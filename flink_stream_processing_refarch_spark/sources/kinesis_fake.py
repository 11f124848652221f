"""Local Kinesis wire fake — a file-backed transport that speaks the
spark-sql-kinesis connector's record contract, so the S1/S7 swap points
(``kinesis_reader`` / ``kinesis_writer``) run END-TO-END without the
connector jar (VERDICT r07 item 3; same pattern as the ES bulk-file
transport in ``streaming/sinks.py``: everything up to the network call
is real, the network itself is a directory).

Record contract (what the public connector's ``load()`` emits and what
``PutRecords`` carries): ``data binary`` (the payload — base64 in the
JSON files, exactly as the Kinesis REST API encodes it on the wire),
``streamName``, ``partitionKey``, ``shardId``, ``sequenceNumber``
(increasing per shard), ``approximateArrivalTimestamp``. The consumer
side needs only ``data`` (``kinesis.parse_wire_bytes``); the rest lets
tests pin the producer semantics the reference relies on:

  - partition-key routing: key = hash(payload)
    (kinesis-taxi-stream-producer/.../Event.java:38-40), records with
    equal keys land on the SAME shard (MD5-range routing in the real
    service; ``pmod(xxhash64(key), shards)`` here — deterministic and
    key-stable, which is the property consumers may assume);
  - per-shard sequence numbers increase with arrival order across
    epochs (epoch-prefixed, zero-padded so string order = numeric).

Delivery: one ``records-e{epoch}`` directory per micro-batch epoch,
overwritten whole on redelivery — idempotent exactly like the ES sink's
epoch dirs. Since r09 the committed record files are renamed to
DETERMINISTIC names (``records-NNNNN.json``): a producer redelivery
(crash between the epoch write and the pump checkpoint's commit, then
restart) reproduces files at IDENTICAL paths — identical in content
too except ``approximateArrivalTimestamp``, which is service-assigned
per arrival exactly like real Kinesis (a redelivered record is a new
arrival), so do NOT build a consumer on byte-level checksums of record
files. Path identity is what matters: a consumer that already consumed
the epoch skips it via its own checkpointed seen-files offsets — the
effectively-once story the reference only gets via idempotent sink
buffering (ElasticsearchJestSink.java:139-148), pinned by
tests/test_kinesis_fake.py::test_consumer_skips_redelivered_epochs.
Assumption (same as any replayed source): the restarted pump re-splits
the epoch identically — true for a checkpointed availableNow replay of
the same bounded source. Since r10 this assumption is ENFORCED, not
just documented (r09 review): each epoch commit writes a tiny
``_epoch_manifest.json`` (file count + per-sorted-position record
counts, computed distributed), and a redelivery whose split differs —
different restart parallelism, changed shuffle partitioning — FAILS
the rename step instead of silently shifting file indices and
duplicating rows past the consumer's seen-files log
(tests/test_kinesis_fake.py::test_redelivery_with_different_split_fails). Scale note: this module is a LOCAL TEST
TRANSPORT; the production path is the real connector
(``kinesis.KINESIS_FORMAT``), the fake's only job is to prove the
engine-side plumbing with zero driver-side row handling (reads and
writes are both distributed; the post-commit rename is a bounded
per-file metadata op).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# What the connector's load() emits — data first, metadata after.
WIRE_CONTRACT = (
    "data binary, streamName string, partitionKey string, "
    "shardId string, sequenceNumber string, "
    "approximateArrivalTimestamp timestamp"
)

DEFAULT_SHARDS = 4

#: per-epoch commit manifest (underscore-prefixed: invisible to the
#: consumer glob ``records-*.json`` and to Spark's directory listing).
EPOCH_MANIFEST = "_epoch_manifest.json"


def stream_dir(root: str, stream_name: str) -> str:
    return os.path.join(root, stream_name)


def epoch_dir(root: str, stream_name: str, epoch_id: int) -> str:
    return os.path.join(
        stream_dir(root, stream_name), f"records-e{int(epoch_id):06d}"
    )


def shard_id_col(partition_key, shards: int = DEFAULT_SHARDS):
    """Deterministic key->shard routing (stands in for the service's
    MD5-of-key hash-range assignment): equal keys always co-locate."""
    return F.format_string(
        "shardId-%012d", F.pmod(F.xxhash64(partition_key), F.lit(shards))
    )


def write_wire_batch(
    batch_df: DataFrame,
    epoch_id: int,
    root: str,
    stream_name: str,
    shards: int = DEFAULT_SHARDS,
) -> None:
    """foreachBatch body for the fake PutRecords: stamp the service-side
    record metadata onto a (data binary, partitionKey string) frame and
    write the epoch's records distributed (every task writes its own
    partition; the driver only issues the job). Sequence numbers are
    epoch-prefixed + task-monotonic (``monotonically_increasing_id``),
    so they are unique and strictly increase per shard ACROSS epochs —
    the guarantee Kinesis gives; like PutRecords, intra-batch order is
    unspecified. Epoch dir overwritten whole on redelivery (idempotent).
    """
    records = batch_df.select(
        F.col("data"),
        F.lit(stream_name).alias("streamName"),
        F.col("partitionKey"),
        shard_id_col(F.col("partitionKey"), shards).alias("shardId"),
        F.format_string(
            "%010d%020d",
            F.lit(int(epoch_id)),
            F.monotonically_increasing_id(),
        ).alias("sequenceNumber"),
        F.current_timestamp().alias("approximateArrivalTimestamp"),
    )
    out = epoch_dir(root, stream_name, epoch_id)
    # A prior manifest means this is a REDELIVERY: read it before the
    # overwrite wipes the epoch dir, so the new split can be checked.
    import glob as _glob
    import json as _json

    mpath = os.path.join(out, EPOCH_MANIFEST)
    prior = None
    if os.path.exists(mpath):
        with open(mpath) as f:
            prior = _json.load(f)
    records.write.mode("overwrite").json(out)
    # Deterministic commit names: Spark's part files carry a fresh UUID
    # per attempt, which would make a redelivered epoch look like NEW
    # files to the consumer's seen-files log. Renaming to stable names
    # makes redelivery path-idempotent, so consumer offsets skip it.
    # Path idempotence assumes the redelivered epoch splits into the
    # SAME files — enforced here (r10): per-sorted-position record
    # counts (computed distributed; the driver collects one bounded row
    # per file) must match the first delivery's manifest, or the rename
    # fails loudly instead of shifting indices and duplicating rows.
    parts = sorted(_glob.glob(os.path.join(out, "part-*")))
    spark = batch_df.sparkSession
    by_file = {
        r["f"]: r["count"]
        for r in spark.read.text(parts)
        .select(F.input_file_name().alias("f"))
        .groupBy("f")
        .count()
        .collect()
    } if parts else {}
    counts = [
        int(by_file.get("file://" + p, by_file.get(p, 0))) for p in parts
    ]
    if prior is not None and prior["counts"] != counts:
        raise RuntimeError(
            f"wire epoch {epoch_id} redelivery split mismatch: first "
            f"delivery committed {prior['counts']} records per file, "
            f"this attempt produced {counts} — restart parallelism or "
            "partitioning changed; consumer seen-file offsets would "
            "silently duplicate rows. Re-run the pump with the original "
            "partitioning (or wipe the epoch dir AND the consumer "
            "checkpoint together)."
        )
    for i, p in enumerate(parts):
        os.replace(p, os.path.join(out, f"records-{i:05d}.json"))
    with open(mpath, "w") as f:
        _json.dump({"n_files": len(parts), "counts": counts}, f)


def fake_reader(spark: SparkSession, root: str, stream_name: str):
    """Configured DataStreamReader over the fake stream directory —
    ``.load()`` yields the connector's record contract (``data`` decoded
    from the wire base64 back to binary by the JSON source). New epoch
    dirs appearing under the glob are picked up on each trigger, exactly
    like new records on a shard."""
    return (
        spark.readStream.format("json")
        .schema(WIRE_CONTRACT)
        .option(
            "path", os.path.join(stream_dir(root, stream_name), "records-e*")
        )
        .option("pathGlobFilter", "records-*.json")
    )
