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
just documented (r09 review): every epoch commit is STAGED — the Spark
write lands in a ``_staging-e*`` dir the consumer glob can never see, a
per-sorted-position (record count, xor-of-xxhash64(data), sum-of-
pmod(xxhash64(data), 2^31)) fingerprint list is computed distributed
and checked against the committed epoch's ``_epoch_manifest.json``, and
only a matching attempt swaps in (whole-dir rename; a pump crash
between the swap's two renames is restored at the next pump startup by
``recover_wire_stream``). A redelivery whose split OR content differs —
different restart parallelism, changed shuffle partitioning, changed
source — FAILS with the committed epoch left byte-untouched, instead of
silently shifting file indices and duplicating rows past the
consumer's seen-files log
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

#: max record files per epoch (r12, ADVICE r11): the deterministic
#: ``records-%05d.json`` names sort lexicographically == numerically
#: only below this, and the manifest's per-file fingerprints are
#: POSITIONAL — the writer refuses to commit a wider epoch (a pump
#: writing 100k+ files per micro-batch should repartition anyway) and
#: the verifier additionally sorts by the parsed numeric index so a
#: hand-widened epoch cannot confuse the audit's pairing.
MAX_FILES_PER_EPOCH = 100_000


def _rec_index(fname: str) -> int:
    """Numeric index of a ``records-NNNNN.json`` file name."""
    return int(fname.split("-", 1)[1].split(".", 1)[0])


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


def _fp_equal(prior_files: list, files: list) -> bool:
    """Manifest fingerprint comparison, tolerant of the r10 2-element
    (count, xor) entries: a legacy committed manifest is judged on the
    fields it recorded (count + xor); any manifest this code writes
    carries the full (count, xor, sum) triple."""
    return len(prior_files) == len(files) and all(
        list(p) == list(q)[: len(p)] for p, q in zip(prior_files, files)
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
    # STAGED epoch commit (r10 review: the old flow overwrote the
    # committed epoch FIRST and checked the split after — a mismatched
    # redelivery destroyed the committed records AND the manifest, so
    # the guard self-destructed on its first firing). The Spark write
    # lands in a staging dir the consumer glob (`records-e*` +
    # `records-*.json`) can never see; validation, deterministic
    # renames, and the manifest all happen there; the committed epoch
    # is replaced only by the final directory swap.
    import glob as _glob
    import json as _json
    import shutil as _shutil

    prior = None
    mpath = os.path.join(out, EPOCH_MANIFEST)
    try:
        with open(mpath) as f:
            prior = _json.load(f)
    except FileNotFoundError:
        pass
    except (_json.JSONDecodeError, ValueError, OSError) as e:
        raise RuntimeError(
            f"wire epoch {epoch_id}: committed manifest {mpath} is "
            f"unreadable ({e}) — external corruption (this writer swaps "
            "it in atomically with the epoch). Wipe the epoch dir AND "
            "the consumer checkpoint together, then re-pump."
        ) from e
    staging = os.path.join(
        stream_dir(root, stream_name), f"_staging-e{int(epoch_id):06d}"
    )
    _shutil.rmtree(staging, ignore_errors=True)
    try:
        records.write.mode("overwrite").json(staging)
        parts = sorted(_glob.glob(os.path.join(staging, "part-*")))
        if len(parts) >= MAX_FILES_PER_EPOCH:
            raise RuntimeError(
                f"wire epoch {epoch_id}: {len(parts)} part files exceed "
                f"MAX_FILES_PER_EPOCH={MAX_FILES_PER_EPOCH} — the "
                "deterministic records-%05d names and the manifest's "
                "positional fingerprints assume lexicographic == numeric "
                "order; repartition the pump below the cap"
            )
        # Per-sorted-position file fingerprints, computed distributed
        # (the driver collects one bounded row per file): record count,
        # an order-independent xor of xxhash64(data), and (r11, ADVICE
        # r10) a wrapping SUM of pmod(xxhash64(data), 2^31) — xor alone
        # is multiplicity-blind (even-multiplicity record swaps cancel:
        # {A,A,B} and {B,C,C} share count AND xor), the sum makes the
        # fingerprint multiplicity-sensitive (each record adds a bounded
        # positive term; BIGINT-safe below ~4e9 records per file).
        # Hashing only ``data`` makes the fingerprint redelivery-stable
        # (arrival timestamps are service-assigned per delivery,
        # documented above) while still catching equal-count-different-
        # content splits that a counts-only check would wave through.
        spark = batch_df.sparkSession
        by_file: dict[str, tuple[int, int, int]] = {}
        if parts:
            for r in (
                spark.read.schema(WIRE_CONTRACT).json(staging)
                .select(
                    F.element_at(F.split(F.input_file_name(), "/"), -1)
                    .alias("f"),
                    F.xxhash64("data").alias("h"),
                )
                .groupBy("f")
                .agg(
                    F.count("*").alias("n"),
                    F.expr("bit_xor(h)").alias("x"),
                    F.expr("sum(pmod(h, 2147483648))").alias("s"),
                )
                .collect()
            ):
                by_file[r["f"]] = (int(r["n"]), int(r["x"]), int(r["s"]))
        for p in parts:
            if os.path.basename(p) not in by_file:
                if os.path.getsize(p) == 0:
                    # an empty task still writes a zero-byte part file;
                    # fingerprint it as such
                    by_file[os.path.basename(p)] = (0, 0, 0)
                else:  # non-empty file the job never saw: never commit
                    raise RuntimeError(
                        f"wire epoch {epoch_id}: fingerprint job missed "
                        f"non-empty part file {p} — refusing to commit "
                        "an unverifiable epoch"
                    )
        files = [list(by_file[os.path.basename(p)]) for p in parts]
        if prior is not None and not _fp_equal(prior["files"], files):
            raise RuntimeError(
                f"wire epoch {epoch_id} redelivery split mismatch: the "
                f"committed epoch's per-file (count, content-hash) "
                f"{prior['files']} != this attempt's {files} — restart "
                "parallelism/partitioning or source content changed; "
                "consumer seen-file offsets would silently duplicate or "
                "lose rows. The COMMITTED epoch is left untouched; "
                "re-run the pump with the original partitioning (or "
                "wipe the epoch dir AND the consumer checkpoint "
                "together)."
            )
        for i, p in enumerate(parts):
            os.replace(p, os.path.join(staging, f"records-{i:05d}.json"))
        tmp_m = os.path.join(staging, EPOCH_MANIFEST + ".tmp")
        with open(tmp_m, "w") as f:
            _json.dump({"n_files": len(parts), "files": files}, f)
        os.replace(tmp_m, os.path.join(staging, EPOCH_MANIFEST))
    except BaseException:
        _shutil.rmtree(staging, ignore_errors=True)
        raise
    # swap: replace the committed epoch only now, whole-dir, idempotent
    old = f"{staging}.old"
    _shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(out):
        os.rename(out, old)
    os.rename(staging, out)
    _shutil.rmtree(old, ignore_errors=True)


def recover_wire_stream(root: str, stream_name: str) -> dict:
    """Pump-startup recovery (r11, ADVICE r10): a pump crash between
    the two renames of the whole-dir epoch swap (``out -> .old`` then
    ``staging -> out``) leaves the committed epoch ABSENT from the
    consumer glob — its content survives only under
    ``_staging-eNNNNNN.old`` — and an ``availableNow`` consumer
    triggering inside that window would list the stream without the
    epoch's files and complete without them. Called by
    ``kinesis.kinesis_writer``'s file-endpoint path before the pump
    starts. Per leftover ``.old``:

    - epoch dir missing, staging present WITH its manifest: the staging
      dir was fully validated (the manifest is its last write) — roll
      FORWARD (``staging -> out``), drop the ``.old``;
    - epoch dir missing, staging absent/incomplete: roll BACK — restore
      the displaced prior commit (``.old -> out``);
    - epoch dir present (crash after the second rename, before the
      ``.old`` cleanup): just drop the ``.old``.

    Leftover plain staging dirs are then discarded: the epoch that was
    being written will be REDELIVERED by the checkpointed foreachBatch
    (its commit never reached the pump checkpoint), and the staged swap
    validates it against the (restored) committed manifest as usual.

    Transport constraint, documented: pump and consumer must not run
    CONCURRENTLY on the fake transport — the crash window above plus
    this recovery both assume no consumer lists the stream mid-swap.
    The sequential pump-then-consume shape every test and entry uses
    satisfies it; the real connector (network PutRecords) has no such
    window."""
    import glob as _glob
    import shutil as _shutil

    sdir = stream_dir(root, stream_name)
    report: dict = {
        "rolled_forward": [], "rolled_back": [],
        "dropped_old": [], "discarded_staging": [],
    }
    for old in sorted(_glob.glob(os.path.join(sdir, "_staging-e*.old"))):
        staging = old[: -len(".old")]
        tag = os.path.basename(staging)[len("_staging-"):]
        out = os.path.join(sdir, f"records-{tag}")
        if not os.path.isdir(out):
            if os.path.isfile(os.path.join(staging, EPOCH_MANIFEST)):
                os.rename(staging, out)
                report["rolled_forward"].append(tag)
            else:
                os.rename(old, out)
                report["rolled_back"].append(tag)
                continue  # the .old IS the restored epoch now
        _shutil.rmtree(old, ignore_errors=True)
        report["dropped_old"].append(tag)
    for staging in _glob.glob(os.path.join(sdir, "_staging-e*")):
        if staging.endswith(".old"):
            continue
        _shutil.rmtree(staging, ignore_errors=True)
        report["discarded_staging"].append(
            os.path.basename(staging)[len("_staging-"):]
        )
    return report


def verify_wire_stream(
    spark: SparkSession, root: str, stream_name: str
) -> dict:
    """Consumer-side integrity audit (r11) — the fsck analog of
    ``corpus_io.verify_manifest`` for the wire transport: recompute
    every committed epoch's per-file (count, xor, sum) content
    fingerprints and compare them against the epoch's
    ``_epoch_manifest.json``. The pump checks fingerprints only at
    REDELIVERY time; this audits the stream at rest, catching on-disk
    corruption, a truncated/lost record file, or a hand-edited epoch
    before a consumer replays it.

    Scale shape: ONE distributed Spark job over the whole stream (all
    epochs' ``records-*.json`` in a single multi-path read, grouped by
    (epoch dir, file) from ``input_file_name``), with one bounded row
    per committed file collected to the driver — never a per-epoch job
    loop, so the audit costs a single scan regardless of epoch count.

    Legacy tolerance: 2-element (count, xor) manifests committed by the
    r10 writer are judged on the fields they recorded (``_fp_equal``);
    an epoch with NO manifest (pre-r10 stream) is reported in
    ``unverifiable``, not failed. Raises ``RuntimeError`` naming every
    mismatched epoch if any fingerprint disagrees; returns
    ``{"epochs", "verified", "unverifiable", "files", "records"}``."""
    import glob as _glob
    import json as _json

    sdir = stream_dir(root, stream_name)
    epochs = sorted(
        d for d in _glob.glob(os.path.join(sdir, "records-e*"))
        if os.path.isdir(d)
    )
    manifests: dict[str, dict] = {}
    listed: dict[str, list[str]] = {}
    unverifiable: list[str] = []
    for ed in epochs:
        name = os.path.basename(ed)
        try:
            with open(os.path.join(ed, EPOCH_MANIFEST)) as f:
                manifests[name] = _json.load(f)
        except FileNotFoundError:
            unverifiable.append(name)
            continue
        except (_json.JSONDecodeError, ValueError, OSError) as e:
            raise RuntimeError(
                f"wire stream {stream_name}: epoch {name} manifest is "
                f"unreadable ({e}) — external corruption"
            ) from e
        # numeric-index order (r12, ADVICE r11): the manifest's
        # fingerprints are positional in the writer's numeric rename
        # order, which equals lexicographic order only below
        # MAX_FILES_PER_EPOCH — sort by the parsed index so the pairing
        # is index-true regardless of width. A glob match whose index
        # segment is NOT numeric (hand-renamed/copied file, e.g.
        # records-copy.json) is external corruption: report it through
        # the fsck's corruption channel like the unreadable-manifest
        # case, instead of letting sorted() propagate a bare ValueError
        # (r13, ADVICE r12 #3).
        try:
            listed[name] = sorted(
                (
                    os.path.basename(p)
                    for p in _glob.glob(os.path.join(ed, "records-*.json"))
                ),
                key=_rec_index,
            )
        except ValueError as e:
            raise RuntimeError(
                f"wire stream {stream_name}: epoch {name} contains a "
                f"record file with a non-numeric index ({e}) — the "
                "writer only ever emits records-NNNNN.json, so this is "
                "external corruption (hand-renamed or stray file); "
                "inspect the epoch directory by hand"
            ) from e
    by: dict[str, dict[str, tuple[int, int, int]]] = {}
    paths = [
        os.path.join(sdir, e, "records-*.json")
        for e in manifests
        if listed[e]
    ]
    if paths:
        rows = (
            spark.read.schema(WIRE_CONTRACT).json(paths)
            .select(
                F.element_at(F.split(F.input_file_name(), "/"), -2)
                .alias("e"),
                F.element_at(F.split(F.input_file_name(), "/"), -1)
                .alias("f"),
                F.xxhash64("data").alias("h"),
            )
            .groupBy("e", "f")
            .agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(h)").alias("x"),
                F.expr("sum(pmod(h, 2147483648))").alias("s"),
            )
            .collect()  # bounded: one row per committed record file
        )
        for r in rows:
            by.setdefault(r["e"], {})[r["f"]] = (
                int(r["n"]), int(r["x"]), int(r["s"])
            )
    mismatched: list[str] = []
    n_files = n_records = 0
    for e, m in manifests.items():
        fnames = listed[e]
        if len(fnames) != m["n_files"]:
            mismatched.append(
                f"{e}: manifest says {m['n_files']} files, "
                f"{len(fnames)} on disk"
            )
            continue
        got = []
        for fn in fnames:
            t = by.get(e, {}).get(fn)
            if t is None:
                # an empty task's zero-byte part file yields no rows
                if os.path.getsize(os.path.join(sdir, e, fn)) == 0:
                    t = (0, 0, 0)
                else:
                    t = (-1, -1, -1)  # non-empty but unread: mismatch
            got.append(list(t))
        n_files += len(got)
        n_records += sum(g[0] for g in got if g[0] > 0)
        if not _fp_equal(m["files"], got):
            mismatched.append(
                f"{e}: committed fingerprints {m['files']} != "
                f"recomputed {got}"
            )
    if mismatched:
        raise RuntimeError(
            f"wire stream {stream_name} failed the at-rest integrity "
            f"audit — {len(mismatched)} epoch(s) diverge from their "
            "committed manifests (corruption or hand-editing after "
            "commit; the pump's redelivery guard cannot have done "
            "this):\n  " + "\n  ".join(mismatched)
        )
    return {
        "epochs": len(epochs),
        "verified": len(manifests),
        "unverifiable": unverifiable,
        "files": n_files,
        "records": n_records,
    }


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
