"""CDC-driven index refresh at the decade (r14, VERDICT r13 #3): price
`refresh_corpus_index` — the first real consumer of
`corpus_changes_since` — against the from-scratch rebuild it must
equal, at two corpus scales.

Claims under test:

- the refresh is O(changed partitions): after a one-partition
  replacement upsert (count-equal, fingerprint-detected) + a
  whole-partition delete on a 20-partition corpus, the refresh's
  recompute scan reads ~1/20th of the corpus while the rebuild reads
  all of it — the refresh wall should track the CHANGED fraction, not
  the corpus;
- refreshed == rebuilt, bit-exact (exceptAll both ways == 0), at every
  scale.

Run (idle box): python tools/scale_cdc_refresh.py [REPLICAS [REPS2]]
(default 1000 100; appends SCALING_DECADE2.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
REPLICAS2 = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def _composite(spark, reps: int):
    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.schemas import load_table

    base = load_table(spark, SF01, "documents").select(
        "doc_id", "text", "source"
    )
    return base.crossJoin(
        spark.range(reps).select(F.col("id").alias("rep"))
    ).select(
        (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias(
            "doc_id"
        ),
        "text",
        "source",
    )


def price_refresh(spark, reps: int, work: str) -> dict:
    """The PRODUCTION shape: the index is itself a partitioned TABLE
    (same partition columns as the corpus), so untouched index
    partitions stay on disk untouched and a refresh WRITES only the
    changed partitions (dynamic partition overwrite — the same
    idempotent partition-replacement the corpus build uses) and drops
    the removed ones. The refresh is timed as exactly that; the
    rebuild re-derives and rewrites the whole index. Equality of the
    two resulting tables is asserted (exceptAll both ways) outside
    the timers."""
    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.operators.corpus_io import (
        corpus_changes_since,
        delete_from_corpus,
        read_corpus,
        upsert_corpus,
        write_partitioned_corpus,
    )

    out = os.path.join(work, f"corpus_x{reps}")
    idx = os.path.join(work, f"index_x{reps}")
    rebuilt_dir = os.path.join(work, f"index_rebuilt_x{reps}")
    for d in (out, idx, rebuilt_dir):
        shutil.rmtree(d, ignore_errors=True)
    m0 = write_partitioned_corpus(_composite(spark, reps), out)
    t0_token = m0["writer_token"]

    def hash_index(df):
        return df.select("doc_id", "source", F.md5("text").alias("h"))

    # the standing index table as of T0 (ingest-time materialization)
    t0 = time.time()
    hash_index(read_corpus(spark, out)).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("source").parquet(idx)
    w_index0 = time.time() - t0
    srcs = sorted(k.split("=", 1)[1] for k in m0["partitions"])
    chg, dele = srcs[0], srcs[-1]
    delta = (
        read_corpus(spark, out)
        .filter((F.col("source") == chg) & (F.col("doc_id") % 5 == 0))
        .withColumn("text", F.concat(F.lit("CHG: "), F.col("text")))
        .localCheckpoint(eager=True)
    )
    upsert_corpus(delta, out)
    delete_from_corpus(spark, out, F.col("source") == dele)
    # refresh: O(changed) end-to-end — metadata diff, pruned recompute
    # scan, dynamic-overwrite write of ONLY the changed partitions,
    # directory drop of the removed ones
    t0 = time.time()
    ch = corpus_changes_since(spark, out, t0_token)
    if ch["changed"]:
        hash_index(ch["df"]).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("source").parquet(idx)
    for pkey in ch["removed"]:
        shutil.rmtree(os.path.join(idx, pkey), ignore_errors=True)
    w_refresh = time.time() - t0
    # rebuild: the O(corpus) baseline the refreshed table must equal
    t0 = time.time()
    hash_index(read_corpus(spark, out)).write.mode(
        "overwrite"
    ).partitionBy("source").parquet(rebuilt_dir)
    w_rebuild = time.time() - t0
    refreshed = spark.read.parquet(idx)
    rebuilt = spark.read.parquet(rebuilt_dir)
    assert refreshed.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(refreshed).count() == 0
    n = rebuilt.count()
    for d in (out, idx, rebuilt_dir):
        shutil.rmtree(d, ignore_errors=True)
    return {
        "rows": m0["total_rows"],
        "index_rows": n,
        "partitions": len(m0["partitions"]),
        "changed": len(ch["changed"]),
        "removed": len(ch["removed"]),
        "index0": w_index0,
        "refresh": w_refresh,
        "rebuild": w_rebuild,
    }


def main() -> None:
    spark = get_spark("scale_cdc_refresh")
    work = "/dev/shm/graft_cdc_refresh"
    os.makedirs(work, exist_ok=True)
    rows = []
    for reps in (REPLICAS, REPLICAS2):
        r = price_refresh(spark, reps, work)
        print(f"x{reps}: {r}", flush=True)
        rows.append((f"x{reps}", r))
    (l1, r1), (l2, r2) = rows
    lines = [
        "",
        "## CDC-driven index refresh at the decade (r14)",
        "",
        f"Generated by `tools/scale_cdc_refresh.py {REPLICAS}"
        f" {REPLICAS2}`: the hash-set index the incremental dedup gate"
        " probes, maintained as a partitioned TABLE through"
        " `corpus_changes_since` (the production shape of"
        " `refresh_corpus_index`: untouched index partitions stay on"
        " disk; the refresh dynamic-overwrites only the CHANGED"
        " partitions and drops the removed ones) vs the from-scratch"
        " rebuild it must equal (asserted exceptAll both ways == 0 at"
        " every scale). Changes: a one-partition count-equal"
        " replacement upsert (fingerprint-detected) + a"
        " whole-partition delete on a"
        f" {r1['partitions']}-partition corpus.",
        "",
        "| corpus | rows | changed/removed parts | refresh (O(changed))"
        " | rebuild (O(corpus)) | ratio |",
        "|---|---|---|---|---|---|",
    ]
    for label, r in rows:
        lines.append(
            f"| {label} | {r['rows']:,} | {r['changed']}/{r['removed']}"
            f" | {r['refresh']:.2f}s | {r['rebuild']:.2f}s |"
            f" {r['refresh'] / max(r['rebuild'], 1e-9):.2f}x |"
        )
    lines += [
        "",
        f"At x{REPLICAS} the refresh costs"
        f" {r1['refresh'] / max(r1['rebuild'], 1e-9):.2f}x of the"
        " rebuild: its scan AND its write touch 1 changed partition of"
        f" {r1['partitions']} (metadata diff + pruned read + dynamic"
        " overwrite of that partition's index files), while the"
        " rebuild re-reads and rewrites everything. The gap widens"
        " with partition count — at 100 TB with thousands of"
        " partitions the refresh stays bounded by the day's changed"
        " set, which is the entire point of fingerprint CDC.",
    ]
    with open("/root/repo/SCALING_DECADE2.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended SCALING_DECADE2.md", flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
