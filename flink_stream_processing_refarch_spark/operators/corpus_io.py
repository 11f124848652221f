"""Corpus output: partitioned parquet writer with a verifiable manifest.

The write side of the training-data pipeline — the batch complement of
the streaming sinks (`streaming/sinks.py` ES bulk, the single-pass
pipeline's epoch-addressed partial writer). The reference's sinks are
Kinesis/Elasticsearch (flink-taxi-stream-processor/.../
ProcessTaxiStream.java:137-150); a corpus engine's primary sink is a
partitioned columnar layout plus a manifest consumers can trust.

Design for 100 TB:
  - ``partitionBy`` on low-cardinality provenance columns (source/split)
    so downstream mixes prune partitions at the scan;
  - ``maxRecordsPerFile`` bounds file sizes without a global sort or an
    extra repartition (Spark splits within task output);
  - dynamic partition overwrite makes re-running one source/shard
    IDEMPOTENT: only the partitions present in the new data are
    replaced, everything else is untouched — the batch analogue of the
    epoch-overwrite idempotency the streaming sinks use;
  - the manifest is written AFTER a read-back of the committed files
    (counts come from what landed, not from what was attempted), so a
    consumer checking ``verify_manifest`` never trusts a partial write.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_corpus_manifest.json"


def write_partitioned_corpus(
    df: DataFrame,
    out_dir: str,
    partition_cols: tuple[str, ...] = ("source",),
    max_records_per_file: int = 100_000,
) -> dict:
    """Write ``df`` partitioned by ``partition_cols`` with dynamic
    partition overwrite, then read back the committed files and write a
    manifest of per-partition row counts. Returns the manifest dict."""
    spark = df.sparkSession
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(out_dir)
    )
    manifest = _manifest_from_files(spark, out_dir, partition_cols)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def _manifest_from_files(
    spark: SparkSession, out_dir: str, partition_cols: tuple[str, ...]
) -> dict:
    back = spark.read.parquet(out_dir)
    rows = back.groupBy(*partition_cols).count().collect()
    parts = {
        "/".join(f"{c}={r[c]}" for c in partition_cols): r["count"]
        for r in rows
    }
    return {
        "partition_cols": list(partition_cols),
        "partitions": parts,
        "total_rows": sum(parts.values()),
    }


def upsert_corpus(
    delta: DataFrame,
    out_dir: str,
    key_cols: tuple[str, ...] = ("doc_id",),
    partition_cols: tuple[str, ...] = ("source",),
    max_records_per_file: int = 100_000,
) -> dict:
    """Merge a delta batch into an existing partitioned corpus:
    delta rows REPLACE existing rows with the same key, new keys are
    appended — the batch upsert that keeps a living corpus current
    (the write-side complement of the delta-vs-corpus admission gate,
    ``operators/incremental.py``).

    Scale shape: only the partitions PRESENT IN THE DELTA are read
    (partition-pruned scan — the bounded partition list is the one
    driver-side collect) and only those partitions are rewritten
    (dynamic overwrite); untouched partitions are never opened. The
    merge itself is one co-partitioned window on the key: delta rows
    win via a deterministic priority column, never a driver-side diff.

    Constraint (documented, standard for partition-scoped upserts): a
    key's partition-column value is assumed stable — provenance columns
    like ``source`` don't change for an existing doc. Moving a key
    across partitions requires rewriting both partitions explicitly.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = delta.sparkSession
    touched = [
        tuple(r[c] for c in partition_cols)
        for r in delta.select(*partition_cols).distinct().collect()
    ]
    if not touched:  # empty delta: nothing to merge, manifest unchanged
        with open(os.path.join(out_dir, MANIFEST)) as f:
            return json.load(f)
    pred = None
    for vals in touched:
        clause = None
        for c, v in zip(partition_cols, vals):
            # null-safe: a NULL partition value must still select its
            # partition's existing rows, or the dynamic overwrite would
            # replace that partition with delta-only content
            eq = F.col(c).eqNullSafe(F.lit(v))
            clause = eq if clause is None else (clause & eq)
        pred = clause if pred is None else (pred | clause)
    existing = spark.read.parquet(out_dir).filter(pred)
    merged = (
        delta.withColumn("_pri", F.lit(0))
        .unionByName(existing.withColumn("_pri", F.lit(1)))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
                    "_pri"
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_pri", "_rn")
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(out_dir)
    )
    manifest = _manifest_from_files(spark, out_dir, partition_cols)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def verify_manifest(spark: SparkSession, out_dir: str) -> bool:
    """True iff the manifest on disk matches a fresh read-back — the
    consumer-side integrity check before a corpus is used."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    fresh = _manifest_from_files(
        spark, out_dir, tuple(manifest["partition_cols"])
    )
    return (
        fresh["partitions"] == manifest["partitions"]
        and fresh["total_rows"] == manifest["total_rows"]
    )
