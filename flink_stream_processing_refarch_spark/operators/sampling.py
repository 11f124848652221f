"""Deterministic sampling / splitting for training-data pipelines.

Not in the reference (SURVEY.md §2.7 — it has no sampling of any kind);
this is part of the training-data operator surface the engine adds on
top. The design constraint at 100 TB is *determinism without a shuffle*:

  * ``orderBy(rand()).limit(n)`` is a global sort — O(n log n) shuffle of
    the full corpus, AND irreproducible run-to-run.
  * ``df.sample(fraction)`` is cheap but seed-and-partitioning dependent:
    repartition the input and membership changes, so train/test splits
    silently drift between runs.
  * Hash-gating on a stable key (``md5`` of the document id) is map-only,
    reproducible on any partitioning, any engine, any cluster size — the
    split is a pure function of the row. This is the standard trick for
    stable train/holdout assignment in large corpus pipelines.

Membership tests compare md5 *hex strings* lexicographically ('00'..'ff'
uniform over 256 buckets at 2 chars) — portable to any engine with md5
and string compare, which is what makes the DuckDB oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table

# First two md5 hex chars are uniform over 256 buckets; 'cc' = 204/256
# -> ~79.7% train, rest eval. Stable forever given stable doc_ids.
TRAIN_GATE_HEX = "cc"
CAP_PER_GROUP = 50


def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/20 train/eval split of the document corpus.

    Map-only: no shuffle, no RNG, no global state — each row's split is
    md5(doc_id) compared against a hex threshold, so the assignment is
    identical on 1 executor or 1000 and survives repartitioning. At
    100 TB this runs at scan speed with full codegen.
    """
    docs = load_table(spark, sf_dir, "documents")
    gate = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return docs.select(
        "doc_id",
        "lang",
        F.when(gate < F.lit(TRAIN_GATE_HEX), "train")
        .otherwise("eval")
        .alias("split"),
    )


SPLIT_TRAIN_TEST_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{TRAIN_GATE_HEX}'
            THEN 'train' ELSE 'eval' END AS split
FROM documents
"""


def q_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each (lang, source) stratum at CAP_PER_GROUP docs, chosen by
    deterministic md5 order (a reproducible "random" per-group sample).

    The balancing primitive for skewed corpora: web-crawl languages are
    Zipfian, and training mixes cap the head instead of sampling a global
    fraction. One shuffle on the stratum key; the md5 sort happens within
    groups only (no global ordering). Strata far larger than memory would
    use the two-pass variant (per-group count + threshold-gate), but
    row_number covers any stratum that fits a partition — and AQE splits
    skewed ones.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang", "source")
        .orderBy(F.md5(F.col("doc_id").cast("string")))
    )
    return (
        docs.select("doc_id", "lang", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= CAP_PER_GROUP)
        .drop("rn")
    )


STRATIFIED_CAP_SQL = f"""
SELECT doc_id, lang, source
FROM (
    SELECT doc_id, lang, source,
           row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR))
           ) AS rn
    FROM documents
)
WHERE rn <= {CAP_PER_GROUP}
"""


def q_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language train/eval counts — the QA report a split job emits.
    Verifies the gate's uniformity (each lang ~80/20) and doubles as the
    aggregate view of q_split_train_test."""
    return (
        q_split_train_test(spark, sf_dir)
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


SPLIT_COUNTS_SQL = f"""
SELECT lang, split, count(*) AS n_docs
FROM ({SPLIT_TRAIN_TEST_SQL.strip()})
GROUP BY lang, split
"""


ID_BUCKETS = 32  # parallelism of the numbering phase


def q_global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global row numbers in doc_id order — the stable-ID
    assignment step of a corpus build (rows -> training-example ids).

    The naive plan, ``row_number() OVER (ORDER BY doc_id)`` with no
    PARTITION BY, funnels the entire corpus through ONE reducer — the
    classic 100 TB scale-killer. This is the two-phase fix as one fully
    declarative plan (no driver actions, no literals):

      1. range-bucket the key: min/max arrive per-row via a broadcast
         1-row cross join feeding uniform ``width_bucket`` (swap in
         percentile boundaries for skewed keys — correctness never
         depends on the boundary choice, only skew balance does,
         because offsets are counted per the same bucket definition);
      2. per-bucket counts roll up map-side to ID_BUCKETS rows, and the
         cumulative-offset window runs over that METADATA-sized
         relation (the single-partition window touches O(buckets)
         rows, never data);
      3. rows are numbered within each bucket in parallel and shifted
         by the bucket's broadcast offset.

    One data shuffle total (hash on bucket for the per-bucket sort).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    mm = docs.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    withb = (
        docs.crossJoin(F.broadcast(mm))
        .withColumn(
            "bucket",
            F.expr(f"width_bucket(doc_id, lo, hi + 1, {ID_BUCKETS})"),
        )
        .drop("lo", "hi")
    )
    counts = withb.groupBy("bucket").agg(F.count("*").alias("n"))
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        "bucket", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("off")
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    return (
        withb.join(F.broadcast(offs), "bucket")
        .select(
            "doc_id",
            (F.row_number().over(w) + F.col("off")).cast("bigint").alias("rn"),
        )
    )


GLOBAL_ROW_NUMBER_SQL = """
SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn
FROM documents
"""


QUERIES = {
    "split_train_test": q_split_train_test,
    "global_row_number": q_global_row_number,
    "split_counts": q_split_counts,
    "stratified_cap": q_stratified_cap,
}

ORACLES = {
    "split_train_test": SPLIT_TRAIN_TEST_SQL,
    "global_row_number": GLOBAL_ROW_NUMBER_SQL,
    "split_counts": SPLIT_COUNTS_SQL,
    "stratified_cap": STRATIFIED_CAP_SQL,
}
