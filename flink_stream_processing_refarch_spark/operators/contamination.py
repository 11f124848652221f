"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set — the standard pre-training
hygiene step (run before any model sees the corpus) that none of the
reference's relational operators cover but every large-scale training
pipeline needs.

Eval membership here is the deterministic split ``doc_id % EVAL_MOD = 0``
(in production the eval set is an external benchmark table; the split
keeps the query self-contained and the oracle portable). Shingle width
is ``NGRAM`` words — real pipelines use 8-13; 3 matches this synthetic
corpus's collision profile and the dedup family's shingle convention
(`operators/dedup.py::_shingles`).

Scale shape at 100 TB:
  - Shingling and ``array_distinct`` are narrow, computed at the scan —
    the text column never crosses a shuffle.
  - The eval shingle set is small by construction (benchmarks are MBs,
    not TBs) → ``F.broadcast`` hash join; the exploded training
    shingles are filtered map-side, so the only wide exchange carries
    (doc_id, n_shingles) for MATCHED shingles only.
  - The final per-doc count is map-side combinable (partial aggregation
    before the exchange).

Reference parity: nearest analogue is the reference's filter+keyBy
pattern (kinesis-analytics-taxi-consumer ProcessTaxiStream.java:124-139)
— this operator generalizes it to a set-membership filter against a
broadcast dimension built in the same query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import words_expr
from ..schemas import load_table

EVAL_MOD = 97  # ~1% of docs act as the held-out eval set
NGRAM = 3      # shingle width in words


def _shingles(dialect: str, w: int = NGRAM) -> str:
    """Distinct word ``w``-gram shingles of ``text``; docs shorter than
    ``w`` words contribute the whole text as one shingle."""
    ws = words_expr("text", dialect)
    if dialect == "spark":
        grams = (
            f"transform(sequence(0, size({ws}) - {w}), i -> "
            f"concat_ws(' ', slice({ws}, i + 1, {w})))"
        )
        return (
            f"CASE WHEN size({ws}) >= {w} THEN array_distinct({grams}) "
            f"ELSE array(text) END"
        )
    grams = (
        f"list_transform(range(1, len({ws}) - {w - 2}), i -> "
        f"array_to_string(list_slice({ws}, i, i + {w - 1}), ' '))"
    )
    return (
        f"CASE WHEN len({ws}) >= {w} THEN list_distinct({grams}) "
        f"ELSE [text] END"
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs that share ≥1 word n-gram with the eval split:
    (doc_id, n_shingles, n_matched, contamination ratio)."""
    docs = load_table(spark, sf_dir, "documents")
    # Single-file testdata scans as 1 partition; spread the CPU-bound
    # shingle transform across cores (no-op at real scale — see
    # dedup.corpus_df for the measured rationale).
    base = docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", F.expr(_shingles("spark")).alias("sh")
    )
    ev = (
        base.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    tr = base.filter(F.col("doc_id") % EVAL_MOD != 0).select(
        "doc_id",
        F.size("sh").cast("bigint").alias("n_shingles"),
        F.explode("sh").alias("g"),
    )
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(
            F.min("n_shingles").alias("n_shingles"),
            F.count("*").alias("n_matched"),
        )
        .withColumn(
            "contamination",
            F.col("n_matched").cast("double") / F.col("n_shingles"),
        )
    )


def _decontaminate_sql() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, {_shingles('duckdb')} AS sh FROM documents
),
ev AS (
  SELECT DISTINCT unnest(sh) AS g FROM base WHERE doc_id % {EVAL_MOD} = 0
),
tr AS (
  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles, unnest(sh) AS g
  FROM base WHERE doc_id % {EVAL_MOD} <> 0
)
SELECT tr.doc_id,
       min(n_shingles) AS n_shingles,
       count(*) AS n_matched,
       CAST(count(*) AS DOUBLE) / min(n_shingles) AS contamination
FROM tr JOIN ev USING (g)
GROUP BY tr.doc_id
"""


QUERIES = {"decontaminate": q_decontaminate}
ORACLES = {"decontaminate": _decontaminate_sql()}
