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

Reference parity: nearest analogue is the reference's predicate chain +
keyed aggregation (flink-taxi-stream-processor/.../ProcessTaxiStream.java:90-106),
whose geo filters test membership in constant cell sets built at
class-load (GeoUtils.java:28-43) — this operator generalizes that fixed
membership set to a broadcast dimension built in the same query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import words_expr
from ..schemas import load_table, spread

EVAL_MOD = 97  # ~1% of docs act as the held-out eval set
NGRAM = 3      # shingle width in words


def _shingles(dialect: str, w: int = NGRAM, ws: str | None = None) -> str:
    """Distinct word ``w``-gram shingles of ``text``; docs shorter than
    ``w`` words contribute the whole text as one shingle.

    ``ws``: name of a pre-projected words column (Spark callers) — the
    inline form spells the split three times in one expression and
    Spark evaluates it three times per row (see dedup._shingles; r14
    optimization round). Oracle callers pass nothing; the DuckDB SQL is
    unchanged."""
    ws = ws or words_expr("text", dialect)
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


def eval_shingle_array(docs: DataFrame) -> DataFrame:
    """The eval split's distinct shingles collapsed to ONE array row
    (``ev_g``) — the static/broadcast side of every decontamination
    variant (batch probe, streaming gate, tests). One definition so the
    eval-membership rule can never diverge between them."""
    return (
        docs.filter(F.col("doc_id") % EVAL_MOD == 0)
        .withColumn("__ws", F.expr(words_expr("text", "spark")))
        .select(F.explode(F.expr(_shingles("spark", ws="__ws"))).alias("g"))
        .distinct()
        .agg(F.collect_list("g").alias("ev_g"))
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs that share ≥1 word n-gram with the eval split:
    (doc_id, n_shingles, n_matched, contamination ratio)."""
    docs = load_table(spark, sf_dir, "documents")
    # Single-file testdata scans as 1 partition; spread() repartitions
    # ONLY in that starved case (gated on the scan's partition count), so
    # the at-scale plan has no exchange upstream of the shingle
    # projection — text never crosses a shuffle there. Project down to
    # (doc_id, text) first so even the local exchange carries no extras.
    base = spread(
        docs.select("doc_id", "text"), src_path=f"{sf_dir}/documents.parquet"
    ).withColumn(
        "__ws", F.expr(words_expr("text", "spark"))
    ).select(
        "doc_id", F.expr(_shingles("spark", ws="__ws")).alias("sh")
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


# ---------------------------------------------------------------------------
# Composed corpus build: quality filter -> exact-dedup survivorship ->
# decontamination gate -> per-source training mix. The end-to-end corpus
# selection as ONE declarative plan (training_mix plus the decontamination
# stage this module adds).
# ---------------------------------------------------------------------------

def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc/token totals of training docs (eval split excluded)
    that pass the quality filter, survive exact dedup, and share no
    n-gram with the eval set.

    Shuffle shape at 100 TB: quality features, the content hash and the
    shingles are all computed in ONE narrow projection at the training
    scan; the eval shingle set (benchmarks are MBs) broadcasts; the
    single wide exchange is the dedup groupBy(h), whose map-side
    partial aggregation collapses each doc's exploded shingle rows
    first (~|train docs| rows cross); the rollup reduces map-side to
    |sources| rows. The text column never crosses any exchange.
    """
    from .text import _exprs, gopher_gate_sql

    e = _exprs("spark", ws="__ws")
    docs = load_table(spark, sf_dir, "documents")
    # the shared Gopher admission rule — identical across the funnel and
    # every corpus write path (VERDICT r07 #5); words projected once
    # (see text._exprs, r14 optimization round)
    keep = gopher_gate_sql("spark", ws="__ws")
    # r15 optimization round (guide §1.2/§2.4): the training split is
    # scanned and tokenized ONCE. Previously the quality/hash projection
    # and the decontamination probe (q_decontaminate's tr side) were two
    # independent subtrees — two full scans, each paying the split() —
    # and the contamination verdict came back through its own
    # groupBy(doc_id) + anti-join pair of exchanges. Now one projection
    # computes (h, quality features, shingles); the exploded shingles
    # left-join the broadcast eval-shingle set for a per-row hit marker,
    # and ONE groupBy(h) performs exact-dedup survivorship AND the
    # contamination verdict together:
    #   - min_by(struct, doc_id) = the survivor, exactly as before;
    #   - max(hit) = "survivor shares an n-gram with the eval split",
    #     because h = md5(text): equal h <=> equal text <=> equal
    #     shingle set <=> equal hit status for every member of the
    #     group (the same text-identity the exact-dedup stage itself is
    #     built on), so any member's hit IS the survivor's hit.
    # Scans 3 -> 2 (eval side + training side), exchanges 4 -> 2, and
    # the map-side partial aggregation collapses each doc's exploded
    # shingle rows before the h-exchange, so the shuffle still carries
    # ~|train docs| narrow rows. Results identical (oracle SQL
    # byte-unchanged; re-proven at sf0.01 + sf0.001).
    ev = (
        docs.filter(F.col("doc_id") % EVAL_MOD == 0)
        .withColumn("__ws", F.expr(words_expr("text", "spark")))
        .select(F.explode(F.expr(_shingles("spark", ws="__ws"))).alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    tr = spread(
        docs.filter(F.col("doc_id") % EVAL_MOD != 0).select(
            "doc_id", "source", "text"
        ),
        src_path=f"{sf_dir}/documents.parquet",
    ).withColumn(
        "__ws", F.expr(words_expr("text", "spark"))
    ).select(
        F.md5("text").alias("h"),
        "doc_id",
        "source",
        F.expr(e["n_words"]).alias("n_tokens"),
        F.expr(keep).alias("keep"),
        F.expr(_shingles("spark", ws="__ws")).alias("sh"),
    )
    exploded = tr.select(
        "h", "doc_id", "source", "n_tokens", "keep",
        F.explode("sh").alias("g"),
    )
    per_h = (
        exploded.join(F.broadcast(ev), "g", "left")
        .groupBy("h")
        .agg(
            F.min_by(
                F.struct("doc_id", "source", "n_tokens", "keep"),
                F.col("doc_id"),
            ).alias("s"),
            F.max(F.coalesce(F.col("__hit"), F.lit(0))).alias("hit"),
        )
        .select("s.*", "hit")
    )
    return (
        per_h.filter(F.col("keep") & (F.col("hit") == 0))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


def _corpus_build_sql() -> str:
    from .text import _exprs, gopher_gate_sql

    e = _exprs("duckdb")
    return f"""
WITH scored AS (
  SELECT md5(text) AS h, doc_id, source,
         {e['n_words']} AS n_tokens,
         {gopher_gate_sql('duckdb')} AS keep
  FROM documents WHERE doc_id % {EVAL_MOD} <> 0
),
surv AS (SELECT h, min(doc_id) AS doc_id FROM scored GROUP BY h),
base AS (
  SELECT doc_id, {_shingles('duckdb')} AS sh FROM documents
),
ev AS (
  SELECT DISTINCT unnest(sh) AS g FROM base WHERE doc_id % {EVAL_MOD} = 0
),
contaminated AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(sh) AS g FROM base
        WHERE doc_id % {EVAL_MOD} <> 0) tr
  JOIN ev USING (g)
)
SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM scored JOIN surv USING (h, doc_id)
WHERE keep AND doc_id NOT IN (SELECT doc_id FROM contaminated)
GROUP BY source
"""


QUERIES = {
    "decontaminate": q_decontaminate,
    "corpus_build": q_corpus_build,
}
ORACLES = {
    "decontaminate": _decontaminate_sql(),
    "corpus_build": _corpus_build_sql(),
}
