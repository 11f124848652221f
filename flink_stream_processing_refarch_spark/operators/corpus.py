"""Corpus-construction operators for large-scale training-data pipelines,
round 3 additions: TF-IDF salient terms, fixed-budget sequence packing,
bottom-k per-source sampling, bigram language-model counts, PII scrubbing,
and duplicate-provenance reporting.

Like the rest of the LLM-pipeline family these go beyond the reference's
inventory (its only queries are the two taxi windowed aggregations,
flink-taxi-stream-processor/.../ProcessTaxiStream.java:96-136); they are
the operations a 100 TB corpus build needs around those streaming
primitives. Every query is a ``queries()`` entry with a DuckDB oracle.

Scale posture (shared): text-derived features are computed narrow at the
scan; wide exchanges carry tokens/hashes/bigints, never document text;
per-group orderings use hash keys so any range/hash partitioning works;
output cardinalities are bounded (per-doc top-k, |vocab|^2 for bigrams,
O(sources x k) for samples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.detmath import apply_stages, ln_det_stages, stages_sql
from ..functions.portable import words_expr
from ..schemas import load_table
from .dedup import corpus_df, corpus_sql

TFIDF_TOP_K = 3        # salient terms kept per document
TFIDF_DOC_MOD = 25     # doc subset for the report (bounds output)
PACK_BUDGET = 256      # tokens per packed training sequence
SAMPLE_K = 5           # bottom-k sample size per source
BIGRAM_TOP_K = 3       # continuations kept per head word


# ---------------------------------------------------------------------------
# TF-IDF salient terms (keyword extraction for corpus QA / indexing)
# ---------------------------------------------------------------------------

def tfidf_micro_stages() -> list[tuple[str, str]]:
    """Per-(doc, term) TF-IDF score in integer MICRO-units as a STAGE
    LIST (detmath discipline): tf * ln(N / df), quantized to BIGINT via
    floor(x*1e6 + 0.5) — round-half-up, exact for these non-negative
    scores (N >= df always, so ln >= 0).

    The ln is ``detmath.ln_det_stages`` (correctly rounded + - * /
    only), identical expression text in both engines, so the quantized
    score — and with it the rank and the emitted 6-decimal value — is
    bit-identical across engines BY CONSTRUCTION. (Until r10 this
    rounded a raw libm ln to 6 decimals; a 1-ulp cross-engine ln
    divergence landing exactly on a rounding boundary flips the hashed
    output — the same class the r08 fuzz gate falsified for kl_term.
    This was the float_audit allowlist's one row; now empty.)
    Domain: idf_x = N/df in [1, N] — inside detmath's [2^-64, 2^64) for
    any corpus below ~1.8e19 docs. Base columns consumed: tf, doc_freq,
    n_docs; final column: ``tfidf_u``."""
    return [
        ("idf_x", "CAST(n_docs AS DOUBLE) / CAST(doc_freq AS DOUBLE)"),
        *ln_det_stages("idf_x", "idf"),
        (
            "tfidf_u",
            "CAST(floor(CAST(tf AS DOUBLE) * idf_ln"
            " * CAST(1000000.0 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)",
        ),
    ]


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TFIDF_TOP_K`` terms per document by TF-IDF.

    tf = in-doc occurrences, idf = ln(N / doc_freq) with N = corpus doc
    count; the score is quantized to 6-decimal micro-units BEFORE
    ranking (ties then break on the word) because mathematically-equal
    scores from different (tf, df) pairs — e.g. 2*ln(2) vs ln(4) — can
    differ in the last ulp, which would make an unquantized rank
    nondeterministic. Both the quantization and the ln itself are the
    shared deterministic stage pipeline (``tfidf_micro_stages``), so
    rank and emitted value are engine-identical by construction.

    Scale shape: explode is narrow at the scan; the (doc_id, word) tf
    aggregate and the |vocab|-sized df aggregate are both map-side
    combinable; df and N (a 1-row aggregate) broadcast back onto the tf
    relation, so the only wide exchange carries (doc_id, word, count)
    pairs. The per-doc top-k window partitions on doc_id — the same key
    the tf aggregate already hashed on. The staged ln adds ~40 scalar
    flops per surviving row inside whole-stage codegen — zero new
    exchanges (the doc_id % mod filter still runs before the stages).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(words_expr("text", "spark"))).alias("word")
    )
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = tok.groupBy("word").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = apply_stages(
        tf.join(F.broadcast(df), "word")
        .join(F.broadcast(n_docs))
        .filter(F.col("doc_id") % TFIDF_DOC_MOD == 0),
        tfidf_micro_stages(),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_u").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            "rank",
            "word",
            "tf",
            "doc_freq",
            (F.col("tfidf_u").cast("double") / F.lit(1000000.0)).alias(
                "tfidf"
            ),
        )
    )


def _tfidf_sql() -> str:
    w = words_expr("text", "duckdb")
    staged = stages_sql(
        "SELECT * FROM tf JOIN df USING (word) CROSS JOIN n"
        f" WHERE tf.doc_id % {TFIDF_DOC_MOD} = 0",
        tfidf_micro_stages(),
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({w}) AS word FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
df AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
       FROM tok GROUP BY word),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, word, tf, doc_freq, tfidf_u FROM ({staged})
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_u DESC, word ASC) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, word, tf, doc_freq,
       CAST(tfidf_u AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS tfidf
FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chunk document packing for pretraining)
# ---------------------------------------------------------------------------

def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences and
    report per-sequence document/token totals.

    The packing rule is the standard concat-and-chunk: within each
    source, documents are laid out in a deterministic pseudo-random
    order (md5 of the doc id — reshuffling is free by changing the salt)
    and a document belongs to the sequence where its first token lands:
    ``seq_id = tokens_before DIV PACK_BUDGET``. Pure integer math — no
    float nondeterminism anywhere.

    Scale shape: the running sum is a window over (source, hash order).
    At 100 TB one source exceeds a single partition, so production
    packing keys the window on (source, shard) where shard =
    ``hash DIV shard_width`` — same plan, finer partitions, and because
    the order key IS the hash, any such range split preserves the
    global layout. Output is O(total_tokens / PACK_BUDGET) rows of four
    small columns; text never leaves the scan projection.
    """
    from ..operators.text import _exprs

    e = _exprs("spark")
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
        F.expr(e["n_words"]).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = base.withColumn(
        "seq_id",
        (
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            / F.lit(PACK_BUDGET)
        ).cast("long"),
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
    )


def _sequence_packing_sql() -> str:
    from ..operators.text import _exprs

    e = _exprs("duckdb")
    return f"""
WITH base AS (
  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hkey,
         {e['n_words']} AS n_tokens
  FROM documents
),
packed AS (
  SELECT source, doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
                PARTITION BY source ORDER BY hkey, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              // {PACK_BUDGET} AS BIGINT) AS seq_id
  FROM base
)
SELECT source, seq_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
FROM packed GROUP BY source, seq_id
"""


# ---------------------------------------------------------------------------
# Bottom-k per-source sampling (mergeable uniform sample)
# ---------------------------------------------------------------------------

def q_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample: the ``SAMPLE_K`` docs with the
    smallest md5(doc_id) per source.

    Bottom-k over a uniform hash is the classic mergeable sampling
    sketch: each partition keeps its own k smallest, merges keep the k
    smallest of the union — so at 100 TB this needs no global sort and
    no shared state, and the same k docs are selected no matter how the
    data is partitioned. The window below compiles to a per-group
    top-k (rank <= k) that Spark evaluates with partial limits, not a
    full sort of each source.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
    )
    w = Window.partitionBy("source").orderBy("hkey", "doc_id")
    return (
        base.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= SAMPLE_K)
        .select("source", "sample_rank", "doc_id")
    )


def _bottomk_sample_sql() -> str:
    return f"""
SELECT source, CAST(sample_rank AS BIGINT) AS sample_rank, doc_id
FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS sample_rank
  FROM documents)
WHERE sample_rank <= {SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Bigram language-model counts (next-token statistics)
# ---------------------------------------------------------------------------

def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``BIGRAM_TOP_K`` continuations per head word with exact
    conditional probabilities — the n-gram LM table used for data-mix
    diagnostics and cheap perplexity-ish corpus scoring.

    cond_prob is a ratio of exact integers (bigram count over head-word
    continuation total), so both engines produce bit-identical doubles.
    Scale shape: the bigram explode is narrow; counts are map-side
    combinable on (w1, w2); the head-word total and top-k share the
    window partition key w1 (one hash exchange of (w1, w2, count) —
    output bounded by |vocab| x k).
    """
    docs = load_table(spark, sf_dir, "documents")
    # Stage the words array once, then emit (w1, w2) structs directly —
    # building "w1 w2" strings and re-splitting them would do the string
    # work twice per gram (measured ~25% slower at sf0.1).
    base = docs.select(
        F.expr(words_expr("text", "spark")).alias("W")
    ).filter(F.size("W") >= 2)
    big = base.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(W) - 1), i -> "
                "struct(element_at(W, CAST(i AS INT)) AS w1, "
                "element_at(W, CAST(i + 1 AS INT)) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cnt = big.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("w1")
    wr = Window.partitionBy("w1").orderBy(F.col("n").desc(), F.col("w2").asc())
    return (
        cnt.withColumn("head_total", F.sum("n").over(wt))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= BIGRAM_TOP_K)
        .select(
            "w1",
            "rank",
            "w2",
            "n",
            "head_total",
            (F.col("n").cast("double") / F.col("head_total")).alias(
                "cond_prob"
            ),
        )
    )


def _bigram_lm_sql() -> str:
    w = words_expr("text", "duckdb")
    grams = (
        f"CASE WHEN len({w}) >= 2 THEN "
        f"list_transform(range(1, len({w})), i -> "
        f"array_to_string(list_slice({w}, i, i + 1), ' ')) "
        f"ELSE [] END"
    )
    return f"""
WITH big AS (
  SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2
  FROM (SELECT unnest({grams}) AS g FROM documents)
),
cnt AS (SELECT w1, w2, count(*) AS n FROM big GROUP BY w1, w2),
ranked AS (
  SELECT w1, w2, n,
         CAST(sum(n) OVER (PARTITION BY w1) AS BIGINT) AS head_total,
         row_number() OVER (PARTITION BY w1 ORDER BY n DESC, w2 ASC) AS rank
  FROM cnt
)
SELECT w1, CAST(rank AS BIGINT) AS rank, w2, n, head_total,
       CAST(n AS DOUBLE) / head_total AS cond_prob
FROM ranked WHERE rank <= {BIGRAM_TOP_K}
"""


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction plumbing + occurrence counts)
# ---------------------------------------------------------------------------

# RE2-safe subset (no backreferences/lookaround): the same pattern strings
# compile in Java regex (Spark) and RE2 (DuckDB) with identical semantics.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^ ]+", "<URL>"),
    ("digit_run", r"[0-9]{3,}", "<NUM>"),
)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII match counts and the fingerprint of the fully redacted
    text. The synthetic corpus contains no PII, so counts are zero here —
    the value under test is the cross-engine parity of the regex engine
    (counts) and of the redaction itself (md5 of the rewritten text,
    byte-identical in both engines or the hash gate fails).

    Scale: pure per-row column expressions — scan-speed, no UDF, no
    shuffle; at 100 TB this runs inside the ingest projection like the
    quality features.
    """
    docs = load_table(spark, sf_dir, "documents")
    cols = [F.col("doc_id")]
    # Column API, not F.expr: a SQL string literal would eat the regex
    # backslashes ('\.' parses to '.') and silently change the pattern.
    red = F.col("text")
    for name, pat, tag in PII_PATTERNS:
        cols.append(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, tag)
    cols.append(F.md5(red).alias("redacted_md5"))
    return docs.select(*cols).filter(F.col("doc_id") % 5 == 0)


def _pii_scrub_sql() -> str:
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _tag in PII_PATTERNS
    )
    red = "text"
    for _name, pat, tag in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{tag}', 'g')"
    return f"""
SELECT doc_id,
       {counts},
       md5({red}) AS redacted_md5
FROM documents WHERE doc_id % 5 = 0
"""


# ---------------------------------------------------------------------------
# Duplicate provenance (which sources produced each duplicated text)
# ---------------------------------------------------------------------------

def q_dup_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per duplicated text (on the injected-duplicate corpus): copy
    count, distinct-source count, and the sorted source list — the
    report that tells a corpus owner WHERE duplication comes from
    (cross-source scrape overlap vs in-source re-crawls).

    Shuffles (hash, source) pairs only; the sorted-set aggregation is
    bounded by the source cardinality (20 here, rarely more than a few
    thousand in practice). Sources emitted as a '|'-joined string — the
    driver canonicalizer cannot hash array columns.
    """
    c = corpus_df(spark, sf_dir)
    return (
        c.select(F.md5("text").alias("h"), "source")
        .groupBy("h")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("source").alias("n_sources"),
            F.array_join(
                F.array_sort(F.collect_set("source")), "|"
            ).alias("sources"),
        )
        .filter(F.col("n_copies") > 1)
    )


def _dup_provenance_sql() -> str:
    return f"""
WITH corpus AS ({corpus_sql('duckdb')})
SELECT md5(text) AS h, count(*) AS n_copies,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       array_to_string(list_sort(list_distinct(list(source))), '|')
         AS sources
FROM corpus GROUP BY md5(text) HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# Mergeable-sketch rollup (HLL partial aggregation)
# ---------------------------------------------------------------------------

def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token estimates from HLL sketches PLUS the
    corpus-wide estimate from *merging those sketches* — the pattern that
    makes sketches matter at 100 TB: sketch each partition/day/source
    once, then answer global (or any grouping's) distinct counts by
    union-merging kilobyte-sized sketch blobs with no rescan. The
    ``<ALL>`` row is computed through ``hll_union_agg`` over the
    per-source sketches, so the merge path itself is what the bound
    check exercises.

    As with the other sketch queries, raw estimates are engine-specific,
    so each engine bound-checks its own estimate against the exact
    distinct count in-row and the driver hashes (exact, sketch_ok).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.expr(words_expr("text", "spark"))).alias("word")
    )
    per = tok.groupBy("source").agg(
        F.expr("hll_sketch_agg(word)").alias("sk"),
        F.countDistinct("word").alias("n_distinct_exact"),
    )
    ok = (
        F.abs(
            F.expr("hll_sketch_estimate(sk)") - F.col("n_distinct_exact")
        )
        <= F.lit(0.05) * F.col("n_distinct_exact")
    )
    src_rows = per.select("source", "n_distinct_exact", ok.alias("sketch_ok"))
    merged = per.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    gexact = tok.agg(F.countDistinct("word").alias("n_distinct_exact"))
    tot = gexact.join(merged).select(
        F.lit("<ALL>").alias("source"),
        "n_distinct_exact",
        (
            F.abs(F.col("est") - F.col("n_distinct_exact"))
            <= F.lit(0.05) * F.col("n_distinct_exact")
        ).alias("sketch_ok"),
    )
    return src_rows.unionByName(tot)


def _sketch_rollup_sql() -> str:
    w = words_expr("text", "duckdb")
    return f"""
WITH tok AS (SELECT source, unnest({w}) AS word FROM documents),
per AS (
  SELECT source, CAST(count(DISTINCT word) AS BIGINT) AS n_distinct_exact,
         approx_count_distinct(word) AS est
  FROM tok GROUP BY source),
overall AS (
  SELECT CAST(count(DISTINCT word) AS BIGINT) AS n_distinct_exact,
         approx_count_distinct(word) AS est
  FROM tok)
SELECT source, n_distinct_exact,
       abs(est - n_distinct_exact)
         <= CAST(0.05 AS DOUBLE) * n_distinct_exact AS sketch_ok
FROM per
UNION ALL
SELECT '<ALL>' AS source, n_distinct_exact,
       abs(est - n_distinct_exact)
         <= CAST(0.05 AS DOUBLE) * n_distinct_exact AS sketch_ok
FROM overall
"""


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights (the multi-source data-mixing step)
# ---------------------------------------------------------------------------

MIX_BUDGET = 1_000_000  # tokens allocated across sources per "epoch"


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights for multi-source training: token
    counts temperature-scaled with alpha = 0.5 (w_s = tokens_s^alpha /
    sum_s tokens_s^alpha — the standard upsampling of small sources used
    for multilingual/multi-domain mixing), plus each source's token
    allocation out of a MIX_BUDGET-token epoch.

    Determinism discipline (same as semantic_dedup): tokens_s^0.5 is
    sqrt of an exact integer (correctly rounded -> engine-identical),
    quantized to BIGINT micro-units so the cross-source TOTAL is an
    exact integer sum — no double accumulation ever crosses rows. The
    final weight is one correctly-rounded division, rounded to 6.

    Scale shape: one map-side-combinable aggregate to |sources| rows;
    the 1-row total broadcasts back. Nothing else moves.
    """
    from .text import _exprs

    e = _exprs("spark")
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.expr(e["n_words"])).alias("n_tokens"),
    )
    wq = (
        "CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * CAST(1000000.0 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    weighted = src.select("source", "n_docs", "n_tokens", F.expr(wq).alias("wq"))
    tot = weighted.agg(F.sum("wq").alias("tot"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr(
                "round(CAST(wq AS DOUBLE) / CAST(tot AS DOUBLE), 6)"
            ).alias("weight"),
            F.expr(
                "CAST(floor(CAST(wq AS DOUBLE) / CAST(tot AS DOUBLE)"
                f" * CAST({MIX_BUDGET}.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))"
                " AS BIGINT)"
            ).alias("budget_tokens"),
        )
    )


def _mixture_weights_sql() -> str:
    from .text import _exprs

    e = _exprs("duckdb")
    return f"""
WITH src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum({e['n_words']}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
weighted AS (
  SELECT source, n_docs, n_tokens,
         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * CAST(1000000.0 AS DOUBLE)
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS wq
  FROM src
),
tot AS (SELECT CAST(sum(wq) AS BIGINT) AS tot FROM weighted)
SELECT source, n_docs, n_tokens,
       round(CAST(wq AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS weight,
       CAST(floor(CAST(wq AS DOUBLE) / CAST(tot AS DOUBLE)
                  * CAST({MIX_BUDGET}.0 AS DOUBLE)
                  + CAST(0.5 AS DOUBLE)) AS BIGINT) AS budget_tokens
FROM weighted CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# Curriculum ordering (weighted source interleave, easy-first)
# ---------------------------------------------------------------------------

CURR_K = 200  # schedule prefix emitted (bounds output)


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first ``CURR_K`` positions of a training curriculum: within
    each source docs are ordered easy-first (ascending token count, the
    standard length-based curriculum proxy), and sources are interleaved
    proportionally to their temperature-scaled mixture weights — source
    s's k-th doc is scheduled at interleave key k*1e9/wq_s, so a source
    with twice the weight appears twice as often in any schedule prefix.

    Determinism: the key is exact integer division of exact integers
    (wq is mixture_weights' micro-unit sqrt weight), ties break on
    (source, rank). Scale shape: per-source ranking is a window on the
    source partition key; the schedule prefix is a TakeOrdered (no
    global sort); the final position numbering is a window over the
    CURR_K-row result only — the same bounded-window discipline as
    quantile_histogram."""
    from .text import _exprs

    e = _exprs("spark")
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", F.expr(e["n_words"]).alias("n_words")
    )
    src = scored.groupBy("source").agg(F.sum("n_words").alias("n_tokens"))
    # greatest(.., 1): a source whose docs all tokenize to zero words
    # would give wq=0, where Spark DIV yields NULL but DuckDB's integer
    # // raises division-by-zero — clamp in BOTH engines (ADVICE r04)
    wq = (
        "greatest(CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))"
        " * CAST(1000000.0 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT), CAST(1 AS BIGINT))"
    )
    weights = src.select("source", F.expr(wq).alias("wq"))
    ranked = scored.withColumn(
        "src_rank",
        F.row_number().over(
            Window.partitionBy("source").orderBy("n_words", "doc_id")
        ),
    )
    prefix = (
        ranked.join(F.broadcast(weights), "source")
        .select(
            "doc_id",
            "source",
            "n_words",
            "src_rank",
            F.expr(
                "CAST(src_rank AS BIGINT) * CAST(1000000000 AS BIGINT)"
                " DIV wq"
            ).alias("ikey"),
        )
        .orderBy("ikey", "source", "src_rank")
        .limit(CURR_K)
    )
    return prefix.withColumn(
        "schedule_pos",
        F.row_number().over(Window.orderBy("ikey", "source", "src_rank")),
    )


def _curriculum_order_sql() -> str:
    from .text import _exprs

    e = _exprs("duckdb")
    return f"""
WITH scored AS (
  SELECT doc_id, source, {e['n_words']} AS n_words FROM documents),
src AS (SELECT source, CAST(sum(n_words) AS BIGINT) AS n_tokens
        FROM scored GROUP BY source),
weights AS (
  SELECT source,
         greatest(CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))
              * CAST(1000000.0 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT), CAST(1 AS BIGINT)) AS wq
  FROM src),
ranked AS (
  SELECT doc_id, source, n_words,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_words, doc_id) AS src_rank
  FROM scored),
prefix AS (
  SELECT doc_id, source, n_words, CAST(src_rank AS BIGINT) AS src_rank,
         CAST(src_rank AS BIGINT) * 1000000000 // wq AS ikey
  FROM ranked JOIN weights USING (source)
  ORDER BY ikey, source, src_rank
  LIMIT {CURR_K})
SELECT doc_id, source, n_words, src_rank, ikey,
       CAST(row_number() OVER (ORDER BY ikey, source, src_rank) AS BIGINT)
         AS schedule_pos
FROM prefix
"""


QUERIES = {
    "curriculum_order": q_curriculum_order,
    "tfidf_top_terms": q_tfidf_top_terms,
    "mixture_weights": q_mixture_weights,
    "sequence_packing": q_sequence_packing,
    "bottomk_sample": q_bottomk_sample,
    "bigram_lm": q_bigram_lm,
    "pii_scrub": q_pii_scrub,
    "dup_provenance": q_dup_provenance,
    "sketch_rollup": q_sketch_rollup,
}

ORACLES = {
    "curriculum_order": _curriculum_order_sql(),
    "tfidf_top_terms": _tfidf_sql(),
    "mixture_weights": _mixture_weights_sql(),
    "sequence_packing": _sequence_packing_sql(),
    "bottomk_sample": _bottomk_sample_sql(),
    "bigram_lm": _bigram_lm_sql(),
    "pii_scrub": _pii_scrub_sql(),
    "dup_provenance": _dup_provenance_sql(),
    "sketch_rollup": _sketch_rollup_sql(),
}
