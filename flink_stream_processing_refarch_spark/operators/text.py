"""Text-analysis operators for large-scale training-data pipelines:
language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting.

All four are pure column expressions over the ``documents`` table — no
UDFs, fully inside whole-stage codegen, trivially parallel at 100 TB
(narrow transformations, zero shuffles). Doubles emitted to results are
ratios of exact integers computed identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import (
    arr_filter,
    arr_len,
    arr_min,
    arr_sum_bigint,
    arr_transform,
    words_expr,
)
from ..schemas import load_table

# Tiny in-query stopword lists (heuristic language ID). Real pipelines load
# these from a broadcast dimension table; inline literals keep the plan
# self-contained and the oracle portable.
EN_STOP = ("the", "a", "of", "and", "to", "in", "is")


def _stop_list_sql() -> str:
    return ", ".join(f"'{w}'" for w in EN_STOP)


def _exprs(dialect: str, ws: str | None = None) -> dict[str, str]:
    """``ws``: name of a pre-projected words column (Spark callers) —
    inlining the split repeats its evaluation per reference (r14
    optimization round, see dedup._shingles). Oracle callers pass
    nothing; the DuckDB SQL is unchanged."""
    w = ws or words_expr("text", dialect)
    n_words = f"CAST({arr_len(w, dialect)} AS BIGINT)"
    word_lens = arr_transform(w, "x -> CAST(length(x) AS BIGINT)", dialect)
    n_word_chars = arr_sum_bigint(word_lens, dialect)
    n_stop = (
        f"CAST({arr_len(arr_filter(w, f'x -> x IN ({_stop_list_sql()})', dialect), dialect)}"
        " AS BIGINT)"
    )
    n_distinct = f"CAST({arr_len(f'{_lst(dialect)}({w})', dialect)} AS BIGINT)"
    return {
        "n_words": n_words,
        "n_word_chars": n_word_chars,
        "n_stop": n_stop,
        "n_distinct": n_distinct,
    }


def _lst(dialect: str) -> str:
    return "array_distinct" if dialect == "spark" else "list_distinct"


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _exprs("spark", ws="__ws")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__ws", F.expr(words_expr("text", "spark"))
    )  # words projected once (see _exprs)
    return docs.select(
        "doc_id",
        F.expr(e["n_words"]).alias("n_tokens"),
        F.expr(e["n_distinct"]).alias("n_distinct_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.expr(
            f"CAST({e['n_distinct']} AS DOUBLE) / {e['n_words']}"
        ).alias("ttr"),  # type-token ratio
    )


def _token_stats_sql() -> str:
    e = _exprs("duckdb")
    return f"""
SELECT doc_id,
       {e['n_words']} AS n_tokens,
       {e['n_distinct']} AS n_distinct_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST({e['n_distinct']} AS DOUBLE) / {e['n_words']} AS ttr
FROM documents
"""


# GPT-2-style pre-tokenizer, RE2-safe subset (no lookaround, so the
# identical pattern runs in Java regex and RE2): letter runs, 1-3-digit
# groups (the GPT-4-style digit split), and non-alphanumeric runs.
# Whitespace is a separator, not a token.
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9 ]+"


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-style token counting next to the whitespace count — the
    budget estimator for tokenizer-measured corpora (SURVEY §2.8's
    'whitespace + BPE-ish regex' pair). Pure regex column expressions:
    scan-speed, no UDF, no shuffle; at 100 TB this runs inside the
    ingest projection like the quality features."""
    e = _exprs("spark", ws="__ws")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__ws", F.expr(words_expr("text", "spark"))
    )
    n_bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_SPLIT_RE), F.lit(0))
    ).cast("bigint")
    # the regex extraction is projected once and referenced twice —
    # the inline form ran the regex scan twice per row
    return docs.select(
        "doc_id",
        "text",
        F.expr(e["n_words"]).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
    ).select(
        "doc_id",
        "n_ws_tokens",
        "n_bpe_tokens",
        F.expr(
            "round(CAST(length(text) AS DOUBLE) / greatest("
            "CAST(n_bpe_tokens AS DOUBLE), CAST(1.0 AS DOUBLE)), 6)"
        ).alias("chars_per_token"),
    )


def _token_count_bpe_sql() -> str:
    e = _exprs("duckdb")
    return f"""
SELECT doc_id,
       {e['n_words']} AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_SPLIT_RE}')) AS BIGINT)
         AS n_bpe_tokens,
       round(CAST(length(text) AS DOUBLE) / greatest(
         CAST(len(regexp_extract_all(text, '{BPE_SPLIT_RE}')) AS DOUBLE),
         CAST(1.0 AS DOUBLE)), 6) AS chars_per_token
FROM documents
"""


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / stopword-ratio / mean-word-length quality features and a
    composite keep/drop flag (the usual pre-training corpus filter)."""
    e = _exprs("spark", ws="__ws")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__ws", F.expr(words_expr("text", "spark"))
    )
    return docs.select(
        "doc_id",
        F.expr(e["n_words"]).alias("n_words"),
        F.expr(
            f"CAST({e['n_stop']} AS DOUBLE) / {e['n_words']}"
        ).alias("stop_ratio"),
        F.expr(
            f"CAST({e['n_word_chars']} AS DOUBLE) / {e['n_words']}"
        ).alias("mean_word_len"),
        F.expr(
            f"CASE WHEN {e['n_words']} >= 20 AND {e['n_words']} <= 1000"
            f" AND CAST({e['n_stop']} AS DOUBLE) / {e['n_words']} >= CAST(0.01 AS DOUBLE)"
            f" THEN true ELSE false END"
        ).alias("keep"),
    )


def _quality_score_sql() -> str:
    e = _exprs("duckdb")
    return f"""
SELECT doc_id,
       {e['n_words']} AS n_words,
       CAST({e['n_stop']} AS DOUBLE) / {e['n_words']} AS stop_ratio,
       CAST({e['n_word_chars']} AS DOUBLE) / {e['n_words']} AS mean_word_len,
       CASE WHEN {e['n_words']} >= 20 AND {e['n_words']} <= 1000
            AND CAST({e['n_stop']} AS DOUBLE) / {e['n_words']} >= CAST(0.01 AS DOUBLE)
            THEN true ELSE false END AS keep
FROM documents
"""


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language heuristic. (The testdata ``lang`` column
    is a synthetic label over a shared vocabulary, so the heuristic is its
    own spec — the oracle runs the identical classifier.)"""
    e = _exprs("spark", ws="__ws")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__ws", F.expr(words_expr("text", "spark"))
    )
    ratio = f"CAST({e['n_stop']} AS DOUBLE) / {e['n_words']}"
    return docs.select(
        "doc_id",
        "lang",
        F.expr(ratio).alias("en_stop_ratio"),
        F.expr(
            f"CASE WHEN {ratio} >= CAST(0.04 AS DOUBLE) THEN 'en'"
            f" ELSE 'other' END"
        ).alias("lang_pred"),
    )


def _lang_id_sql() -> str:
    e = _exprs("duckdb")
    ratio = f"CAST({e['n_stop']} AS DOUBLE) / {e['n_words']}"
    return f"""
SELECT doc_id, lang,
       {ratio} AS en_stop_ratio,
       CASE WHEN {ratio} >= CAST(0.04 AS DOUBLE) THEN 'en' ELSE 'other' END AS lang_pred
FROM documents
"""


# ---------------------------------------------------------------------------
# Document fingerprinting (min-hash of word 5-grams — winnowing-lite)
# ---------------------------------------------------------------------------

def q_udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (SURVEY.md §2.7 'UDF/UDAF/UDTF'): a table
    function exploding each doc into (pos, word, is_stopish) rows — the
    1->N scalar-to-table expansion as a declared UDTF rather than
    posexplode (same plan shape; the UDTF form is the extension point for
    logic SQL can't express, e.g. a real tokenizer).

    Scale: UDTFs run per-partition in Arrow-batched Python workers —
    the fan-out happens executor-side before any shuffle, like
    mapInPandas. For this trivial split the built-in posexplode is the
    production choice; the operator exists to keep the UDTF surface
    tested.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string, word_len int")
    class WordPositions:
        def eval(self, text: str):  # noqa: ANN001
            for i, w in enumerate(text.split(" ")):
                yield i, w, len(w)

    spark.udtf.register("word_positions", WordPositions)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, w.pos, w.word, w.word_len
        FROM documents_udtf d, LATERAL word_positions(d.text) w
        WHERE d.doc_id % 50 = 0
        """
    )


UDTF_WORD_POSITIONS_SQL = """
SELECT doc_id, CAST(u.pos - 1 AS INT) AS pos, u.word,
       CAST(length(u.word) AS INT) AS word_len
FROM documents,
     LATERAL (SELECT unnest(string_split(text, ' ')) AS word,
                     generate_subscripts(string_split(text, ' '), 1) AS pos) u
WHERE doc_id % 50 = 0
"""


def _fingerprint_expr(dialect: str) -> str:
    w = words_expr("text", dialect)
    if dialect == "spark":
        grams = (
            f"transform(sequence(0, size({w}) - 5), i -> "
            f"concat_ws(' ', slice({w}, i + 1, 5)))"
        )
        guard = f"size({w}) >= 5"
    else:
        grams = (
            f"list_transform(range(1, len({w}) - 3), i -> "
            f"array_to_string(list_slice({w}, i, i + 4), ' '))"
        )
        guard = f"len({w}) >= 5"
    hashed = arr_transform(grams, "g -> md5(g)", dialect)
    return f"CASE WHEN {guard} THEN {arr_min(hashed, dialect)} ELSE md5(text) END"


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.expr(_fingerprint_expr("spark")).alias("fingerprint")
    )


def _doc_fingerprint_sql() -> str:
    return f"SELECT doc_id, {_fingerprint_expr('duckdb')} AS fingerprint FROM documents"


# ---------------------------------------------------------------------------
# Composed selection pipeline: quality filter + exact-dedup survivorship
# + per-source rollup — the end-to-end corpus-build query
# ---------------------------------------------------------------------------

def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data selection in ONE plan: per-source doc and
    token totals of quality-keep documents that survive exact dedup.

    Shuffle shape at 100 TB: all text-derived features (token count,
    quality flag, content hash) are computed narrow at the scan, so the
    single wide exchange carries only (hash, doc_id, source, n_tokens,
    keep) — never the text. Survivor selection is min_by over the content
    hash (no survivors-back-to-corpus join), and the final per-source
    rollup reduces map-side to |sources| rows.

    The quality gate is the shared Gopher admission rule
    (:func:`gopher_gate_sql`), identical across the funnel and every
    corpus write path.
    """
    e = _exprs("spark", ws="__ws")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__ws", F.expr(words_expr("text", "spark"))
    )  # words projected once (see _exprs)
    keep = gopher_gate_sql("spark", ws="__ws")
    scored = docs.select(
        F.md5("text").alias("h"),
        "doc_id",
        "source",
        F.expr(e["n_words"]).alias("n_tokens"),
        F.expr(keep).alias("keep"),
    )
    surv = scored.groupBy("h").agg(
        F.min_by(
            F.struct("doc_id", "source", "n_tokens", "keep"), F.col("doc_id")
        ).alias("s")
    )
    return (
        surv.select("s.*")
        .filter(F.col("keep"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


def _training_mix_sql() -> str:
    e = _exprs("duckdb")
    return f"""
WITH scored AS (
  SELECT md5(text) AS h, doc_id, source,
         {e['n_words']} AS n_tokens,
         {gopher_gate_sql('duckdb')} AS keep
  FROM documents
),
surv AS (SELECT h, min(doc_id) AS doc_id FROM scored GROUP BY h)
SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM scored JOIN surv USING (h, doc_id)
WHERE keep GROUP BY source
"""


# ---------------------------------------------------------------------------
# Repetition scoring (duplicate n-gram mass — the Gopher-style
# "repetitious document" filter, complementary to q_quality_score)
# ---------------------------------------------------------------------------

def _rep_exprs(dialect: str, w: int = 2, ws: str | None = None) -> dict[str, str]:
    """Duplicate word-``w``-gram fraction: 1 - distinct/total grams.
    Boilerplate/spam/template pages repeat phrases; prose doesn't."""
    ws = ws or words_expr("text", dialect)
    if dialect == "spark":
        grams = (
            f"transform(sequence(0, size({ws}) - {w}), i -> "
            f"concat_ws(' ', slice({ws}, i + 1, {w})))"
        )
        guard = f"size({ws}) >= {w}"
    else:
        grams = (
            f"list_transform(range(1, len({ws}) - {w - 2}), i -> "
            f"array_to_string(list_slice({ws}, i, i + {w - 1}), ' '))"
        )
        guard = f"len({ws}) >= {w}"
    n_grams = f"CAST({arr_len(grams, dialect)} AS BIGINT)"
    n_distinct = (
        f"CAST({arr_len(f'{_lst(dialect)}({grams})', dialect)} AS BIGINT)"
    )
    return {
        "guard": guard,
        "grams": grams,
        "n_grams": n_grams,
        "n_distinct": n_distinct,
    }


def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicate-bigram fraction + keep flag. Pure column exprs:
    the gram set never leaves its row (no explode, no shuffle) — at
    100 TB this is a scan-speed map like the other quality features.
    The gram array and the ratio are materialized once per row (array
    HOFs are interpreted, so leaning on common-subexpression
    elimination recomputes them per use — measured ~4x slower)."""
    e = _rep_exprs("spark", ws="__ws")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__ws", F.expr(words_expr("text", "spark"))
    )
    staged = docs.select(
        "doc_id",
        F.expr(e["guard"]).alias("__ok"),
        F.expr(e["grams"]).alias("__g"),
    ).select(
        "doc_id",
        "__ok",
        F.size("__g").cast("bigint").alias("__n"),
        F.size(F.array_distinct("__g")).cast("bigint").alias("__d"),
    ).select(
        "doc_id",
        F.expr(
            "CASE WHEN __ok THEN CAST(__n - __d AS DOUBLE) / __n"
            " ELSE CAST(0 AS DOUBLE) END"
        ).alias("dup_gram_ratio"),
    )
    return staged.select(
        "doc_id",
        "dup_gram_ratio",
        F.expr(
            "CASE WHEN dup_gram_ratio <= CAST(0.5 AS DOUBLE) THEN true"
            " ELSE false END"
        ).alias("keep"),
    )


def _repetition_score_sql() -> str:
    e = _rep_exprs("duckdb")
    return f"""
SELECT doc_id, dup_gram_ratio,
       CASE WHEN dup_gram_ratio <= CAST(0.5 AS DOUBLE) THEN true ELSE false END AS keep
FROM (
  SELECT doc_id,
         CASE WHEN {e['guard']}
              THEN CAST({e['n_grams']} - {e['n_distinct']} AS DOUBLE) / {e['n_grams']}
              ELSE CAST(0 AS DOUBLE) END AS dup_gram_ratio
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# Corpus QA: document-length histogram per source
# ---------------------------------------------------------------------------

LEN_BUCKET_WIDTH = 50  # chars per histogram bucket


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length distribution per source — the QA report behind length
    cutoffs in quality filters. Fixed-width buckets (not width_bucket
    over observed min/max: fixed edges keep rounds and engines
    comparable). Narrow bucket expr + one map-combinable aggregation;
    output is O(sources x buckets) regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            F.expr(
                f"(CAST(length(text) AS BIGINT) DIV {LEN_BUCKET_WIDTH})"
                f" * {LEN_BUCKET_WIDTH}"
            ).alias("len_bucket"),
        )
        .groupBy("source", "len_bucket")
        .agg(F.count("*").alias("n_docs"))
    )


LENGTH_HISTOGRAM_SQL = f"""
SELECT source,
       (CAST(length(text) AS BIGINT) // {LEN_BUCKET_WIDTH}) * {LEN_BUCKET_WIDTH}
         AS len_bucket,
       count(*) AS n_docs
FROM documents
GROUP BY source, len_bucket
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary statistics (token -> term/document frequency)
# ---------------------------------------------------------------------------

def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide vocabulary table: per token, total occurrences and the
    number of documents containing it — the input to BPE vocab builds,
    stopword induction, and df-based quality filters.

    Scale shape: the explode is narrow (executor-side fan-out at the
    scan, text never shuffled); ``count`` gets a map-side partial
    aggregate, and ``countDistinct(doc_id)`` becomes Spark's two-stage
    distinct-then-count expansion — both exchanges carry (word, doc_id)
    pairs at most, never text. Output cardinality = |vocab|, which is
    bounded (~100k-1M tokens) regardless of corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.expr(words_expr("text", "spark"))).alias("word"),
    )
    return tok.groupBy("word").agg(
        F.count("*").alias("term_freq"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )


VOCAB_STATS_SQL = f"""
SELECT word, count(*) AS term_freq,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM (SELECT doc_id, unnest({words_expr('text', 'duckdb')}) AS word
      FROM documents)
GROUP BY word
"""


# ---------------------------------------------------------------------------
# Feature hashing (the "hashing trick")
# ---------------------------------------------------------------------------

FH_BUCKETS = 64  # feature dimension; 100 TB pipelines use 2^18+, same plan


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document features (Weinberger et al. 2009,
    "Feature Hashing for Large Scale Multitask Learning"): every word
    hashes to one of FH_BUCKETS buckets — no vocabulary relation, no
    vocab join, which is the point at 100 TB (a fixed feature space
    regardless of corpus vocabulary growth). Emitted sparse: one row
    per (doc, non-empty bucket) with the exact count and an exact
    integer L1 weight in ppm.

    Plan shape: explode -> groupBy(doc_id, bucket) with map-side
    combine, so the exchange carries at most |docs| x FH_BUCKETS
    combined rows, never words; the per-doc total comes from a window
    over the already-combined relation (same doc_id partitioning, no
    extra exchange after the group)."""
    from ..functions.portable import md5_int60

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.expr(words_expr("text", "spark"))).alias("w")
    )
    per = (
        words.select(
            "doc_id",
            F.expr(f"{md5_int60('w', 'spark')} % {FH_BUCKETS}").alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    tot = F.sum("cnt").over(Window.partitionBy("doc_id"))
    return per.withColumn("tot", tot).select(
        "doc_id",
        "bucket",
        "cnt",
        F.expr("cnt * CAST(1000000 AS BIGINT) DIV tot").alias("w_ppm"),
    )


def _feature_hashing_sql() -> str:
    from ..functions.portable import md5_int60

    w = words_expr("text", "duckdb")
    return f"""
WITH wds AS (SELECT doc_id, unnest({w}) AS w FROM documents),
per AS (SELECT doc_id, {md5_int60('w', 'duckdb')} % {FH_BUCKETS} AS bucket,
               count(*) AS cnt
        FROM wds GROUP BY 1, 2)
SELECT doc_id, bucket, cnt,
       CAST(cnt AS BIGINT) * 1000000
         // CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS w_ppm
FROM per
"""


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-budget planning signal:
    for each power-of-two rank bucket b (vocab entries ranked by corpus
    frequency, ties by word), the cumulative fraction of all corpus
    tokens covered by the top-(2^(b+1)-1) entries, in exact ppm. A
    pipeline reads this to size a vocab (e.g. "2^15 entries cover 99.2%
    of tokens") before committing to BPE training.

    Scale: the corpus-sized work is one wordcount-shaped combine
    exchange (identical to vocab_stats); the ranking window runs over
    the BOUNDED vocab relation — the repo's accepted bounded-relation
    global-window pattern (quantile_histogram's discipline), never over
    corpus rows. Bucket ids come from length(bin(rank)) — integer
    log2, no floating log, identical in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.expr(words_expr("text", "spark"))).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    from pyspark.sql import Window

    order = [F.desc("cnt"), F.asc("word")]
    rank = F.row_number().over(Window.orderBy(*order)).cast("bigint")
    cum = F.sum("cnt").over(
        Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = vocab.select(
        rank.alias("rank"), cum.alias("cum")
    )
    return (
        ranked.withColumn(
            "bucket", (F.length(F.expr("bin(rank)")) - 1).cast("int")
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("top_rank"), F.max("cum").alias("covered_tokens"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "top_rank",
            "covered_tokens",
            F.expr(
                "covered_tokens * CAST(1000000 AS BIGINT) DIV total"
            ).alias("coverage_ppm"),
        )
    )


def _vocab_coverage_sql() -> str:
    w = words_expr("text", "duckdb")
    return f"""
WITH tok AS (SELECT unnest({w}) AS word FROM documents),
vocab AS (SELECT word, count(*) AS cnt FROM tok GROUP BY word),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, word ASC) AS BIGINT)
           AS rank,
         CAST(sum(cnt) OVER (ORDER BY cnt DESC, word ASC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM vocab)
SELECT CAST(length(bin(rank)) - 1 AS INT) AS bucket,
       max(rank) AS top_rank,
       CAST(max(cum) AS BIGINT) AS covered_tokens,
       CAST(max(cum) AS BIGINT) * 1000000 // (SELECT total FROM tot)
         AS coverage_ppm
FROM ranked GROUP BY 1
"""


# quality_funnel knobs (Gopher-style gates, Rae et al. 2021 Table A1
# adapted to integer-exact arithmetic)
QF_MIN_WORDS, QF_MAX_WORDS = 20, 10_000
QF_MIN_MWL, QF_MAX_MWL = 2, 12  # mean word length bounds (chars/word)
QF_MIN_STOP = 2  # distinct stopword hits
QF_MIN_DISTINCT_PCT = 20  # distinct words >= 20% of words


def gopher_stage_exprs(dialect: str, ws: str | None = None) -> list[str]:
    """The four Gopher quality gates in funnel order — THE corpus
    admission rule, defined once (VERDICT r07 #5: previously the funnel
    and the corpus write paths maintained separate 'admitted'
    expressions that could drift). ``quality_funnel`` reports per-stage
    survival of exactly these; every corpus write path (training_mix,
    corpus_build, corpus_ingest_streaming) admits documents by their
    conjunction (:func:`gopher_gate_sql`). All comparisons are
    integer-exact (cross-multiplied, no division), so Spark/DuckDB
    hash-parity holds at any scale."""
    e = _exprs(dialect, ws=ws)
    return [
        f"({e['n_words']} BETWEEN {QF_MIN_WORDS} AND {QF_MAX_WORDS})",
        f"({e['n_word_chars']} >= {QF_MIN_MWL} * {e['n_words']}"
        f" AND {e['n_word_chars']} <= {QF_MAX_MWL} * {e['n_words']})",
        f"({_distinct_stop_expr(dialect, ws=ws)} >= {QF_MIN_STOP})",
        f"({e['n_distinct']} * 100 >= {QF_MIN_DISTINCT_PCT} * {e['n_words']})",
    ]


def gopher_gate_sql(dialect: str, ws: str | None = None) -> str:
    """Conjunction of all four gates == the funnel's ``admitted`` — the
    single quality-admission predicate the corpus pipelines filter on."""
    return "(" + " AND ".join(gopher_stage_exprs(dialect, ws=ws)) + ")"


def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-gate FUNNEL (Gopher-rule sequence, Rae et al.
    2021): how many documents survive each successive gate — word
    count in [QF_MIN_WORDS, QF_MAX_WORDS], mean word length in
    [QF_MIN_MWL, QF_MAX_MWL], >= QF_MIN_STOP distinct stopwords,
    distinct-word ratio >= QF_MIN_DISTINCT_PCT% — plus the final
    admitted count. quality_score emits per-doc features; this is the
    corpus-curation VIEW of the same gates: where the pipeline loses
    documents, per source, as cumulative counts.

    All comparisons are integer-exact (mean word length as
    chars*1 vs bounds*n_words; the distinct ratio as
    distinct*100 vs pct*n_words — no division), so DuckDB hash-parity
    holds at any scale. Scale: one narrow projection per doc (the
    gates are array expressions at the scan, no explode), then a
    |sources|-row combine — map-side-aggregated, one exchange."""
    return quality_funnel_from_docs(load_table(spark, sf_dir, "documents"))


def quality_funnel_from_docs(docs: DataFrame) -> DataFrame:
    """The funnel aggregation over any (source, text) relation — shared
    by the batch entry and the streaming twin (the per-doc gate flags
    are stateless and the counts are associative sums, so a complete-
    mode running aggregation's end state equals the batch result)."""
    g1, g2, g3, g4 = gopher_stage_exprs("spark", ws="__ws")
    # each gate evaluated ONCE as its own column; the cumulative flags
    # are cheap boolean ANDs over those columns (the inline form
    # re-evaluated gate 1 four times, gate 2 three times, ... — and
    # every gate re-split the text; r14 optimization round)
    flags = docs.withColumn(
        "__ws", F.expr(words_expr("text", "spark"))
    ).select(
        "source",
        F.expr(g1).alias("__f1"),
        F.expr(g2).alias("__f2"),
        F.expr(g3).alias("__f3"),
        F.expr(g4).alias("__f4"),
    ).select(
        "source",
        F.col("__f1").alias("p1"),
        (F.col("__f1") & F.col("__f2")).alias("p2"),
        (F.col("__f1") & F.col("__f2") & F.col("__f3")).alias("p3"),
        (F.col("__f1") & F.col("__f2") & F.col("__f3") & F.col("__f4")).alias("p4"),
    )
    return flags.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("p1").cast("bigint")).alias("pass_len"),
        F.sum(F.col("p2").cast("bigint")).alias("pass_word_len"),
        F.sum(F.col("p3").cast("bigint")).alias("pass_stopwords"),
        F.sum(F.col("p4").cast("bigint")).alias("admitted"),
    )


def _distinct_stop_expr(dialect: str, ws: str | None = None) -> str:
    w = ws or words_expr("text", dialect)
    stops = arr_filter(w, f"x -> x IN ({_stop_list_sql()})", dialect)
    return f"CAST({arr_len(f'{_lst(dialect)}({stops})', dialect)} AS BIGINT)"


def _quality_funnel_sql() -> str:
    g1, g2, g3, g4 = gopher_stage_exprs("duckdb")
    return f"""
WITH flags AS (
  SELECT source,
         {g1} AS p1,
         {g1} AND {g2} AS p2,
         {g1} AND {g2} AND {g3} AS p3,
         {g1} AND {g2} AND {g3} AND {g4} AS p4
  FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(p1 AS BIGINT)) AS BIGINT) AS pass_len,
       CAST(sum(CAST(p2 AS BIGINT)) AS BIGINT) AS pass_word_len,
       CAST(sum(CAST(p3 AS BIGINT)) AS BIGINT) AS pass_stopwords,
       CAST(sum(CAST(p4 AS BIGINT)) AS BIGINT) AS admitted
FROM flags GROUP BY source
"""


# source_signature_terms knobs
SIG_TOP = 15  # discriminative terms kept per source
SIG_MIN_CNT = 5  # ignore words rarer than this in the source


def q_source_signature_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source discriminative vocabulary: the SIG_TOP words whose
    within-source token rate (ppm) most exceeds their rate in the REST
    of the corpus — the contrastive-term analysis a mixture designer
    reads to understand what a source actually contributes (the
    exact-integer stand-in for log-odds contrast). Rates and the
    contrast are exact ppm integers; ties break by word, so the top-k
    is deterministic cross-engine.

    Scale: one (source, word) wordcount combine — the only corpus-
    sized exchange; per-word corpus totals come from a second combine
    over the VOCAB-bounded relation (never a window over corpus rows);
    per-source totals are a |sources|-row broadcast; the top-k window
    partitions by source over vocab-bounded rows."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.expr(words_expr("text", "spark"))).alias("word")
    )
    sw = tok.groupBy("source", "word").agg(F.count("*").alias("cnt"))
    stot = sw.groupBy("source").agg(F.sum("cnt").alias("s_tokens"))
    wtot = sw.groupBy("word").agg(F.sum("cnt").alias("w_total"))
    gtot = stot.agg(F.sum("s_tokens").alias("g_tokens"))
    rated = (
        sw.filter(F.col("cnt") >= SIG_MIN_CNT)
        .join(F.broadcast(stot), "source")
        .join(wtot, "word")
        .crossJoin(F.broadcast(gtot))
        .filter(F.col("g_tokens") > F.col("s_tokens"))
        .select(
            "source",
            "word",
            "cnt",
            F.expr("cnt * CAST(1000000 AS BIGINT) DIV s_tokens").alias(
                "rate_ppm"
            ),
            F.expr(
                "(w_total - cnt) * CAST(1000000 AS BIGINT)"
                " DIV (g_tokens - s_tokens)"
            ).alias("rest_rate_ppm"),
        )
        .withColumn("lift_ppm", F.expr("rate_ppm - rest_rate_ppm"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.desc("lift_ppm"), F.asc("word")
    )
    return (
        rated.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SIG_TOP)
        .select(
            "source",
            F.col("rk").cast("bigint").alias("rk"),
            "word",
            "cnt",
            "rate_ppm",
            "rest_rate_ppm",
            "lift_ppm",
        )
    )


def _source_signature_terms_sql() -> str:
    w = words_expr("text", "duckdb")
    return f"""
WITH tok AS (SELECT source, unnest({w}) AS word FROM documents),
sw AS (SELECT source, word, CAST(count(*) AS BIGINT) AS cnt
       FROM tok GROUP BY source, word),
stot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS s_tokens
         FROM sw GROUP BY source),
wtot AS (SELECT word, CAST(sum(cnt) AS BIGINT) AS w_total
         FROM sw GROUP BY word),
gtot AS (SELECT CAST(sum(s_tokens) AS BIGINT) AS g_tokens FROM stot),
rated AS (
  SELECT sw.source, sw.word, cnt,
         cnt * 1000000 // s_tokens AS rate_ppm,
         (w_total - cnt) * 1000000 // (g_tokens - s_tokens)
           AS rest_rate_ppm,
         cnt * 1000000 // s_tokens
           - (w_total - cnt) * 1000000 // (g_tokens - s_tokens) AS lift_ppm
  FROM sw JOIN stot USING (source) JOIN wtot USING (word), gtot
  WHERE cnt >= {SIG_MIN_CNT} AND g_tokens > s_tokens),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY source
             ORDER BY lift_ppm DESC, word ASC) AS BIGINT) AS rk
  FROM rated)
SELECT source, rk, word, cnt, rate_ppm, rest_rate_ppm, lift_ppm
FROM ranked WHERE rk <= {SIG_TOP}
"""


QUERIES = {
    "token_stats": q_token_stats,
    "token_count_bpe": q_token_count_bpe,
    "vocab_stats": q_vocab_stats,
    "quality_score": q_quality_score,
    "repetition_score": q_repetition_score,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "length_histogram": q_length_histogram,
    "udtf_word_positions": q_udtf_word_positions,
    "training_mix": q_training_mix,
    "feature_hashing": q_feature_hashing,
    "vocab_coverage": q_vocab_coverage,
    "quality_funnel": q_quality_funnel,
    "source_signature_terms": q_source_signature_terms,
}

ORACLES = {
    "token_stats": _token_stats_sql(),
    "token_count_bpe": _token_count_bpe_sql(),
    "vocab_stats": VOCAB_STATS_SQL,
    "quality_score": _quality_score_sql(),
    "repetition_score": _repetition_score_sql(),
    "lang_id": _lang_id_sql(),
    "doc_fingerprint": _doc_fingerprint_sql(),
    "length_histogram": LENGTH_HISTOGRAM_SQL,
    "udtf_word_positions": UDTF_WORD_POSITIONS_SQL,
    "training_mix": _training_mix_sql(),
    "feature_hashing": _feature_hashing_sql(),
    "vocab_coverage": _vocab_coverage_sql(),
    "quality_funnel": _quality_funnel_sql(),
    "source_signature_terms": _source_signature_terms_sql(),
}
