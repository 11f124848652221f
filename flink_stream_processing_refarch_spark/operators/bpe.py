"""BPE merge training: learn the first ``BPE_MERGES`` byte-pair-encoding
merges from the corpus — tokenizer induction, the step that sits in
front of every token-counting / sequence-packing operator in this
family (operators/text.py counts with a FIXED pre-tokenizer; this
operator is where such a tokenizer comes FROM; Sennrich et al. 2016).

Algorithm (the classic one, and the reason it scales): BPE statistics
live on the VOCABULARY, not the corpus — one corpus scan builds the
bounded ``(word, freq)`` relation, and every merge round runs on that
relation alone: explode adjacent symbol pairs weighted by word
frequency, pick the most frequent pair (ties lexicographic — the
determinism rule), apply the merge to every word's symbol sequence with
a greedy left-to-right fold. At 100 TB the corpus scan is the only big
job; the M rounds touch |vocab| rows each.

Cross-engine determinism: frequencies are exact BIGINT sums; the greedy
fold is the same CASE-based accumulator in Spark (``aggregate`` HOF)
and DuckDB (``list_reduce`` over singleton lists — DuckDB list slicing
is end-inclusive, hence ``acc[:-2]`` to drop the last element); the
chosen pair per round is an ORDER BY (freq DESC, pair ASC) LIMIT 1 in
both engines. The oracle unrolls the M rounds as CTE layers computing
the identical argmax relationally, so the driver hash-check covers the
whole training loop, not just the first round.

The reference has no counterpart (its queries are the two taxi windows,
flink-taxi-stream-processor/.../ProcessTaxiStream.java:96-136).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import words_expr
from ..schemas import load_table

BPE_MERGES = 8  # merge rounds learned (bounded output: one row each)

#: greedy left-to-right merge of adjacent pair (a, b) -> a||b over a
#: symbol array; the merged token cannot cascade within the same pass
#: (its value differs from ``a`` for any non-empty ``b``)
_SPARK_FOLD = (
    "aggregate(slice(s, 2, size(s)-1), array(element_at(s,1)), "
    "(acc, x) -> CASE WHEN element_at(acc,-1)='{a}' AND x='{b}' "
    "THEN concat(slice(acc, 1, size(acc)-1), array('{m}')) "
    "ELSE concat(acc, array(x)) END)"
)

_PAIRS = (
    "explode(transform(sequence(1, size(s)-1), "
    "i -> struct(element_at(s, CAST(i AS INT)) AS a, "
    "element_at(s, CAST(i+1 AS INT)) AS b)))"
)


def _sql_quote(tok: str) -> str:
    """Quote a learned token for inlining into the SPARK fold expression.
    Spark's parser treats backslash as an escape character inside string
    literals (DuckDB doesn't, but the oracle never inlines tokens — it
    re-derives merges relationally), so corpus tokens containing
    backslashes (data-reachable: tokens come straight from text split on
    spaces) must double them BEFORE the quote doubling — else 'a\\b'
    trains a different merge than DuckDB and a trailing backslash
    swallows the closing quote (ADVICE r05)."""
    return tok.replace("\\", "\\\\").replace("'", "''")


#: (sf_dir, documents stamp) -> (merges list, final vocab DataFrame)
_TRAIN_CACHE: dict = {}


def _train(spark: SparkSession, sf_dir: str):
    """Run the merge-training loop once per (sf_dir, table stamp);
    returns (merges, vocab) where vocab carries each word's FINAL
    symbol sequence — the relation tokenization joins against."""
    from ..schemas import table_stamp

    # applicationId in the key: the cached vocab is a localCheckpoint-ed
    # DataFrame whose blocks live on this context's executors — a fresh
    # context must retrain, not deserialize a dead reference
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        table_stamp(f"{sf_dir}/documents.parquet"),
    )
    if key in _TRAIN_CACHE:
        return _TRAIN_CACHE[key]
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.expr(words_expr("text", "spark"))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn("s", F.expr("filter(split(word, ''), x -> x != '')"))
        # the rounds iterate on this relation; checkpoint so each round
        # starts from materialized rows instead of re-running the scan
        # and every prior round's fold (bounded: |vocab| rows)
        .localCheckpoint(eager=True)
    )
    merges = []
    for rnd in range(1, BPE_MERGES + 1):
        best = (
            # size >= 2: Spark's sequence(1, 0) counts DOWN, so a
            # fully-merged single-symbol word would explode [1, 0]
            vocab.filter(F.size("s") >= 2)
            .select("freq", F.expr(_PAIRS).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("pf"))
            .orderBy(F.desc("pf"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:  # vocabulary fully merged before M rounds
            break
        a, b, pf = best[0]["a"], best[0]["b"], best[0]["pf"]
        merges.append((rnd, a, b, int(pf)))
        fold = _SPARK_FOLD.format(
            a=_sql_quote(a), b=_sql_quote(b), m=_sql_quote(a + b)
        )
        vocab = vocab.withColumn("s", F.expr(fold)).localCheckpoint(eager=True)
    # in-place regeneration of documents -> the old stamp's entry (and
    # its checkpointed vocab blocks, reclaimed by the ContextCleaner
    # once unreferenced) can never be served again; drop it
    from ..schemas import evict_stale_stamp

    evict_stale_stamp(_TRAIN_CACHE, key, 2)
    _TRAIN_CACHE[key] = (merges, vocab)
    return _TRAIN_CACHE[key]


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: (round, lhs, rhs, pair_freq) for the
    first BPE_MERGES merges over the documents corpus."""
    merges, _ = _train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "round BIGINT, lhs STRING, rhs STRING, pair_freq BIGINT"
    )


# per-round argmax collects + checkpoints during plan construction
q_bpe_train.stateful_build = True


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts UNDER THE LEARNED TOKENIZER: train ->
    apply, closing the loop bpe_train opens. The scalable application
    path is the point: a document is tokenized by LOOKUP — join its
    words against the trained vocab's final symbol sequences — never by
    re-running the merge fold per document. At 100 TB the join side is
    the bounded vocab relation (broadcast below the threshold, plain
    shuffle join on the word key above it); the corpus-side exchange
    carries (doc_id, word-count) pairs only."""
    _, vocab = _train(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.expr(words_expr("text", "spark"))).alias("word"),
    ).filter(F.length("word") > 0)
    per_word = vocab.select("word", F.size("s").alias("n_tok"))
    # no broadcast HINT: the vocab broadcasts when it fits the
    # autoBroadcastJoinThreshold and falls back to a word-key shuffle
    # join when an open-ended real vocabulary doesn't — a hard hint
    # would force-collect it regardless of size
    return (
        words.join(per_word, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").alias("n_bpe_tokens"),
        )
    )


q_bpe_token_count.stateful_build = True


def _bpe_train_sql() -> str:
    w = words_expr("text", "duckdb")
    parts = [
        f"""w AS (SELECT unnest({w}) AS word FROM documents),
v0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         list_filter(string_split(word, ''), x -> x != '') AS s
  FROM w WHERE length(word) > 0 GROUP BY word)"""
    ]
    selects = []
    for r in range(1, BPE_MERGES + 1):
        prev = f"v{r - 1}"
        # LEFT JOIN ON true, not CROSS JOIN: a round with no pairs left
        # (b{r} empty) must carry the vocab through UNCHANGED — the
        # relational mirror of the Spark loop's break — not annihilate
        # it and every later layer
        parts.append(
            f"""p{r} AS (
  SELECT p[1] AS a, p[2] AS b, CAST(sum(freq) AS BIGINT) AS pf
  FROM (SELECT freq,
          unnest(list_transform(range(1, len(s)), i -> [s[i], s[i+1]])) AS p
        FROM {prev})
  GROUP BY 1, 2),
b{r} AS (SELECT a, b, pf FROM p{r} ORDER BY pf DESC, a, b LIMIT 1),
v{r} AS (
  SELECT word, freq,
         CASE WHEN b{r}.a IS NULL THEN s ELSE
           list_reduce(list_transform(s, x -> [x]),
             (acc, x) -> CASE WHEN acc[-1] = b{r}.a AND x[1] = b{r}.b
                         THEN list_append(acc[:-2], b{r}.a || b{r}.b)
                         ELSE list_concat(acc, x) END) END AS s
  FROM {prev} LEFT JOIN b{r} ON true)"""
        )
        selects.append(
            f"SELECT {r} AS round, a AS lhs, b AS rhs, pf AS pair_freq FROM b{r}"
        )
    body = ",\n".join(parts)
    union = "\nUNION ALL ".join(selects)
    return f"WITH {body}\nSELECT CAST(round AS BIGINT) AS round, lhs, rhs, pair_freq FROM ({union})\n"


def _bpe_token_count_sql() -> str:
    w = words_expr("text", "duckdb")
    # reuse the training CTE chain; the final vocab is v{BPE_MERGES}
    train = _bpe_train_sql()
    body = train[len("WITH "):train.index("\nSELECT")]
    return f"""
WITH {body},
tok AS (
  SELECT doc_id, word
  FROM (SELECT doc_id, unnest({w}) AS word FROM documents)
  WHERE length(word) > 0)
SELECT doc_id, count(*) AS n_words,
       CAST(sum(len(s)) AS BIGINT) AS n_bpe_tokens
FROM tok JOIN v{BPE_MERGES} USING (word)
GROUP BY doc_id
"""


QUERIES = {
    "bpe_train": q_bpe_train,
    "bpe_token_count": q_bpe_token_count,
}

ORACLES = {
    "bpe_train": _bpe_train_sql(),
    "bpe_token_count": _bpe_token_count_sql(),
}
