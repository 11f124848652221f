"""BPE merge training (operators/bpe.py): oracle parity + the greedy
merge semantics on a controlled vocabulary."""

from __future__ import annotations

from conftest import assert_matches_oracle
from pyspark.sql import functions as F

from flink_stream_processing_refarch_spark.operators import bpe


def test_matches_oracle(spark, duck):
    assert_matches_oracle(
        spark, duck, bpe.QUERIES["bpe_train"], bpe.ORACLES["bpe_train"]
    )


def test_greedy_fold_merges_left_to_right_without_cascade(spark):
    """'aaa' under merge (a,a) must become [aa, a] — greedy pass,
    the merged token never cascades within the same round."""
    df = spark.createDataFrame([("aaa",), ("aab",), ("a",)], ["word"])
    df = df.withColumn("s", F.expr("filter(split(word, ''), x -> x != '')"))
    fold = bpe._SPARK_FOLD.format(a="a", b="a", m="aa")
    got = {r["word"]: r["m"] for r in df.select("word", F.expr(fold).alias("m")).collect()}
    assert got == {"aaa": ["aa", "a"], "aab": ["aa", "b"], "a": ["a"]}


def test_merge_rounds_are_frequency_ordered(spark):
    """Round r's chosen pair frequency never increases with r on a
    fixed corpus (each merge can only remove occurrences of other
    pairs it overlaps, so the max is non-increasing... except merges
    CREATE new pairs; assert instead: every round's pair was the
    argmax of its OWN round — already hash-proven by the oracle — and
    rounds/freqs are well-formed."""
    rows = bpe.q_bpe_train(spark, "/root/testdata/sf0.001").collect()
    assert [r["round"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["pair_freq"] > 0 for r in rows)
    assert all(r["lhs"] and r["rhs"] for r in rows)


def test_oracle_carries_vocab_through_empty_rounds(duck):
    """A corpus whose vocabulary fully merges (or never has pairs)
    before BPE_MERGES rounds must NOT annihilate the oracle's vocab
    chain — the LEFT JOIN carries it through unchanged, mirroring the
    Spark loop's break (review finding r05)."""
    import duckdb as ddb

    con = ddb.connect()
    con.execute("CREATE VIEW documents AS SELECT 1 AS doc_id, 'a b c a' AS text")
    assert con.execute(bpe.ORACLES["bpe_train"]).fetchall() == []
    # token counts still flow from the final vocab layer
    assert con.execute(bpe.ORACLES["bpe_token_count"]).fetchall() == [(1, 4, 4)]
