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


def test_backslash_tokens_train_identically(spark, duck, tmp_path):
    """ADVICE r05: Spark unescapes backslash sequences in string
    literals while DuckDB doesn't, so a corpus whose tokens carry
    backslashes must still train the SAME merges in both engines
    (tokens are inlined only into the Spark fold; _sql_quote doubles
    backslashes before quote-doubling). Covers both the mid-token
    backslash ('a\\b' -> '\b' backspace bug) and the trailing
    backslash ('a\\' swallowing the closing quote -> analysis error)."""
    import duckdb as ddb

    sf = str(tmp_path)
    texts = [
        "\\a \\a \\a \\a x\\ x\\ x\\ q'\\ q'\\",
        "\\a \\a b\\b b\\b b\\b x\\ q'\\",
    ]
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = [
        tuple(r)
        for r in bpe.q_bpe_train(spark, sf)
        .orderBy("round")
        .collect()
    ]
    con = ddb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    want = con.execute(
        f"SELECT * FROM ({bpe.ORACLES['bpe_train']}) ORDER BY round"
    ).fetchall()
    assert got == want
    assert any("\\" in r[1] or "\\" in r[2] for r in got)  # really exercised
    # and the tokenizer-apply side agrees over the same learned vocab
    got_tc = sorted(
        tuple(r) for r in bpe.q_bpe_token_count(spark, sf).collect()
    )
    want_tc = sorted(con.execute(bpe.ORACLES["bpe_token_count"]).fetchall())
    assert got_tc == want_tc
