"""Oracle parity + invariants for the round-3 corpus-construction
operators (operators/corpus.py)."""

from __future__ import annotations

import pytest
from conftest import SF_DIR, assert_matches_oracle
from pyspark.sql import functions as F

from flink_stream_processing_refarch_spark.operators import corpus


@pytest.mark.parametrize("name", sorted(corpus.ORACLES))
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, corpus.QUERIES[name], corpus.ORACLES[name], min_rows=1
    )


def test_tfidf_ranks_are_dense_and_scores_descend(spark):
    rows = corpus.q_tfidf_top_terms(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in doc_rows] == list(
            range(1, len(doc_rows) + 1)
        )
        scores = [r["tfidf"] for r in doc_rows]
        assert scores == sorted(scores, reverse=True)


def test_sequence_packing_conserves_docs_and_tokens(spark, duck):
    """Packing is a partition of the corpus: per-source doc and token
    totals must survive the seq_id assignment exactly."""
    packed = (
        corpus.q_sequence_packing(spark, SF_DIR)
        .groupBy("source")
        .agg(
            F.sum("n_docs").alias("docs"),
            F.sum("seq_tokens").alias("tokens"),
        )
        .collect()
    )
    expect = dict(
        duck.execute(
            "SELECT source, count(*) FROM documents GROUP BY source"
        ).fetchall()
    )
    assert {r["source"]: r["docs"] for r in packed} == expect


def test_bottomk_sample_partition_invariant(spark):
    """The mergeable-sketch claim: the selected sample must be identical
    no matter how the input is partitioned."""
    base = corpus.q_bottomk_sample(spark, SF_DIR)
    rows = {tuple(r) for r in base.collect()}
    from flink_stream_processing_refarch_spark.schemas import load_table

    docs = load_table(spark, SF_DIR, "documents").repartition(13)
    docs.createOrReplaceTempView("documents_repart")
    # same query over a differently-partitioned relation
    alt = (
        docs.select(
            "source",
            "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("hkey"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("hkey", "doc_id")
    alt_rows = {
        tuple(r)
        for r in alt.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= corpus.SAMPLE_K)
        .select("source", "sample_rank", "doc_id")
        .collect()
    }
    assert rows == alt_rows
    per_source: dict[str, int] = {}
    for source, _rank, _doc in rows:
        per_source[source] = per_source.get(source, 0) + 1
    assert all(n <= corpus.SAMPLE_K for n in per_source.values())


def test_bigram_lm_probabilities_normalize(spark):
    rows = corpus.q_bigram_lm(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["rank"] <= corpus.BIGRAM_TOP_K
        assert 0 < r["cond_prob"] <= 1
        assert r["n"] <= r["head_total"]


def test_pii_scrub_detects_and_redacts(spark):
    """The corpus is PII-free, so prove the patterns on crafted rows:
    counts find the matches and the redaction rewrites them."""
    df = spark.createDataFrame(
        [
            (1, "mail me at a.user@example.com or see https://x.io/p 12345"),
            (2, "clean text only"),
        ],
        "doc_id long, text string",
    )
    cols = [F.col("doc_id")]
    red = F.col("text")
    for name, pat, tag in corpus.PII_PATTERNS:
        cols.append(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, tag)
    cols.append(red.alias("redacted"))
    out = {r["doc_id"]: r for r in df.select(*cols).collect()}
    assert out[1]["n_email"] == 1
    assert out[1]["n_url"] == 1
    assert out[1]["n_digit_run"] == 1
    assert out[1]["redacted"] == "mail me at <EMAIL> or see <URL> <NUM>"
    assert out[2]["redacted"] == "clean text only"


def test_dup_provenance_counts_match_exact_dedup(spark):
    """Every provenance row is a duplicate group, so the set of hashes
    must equal dedup_exact's (same corpus, same predicate)."""
    from flink_stream_processing_refarch_spark.operators import dedup

    prov = {r["h"] for r in corpus.q_dup_provenance(spark, SF_DIR).collect()}
    exact = {r["h"] for r in dedup.q_dedup_exact(spark, SF_DIR).collect()}
    assert prov == exact


def test_tfidf_broadcasts_small_sides(spark):
    """df (|vocab| rows) and the 1-row doc count must broadcast; the only
    wide exchange carries (doc_id, word, count)."""
    plan = (
        corpus.q_tfidf_top_terms(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_sketch_rollup_merge_consistency(spark):
    """The merged <ALL> row must bound every per-source exact count and
    its own sketch must pass the in-row check (merge path exercised)."""
    rows = {r["source"]: r for r in corpus.q_sketch_rollup(spark, SF_DIR).collect()}
    assert "<ALL>" in rows
    glob = rows.pop("<ALL>")
    assert glob["sketch_ok"]
    for r in rows.values():
        assert r["sketch_ok"], r
        assert r["n_distinct_exact"] <= glob["n_distinct_exact"]


def test_mixture_weights_form_a_distribution(spark):
    """Weights sum to ~1, every source gets a positive weight, and the
    epoch budget allocation matches each weight within rounding."""
    rows = corpus.q_mixture_weights(spark, SF_DIR).collect()
    assert rows
    total_w = sum(r["weight"] for r in rows)
    assert abs(total_w - 1.0) < 1e-4 * len(rows)
    for r in rows:
        assert r["weight"] > 0
        assert abs(r["budget_tokens"] - r["weight"] * corpus.MIX_BUDGET) <= (
            corpus.MIX_BUDGET * 1e-6 + 1
        )
    # temperature alpha=0.5 upsamples small sources: the weight ratio
    # between the largest and smallest source is the sqrt of their token
    # ratio, i.e. strictly compressed relative to proportional sampling
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    if big["n_tokens"] > small["n_tokens"]:
        assert (
            big["weight"] / small["weight"]
            < big["n_tokens"] / small["n_tokens"]
        )


def test_curriculum_prefix_is_weighted_and_easy_first(spark):
    """Every source's prefix picks its easiest docs in order (src_rank
    contiguous from 1, n_words non-decreasing along it), and schedule
    positions are dense 1..CURR_K."""
    rows = corpus.q_curriculum_order(spark, SF_DIR).collect()
    assert sorted(r["schedule_pos"] for r in rows) == list(
        range(1, len(rows) + 1)
    )
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for docs in by_src.values():
        docs.sort(key=lambda r: r["src_rank"])
        assert [r["src_rank"] for r in docs] == list(range(1, len(docs) + 1))
        words = [r["n_words"] for r in docs]
        assert words == sorted(words)
