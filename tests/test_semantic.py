"""Oracle parity + invariants for SemDeDup (operators/semantic.py)."""

from __future__ import annotations

import pytest
from conftest import SF_DIR, assert_matches_oracle

from flink_stream_processing_refarch_spark.operators import semantic


@pytest.mark.parametrize("name", sorted(semantic.ORACLES))
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, semantic.QUERIES[name], semantic.ORACLES[name], min_rows=1
    )


def test_semantic_dedup_invariants(spark):
    """Every vector appears once; clusters are within [0, K); dup_of
    always points at an earlier vector in the SAME cluster; is_kept is
    exactly dup_of IS NULL; the first vector of every cluster survives."""
    rows = semantic.q_semantic_dedup(spark, SF_DIR).collect()
    assert rows
    by_id = {r["vec_id"]: r for r in rows}
    assert len(by_id) == len(rows)  # one row per vector
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(semantic.K_CLUSTERS))
    for r in rows:
        assert (r["dup_of"] is None) == r["is_kept"]
        if r["dup_of"] is not None:
            src = by_id[r["dup_of"]]
            assert src["vec_id"] < r["vec_id"]
            assert src["cluster"] == r["cluster"]
    for cl in clusters:
        first = min(r["vec_id"] for r in rows if r["cluster"] == cl)
        assert by_id[first]["is_kept"]


def test_kmeans_clusters_invariants(spark):
    """Cluster profile covers every vector exactly once; purity is the
    exact integer ratio; clustering agrees with semantic_dedup's (same
    Lloyd state walk on the same seeds)."""
    prof = semantic.q_kmeans_clusters(spark, SF_DIR).collect()
    assert prof
    assert len({r["cluster"] for r in prof}) == len(prof)
    dedup_rows = semantic.q_semantic_dedup(spark, SF_DIR).collect()
    assert sum(r["n_vectors"] for r in prof) == len(dedup_rows)
    from collections import Counter

    sizes = Counter(r["cluster"] for r in dedup_rows)
    for r in prof:
        assert sizes[r["cluster"]] == r["n_vectors"]
        assert 0 < r["top_label_n"] <= r["n_vectors"]
        assert r["purity_ppm"] == r["top_label_n"] * 1_000_000 // r["n_vectors"]


def test_semantic_dedup_catches_injected_near_dups(spark):
    """The embeddings table carries near-identical vector pairs (the same
    structure dedup_embedding keys on); SemDeDup must mark some vectors
    as duplicates — an empty dup set would mean clustering separated
    every near-dup pair, defeating the operator's purpose."""
    rows = semantic.q_semantic_dedup(spark, SF_DIR).collect()
    dups = [r for r in rows if not r["is_kept"]]
    assert dups, "no within-cluster near-dups found at all"
    assert len(dups) < len(rows)  # and it must not collapse everything
