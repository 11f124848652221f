"""Oracle parity + invariants for the retrieval-prep operators
(operators/retrieval.py): fixed-window chunking and inverted index."""

from __future__ import annotations

import pytest
from conftest import SF_DIR, assert_matches_oracle
from pyspark.sql import functions as F

from flink_stream_processing_refarch_spark.operators import retrieval


@pytest.mark.parametrize("name", sorted(retrieval.ORACLES))
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, retrieval.QUERIES[name], retrieval.ORACLES[name], min_rows=1
    )


def test_doc_chunks_cover_every_word_exactly_by_stride(spark):
    """Chunking is a strided cover: chunk k starts at word k*stride+1,
    chunk ids are dense from 0, and every chunk except possibly the last
    is exactly CHUNK_WORDS long."""
    rows = retrieval.q_doc_chunks(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in doc_rows] == list(range(len(doc_rows)))
        # A non-last chunk always has another chunk starting STRIDE words
        # later, so it holds at least STRIDE+1 words (it may still be short
        # of CHUNK_WORDS when the doc ends inside its window).
        for r in doc_rows[:-1]:
            assert r["n_words"] > retrieval.CHUNK_STRIDE
            assert r["n_words"] <= retrieval.CHUNK_WORDS
            assert len(r["chunk_text"].split(" ")) == r["n_words"]
        last = doc_rows[-1]
        assert 1 <= last["n_words"] <= retrieval.CHUNK_WORDS
        assert len(last["chunk_text"].split(" ")) == last["n_words"]


def test_doc_chunks_overlap_matches_stride(spark):
    """Consecutive chunks overlap by CHUNK_WORDS - CHUNK_STRIDE words."""
    overlap = retrieval.CHUNK_WORDS - retrieval.CHUNK_STRIDE
    rows = (
        retrieval.q_doc_chunks(spark, SF_DIR)
        .filter(F.col("n_words") == retrieval.CHUNK_WORDS)
        .limit(200)
        .collect()
    )
    by_doc: dict[int, dict[int, str]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]
    checked = 0
    for chunks in by_doc.values():
        for cid, text in chunks.items():
            nxt = chunks.get(cid + 1)
            if nxt is None:
                continue
            tail = text.split(" ")[retrieval.CHUNK_STRIDE:]
            head = nxt.split(" ")[:overlap]
            assert tail == head
            checked += 1
    assert checked > 0


def test_inverted_index_doc_freq_bounds_and_postings_sorted(spark, duck):
    rows = retrieval.q_inverted_index(spark, SF_DIR).collect()
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert rows
    for r in rows:
        assert 1 <= r["doc_freq"] <= n_docs
        assert r["term_freq"] >= r["doc_freq"]
        ids = [int(x) for x in r["postings_head"].split("|")]
        assert ids == sorted(ids)
        assert len(ids) == min(r["doc_freq"], retrieval.POSTINGS_CAP)


def test_doc_chunks_plan_is_narrow(spark):
    """The chunker must stay narrow — no hash/range shuffle at any point.
    The only Exchange permitted is the starved-scan round-robin gate
    (spread()), which no-ops at real scale where the scan has >= cores
    splits."""
    plan = (
        retrieval.q_doc_chunks(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1, plan[:2000]
    assert "hashpartitioning" not in plan, plan[:2000]
    assert "rangepartitioning" not in plan, plan[:2000]


def test_bm25_topk_batch_ranking_invariants(spark):
    """Per query: at most BM25B_TOP rows, ranks contiguous from 1,
    scores non-increasing with doc_id tiebreak, and 1 <= n_terms <=
    BM25B_QWORDS (a returned doc matches at least one query term).
    Note self-retrieval is NOT asserted: the synthetic corpus reuses
    sentence templates, so 3-common-word queries rank long template
    twins above the (low-idf) source doc — correct BM25 behavior."""
    from collections import defaultdict

    rows = retrieval.q_bm25_topk_batch(spark, SF_DIR).collect()
    assert rows
    per = defaultdict(list)
    for r in rows:
        per[r.query_id].append(r)
    assert len(per) > 1
    for qid, rs in per.items():
        rs.sort(key=lambda r: r.rank)
        assert 1 <= len(rs) <= retrieval.BM25B_TOP
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (a.bm25, -a.doc_id) >= (b.bm25, -b.doc_id)
        for r in rs:
            assert 1 <= r.n_terms <= retrieval.BM25B_QWORDS


def test_hybrid_rerank_is_a_cosine_reorder_of_bm25_candidates(spark):
    """Every hybrid result is one of that query's BM25 candidates;
    per query at most HY_TOP rows with contiguous ranks; cosine is in
    [-1, 1] and non-increasing down the rank with doc_id tiebreak."""
    from collections import defaultdict

    cands = defaultdict(set)
    for r in retrieval.q_bm25_topk_batch(spark, SF_DIR).collect():
        cands[r.query_id].add(r.doc_id)
    per = defaultdict(list)
    for r in retrieval.q_hybrid_retrieval(spark, SF_DIR).collect():
        per[r.query_id].append(r)
    assert per
    for qid, rs in per.items():
        rs.sort(key=lambda r: r.hybrid_rank)
        assert 1 <= len(rs) <= retrieval.HY_TOP
        assert [r.hybrid_rank for r in rs] == list(range(1, len(rs) + 1))
        for r in rs:
            assert r.doc_id in cands[qid]
            assert -1.0 <= r.cos <= 1.0
        for a, b in zip(rs, rs[1:]):
            assert (a.cos, -a.doc_id) >= (b.cos, -b.doc_id)


def test_ext_query_table_matches_derived(spark):
    """The external-table entries read the query dim (and corpus stats)
    from the stamp-keyed sidecar instead of deriving them inline; the
    results must be row-identical to the derived-dim entries, and the
    executed plan must scan `documents` exactly once (the point of the
    ext shape — VERDICT r05 item 4)."""
    derived = sorted(map(tuple, retrieval.q_bm25_topk_batch(spark, SF_DIR).collect()))
    # earlier tests leak persisted candidate relations; a cache hit here
    # would swap the whole plan for an InMemoryRelation (whose printout
    # repeats its cached plan and double-counts the scan)
    spark.catalog.clearCache()
    ext_df = retrieval.q_bm25_topk_batch_ext(spark, SF_DIR)
    # plan BEFORE execution: the AQE final plan prints reused shuffle
    # stages with their whole subtree repeated, which double-counts scans
    plan = ext_df._jdf.queryExecution().executedPlan().toString()
    # count DISTINCT scan nodes: the persisted tf relation is referenced
    # from two branches, and the tree printout repeats the one underlying
    # scan (same attribute ids) under each InMemoryRelation — dedupe on
    # the scan text itself
    doc_scans = {
        ln[ln.index("FileScan"):]
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "documents" in ln
    }
    assert len(doc_scans) == 1, "\n".join(s[:300] for s in doc_scans)
    assert sorted(map(tuple, ext_df.collect())) == derived
    hyb_derived = sorted(
        map(tuple, retrieval.q_hybrid_retrieval(spark, SF_DIR).collect())
    )
    hyb_ext = sorted(
        map(tuple, retrieval.q_hybrid_retrieval_ext(spark, SF_DIR).collect())
    )
    assert hyb_ext == hyb_derived


def test_queries_sidecar_is_stamp_stable(spark):
    """Two calls under one table stamp reuse one sidecar directory."""
    p1 = retrieval.queries_table_path(spark, SF_DIR)
    p2 = retrieval.queries_table_path(spark, SF_DIR)
    assert p1 == p2
    import os

    assert os.path.isdir(f"{p1}/queries") and os.path.isdir(f"{p1}/stats")


def test_common_term_cutoff_boundary(spark, tmp_path, monkeypatch):
    """The cutoff prunes a query term exactly when BOTH conditions hold
    (df >= BM25_DF_MIN AND df*100 >= n_docs*COMMON_DF_PCT): with the
    absolute floor patched down to make a tiny corpus testable, a term
    in most docs stops contributing (docs matching only it vanish from
    the ranking) while rare terms still score; with the floor at its
    real value (far above this corpus) nothing is pruned — the
    small-corpus-exactness property the compound rule exists for."""
    import pyspark.sql.functions as F

    sf = str(tmp_path)
    # 8 docs: 'common' in 6 of 8 (75% >= 50%), 'rare' in doc 0 only.
    # doc_id 0 is the query source (words 5..7 = common rare uniq0).
    rows = []
    for i in range(8):
        filler = " ".join(f"f{i}_{j}" for j in range(4))
        tail = "common rare uniq0" if i == 0 else (
            f"common x{i} y{i}" if i <= 5 else f"z{i} x{i} y{i}")
        # only doc 0 is a query source (ids 1..7 are not % 25 == 0), so
        # the one query is (common, rare, uniq0)
        rows.append((0 if i == 0 else i, f"{filler} {tail} pad1 pad2 pad3"))
    spark.createDataFrame(rows, "doc_id LONG, text STRING").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    from flink_stream_processing_refarch_spark.operators import retrieval

    def run():
        docs = retrieval._docs_words(spark, sf)
        q = retrieval._derived_queries_dim(docs)
        return {
            (r.query_id, r.doc_id): r.n_terms
            for r in retrieval.bm25_topk_from_queries(docs, q).collect()
        }

    unpruned = run()
    # real floor (10k) never binds on 8 docs: 'common' scores, so docs
    # 1-5 (which match ONLY 'common') appear among results
    assert any(d in (1, 2, 3, 4, 5) for (_, d) in unpruned)

    monkeypatch.setattr(retrieval, "BM25_DF_MIN", 2)
    pruned = run()
    # 'common' now pruned: only docs matching 'rare'/'uniq0' (doc 0) or
    # nothing else can score -> every result doc must contain a
    # non-common query term
    assert set(d for (_, d) in pruned) == {0}
