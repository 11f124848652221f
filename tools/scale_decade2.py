"""Second scaling decade: sf1 -> sf10 (500,000 docs, 100
similarity-disjoint replicas of the driver's sf0.1 corpus) for the
text-side dedup / contamination / selection / retrieval family.

This is the decade where walls are fully data-dominated (the sf0.001 ->
sf0.1 steps sit on the local-mode scheduling floor; SCALING.md's sf1
column is the first data-dominated step). Linear operators must show
~10x wall AND ~10x shuffle here; any quadratic candidate path would
show ~100x.

Embedding family (r07, VERDICT r06 #3): INCLUDED, with the code spaces
re-derived per corpus through the documented N-rules (dedup.emb_bits_for,
similarity.lsh_planes_for / ivf_centroids_for — one bit per doubling,
IVF cells ~sqrt(N)) via the official setters (set_emb_scale /
set_ann_scale), which regenerate the Spark expressions AND the DuckDB
oracle literals in lockstep (tests/test_pipeline_ops.py::
test_emb_code_space_scales_in_lockstep proves oracle parity at the
sf10 settings). The r06 exclusion reason — fixed 8x6 codes put ~3,100
vectors per band bucket at 200k vectors, past EMB_BUCKET_CAP — is
exactly what the N-rule removes: occupancy stays ~constant at every
scale. semantic_dedup needs no knob — its exchange volume is constant
in corpus size by construction, which this decade confirms.

Build the corpus first:
  SCALE_OUT_DIR=/dev/shm/graft_sf10 SCALE_REPLICAS=100 \
      python tools/make_scale_data.py
Run: python tools/scale_decade2.py   (writes SCALING_DECADE2.md)

Measurement caveat (r06): the timed action is .count(); for a
FILTER-LESS per-doc score (memorization_risk) Catalyst prunes the
aggregation/window subtree count() doesn't need, under-reporting
shuffle — such rows need a full-consume action (sum over every output
column); see the r06 addendum in the output md.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from flink_stream_processing_refarch_spark.operators import (  # noqa: E402
    bpe,
    contamination,
    dedup,
    incremental,
    retrieval,
    selection,
    semantic,
    similarity,
    text,
)
from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402
from tools.scale_curve import shuffle_write_bytes  # noqa: E402

N_RUNS = 3
SF1_DIR = "/dev/shm/graft_sf1"
SF10_DIR = "/dev/shm/graft_sf10"

QUERIES = {
    "dedup_exact": dedup.QUERIES["dedup_exact"],
    "dedup_minhash_lsh": dedup.QUERIES["dedup_minhash_lsh"],
    "dedup_simhash": dedup.QUERIES["dedup_simhash"],
    "ngram_jaccard": dedup.QUERIES["ngram_jaccard"],
    "dedup_clusters": dedup.QUERIES["dedup_clusters"],
    "dedup_incremental": incremental.QUERIES["dedup_incremental"],
    "decontaminate": contamination.QUERIES["decontaminate"],
    "corpus_build": contamination.QUERIES["corpus_build"],
    "semantic_dedup": semantic.QUERIES["semantic_dedup"],
    "importance_resampling": selection.QUERIES["importance_resampling"],
    "lm_perplexity": selection.QUERIES["lm_perplexity"],
    "split_leakage": selection.QUERIES["split_leakage"],
    "source_drift": selection.QUERIES["source_drift"],
    "inverted_index": retrieval.QUERIES["inverted_index"],
    "bm25_score": retrieval.QUERIES["bm25_score"],
    # late-r05 additions
    "dedup_spans": dedup.QUERIES["dedup_spans"],
    "kmeans_clusters": semantic.QUERIES["kmeans_clusters"],
    "feature_hashing": text.QUERIES["feature_hashing"],
    "containment_dedup": dedup.QUERIES["containment_dedup"],
    "dup_source_matrix": dedup.QUERIES["dup_source_matrix"],
    "vocab_coverage": text.QUERIES["vocab_coverage"],
    "bm25_topk_batch": retrieval.QUERIES["bm25_topk_batch"],
    "hybrid_retrieval": retrieval.QUERIES["hybrid_retrieval"],
    # r06 addition: the BPE apply side (train -> vocab-lookup join ->
    # per-doc counts); train cost is stamp-memoized after the first
    # (untimed) run, so the decade measures the corpus-side join +
    # combine the operator claims scale linearly
    "bpe_token_count": bpe.QUERIES["bpe_token_count"],
    # r06 late additions (first decade rows in the r06 addendum;
    # full-table rows from the next harness run)
    "memorization_risk": dedup.QUERIES["memorization_risk"],
    "winnow_fingerprints": dedup.QUERIES["winnow_fingerprints"],
    # r07: the index consumer (bucketed candidate join + Jaccard verify)
    "winnow_matches": dedup.QUERIES["winnow_matches"],
}

# r07: the embedding family, measured with code spaces re-derived per
# corpus via the documented N-rules (the setters are called with the
# corpus's vector count before these run; defaults restored after).
EMB_QUERIES = {
    "dedup_embedding": dedup.QUERIES["dedup_embedding"],
    "ann_lsh": similarity.QUERIES["ann_lsh"],
    "ann_lsh_multiprobe": similarity.QUERIES["ann_lsh_multiprobe"],
    "ann_ivf": similarity.QUERIES["ann_ivf"],
    "ann_pq": similarity.QUERIES["ann_pq"],
}


def main() -> None:
    for d in (SF1_DIR, SF10_DIR):
        if not os.path.isdir(d):
            raise SystemExit(f"missing corpus {d} — run make_scale_data.py")
    spark = get_spark(
        "scale-decade2",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for fn in list(QUERIES.values()) + list(EMB_QUERIES.values()):
        fn(spark, "/root/testdata/sf0.001").count()

    results: dict[str, dict[str, dict]] = {
        q: {} for q in list(QUERIES) + list(EMB_QUERIES)
    }

    def measure(name, fn, sf, sf_dir):
        b0 = shuffle_write_bytes(spark)
        walls = []
        t0 = time.monotonic()
        rows = fn(spark, sf_dir).count()
        walls.append(time.monotonic() - t0)
        b1 = shuffle_write_bytes(spark)
        for _ in range(N_RUNS - 1):
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            walls.append(time.monotonic() - t0)
        results[name][sf] = {
            "rows": rows,
            "wall": round(statistics.median(walls), 2),
            "shuffle_mb": round(max(0, b1 - b0) / 1e6, 2),
        }
        print(f"{sf} {name}: {results[name][sf]}", file=sys.stderr)

    emb_settings: dict[str, tuple] = {}
    try:
        for sf, sf_dir in (("sf1", SF1_DIR), ("sf10", SF10_DIR)):
            for name, fn in QUERIES.items():
                measure(name, fn, sf, sf_dir)
            # embedding family: code spaces re-derived from THIS corpus's
            # vector count (the documented N-rules), oracle in lockstep
            from flink_stream_processing_refarch_spark.schemas import (
                load_table,
            )

            n_vec = load_table(spark, sf_dir, "embeddings").count()
            bits = dedup.set_emb_scale(n_vec)
            planes, cents = similarity.set_ann_scale(n_vec)
            emb_settings[sf] = (n_vec, bits, planes, cents)
            print(
                f"{sf}: n_vec={n_vec} -> EMB_BITS={bits},"
                f" N_PLANES={planes}, N_CENTROIDS={cents}",
                file=sys.stderr,
            )
            for name, fn in EMB_QUERIES.items():
                measure(name, fn, sf, sf_dir)
            dedup.set_emb_scale()
            similarity.set_ann_scale()
    finally:
        dedup.set_emb_scale()
        similarity.set_ann_scale()

    write_md(results, emb_settings)


def render(results: dict, emb_settings: dict) -> str:
    """Markdown from measured results — split from main() so a
    completed run's logged measurements can be re-rendered (narrative /
    formatting edits) without re-measuring."""
    lines = [
        "# SCALING_DECADE2 — sf1 -> sf10 (50k -> 500k docs),"
        " text + embedding families",
        "",
        "Generated by `tools/scale_decade2.py` (median wall of "
        f"{N_RUNS} warm runs; shuffle MB from the status API, one run).",
        "The fully data-dominated decade: both steps are far above the",
        "local-mode scheduling floor, so wall factors near 10x (and",
        "shuffle factors at ~10x) certify linear scaling directly.",
        "",
        "The embedding family (last five rows) runs with its code",
        "spaces re-derived per corpus through the documented N-rules",
        "(`dedup.emb_bits_for`, `similarity.lsh_planes_for` /",
        "`ivf_centroids_for` — one bit per doubling, IVF cells",
        "~sqrt(N)); the setters regenerate the Spark expressions AND",
        "the DuckDB oracle literals in lockstep (oracle parity at the",
        "sf10 settings is pinned by",
        "tests/test_pipeline_ops.py::test_emb_code_space_scales_in_lockstep).",
        "Active settings (n_vectors -> EMB_BITS / N_PLANES /",
        "N_CENTROIDS): "
        + "; ".join(
            f"{sf}: {v[0]} -> {v[1]}/{v[2]}/{v[3]}"
            for sf, v in emb_settings.items()
        ),
        "",
        "| query | sf1 wall / shuffle | sf10 wall / shuffle"
        " | wall x | shuffle x | rows x |",
        "|---|---|---|---|---|---|",
    ]
    for name, per in results.items():
        w1, w10 = per["sf1"]["wall"], per["sf10"]["wall"]
        s1, s10 = per["sf1"]["shuffle_mb"], per["sf10"]["shuffle_mb"]
        r1, r10 = per["sf1"]["rows"], per["sf10"]["rows"]
        wall_x = f"{w10 / w1:.1f}x" if w1 else "—"
        shuf_x = f"{s10 / s1:.1f}x" if s1 else ("0 / 0" if not s10 else "—")
        rows_x = f"{r10 / r1:.1f}x" if r1 else "—"
        lines.append(
            f"| {name} | {w1}s / {s1}MB | {w10}s / {s10}MB"
            f" | {wall_x} | {shuf_x} | {rows_x} |"
        )
    lines += [
        "",
        "Reading the outliers: split_leakage's shuffle factor is a",
        "JOIN-REGIME TRANSITION, not quadratic growth (verified from the",
        "executed plans): at sf1 AQE still broadcast the smaller shingle",
        "side (pairs never crossed an exchange before aggregation); at",
        "sf10 neither side fits a broadcast and the operator enters its",
        "designed shuffle-join regime — both exploded shingle sides and",
        "the matched (hash, doc_id) pairs hash-partition. Output rows and",
        "every other factor stay ~10x. dedup_simhash's 1.4 GB is",
        "output-bound (12M genuine Hamming<=3 pairs at sf10 — the",
        "operator must emit them; see SCALING.md's vocabulary note).",
        "semantic_dedup confirms its constant-exchange design: 0.9 MB of",
        "shuffle for a 500k-doc corpus (centroid partial sums only);",
        "kmeans_clusters (same Lloyd walk + a K x |labels| profile) must",
        "match that constant-exchange behavior. dedup_spans is the",
        "deliberate heavyweight of the family — its exchange carries one",
        "(doc_id, 60-bit hash) row per stride-1 word window, so shuffle",
        "tracks total corpus WORDS (~10x per decade is the certificate;",
        "absolute volume is the documented cost of substring-level",
        "auditing). feature_hashing's exchange carries at most",
        "FH_BUCKETS combined rows per doc — linear in docs (the",
        "measured ~10x) with a hard per-doc bound, never per-word.",
        "containment_dedup and dup_source_matrix inherit the LSH",
        "candidate bound (exact set math and source joins touch",
        "candidate pairs only, never pairs-of-docs; their ~10x output",
        "certifies that). Their ~29x shuffle factor is the SAME",
        "join-regime transition as split_leakage, verified from the",
        "executed plans: at sf1 the word-set relation broadcasts into",
        "the candidate join (6 BroadcastHashJoins); at sf10 it no",
        "longer fits and three of those joins run as SortMergeJoin, so",
        "the word-set side starts crossing the exchange. vocab_coverage",
        "ranks only the bounded vocab relation (kilobytes of shuffle).",
        "bm25_topk_batch / hybrid_retrieval scale in BOTH docs and",
        "queries here (the derived query table is |docs|/25 rows, so a",
        "10x corpus also means 10x queries); the measured ~10x wall and",
        "shuffle show the token-side combine dominates — the per-query",
        "cost stays amortized, and hybrid's dense re-rank stays",
        "candidates-only at every scale.",
        "bpe_token_count's 359x shuffle step is the SAME",
        'broadcast->shuffle regime transition, verified from the',
        "executed plans and predicted by the operator's own docstring:",
        'at sf1 the trained vocab (~300k words, under the 10 MB',
        'broadcast threshold) broadcasts into the apply join',
        '(BroadcastHashJoin, 0.33 MB shuffle = the per-doc rollup',
        'partials only); at sf10 the ~2M-word vocab exceeds it and the',
        'apply join runs as SortMergeJoin on the word key, so the',
        'corpus-side (doc_id, word) rows and the vocab relation both',
        'cross the exchange — 118 MB, linear in corpus words from here',
        'up (the sf1 point just sits in the cheaper regime).',
        "Wall factors under 10x reflect unused local[32] headroom at",
        "sf1-sized inputs, not sub-linear work.",
        "",
        "r07 rows. memorization_risk now tracks dedup_spans (~10x",
        "shuffle of 8-byte hash partials) — the r07 groupBy+join-back",
        "totals replaced the single-task per-hash window (ADVICE r06).",
        "winnow_fingerprints shuffles NOTHING at either scale: the",
        "whole extraction is array expressions at the scan and count()",
        "needs no exchange — the index itself only pays its ~2/(w+1)",
        "write when a consumer materializes it. winnow_matches (its",
        "consumer) inherits the LSH candidate bound: one fp exchange",
        "plus candidate pairs, ~10x both axes.",
        "",
        "Embedding family. The probe operators' costs are bounded by",
        "one corpus scan (bucket/cell codes re-derived in the scan",
        "locally; ingest-time columns + partition pruning at 100 TB):",
        "ann_ivf tracks the scan (~9x), the LSH probes sit near the",
        "local scheduling floor at both scales (sub-2 s walls, 10-row",
        "output, zero shuffle), and ann_pq pays only its ADC pass over",
        "8-byte codes plus the fixed PQ_CAND re-rank (sub-linear; the",
        "codes sidecar is stamp-keyed and reused).",
        "dedup_embedding is the family's deliberate heavyweight and its",
        "factors decompose exactly (verified from bucket occupancy and",
        "the executed plans): candidates are O(N x band-bucket",
        "occupancy); the integer-bit N-rule holds occupancy at 39 -> 49",
        "(3 bits granted for a 10x corpus, log2(10)=3.32), so the",
        "candidate set grows ~12x, not 100x — the banded bound doing",
        "its job. The 98.6x shuffle is that ~12x candidate volume TIMES",
        "the same broadcast->SMJ regime transition as split_leakage",
        "(verified from the executed plans at both scales):",
        "at sf1 the 20k-vector relation broadcasts into the verify",
        "joins (34 MB = candidate pairs only); at sf10 the 200k x",
        "64-double relation exceeds the threshold and both verify legs",
        "shuffle pair rows + vectors. The 28.3x OUTPUT rows are corpus",
        "structure, not a candidate leak: at DIM=64 the random-cosine",
        "std is 1/8, so the 0.42 threshold sits at ~3.4 sigma of the",
        "CROSS-replica Rademacher tail — a population that grows with",
        "replica PAIRS (~N^2/2), and the near-threshold regime is",
        "exactly where this operator's docstring already routes",
        "moderate-threshold work to SemDeDup (which holds 0.9 MB",
        "constant exchange on the same corpus, one row up).",
        "",
        "Addendum (r05, bpe_train): the tokenizer-training loop is",
        "vocab-bounded as designed — warm median train wall 2.81 s at sf1",
        "(50k docs, ~310-word vocab) vs 3.18 s at sf10 (500k docs,",
        "~3,100-word vocab): a 10x corpus with a 10x vocabulary costs",
        "+13% wall, because after the single corpus scan every merge round",
        "touches only the (word, freq) relation. (Measured with",
        "_TRAIN_CACHE cleared per run; the per-stamp memo otherwise makes",
        "repeat calls ~0.3 s.)",
        "",
    ]
    return "\n".join(lines)


def write_md(results: dict, emb_settings: dict) -> None:
    with open("/root/repo/SCALING_DECADE2.md", "w") as f:
        f.write(render(results, emb_settings))
    print("wrote SCALING_DECADE2.md")


def rerender_from_log(log_path: str) -> None:
    """Re-render SCALING_DECADE2.md from a completed run's stderr log
    (the ``sfN name: {...}`` lines + the ``n_vec=`` settings line) —
    narrative/format edits without a 30-minute re-measure."""
    import ast
    import re

    results: dict[str, dict[str, dict]] = {}
    emb_settings: dict[str, tuple] = {}
    pat = re.compile(r"(sf1|sf10) ([a-z_0-9]+): (\{[^}]*\})")
    spat = re.compile(
        r"(sf1|sf10): n_vec=(\d+) -> EMB_BITS=(\d+), N_PLANES=(\d+),"
        r" N_CENTROIDS=(\d+)"
    )
    text = open(log_path, errors="replace").read().replace("\r", "\n")
    for m in pat.finditer(text):
        results.setdefault(m.group(2), {})[m.group(1)] = ast.literal_eval(
            m.group(3)
        )
    for m in spat.finditer(text.replace("\n", " ")):
        emb_settings[m.group(1)] = tuple(int(x) for x in m.groups()[1:])
    order = list(QUERIES) + list(EMB_QUERIES)
    missing = [
        q for q in order
        if q not in results or {"sf1", "sf10"} - set(results[q])
    ]
    if missing:
        raise SystemExit(f"log incomplete, missing: {missing}")
    write_md({q: results[q] for q in order}, emb_settings)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--from-log":
        rerender_from_log(sys.argv[2])
    else:
        main()
