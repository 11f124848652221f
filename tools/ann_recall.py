"""ANN recall@10 vs exact cosine top-k — committed evidence for the
approximate operators' recall claims (VERDICT r04 stretch item 7).

Runs the ACTUAL registry operator builders (operators/similarity.py) —
not a numpy mirror — over many query vectors by rebinding the module's
``QUERY_VEC_ID`` per run (the builders read it at plan-build time), and
compares each operator's top-10 against ``q_cosine_topk``'s exact
top-10 for the same query. ``ann_pq`` is additionally swept over
``PQ_CAND`` (the ADC candidate count, its recall/cost knob); the PQ
codes sidecar and codebooks are stamp-keyed per table, so they are
built once and REUSED across every query — exactly the ingest-time
design the operator claims.

Corpus: /dev/shm/graft_sf1 (20k vectors, 10 similarity-disjoint
Rademacher replicas of the driver's sf0.1 embeddings —
tools/make_scale_data.py) when present, else the driver's sf0.1.
Queries: N_QUERIES vec_ids spread across replicas (deterministic
stride), so recall is averaged over query positions, not tuned to
vec_id 0.

Run: python tools/ann_recall.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from flink_stream_processing_refarch_spark.operators import similarity as sim  # noqa: E402
from flink_stream_processing_refarch_spark.schemas import load_table  # noqa: E402
from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402

N_QUERIES = 20


def pick_queries(spark, sf_dir: str) -> list[int]:
    ids = [
        r[0]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id")
        .orderBy("vec_id")
        .collect()
    ]
    stride = max(1, len(ids) // N_QUERIES)
    return ids[::stride][:N_QUERIES]


def topk_ids(df) -> list[int]:
    return [r["vec_id"] for r in df.collect()]


def main() -> None:
    sf_dir = (
        "/dev/shm/graft_sf1"
        if os.path.isdir("/dev/shm/graft_sf1")
        else "/root/testdata/sf0.1"
    )
    spark = get_spark("ann_recall")
    queries = pick_queries(spark, sf_dir)

    variants: list[tuple[str, dict]] = [
        ("ann_lsh", {}),
        ("ann_lsh_multiprobe", {}),
        ("ann_ivf", {}),
        ("ann_pq cand=50", {"PQ_CAND": 50}),
        ("ann_pq cand=200", {"PQ_CAND": 200}),
        ("ann_pq cand=1000 (default)", {"PQ_CAND": 1000}),
    ]
    builders = {
        "ann_lsh": sim.q_ann_lsh,
        "ann_lsh_multiprobe": sim.q_ann_lsh_multiprobe,
        "ann_ivf": sim.q_ann_ivf,
        "ann_pq": sim.q_ann_pq,
    }
    defaults = {"PQ_CAND": sim.PQ_CAND}
    recalls: dict[str, list[float]] = {v: [] for v, _ in variants}
    for q in queries:
        sim.QUERY_VEC_ID = q
        exact = set(topk_ids(sim.q_cosine_topk(spark, sf_dir)))
        for vname, knobs in variants:
            for k, val in knobs.items():
                setattr(sim, k, val)
            try:
                got = set(topk_ids(builders[vname.split()[0]](spark, sf_dir)))
                recalls[vname].append(len(got & exact) / len(exact))
            finally:
                for k in knobs:
                    setattr(sim, k, defaults[k])
    sim.QUERY_VEC_ID = 0

    print(f"\nANN recall@{sim.TOP_K} over {len(queries)} queries at {sf_dir}")
    print("| variant | recall@10 (mean) | min |")
    print("|---|---|---|")
    for vname, _ in variants:
        r = recalls[vname]
        print(
            f"| {vname} | {sum(r) / len(r):.3f} "
            f"| {min(r):.3f} |"
        )


if __name__ == "__main__":
    main()
