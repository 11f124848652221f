"""Break the bounded streaming replays' per-batch cost into components.

VERDICT r14 #4: the ~0.3-0.5 s/batch streaming scaffold is the largest
untouched block of the sweep — profile where the per-batch fixed cost
goes (offset/commit log, state store load, planning) before touching
any lever. Runs each named entry twice (cold, then warm — codegen and
state-store classes loaded), and on the warm run reads the per-batch
StreamingQueryProgress captured by ``jobs.LAST_RUN_PROGRESS`` to print
each micro-batch's ``durationMs`` components plus the state-operator
commit times. The gap between entry wall and sum(triggerExecution) is
driver-side scaffold OUTSIDE the trigger loop (query start/stop,
checkpoint setup, memory-sink read-back).

Usage: python tools/profile_stream_scaffold.py sf_dir entry [entry ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402
from flink_stream_processing_refarch_spark.streaming import jobs  # noqa: E402

DUR_KEYS = (
    "addBatch",
    "walCommit",
    "commitOffsets",
    "latestOffset",
    "getBatch",
    "queryPlanning",
    "triggerExecution",
)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("profile_stream_scaffold")
    qs = entry.queries()
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).count()  # cold warm-up run
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        wall = time.time() - t0
        progs = jobs.LAST_RUN_PROGRESS
        print(f"\n== {name}: rows={n} warm_wall={wall:.3f}s "
              f"batches={len(progs)}")
        total: dict[str, float] = {k: 0.0 for k in DUR_KEYS}
        commit_ms = 0.0
        for p in progs:
            d = p.get("durationMs") or {}
            ops = p.get("stateOperators") or []
            op_commit = sum(o.get("commitTimeMs", 0) or 0 for o in ops)
            commit_ms += op_commit
            for k in DUR_KEYS:
                total[k] += d.get(k, 0) or 0
            comps = " ".join(
                f"{k}={d.get(k, 0)}" for k in DUR_KEYS if k in d
            )
            print(
                f"  batch {p.get('batchId')}: rows={p.get('numInputRows')}"
                f" {comps} stateCommitMs={op_commit}"
            )
        trig = total["triggerExecution"] / 1000.0
        known = sum(total[k] for k in DUR_KEYS[:-1]) / 1000.0
        print(
            f"  totals: triggerExecution={trig:.3f}s"
            f" (addBatch={total['addBatch'] / 1000:.3f}"
            f" walCommit={total['walCommit'] / 1000:.3f}"
            f" commitOffsets={total['commitOffsets'] / 1000:.3f}"
            f" latestOffset={total['latestOffset'] / 1000:.3f}"
            f" getBatch={total['getBatch'] / 1000:.3f}"
            f" queryPlanning={total['queryPlanning'] / 1000:.3f}"
            f" other={trig - known:.3f})"
            f" stateCommit={commit_ms / 1000:.3f}s"
            f" outside_trigger={wall - trig:.3f}s"
        )


if __name__ == "__main__":
    main()
