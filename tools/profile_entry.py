"""Per-entry profiling harness for the r14 optimization round.

For each named registry entry: run it ``--runs`` times (median wall, like
bench.py), and report the number of Spark jobs the run scheduled — the
protocol entries (corpus roundtrips, iterative CC/k-means, bounded
streams) spend their wall in fixed per-job scheduling + action overhead,
so job count is the first-order cost model locally (guide §1: decide
WHERE the time goes before touching anything).

Job count comes from the status tracker's job-id high-water mark
(job ids are allocated by one AtomicInteger in the DAGScheduler, so
max(id)+1 before/after brackets every job this entry scheduled;
nothing else runs concurrently in this harness).

Usage: python tools/profile_entry.py [sf_dir] entry [entry ...]
       python tools/profile_entry.py --runs 3 /root/testdata/sf0.1 corpus_time_travel
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402


def _max_job_id(sc) -> int:
    ids = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
    return max(ids) if ids else -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("sf_dir")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile")
    sc = spark.sparkContext
    qs = entry.queries()
    for name in args.names:
        fn = qs[name]
        walls, builds, jobs, rows = [], [], [], None
        for _ in range(args.runs):
            j0 = _max_job_id(sc)
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            t1 = time.time()
            rows = df.count()
            t2 = time.time()
            walls.append(t2 - t0)
            builds.append(t1 - t0)
            jobs.append(_max_job_id(sc) - j0)
        print(
            f"{name}: rows={rows} wall median {statistics.median(walls):.3f}s "
            f"of {[round(w, 3) for w in walls]}; build {statistics.median(builds):.3f}s "
            f"of {[round(b, 3) for b in builds]}; jobs {jobs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
