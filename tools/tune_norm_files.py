"""Measure normalized-events file-count tradeoff (tuning harness).

Runs the headline taxi queries plus the r04-regressed cheap event
queries at one SPARK_GRAFT_NORM_EVENTS_FILES setting and prints a JSON
line of median walls. Run once per candidate in a fresh process:

    for n in 2 4 8 16 32; do \
        SPARK_GRAFT_NORM_EVENTS_FILES=$n python tools/tune_norm_files.py; done
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q1_pickup_count",
    "q2_trip_duration",
    "time_rollup",
    "sliding_window_counts",
    "asof_join",
    "session_windows",
    "dup_provenance",
    "running_totals",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tune_norm_files")
    qs = entry.queries()
    # warm: materialization + codegen per query
    for name in QUERIES:
        qs[name](spark, sf_dir).count()
    out = {}
    for name in QUERIES:
        walls = []
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            walls.append(time.time() - t0)
        out[name] = round(statistics.median(walls), 3)
    out["_nfiles"] = os.environ.get("SPARK_GRAFT_NORM_EVENTS_FILES", "auto")
    out["_headline"] = round(out["q1_pickup_count"] + out["q2_trip_duration"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
