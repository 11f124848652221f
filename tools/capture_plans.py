"""Capture .explain("formatted") for registry entries into plans/<round>.

Usage: python tools/capture_plans.py <suffix> entry [entry ...]
       (suffix = "before" or "after"; round dir defaults to r15,
       override with $SPARK_GRAFT_PLANS_ROUND)

Streaming / protocol entries whose callable RUNS work are captured as
the final returned frame's plan (their cost story is job counts, told
in OPTIMIZATION_r14.md); plain batch entries capture the full lazy
plan the driver executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("capture_plans")
    if os.environ.get("CAPTURE_NO_EXCLUDED_RULES"):
        # "before" captures: restore the stock optimizer rule set so the
        # plan files show the shape the engine had prior to this round
        spark.conf.set("spark.sql.optimizer.excludedRules", "")
    qs = entry.queries()
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = qs[name](spark, SF_DIR)
        text = df._jdf.queryExecution().explainString(jvm_mode)
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")


if __name__ == "__main__":
    main()
