"""A/B the InferFiltersFromGenerate exclusion on named entries.

The r14 closing sweep showed the simhash/exact-dedup family 1.3-1.8x
above the round baseline warm; the only session-global change that
could touch their plans is ``spark.sql.optimizer.excludedRules``
(session.py, r14 change 1). ``excludedRules`` is a runtime SQLConf read
at optimization time, so alternating it within ONE session isolates the
rule's effect from machine condition (README: cross-sweep walls on this
box are not comparable; in-session alternation is).

Usage: python tools/ab_excluded_rules.py [--runs N] sf_dir entry [...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402

RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("sf_dir")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("ab_excluded_rules")
    # restore whatever the session actually had, not a hard-coded RULE
    # (ADVICE r14: if session.py's default list changes, a hard-coded
    # restore would silently leave the session stale)
    prev = spark.conf.get("spark.sql.optimizer.excludedRules", "")
    qs = entry.queries()
    for name in args.names:
        fn = qs[name]
        fn(spark, args.sf_dir).count()  # warm codegen/footers once
        walls: dict[str, list[float]] = {"excluded": [], "stock": []}
        rows: dict[str, int] = {}
        for i in range(args.runs):
            arms = (("excluded", RULE), ("stock", ""))
            if i % 2:  # alternate arm order to cancel first-position bias
                arms = arms[::-1]
            for arm, conf in arms:
                spark.conf.set("spark.sql.optimizer.excludedRules", conf)
                t0 = time.time()
                n = fn(spark, args.sf_dir).count()
                walls[arm].append(round(time.time() - t0, 3))
                rows[arm] = n
        spark.conf.set("spark.sql.optimizer.excludedRules", prev or "")
        parity = "" if rows["excluded"] == rows["stock"] else (
            f" *** ROW MISMATCH excluded={rows['excluded']}"
            f" stock={rows['stock']} ***"
        )
        print(
            f"{name}: rows_excluded={rows['excluded']} "
            f"rows_stock={rows['stock']} excluded={walls['excluded']} "
            f"stock={walls['stock']}{parity}"
        )


if __name__ == "__main__":
    main()
