"""A/B a streaming-side SQLConf on named registry entries.

Alternates the conf value run-by-run within ONE session (cross-sweep
walls on this box are not comparable — README r12-r14), so the delta
isolates the conf from machine condition. Built for the r14 probe of
RocksDB changelog checkpointing
(``spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled``)
on the bounded streaming replays: full-snapshot-per-batch vs
changelog-per-batch is a per-micro-batch commit cost, which is exactly
the scaffold cost these entries pay locally.

Usage:
  python tools/ab_stream_conf.py --conf KEY --on true --off false \
      [--runs N] sf_dir entry [entry ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--on", required=True)
    ap.add_argument("--off", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("sf_dir")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("ab_stream_conf")
    qs = entry.queries()
    for name in args.names:
        fn = qs[name]
        fn(spark, args.sf_dir).count()  # warm codegen/state-store classes
        walls: dict[str, list[float]] = {"on": [], "off": []}
        rows: dict[str, int] = {}
        for i in range(args.runs):
            arms = (("on", args.on), ("off", args.off))
            if i % 2:  # alternate arm order to cancel first-position bias
                arms = arms[::-1]
            for arm, val in arms:
                spark.conf.set(args.conf, val)
                t0 = time.time()
                n = fn(spark, args.sf_dir).count()
                walls[arm].append(round(time.time() - t0, 3))
                rows[arm] = n
        spark.conf.unset(args.conf)
        parity = "" if rows["on"] == rows["off"] else (
            f" *** ROW MISMATCH on={rows['on']} off={rows['off']} ***"
        )
        print(
            f"{name}: rows_on={rows['on']} rows_off={rows['off']} "
            f"on={walls['on']} off={walls['off']}{parity}"
        )


if __name__ == "__main__":
    main()
