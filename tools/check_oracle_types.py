"""Static type audit of every oracle SQL against the HUGEINT trap.

The driver canonicalizes results through pandas before hashing; DuckDB
widens sum(BIGINT/INTEGER) to HUGEINT (INT128), which pandas renders as
float64/object while Spark emits int64 — identical values, different
hash. ``DESCRIBE SELECT ...`` binds the query without executing it, so
this audit is near-instant and runs over EVERY oracle (including ones
the driver has not reached yet).

Usage: python tools/check_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from flink_stream_processing_refarch_spark.schemas import TESTDATA_TABLES  # noqa: E402

# Types pandas cannot round-trip as int64 / clean scalars.
BAD_TYPES = ("HUGEINT", "INT128", "UHUGEINT")
BAD_PREFIXES = ("STRUCT", "MAP")  # unhashable by the driver canonicalizer
BAD_EXACT = ("INTERVAL",)


def hostile_columns(desc: list[tuple]) -> list[tuple[str, str]]:
    """(col, type) pairs the driver's pandas canonicalizer cannot hash
    identically to Spark's output — the shared predicate for both this
    standalone audit and the mandatory gate inside check_oracle.py."""
    return [
        (c, ty)
        for c, ty, *_ in desc
        if any(b in ty for b in BAD_TYPES)
        or any(ty.startswith(p) for p in BAD_PREFIXES)
        or ty in BAD_EXACT
        or ty.endswith("[]")  # LIST -> python list, unhashable
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name, sql in entry.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: describe error: {e}")
            failures += 1
            continue
        bad = hostile_columns(desc)
        if bad:
            print(f"FAIL {name}: driver-hostile oracle column types: {bad}")
            failures += 1
        else:
            print(f"PASS {name}")
    print("RESULT:", "FAIL" if failures else "PASS", f"({failures} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
