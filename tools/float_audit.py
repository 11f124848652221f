"""Cross-engine float-determinism tripwire (r09).

The repo's oracle hash-compare only works if every hashed/ranked value
is built from operations that are CORRECTLY ROUNDED — hence
bit-identical — in both Spark (JVM) and DuckDB (libm): ``+ - * /``,
comparisons, casts, strtod literal parsing, and ``sqrt`` (IEEE-754
requires correct rounding for sqrt; JVM Math.sqrt and libm/hardware
sqrt agree bit-for-bit). Transcendentals are NOT in that set — the r08
fuzz gate caught JVM ``Math.log`` and DuckDB's ``ln`` differing by one
ulp exactly on a ``floor(x*1e9 + 0.5)`` quantization boundary — so any
``ln``-class call in an oracle-paired expression must go through the
deterministic expression tree of ``functions/detmath.py`` instead.

This audit scans every ``oracle_sql()`` string (the exact text whose
results the driver hash-compares; the Spark plans share the same
expression text by the repo's shared-dialect discipline) for raw
transcendental function calls and fails on any hit outside the explicit
allowlist. It is the standing enforcement of SURVEY §5.6: a future
operator that inlines ``ln(...)``/``exp(...)`` into a new oracle fails
CI here before it can fail a driver hash at some unlucky boundary.

Run: python tools/float_audit.py     (exit 1 on unexpected hits)
Wrapped by tests/test_tools.py so the pytest suite enforces it.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

#: functions that are NOT correctly rounded (engine/libm-dependent).
#: sqrt is deliberately absent: IEEE-754 requires it correctly rounded,
#: so it is as deterministic as division. power/pow are flagged even
#: for integer exponents — use multiplication or detmath instead.
FORBIDDEN = (
    "ln", "log", "log2", "log10", "log1p", "exp", "expm1",
    "pow", "power", "sin", "cos", "tan", "asin", "acos", "atan",
    "atan2", "sinh", "cosh", "tanh", "cbrt",
)

#: entry -> reason. EMPTY since r10: tfidf_top_terms — the last raw
#: transcendental in any oracle — migrated to the detmath staged ln
#: (operators/corpus.py::tfidf_micro_stages), closing VERDICT r09 #1.
ALLOW: dict[str, str] = {}

_PAT = re.compile(
    r"(?<![A-Za-z0-9_])(" + "|".join(FORBIDDEN) + r")\s*\(",
    re.IGNORECASE,
)


def audit() -> dict[str, list[str]]:
    """entry name -> forbidden function tokens found in its oracle."""
    import __spark_entry__ as entry

    hits: dict[str, list[str]] = {}
    for name, sql in entry.oracle_sql().items():
        found = sorted({m.group(1).lower() for m in _PAT.finditer(sql)})
        if found:
            hits[name] = found
    return hits


def main() -> int:
    hits = audit()
    unexpected = {n: f for n, f in hits.items() if n not in ALLOW}
    stale_allow = [n for n in ALLOW if n not in hits]
    for n, f in sorted(hits.items()):
        tag = "ALLOWED" if n in ALLOW else "FORBIDDEN"
        why = f" ({ALLOW[n]})" if n in ALLOW else ""
        print(f"{tag} {n}: {', '.join(f)}{why}")
    if stale_allow:
        print(f"STALE ALLOWLIST (no hits — remove): {stale_allow}")
    print(
        "RESULT:",
        "FAIL" if unexpected or stale_allow else "PASS",
        f"({len(unexpected)} unexpected, {len(hits)} total hits,"
        f" {len(stale_allow)} stale allowlist rows)",
    )
    return 1 if unexpected or stale_allow else 0


if __name__ == "__main__":
    raise SystemExit(main())
