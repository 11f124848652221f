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


#: (relpath, token) -> reason, for the SOURCE scan below. Empty.
ALLOW_SOURCES: dict[tuple[str, str], str] = {}

_PKG = "/root/repo/flink_stream_processing_refarch_spark"


def audit_sources(pkg_root: str = _PKG) -> dict[str, list[str]]:
    """relpath -> forbidden tokens in PLAN-BUILDER sources (r10, closing
    an r09 review gap): the oracle scan above only covers text shared
    with ``oracle_sql()``; a Spark-side-only expression — a forbidden
    function inside an ``F.expr``/``selectExpr`` STRING, or a direct
    ``pyspark.sql.functions`` call like ``F.log`` — would reintroduce
    the cross-engine ulp exposure without tripping it. This walks every
    package module's AST and flags (a) forbidden tokens inside string
    constants (docstrings excluded — the AST, unlike a raw grep, knows
    which strings are documentation) and (b) ``F.<forbidden>(...)``
    attribute calls. Python-level ``math.log`` etc. are deliberately NOT
    flagged: a driver-side constant is computed once and embedded
    identically in both engines' plans — no cross-engine divergence."""
    import ast
    import glob
    import os

    hits: dict[str, set[str]] = {}
    for path in sorted(glob.glob(f"{pkg_root}/**/*.py", recursive=True)):
        rel = os.path.relpath(path, os.path.dirname(pkg_root))
        tree = ast.parse(open(path).read())
        docstrings = set()
        # every local name bound to pyspark.sql.functions — NOT just
        # the conventional `F` (r10 review: an `as sf` alias or a
        # fully-qualified call would have bypassed the tripwire)
        fn_aliases = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    if a.name == "pyspark.sql.functions":
                        fn_aliases.add(a.asname or "pyspark")
            elif isinstance(node, ast.ImportFrom):
                if node.module == "pyspark.sql":
                    for a in node.names:
                        if a.name == "functions":
                            fn_aliases.add(a.asname or "functions")
                elif node.module == "pyspark.sql.functions":
                    for a in node.names:
                        if a.name.lower() in FORBIDDEN:
                            fn_aliases.add("__direct__")
            if isinstance(
                node, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef,
                       ast.ClassDef)
            ):
                body = node.body
                if (
                    body
                    and isinstance(body[0], ast.Expr)
                    and isinstance(body[0].value, ast.Constant)
                    and isinstance(body[0].value.value, str)
                ):
                    docstrings.add(id(body[0].value))

        def _is_functions_module(expr) -> bool:
            # Name bound to the functions module, or any attribute
            # chain ending in `.functions` (pyspark.sql.functions.log)
            if isinstance(expr, ast.Name):
                return expr.id in fn_aliases or expr.id == "F"
            if isinstance(expr, ast.Attribute):
                return expr.attr == "functions"
            return False

        found: set[str] = set()
        if "__direct__" in fn_aliases:
            found.add("from-import of forbidden function")
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Constant)
                and isinstance(node.value, str)
                and id(node) not in docstrings
            ):
                found |= {m.group(1).lower() for m in _PAT.finditer(node.value)}
            elif (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr.lower() in FORBIDDEN
                and _is_functions_module(node.func.value)
            ):
                found.add(f"F.{node.func.attr}")
        if found:
            hits[rel] = sorted(found)
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
    src_hits = audit_sources()
    src_unexpected = {
        rel: [t for t in toks if (rel, t) not in ALLOW_SOURCES]
        for rel, toks in src_hits.items()
    }
    src_unexpected = {r: t for r, t in src_unexpected.items() if t}
    src_stale = [
        k for k in ALLOW_SOURCES
        if k[1] not in src_hits.get(k[0], [])
    ]
    for rel, toks in sorted(src_hits.items()):
        for t in toks:
            tag = "ALLOWED" if (rel, t) in ALLOW_SOURCES else "FORBIDDEN"
            why = (
                f" ({ALLOW_SOURCES[(rel, t)]})"
                if (rel, t) in ALLOW_SOURCES else ""
            )
            print(f"{tag} source {rel}: {t}{why}")
    if src_stale:
        print(f"STALE SOURCE ALLOWLIST (no hits — remove): {src_stale}")
    bad = unexpected or stale_allow or src_unexpected or src_stale
    print(
        "RESULT:",
        "FAIL" if bad else "PASS",
        f"({len(unexpected)} unexpected oracle, {len(hits)} oracle hits,"
        f" {len(stale_allow)} stale allow rows;"
        f" {len(src_unexpected)} unexpected source files,"
        f" {len(src_hits)} source hits, {len(src_stale)} stale source rows)",
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
