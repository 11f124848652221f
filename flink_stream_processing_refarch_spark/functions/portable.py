"""Tiny dialect shim for expressions that must evaluate identically in
Spark SQL and DuckDB (the oracle engine).

Only names differ — semantics of the chosen subset are verified identical:
ASCII string comparison, md5 hex output, lambda transforms over arrays,
truncating integer division (Spark ``DIV`` / DuckDB ``//``). Array
subscripts are intentionally NOT shimmed (0- vs 1-based) — use the
helpers, not raw ``arr[i]``.
"""

from __future__ import annotations

TOKENS = {
    "spark": {
        "split": "split",          # split(text, ' ')  (regex arg, ' ' is fine)
        "xform": "transform",
        "filter": "filter",
        "amin": "array_min",
        "alen": "size",
        "adistinct": "array_distinct",
        "idiv": "DIV",
    },
    "duckdb": {
        "split": "string_split",
        "xform": "list_transform",
        "filter": "list_filter",
        "amin": "list_min",
        "alen": "len",
        "adistinct": "list_distinct",
        "idiv": "//",
    },
}


def words_expr(text: str, dialect: str) -> str:
    return f"{TOKENS[dialect]['split']}({text}, ' ')"


def arr_len(arr: str, dialect: str) -> str:
    return f"{TOKENS[dialect]['alen']}({arr})"


def arr_transform(arr: str, lam: str, dialect: str) -> str:
    """lam is e.g. ``x -> length(x)`` — identical lambda syntax in both."""
    return f"{TOKENS[dialect]['xform']}({arr}, {lam})"


def arr_filter(arr: str, lam: str, dialect: str) -> str:
    return f"{TOKENS[dialect]['filter']}({arr}, {lam})"


def arr_min(arr: str, dialect: str) -> str:
    return f"{TOKENS[dialect]['amin']}({arr})"


def arr_sum_bigint(arr: str, dialect: str) -> str:
    """Exact integer sum of a BIGINT array (order-independent)."""
    if dialect == "spark":
        return f"aggregate({arr}, CAST(0 AS BIGINT), (a, x) -> a + x)"
    return f"CAST(list_sum({arr}) AS BIGINT)"


def md5_int60(x: str, dialect: str) -> str:
    """First 60 bits of md5(x) as a BIGINT — the portable deterministic
    hash used by minhash/simhash parity paths (production would use
    xxhash64; md5 is the one 64-bit-safe hash both engines share)."""
    if dialect == "spark":
        return f"CAST(conv(substr(md5({x}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"
