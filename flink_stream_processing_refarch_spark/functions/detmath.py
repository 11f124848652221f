"""Cross-engine DETERMINISTIC natural log as a staged SQL expression
tree — the round-9 fix for the repo's one red fuzz gate.

Why: ``ln()`` is the only non-correctly-rounded operation the
ln-quantized selection expressions (``operators/selection.py``) used to
lean on. IEEE-754 ``+ - * /``, comparisons, and decimal-literal parsing
are correctly rounded (hence bit-identical) in both the JVM (Spark) and
C++ libm/fast_float (DuckDB), but ``ln`` itself is library-dependent
(JVM ``Math.log`` is allowed 1 ulp error vs whatever libm DuckDB links).
When ``p*ln(p/q)`` lands within an ulp of a ``floor(x*1e9 + 0.5)``
boundary, the quantized BIGINT differs between engines — the r08
judge-minimized counterexample is ``(c_sb, n_s, c_b, n_tot) =
(424080447, 111, 29683, 46597)``: Spark ``...320`` vs DuckDB ``...318``.

Fix: never call the engine's ``ln``. Build ln(x) from ONLY correctly
rounded operations, as the SAME expression text for both engines, so the
result is bit-identical BY CONSTRUCTION (no "both libms agree" residual
assumption):

  1. + 2. exact range reduction to m = x / 2^e in [1, 2) via a binary
     cascade: pre-scale sub-1 inputs by 2^64 (exact), then for
     k = 6..0 divide out 2^(2^k) when the running value exceeds it —
     comparisons are exact and dividing a double by a power of two is
     EXACT (same mantissa, shifted exponent); e accumulates the bits;
  3. secondary reduction: m >= 1.5 -> m/2 (exact) and e += 1, giving
     m2 in [0.75, 1.5) so t = (m2-1)/(m2+1) in [-1/7, 1/5];
  4. atanh series  ln(m2) = 2 * sum t^(2k+1)/(2k+1), Horner over
     u = t*t, 14 terms (truncation < 1e-20 at |t| <= 0.2);
  5. recombine  ln(x) ~= e * LN2 + 2*S  with LN2 the shortest-roundtrip
     double literal of ln 2.

Every constant is emitted in E-notation (``0.2e0``) because a bare
decimal literal types as DECIMAL in BOTH Spark and DuckDB and the
DECIMAL->DOUBLE cast path is engine-internal; an E-notation literal is
DOUBLE at parse time in both, via correctly rounded strtod (Java
``Double.parseDouble`` / DuckDB fast_float).

Accuracy (vs true ln): |e|<=64 exponent-term rounding ~5e-16 absolute
plus ~1e-16 series rounding — so quantized results may differ from
infinitely-precise rounding by at most 1 unit in adversarial boundary
cases, but the two engines ALWAYS agree, which is the contract the
oracle hash-compare and the fuzz gate (tests/test_properties.py) check.

Expression-size discipline: a single flat string would blow up
exponentially (stage k references stage k-1 several times), so the ln is
emitted as a list of (column, expr) STAGES where each expr references
prior stages by short column name. Spark applies them as chained
``withColumn`` projections (Catalyst's CollapseProject keeps multiply-
referenced non-trivial aliases in separate projects, so the tree stays
linear); the DuckDB oracle nests them as ``SELECT *, expr AS name``
subqueries. Domain: x in [2^-64, 2^64), x > 0 — callers' arguments are
ratios of add-smoothed exact integer counts, always inside.

Domain at 100 TB (why [2^-64, 2^64) is ample, not just locally true):
each caller's argument has one factor bounded by <= 1 via an operator
invariant — KL: (c_sb+1)/(n_s+B) <= ~1 since a source's bucket count
never exceeds the source total; DSIR lambda: (tc+1)/(t_tot+B) <= ~1
likewise — leaving the other factor bounded by the smoothed corpus
total (n_tot+B, s_tot+B, c1+v <= total bigrams + vocab). A 100 TB
corpus is ~1e13-1e14 tokens, so arguments live in ~[1e-14, 1e14],
five orders inside both domain edges (2^-64 ~ 5.4e-20, 2^64 ~ 1.8e19);
the domain runs out only past ~1e19 tokens — a million times today's
largest corpora. Outside the domain the result is still bit-identical
across engines (same expression tree), only no longer a good ln
approximation. Pinned by
tests/test_properties.py::test_ln_det_at_100tb_scale_counts.

The reference engine has no counterpart (its two queries are
count/sum/avg only, flink-taxi-stream-processor/.../ProcessTaxiStream.java:96-136);
this backs the LLM-pipeline selection operators (DSIR / KL drift /
bigram-LM NLL).
"""

from __future__ import annotations

#: shortest-roundtrip repr of the double nearest ln(2); parses to the
#: identical bit pattern in both engines (correctly rounded strtod).
LN2 = "0.6931471805599453e0"

_EMIN, _EMAX = -64, 63  # supported binary exponent range


def _dlit(v: float) -> str:
    """A double literal that parses to exactly ``v`` in BOTH dialects:
    shortest-roundtrip repr, forced to E-notation so it types as DOUBLE
    (not DECIMAL) at parse time."""
    s = repr(float(v))
    if "e" not in s and "E" not in s:
        s += "e0"
    return s


def ln_det_stages(x: str, prefix: str) -> list[tuple[str, str]]:
    """Staged deterministic ln of column/expr ``x`` (referenced three
    times — pass a short column name, staging the argument first).
    Returns [(col, expr), ...]; the final column is ``{prefix}_ln``
    (DOUBLE).

    Range reduction is a 7-step binary cascade instead of one huge
    comparison ladder: pre-scale sub-1 inputs by 2^64 (exact), then for
    k = 6..0 halve out 2^(2^k) when the running value still exceeds it
    (one exact comparison + one exact power-of-two division per step),
    accumulating the exponent. Every stage is a tiny expression, so
    both engines' plans stay linear and codegen-friendly."""
    p = prefix
    stages: list[tuple[str, str]] = [
        # pre-scale: y7 in [1, 2^64) for any x in [2^-64, 2^64)
        (
            f"{p}_y7",
            f"CASE WHEN {x} < 1.0e0 THEN {x} * {_dlit(2.0 ** -_EMIN)}"
            f" ELSE {x} END",
        ),
        (f"{p}_e7", f"CASE WHEN {x} < 1.0e0 THEN {_EMIN} ELSE 0 END"),
    ]
    for k in range(6, -1, -1):
        yk1, ek1 = f"{p}_y{k + 1}", f"{p}_e{k + 1}"
        lit = _dlit(2.0 ** (2 ** k))
        stages += [
            (
                f"{p}_y{k}",
                f"CASE WHEN {yk1} >= {lit} THEN {yk1} / {lit}"
                f" ELSE {yk1} END",
            ),
            (
                f"{p}_e{k}",
                f"{ek1} + CASE WHEN {yk1} >= {lit}"
                f" THEN {2 ** k} ELSE 0 END",
            ),
        ]
    m, e = f"{p}_y0", f"{p}_e0"  # m in [1, 2), e = floor(log2 x)
    m2, ee, t = f"{p}_m2", f"{p}_ee", f"{p}_t"
    # Horner over u = t*t: S = t * (1 + u*(1/3 + u*(1/5 + ...)))
    u = f"({t} * {t})"
    terms = 14
    inner = _dlit(1.0 / (2 * terms - 1))
    for k in range(terms - 2, 0, -1):
        inner = f"{_dlit(1.0 / (2 * k + 1))} + {u} * ({inner})"
    series = f"{t} * (1.0e0 + {u} * ({inner}))"
    return [
        *stages,
        (m2, f"CASE WHEN {m} >= 1.5e0 THEN {m} * 0.5e0 ELSE {m} END"),
        (ee, f"{e} + CASE WHEN {m} >= 1.5e0 THEN 1 ELSE 0 END"),
        (t, f"({m2} - 1.0e0) / ({m2} + 1.0e0)"),
        (
            f"{prefix}_ln",
            f"CAST({ee} AS DOUBLE) * {LN2} + 2.0e0 * ({series})",
        ),
    ]


def _batches(stages: list[tuple[str, str]]) -> list[list[tuple[str, str]]]:
    """Greedily group consecutive stages into projection batches: a
    stage joins the current batch unless its expr references a column
    DEFINED in that batch (the cascade's (y_k, e_k) pairs only read
    level k+1, so they batch together — halves the projection chain,
    which is pure plan-analysis overhead)."""
    out: list[list[tuple[str, str]]] = []
    cur: list[tuple[str, str]] = []
    for name, expr in stages:
        if any(n in expr for n, _ in cur):
            out.append(cur)
            cur = []
        cur.append((name, expr))
    if cur:
        out.append(cur)
    return out


def apply_stages(df, stages: list[tuple[str, str]]):
    """Spark side: chain the stages as (batched) projections."""
    from pyspark.sql import functions as F

    for batch in _batches(stages):
        df = df.withColumns({n: F.expr(e) for n, e in batch})
    return df


def stages_sql(base_select: str, stages: list[tuple[str, str]]) -> str:
    """Oracle side: nest the stages as ``SELECT *, expr AS name``
    subqueries over ``base_select`` (projection boundaries keep the
    expression tree linear in DuckDB exactly as withColumns does in
    Spark)."""
    q = base_select
    for batch in _batches(stages):
        cols = ", ".join(f"{e} AS {n}" for n, e in batch)
        q = f"SELECT *, {cols} FROM ({q})"
    return q
