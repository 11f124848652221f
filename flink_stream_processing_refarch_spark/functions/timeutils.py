"""Time helpers shared by the taxi queries and their oracles.

Reference semantics being matched:
  - trip duration in whole standard minutes: Java's
    ``Duration.getStandardMinutes`` = millis / 60000 with integer division
    truncating toward zero, negatives allowed (ProcessTaxiStream.java:112).
    Spark's ``DIV`` and DuckDB's ``//`` both truncate toward zero
    (verified empirically), so the same formula serves both engines.
  - result timestamp = Flink window ``maxTimestamp()`` = window end - 1 ms
    (ProcessTaxiStream.java:104,134).
  - 10-minute tumbling windows are epoch-aligned (Flink ``timeWindow`` and
    Spark ``window()`` agree); on epoch-milliseconds this is plain modular
    arithmetic, identical in both engines.
"""

from __future__ import annotations

WINDOW_MS = 10 * 60 * 1000  # ProcessTaxiStream.java:99,121 — 10-minute tumble


def duration_min_sql(dropoff_ms: str, pickup_ms: str, dialect: str) -> str:
    idiv = {"spark": "DIV", "duckdb": "//"}[dialect]
    return f"(({dropoff_ms} - {pickup_ms}) {idiv} 60000)"


def window_end_ms_sql(event_ms: str, window_ms: int = WINDOW_MS) -> str:
    """Exclusive end of the epoch-aligned tumbling window containing event_ms."""
    return f"({event_ms} - {event_ms} % {window_ms} + {window_ms})"
