"""DuckDB oracle SQL for the taxi queries.

Each function returns ANSI SQL runnable by DuckDB against the
pre-registered testdata views; semantics mirror the DataFrame plans in
``plans/taxi.py`` exactly (shared expression generators in
``functions/geo.py`` / ``functions/timeutils.py`` / ``sources/trips.py``).
"""

from __future__ import annotations

from ..functions import geo
from ..functions.timeutils import duration_min_sql, window_end_ms_sql
from ..sources.trips import clean_trip_filter_sql, trips_cte_sql


def _geohash_layers(inner: str, lat: str, lon: str, precision: int,
                    keep: list[str], out: str = "location") -> str:
    """Wrap ``inner`` SQL in layers computing a geohash of (lat, lon)."""
    lab, lob = geo.geohash_scale_sql(lat, lon, precision)
    inter = geo.geohash_interleave_sql("__lab", "__lob", precision)
    chars = geo.geohash_chars_sql("__it", precision)
    keep_sql = ", ".join(keep)
    return (
        f"SELECT {keep_sql}, {chars} AS {out} FROM ("
        f"SELECT {keep_sql}, {inter} AS __it FROM ("
        f"SELECT {keep_sql}, {lab} AS __lab, {lob} AS __lob FROM ({inner})"
        f"))"
    )


def _clean_trips_sql() -> str:
    return (
        f"WITH trips AS ({trips_cte_sql()}) "
        f"SELECT * FROM trips WHERE {clean_trip_filter_sql()}"
    )


def q1_sql() -> str:
    wend = window_end_ms_sql("dropoff_ms")
    located = _geohash_layers(
        _clean_trips_sql(), "pickup_lat", "pickup_lon", 6,
        keep=["trip_id", "dropoff_ms"],
    )
    return (
        f"SELECT location, count(*) AS pickup_count,"
        f' {wend} - 1 AS "timestamp"'
        f" FROM ({located})"
        f" GROUP BY location, {wend}"
        f" HAVING count(*) >= 2"
    )


def trending_cells_sql() -> str:
    from ..plans.taxi import TREND_TOP

    wend = window_end_ms_sql("dropoff_ms")
    located = _geohash_layers(
        _clean_trips_sql(), "pickup_lat", "pickup_lon", 6,
        keep=["trip_id", "dropoff_ms"],
    )
    return (
        f'SELECT "timestamp", location, pickup_count, rank FROM ('
        f"SELECT location, count(*) AS pickup_count,"
        f' {wend} - 1 AS "timestamp",'
        f" CAST(row_number() OVER (PARTITION BY {wend}"
        f" ORDER BY count(*) DESC, location ASC) AS INT) AS rank"
        f" FROM ({located})"
        f" GROUP BY location, {wend}"
        f") WHERE rank <= {TREND_TOP}"
    )


def _airport_trips_sql() -> str:
    jfk = geo.near_jfk_sql("dropoff_lat", "dropoff_lon")
    lga = geo.near_lga_sql("dropoff_lat", "dropoff_lon")
    dur = duration_min_sql("dropoff_ms", "pickup_ms", "duckdb")
    classified = (
        f"SELECT trip_id, pickup_lat, pickup_lon, dropoff_ms,"
        f" CASE WHEN {jfk} THEN 'JFK' WHEN {lga} THEN 'LGA' END AS airport_code,"
        f" {dur} AS duration_min"
        f" FROM ({_clean_trips_sql()})"
    )
    filtered = f"SELECT * FROM ({classified}) WHERE airport_code IS NOT NULL"
    return _geohash_layers(
        filtered, "pickup_lat", "pickup_lon", 6,
        keep=["trip_id", "airport_code", "duration_min", "dropoff_ms"],
    )


def q2_sql() -> str:
    wend = window_end_ms_sql("dropoff_ms")
    return (
        f"SELECT location, airport_code,"
        f" CAST(sum(duration_min) AS BIGINT) AS sum_trip_duration,"
        f" CAST(sum(duration_min) AS DOUBLE) / count(*) AS avg_trip_duration,"
        f' {wend} - 1 AS "timestamp"'
        f" FROM ({_airport_trips_sql()})"
        f" GROUP BY location, airport_code, {wend}"
        f" HAVING count(*) > 1"
    )


def trips_clean_sql() -> str:
    return (
        "SELECT trip_id, location, dropoff_ms, total_amount FROM ("
        + _geohash_layers(
            _clean_trips_sql(), "pickup_lat", "pickup_lon", 6,
            keep=["trip_id", "dropoff_ms", "total_amount"],
        )
        + ")"
    )


def _max_clean_dropoff_sql() -> str:
    return f"SELECT max(dropoff_ms) FROM ({_clean_trips_sql()})"


def q1_streaming_sql() -> str:
    """Streaming (availableNow, watermark delay 0) emission rule: a window
    emits iff final watermark >= window end, i.e. window_end <= max event
    time — the batch answer minus the trailing unflushed window."""
    return (
        f'SELECT * FROM ({q1_sql()}) WHERE "timestamp" <'
        f" ({_max_clean_dropoff_sql()})"
    )


def q2_streaming_sql() -> str:
    return (
        f'SELECT * FROM ({q2_sql()}) WHERE "timestamp" <'
        f" ({_max_clean_dropoff_sql()})"
    )


def trending_cells_streaming_sql() -> str:
    """Streaming leaderboard oracle: the batch trending query restricted
    to watermark-finalized windows (same emission rule as q1_streaming).
    The per-window rank is unaffected by dropping whole trailing
    windows, so the restriction composes outside the rank."""
    return (
        f'SELECT * FROM ({trending_cells_sql()}) WHERE "timestamp" <'
        f" ({_max_clean_dropoff_sql()})"
    )


def airport_trips_oracle_sql() -> str:
    return (
        "SELECT trip_id, location, airport_code, duration_min FROM ("
        + _airport_trips_sql()
        + ")"
    )
