"""Geo functions: geohash encode + the reference's region predicates.

Reference parity targets (all in /root/reference/):
  - geohash encode at precisions 4/6/7 — the reference uses
    ch.hsr:geohash:1.3.0 (flink-taxi-stream-processor/pom.xml:124-128),
    called from ProcessTaxiStream.java:97,111 (precision 6) and via the
    region cell constants in utils/GeoUtils.java:28-34 (precisions 4/6/7).
  - Region membership (GeoUtils.java:36-51): NYC = the 8 geohash-4
    neighbors of ``dr72`` (the center cell itself is a HOLE — the library's
    getAdjacent() returns neighbors only); JFK = the 8 geohash-6 neighbors
    of ``dr5x0z`` (same hole semantics); LGA = geohash-6 cells
    {dr5ryy, dr5rzn} plus the 8 geohash-7 neighbors of ``dr5rzjx``.
  - Coordinate validity (GeoUtils.java:53-56): |lat| <= 90 and |lon| <= 180
    for both endpoints.

Spark-first design
------------------
Geohash cells are axis-aligned rectangles, so every region predicate is
expressed as plain lat/lon range predicates ("3x3 outer box AND NOT center
box") — pure built-in comparisons that Catalyst can push into the parquet
scan. No UDF, no string isin over computed geohashes on the filter path.

The geohash *encode* (needed only as a grouping/output column) is generated
as a pure SQL/Column bitwise expression: scale lat/lon to integer bit
ranges, interleave bits (lon first), then map 5-bit groups through the
base-32 alphabet. This keeps encoding inside whole-stage codegen — at 100 TB
there is no Python in the hot path. The same generated expression text runs
under DuckDB for oracle checks (operators `<<`, `>>`, `&`, `floor`,
`substr`, `concat` behave identically — verified empirically; note
CAST(double AS BIGINT) is avoided because DuckDB rounds while Spark
truncates).

A tiny pure-Python geohash (standard public-domain bisection algorithm) is
included for constants, goldens, and tests only — never on the data path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BASE32_INDEX = {c: i for i, c in enumerate(BASE32)}


# ---------------------------------------------------------------------------
# Pure-Python geohash (constants & tests only)
# ---------------------------------------------------------------------------

def geohash_encode_py(lat: float, lon: float, precision: int) -> str:
    """Standard geohash base-32 encode (bisection algorithm)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True  # even bit index -> longitude
    while len(bits) < precision * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        chunk = bits[i * 5 : i * 5 + 5]
        val = 0
        for b in chunk:
            val = (val << 1) | b
        out.append(BASE32[val])
    return "".join(out)


def geohash_bbox_py(gh: str) -> tuple[float, float, float, float]:
    """Decode a geohash cell to (lat_min, lat_max, lon_min, lon_max)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in gh:
        val = _BASE32_INDEX[c]
        for shift in range(4, -1, -1):
            bit = (val >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return (lat_lo, lat_hi, lon_lo, lon_hi)


def geohash_neighbors_py(gh: str) -> set[str]:
    """The 8 adjacent cells of ``gh`` (center NOT included) — same set the
    reference's ``GeoHash.getAdjacent()`` produces (GeoUtils.java:36-51)."""
    lat_lo, lat_hi, lon_lo, lon_hi = geohash_bbox_py(gh)
    clat = (lat_lo + lat_hi) / 2
    clon = (lon_lo + lon_hi) / 2
    dlat = lat_hi - lat_lo
    dlon = lon_hi - lon_lo
    out = set()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            out.add(geohash_encode_py(clat + dy * dlat, clon + dx * dlon, len(gh)))
    return out


def geohash_center_py(gh: str) -> tuple[float, float]:
    lat_lo, lat_hi, lon_lo, lon_hi = geohash_bbox_py(gh)
    return ((lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2)


# ---------------------------------------------------------------------------
# Region constants (derived from the reference's cell lists, GeoUtils.java:28-34)
# ---------------------------------------------------------------------------

NYC_CENTER_CELL = "dr72"      # GeoUtils.java:28 — hole
JFK_CENTER_CELL = "dr5x0z"    # GeoUtils.java:29 — hole
LGA_G6_CELLS = ("dr5ryy", "dr5rzn")  # GeoUtils.java:31-32
LGA_CENTER_CELL = "dr5rzjx"   # GeoUtils.java:30,33-34 — hole (g7 ring)

NYC_CELLS = frozenset(geohash_neighbors_py(NYC_CENTER_CELL))
JFK_CELLS = frozenset(geohash_neighbors_py(JFK_CENTER_CELL))
LGA_G7_CELLS = frozenset(geohash_neighbors_py(LGA_CENTER_CELL))


def _ring_boxes(center_cell: str) -> tuple[tuple, tuple]:
    """(outer 3x3 bbox, inner center bbox) for a neighbor-ring region."""
    lat_lo, lat_hi, lon_lo, lon_hi = geohash_bbox_py(center_cell)
    dlat = lat_hi - lat_lo
    dlon = lon_hi - lon_lo
    outer = (lat_lo - dlat, lat_hi + dlat, lon_lo - dlon, lon_hi + dlon)
    inner = (lat_lo, lat_hi, lon_lo, lon_hi)
    return outer, inner


NYC_OUTER_BOX, NYC_INNER_BOX = _ring_boxes(NYC_CENTER_CELL)
JFK_OUTER_BOX, JFK_INNER_BOX = _ring_boxes(JFK_CENTER_CELL)
LGA_OUTER_BOX, LGA_INNER_BOX = _ring_boxes(LGA_CENTER_CELL)
LGA_BOXES = tuple(geohash_bbox_py(c) for c in LGA_G6_CELLS)


# ---------------------------------------------------------------------------
# SQL expression generators (dialect-shared: Spark SQL and DuckDB)
# ---------------------------------------------------------------------------

def dlit(x: float) -> str:
    """A float literal that is DOUBLE in both Spark SQL and DuckDB.

    Bare decimal literals are DECIMAL in DuckDB (vs DOUBLE in Spark), which
    silently changes arithmetic; an explicit cast keeps the two engines
    bit-identical.
    """
    return f"CAST({x!r} AS DOUBLE)"


def _in_box_sql(lat: str, lon: str, box: tuple[float, float, float, float]) -> str:
    """Half-open cell membership: [lat_min, lat_max) x [lon_min, lon_max).

    Half-open intervals match geohash bisection: a point on a cell's lower
    edge belongs to that cell, the upper edge belongs to the next cell.
    """
    lat_lo, lat_hi, lon_lo, lon_hi = box
    return (
        f"({lat} >= {dlit(lat_lo)} AND {lat} < {dlit(lat_hi)}"
        f" AND {lon} >= {dlit(lon_lo)} AND {lon} < {dlit(lon_hi)})"
    )


def valid_coords_sql(lat: str, lon: str) -> str:
    """GeoUtils.java:53-56 — |lat| <= 90 AND |lon| <= 180."""
    return f"(abs({lat}) <= 90.0 AND abs({lon}) <= 180.0)"


def in_nyc_sql(lat: str, lon: str) -> str:
    """NYC region (GeoUtils.java:36-43): 8 geohash-4 neighbors of dr72;
    dr72 itself is a hole. Expressed as outer-box AND NOT center-box —
    pure range predicates, pushdown-friendly."""
    return (
        f"({_in_box_sql(lat, lon, NYC_OUTER_BOX)}"
        f" AND NOT {_in_box_sql(lat, lon, NYC_INNER_BOX)})"
    )


def near_jfk_sql(lat: str, lon: str) -> str:
    """JFK region (GeoUtils.java:45-47): 8 geohash-6 neighbors of dr5x0z
    (center cell is a hole)."""
    return (
        f"({_in_box_sql(lat, lon, JFK_OUTER_BOX)}"
        f" AND NOT {_in_box_sql(lat, lon, JFK_INNER_BOX)})"
    )


def near_lga_sql(lat: str, lon: str) -> str:
    """LGA region (GeoUtils.java:49-51): dr5ryy ∪ dr5rzn (geohash-6) ∪ the
    8 geohash-7 neighbors of dr5rzjx (center cell is a hole)."""
    parts = [_in_box_sql(lat, lon, b) for b in LGA_BOXES]
    parts.append(
        f"({_in_box_sql(lat, lon, LGA_OUTER_BOX)}"
        f" AND NOT {_in_box_sql(lat, lon, LGA_INNER_BOX)})"
    )
    return "(" + " OR ".join(parts) + ")"


def geohash_scale_sql(lat: str, lon: str, precision: int) -> tuple[str, str]:
    """SQL for the integer bit encodings of lat/lon at ``precision`` chars.

    Returns (lat_bits_sql, lon_bits_sql). lon gets ceil(5p/2) bits, lat
    floor(5p/2) (geohash interleave starts with longitude). floor() before
    any integer use — never CAST a fractional double (DuckDB rounds,
    Spark truncates).
    """
    total = precision * 5
    lon_n = (total + 1) // 2
    lat_n = total // 2
    lat_bits = (
        f"CAST(least(floor(({lat} + {dlit(90.0)}) / {dlit(180.0)} * {1 << lat_n}),"
        f" {(1 << lat_n) - 1}) AS BIGINT)"
    )
    lon_bits = (
        f"CAST(least(floor(({lon} + {dlit(180.0)}) / {dlit(360.0)} * {1 << lon_n}),"
        f" {(1 << lon_n) - 1}) AS BIGINT)"
    )
    return lat_bits, lon_bits


# Morton bit-spread masks: place the low 32 bits of x at even bit positions.
_SPREAD_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_sql(col: str) -> str:
    """SQL spreading bits of ``col`` to even positions (classic Morton
    masked-shift sequence — 5 ops instead of one term per bit, which keeps
    Spark's generated code far below the 64 KB JVM method limit)."""
    e = col
    for shift, mask in _SPREAD_MASKS:
        e = f"((({e}) | (({e}) << {shift})) & {mask})"
    return e


def geohash_interleave_sql(lat_bits_col: str, lon_bits_col: str, precision: int) -> str:
    """SQL interleaving lat/lon bit codes into one BIGINT (lon bit first).

    Geohash puts the longitude bit first (MSB). For even precision the
    longitude bits land on odd positions (shifted), for odd precision on
    even positions.
    """
    if precision % 2 == 0:
        return f"(({_spread_sql(lon_bits_col)} << 1) | {_spread_sql(lat_bits_col)})"
    return f"({_spread_sql(lon_bits_col)} | ({_spread_sql(lat_bits_col)} << 1))"


def geohash_chars_sql(interleaved_col: str, precision: int) -> str:
    """SQL mapping the interleaved BIGINT to the base-32 geohash string."""
    total = precision * 5
    parts = [
        f"substr('{BASE32}', (({interleaved_col} >> {total - 5 * (i + 1)}) & 31) + 1, 1)"
        for i in range(precision)
    ]
    return "concat(" + ", ".join(parts) + ")"


# ---------------------------------------------------------------------------
# Spark Column API (thin wrappers over the generated SQL)
# ---------------------------------------------------------------------------

def geohash_col(lat: Column | str, lon: Column | str, precision: int = 6) -> Column:
    """Geohash encode as a single pure-builtin Column expression.

    Inlines the scale step twice per coordinate axis; for hot paths prefer
    :func:`with_geohash`, which materializes the bit columns once.
    """
    lat_s = lat if isinstance(lat, str) else lat._jc.toString()  # noqa: SLF001
    lon_s = lon if isinstance(lon, str) else lon._jc.toString()  # noqa: SLF001
    lat_bits, lon_bits = geohash_scale_sql(lat_s, lon_s, precision)
    inter = geohash_interleave_sql(lat_bits, lon_bits, precision)
    return F.expr(geohash_chars_sql(inter, precision))


def with_geohash(df, out_col: str, lat: str, lon: str, precision: int = 6):
    """df + a geohash column, computing the bit columns once (CSE-friendly)."""
    lat_bits, lon_bits = geohash_scale_sql(lat, lon, precision)
    df = df.withColumn("__gh_lat_bits", F.expr(lat_bits)).withColumn(
        "__gh_lon_bits", F.expr(lon_bits)
    )
    inter = geohash_interleave_sql("__gh_lat_bits", "__gh_lon_bits", precision)
    df = df.withColumn("__gh_inter", F.expr(inter))
    df = df.withColumn(out_col, F.expr(geohash_chars_sql("__gh_inter", precision)))
    return df.drop("__gh_lat_bits", "__gh_lon_bits", "__gh_inter")


def valid_coords(lat: str, lon: str) -> Column:
    return F.expr(valid_coords_sql(lat, lon))


def in_nyc(lat: str, lon: str) -> Column:
    return F.expr(in_nyc_sql(lat, lon))


def near_jfk(lat: str, lon: str) -> Column:
    return F.expr(near_jfk_sql(lat, lon))


def near_lga(lat: str, lon: str) -> Column:
    return F.expr(near_lga_sql(lat, lon))
