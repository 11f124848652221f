"""Golden tests for the geo module (SURVEY.md §5 item 1)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flink_stream_processing_refarch_spark.functions import geo


def test_landmarks():
    # SURVEY.md §5: landmark sanity values
    assert geo.geohash_encode_py(40.7580, -73.9855, 6) == "dr5ru7"  # Times Sq
    assert geo.geohash_encode_py(40.6413, -73.7781, 6) == "dr5x1n"  # JFK
    assert geo.geohash_encode_py(40.7769, -73.8740, 6) == "dr5ryz"  # LGA


def test_reference_cell_sets():
    # GeoUtils.java:28-34 — exact neighbor sets, center cells excluded
    assert geo.NYC_CELLS == {
        "dr5p", "dr5r", "dr5x", "dr70", "dr78", "dr71", "dr73", "dr79"
    }
    assert geo.JFK_CELLS == {
        "dr5x0w", "dr5x0y", "dr5x1n", "dr5x0x", "dr5x1p", "dr5x28",
        "dr5x2b", "dr5x30",
    }
    assert geo.LGA_G7_CELLS == {
        "dr5rzjq", "dr5rzjr", "dr5rzm2", "dr5rzjw", "dr5rzm8", "dr5rzjy",
        "dr5rzjz", "dr5rzmb",
    }


def test_region_predicates_match_cell_membership(spark):
    """Property: the bbox-ring predicates equal geohash-cell membership."""
    random.seed(7)
    pts = [
        (random.uniform(40.4, 41.2), random.uniform(-74.6, -73.4))
        for _ in range(3000)
    ]
    # hole / landmark points from FIXTURES.md
    pts += [
        (40.87, -74.00),      # dr72 hole
        (40.6467, -73.7897),  # dr5x0z hole
        (40.773, -73.878),    # dr5ryy (LGA)
        (40.7769, -73.8740),  # dr5ryz (NOT LGA)
        (40.6413, -73.7781),  # JFK terminal
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = df.select(
        "lat",
        "lon",
        geo.in_nyc("lat", "lon").alias("nyc"),
        geo.near_jfk("lat", "lon").alias("jfk"),
        geo.near_lga("lat", "lon").alias("lga"),
        geo.geohash_col("lat", "lon", 6).alias("g6"),
    ).collect()
    for r in got:
        g4 = geo.geohash_encode_py(r.lat, r.lon, 4)
        g6 = geo.geohash_encode_py(r.lat, r.lon, 6)
        g7 = geo.geohash_encode_py(r.lat, r.lon, 7)
        assert r.g6 == g6, (r.lat, r.lon, r.g6, g6)
        assert r.nyc == (g4 in geo.NYC_CELLS), (r.lat, r.lon, g4)
        assert r.jfk == (g6 in geo.JFK_CELLS), (r.lat, r.lon, g6)
        want_lga = g6 in geo.LGA_G6_CELLS or g7 in geo.LGA_G7_CELLS
        assert r.lga == want_lga, (r.lat, r.lon, g6, g7)


def test_geohash_col_precisions(spark):
    random.seed(11)
    pts = [
        (random.uniform(-89.9, 89.9), random.uniform(-179.9, 179.9))
        for _ in range(500)
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    cols = [geo.geohash_col("lat", "lon", p).alias(f"g{p}") for p in (4, 6, 7)]
    for r in df.select("lat", "lon", *cols).collect():
        for p in (4, 6, 7):
            assert getattr(r, f"g{p}") == geo.geohash_encode_py(r.lat, r.lon, p)


def test_geohash_stays_jvm_side(spark):
    """The geohash column must not introduce a Python UDF (BatchEvalPython)."""
    df = spark.createDataFrame([(40.0, -73.0)], "lat double, lon double")
    plan = df.select(geo.geohash_col("lat", "lon", 6))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
