"""Guards added after the r14 closing sweep: the footer-metadata row
counter must refuse layouts outside its contract (silent undercount),
and the vectorized sessionizer must fail loudly on null timestamps
(pandas renders nullable bigint as float64+NaN; ndarray int64 casting
would silently emit INT64_MIN)."""

from __future__ import annotations

import os

import pytest


def _write_parquet(path: str, n: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": list(range(n))}), path)


def test_table_row_count_flat_dir_sums_footers(tmp_path):
    from flink_stream_processing_refarch_spark.schemas import table_row_count

    d = tmp_path / "t.parquet"
    d.mkdir()
    _write_parquet(str(d / "part-0.parquet"), 3)
    _write_parquet(str(d / "part-1.parquet"), 4)
    assert table_row_count(str(d)) == 7
    # single-file layout too
    assert table_row_count(str(d / "part-0.parquet")) == 3


def test_table_row_count_refuses_mixed_partitioned_layout(tmp_path):
    """Top-level part files + partition subdirectories: summing only the
    flat files would silently undercount — the helper must return None
    so the caller falls back to df.count()."""
    from flink_stream_processing_refarch_spark.schemas import table_row_count

    d = tmp_path / "t.parquet"
    sub = d / "source=web"
    sub.mkdir(parents=True)
    _write_parquet(str(d / "part-0.parquet"), 3)
    _write_parquet(str(sub / "part-0.parquet"), 5)
    assert table_row_count(str(d)) is None
    # spark metadata dirs/files do not trip the guard
    os.mkdir(d / "_delta_log")
    os.remove(str(sub / "part-0.parquet"))
    sub.rmdir()
    assert table_row_count(str(d)) == 3


def test_merge_sessions_vectorized_rejects_nan_timestamps():
    import numpy as np

    from flink_stream_processing_refarch_spark.streaming.jobs import (
        _MERGE_VECTORIZE_MIN,
        _merge_sessions,
    )

    ts = np.arange(_MERGE_VECTORIZE_MIN, dtype=np.float64)
    ts[7] = np.nan
    with pytest.raises(ValueError, match="null event timestamp"):
        _merge_sessions([], ts)
    # an all-finite float batch (same pandas rendering, no nulls) still
    # sessionizes: one dense run
    ok = _merge_sessions([], np.arange(_MERGE_VECTORIZE_MIN, dtype=np.float64))
    assert ok == [[0, _MERGE_VECTORIZE_MIN - 1, _MERGE_VECTORIZE_MIN]]
