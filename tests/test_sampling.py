"""Oracle parity + determinism/shape evidence for operators/sampling.py."""

from __future__ import annotations

import pytest
from conftest import SF_DIR, assert_matches_oracle

from flink_stream_processing_refarch_spark.operators import sampling


@pytest.mark.parametrize("name", sorted(sampling.ORACLES))
def test_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, sampling.QUERIES[name], sampling.ORACLES[name]
    )


def test_split_is_partitioning_invariant(spark):
    """The whole point of hash-gating: membership must not change when the
    input is repartitioned (df.sample() fails this)."""
    base = {
        r["doc_id"]: r["split"]
        for r in sampling.q_split_train_test(spark, SF_DIR).collect()
    }
    from flink_stream_processing_refarch_spark.schemas import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents").repartition(13, "lang")
    gate = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    redo = docs.select(
        "doc_id",
        F.when(gate < sampling.TRAIN_GATE_HEX, "train")
        .otherwise("eval")
        .alias("split"),
    )
    assert {r["doc_id"]: r["split"] for r in redo.collect()} == base


def test_split_fraction_near_gate(spark):
    rows = sampling.q_split_counts(spark, SF_DIR).collect()
    train = sum(r["n_docs"] for r in rows if r["split"] == "train")
    total = sum(r["n_docs"] for r in rows)
    assert abs(train / total - 204 / 256) < 0.05


def test_split_is_map_only(spark):
    """No Exchange in the plan — the split must run at scan speed."""
    plan = (
        sampling.q_split_train_test(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_global_row_number_avoids_global_sort(spark):
    """The data path must never range-shuffle into one reducer: no
    rangepartitioning exchange anywhere, and the bucket window's hash
    exchange is present — the two-phase shape, not the naive plan."""
    plan = (
        sampling.q_global_row_number(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning(bucket" in plan


def test_stratified_cap_respects_cap(spark):
    df = sampling.q_stratified_cap(spark, SF_DIR)
    counts = df.groupBy("lang", "source").count().collect()
    assert counts and all(r["count"] <= sampling.CAP_PER_GROUP for r in counts)
