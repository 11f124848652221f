"""Corpus CDC streaming source (sources/corpus_cdc.py, r14): the
contracts a standing incremental consumer depends on — multi-batch
delivery, checkpoint replay determinism, the fallen-behind raise, and
typed partition values."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_stream_processing_refarch_spark.operators import corpus_io
from flink_stream_processing_refarch_spark.sources import corpus_cdc


def _docs(spark, n=60):
    return spark.createDataFrame(
        [(i, f"base {i}", f"s{i % 3}") for i in range(n)],
        "doc_id long, text string, source string",
    )


def _start(spark, out, base, t0, sink):
    corpus_cdc.register(spark)
    feed = (
        spark.readStream.format("corpus_cdc")
        .option("path", out)
        .option("since_token", t0)
        .load()
    )
    return (
        feed.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(base, "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def test_multi_batch_delivery_and_replay_determinism(spark):
    """Two separate availableNow drains (one commit each) must land
    the same rows a single drain over both commits would — and the
    checkpoint must prevent redelivery of the first batch."""
    with tempfile.TemporaryDirectory() as base:
        out = os.path.join(base, "corpus")
        sink = os.path.join(base, "sink")
        docs = _docs(spark)
        t0 = corpus_io.write_partitioned_corpus(docs, out)["writer_token"]

        # commit 1: replacement upsert into s0
        d1 = docs.filter(
            (F.col("doc_id") % 2 == 0) & (F.col("source") == "s0")
        ).withColumn("text", F.concat(F.lit("A-"), F.col("doc_id")))
        corpus_io.upsert_corpus(d1, out)
        q = _start(spark, out, base, t0, sink)
        q.awaitTermination(120)
        n1 = spark.read.parquet(sink).count()
        assert n1 == 20  # s0's full current content, once

        # commit 2: remove s2 — the restarted query must deliver ONLY
        # the new interval (one tombstone), not re-deliver batch 1
        corpus_io.delete_from_corpus(spark, out, F.col("source") == "s2")
        q = _start(spark, out, base, t0, sink)
        q.awaitTermination(120)
        rows = spark.read.parquet(sink).collect()
        assert len(rows) == 21
        rem = [r for r in rows if r["_change_type"] == "remove"]
        assert [(r["source"], r["doc_id"]) for r in rem] == [("s2", None)]
        upd = {
            (r["doc_id"], r["text"])
            for r in rows
            if r["_change_type"] == "update"
        }
        assert upd == {
            (i, f"A-{i}" if i % 2 == 0 else f"base {i}")
            for i in range(60)
            if i % 3 == 0
        }


def test_fallen_behind_raises_naming_resync(spark):
    with tempfile.TemporaryDirectory() as base:
        out = os.path.join(base, "corpus")
        docs = _docs(spark, 12)
        corpus_io.write_partitioned_corpus(docs, out)
        corpus_cdc.register(spark)
        feed = (
            spark.readStream.format("corpus_cdc")
            .option("path", out)
            .option("since_token", "999-1")  # never committed
            .load()
        )
        q = (
            feed.writeStream.format("noop")
            .option("checkpointLocation", os.path.join(base, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception, match="corpus_changes_vs_manifest"):
            q.awaitTermination(120)
            raise RuntimeError("stream did not fail")


def test_typed_partition_values_roundtrip(spark):
    """An integer partition column comes back typed (the file lacks
    it physically; the source parses + casts from the pkey per the
    manifest schema)."""
    with tempfile.TemporaryDirectory() as base:
        out = os.path.join(base, "corpus")
        sink = os.path.join(base, "sink")
        docs = spark.createDataFrame(
            [(i, f"t {i}", i % 4) for i in range(40)],
            "doc_id long, text string, bucket long",
        )
        t0 = corpus_io.write_partitioned_corpus(
            docs, out, partition_cols=("bucket",)
        )["writer_token"]
        d = docs.filter(F.col("bucket") == 2).withColumn(
            "text", F.lit("new")
        )
        corpus_io.upsert_corpus(d, out, partition_cols=("bucket",))
        q = _start(spark, out, base, t0, sink)
        q.awaitTermination(120)
        got = spark.read.parquet(sink)
        assert dict(got.dtypes)["bucket"] == "bigint"
        assert {r["bucket"] for r in got.collect()} == {2}
