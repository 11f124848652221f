"""Interleaved corpus maintenance at the decade (VERDICT r09 #6): run
compaction + layout clustering against a composite corpus WHILE the
streaming upsert twin is mid-stream, with the per-corpus lease
serializing all three writers.

Why this harness exists: the r08/r09 pattern is that decades find real
bugs (directory-glob zero matches, 1-file triggers, coalesce(1)) — and
this one did too, at build time: the streaming upsert used to DIE with
MaintenanceLeaseHeld when maintenance interleaved between its epochs
(fixed: ``upsert_corpus_retrying``, pinned in tests/test_corpus_io.py).

Shape: ``REPLICAS`` doc_id-shifted copies of the sf0.1 documents table
(100 => 500k docs, two decades over the driver scale) written as a
multi-file directory so the delta arrives over ~10 micro-batch epochs
(``maxFilesPerTrigger``). Each epoch upserts with a small
``max_records_per_file`` — streaming ingest realistically leaves small
files — so the concurrently-running compaction always has real work.

Measured: idle-corpus compact/layout walls (baseline), the same ops
while the stream is live (wall + how many lease-held retries each
writer ate), stream epoch count, TTL-break counter deltas (must be 0),
and CONVERGENCE: the final corpus must equal the batch delta-wins merge
exactly, no matter how the three writers interleaved.

Run (idle box — no concurrent Spark work):
    python tools/scale_maintenance.py [REPLICAS]   (appends SCALING_DECADE2.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import threading
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
WORK = f"/dev/shm/graft_maint_x{REPLICAS}"
N_SRC_FILES = 50          # composite layout -> ~10 delta epochs
FILES_PER_TRIGGER = 5
FRAG_ROWS = 500           # per-file rows each streaming epoch leaves


def build_docs_composite(spark) -> str:
    """REPLICAS doc_id-shifted copies of sf0.1 documents, written as a
    multi-file directory (the shape a streaming source can consume in
    multiple epochs)."""
    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.schemas import load_table

    out = os.path.join(WORK, "documents_dir")
    if os.path.isdir(out) and os.listdir(out):
        return out
    base = load_table(spark, SF01, "documents").select(
        "doc_id", "text", "source"
    )
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    comp = base.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
        "text",
        "source",
    )
    comp.repartition(N_SRC_FILES).write.mode("overwrite").parquet(out)
    return out


def timed(label: str, fn):
    t0 = time.time()
    out = fn()
    w = time.time() - t0
    print(f"  {label}: {w:.2f}s", flush=True)
    return w, out


def retry_held(op, counter: list[int], deadline_sec: float = 600.0):
    """corpus_io.retry_on_lease_held with a held-retry counter — the
    production retry protocol, not a re-implementation."""
    from flink_stream_processing_refarch_spark.operators.corpus_io import (
        retry_on_lease_held,
    )

    def count(_e):
        counter[0] += 1

    return retry_on_lease_held(
        op, max_wait_sec=deadline_sec, backoff_sec=0.2, on_held=count
    )


def main() -> None:
    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.operators import corpus_io

    spark = get_spark("scale_maint")
    os.makedirs(WORK, exist_ok=True)
    docs_dir = build_docs_composite(spark)
    docs = spark.read.parquet(docs_dir)
    n_docs = docs.count()
    print(f"[composite] {n_docs:,} docs in {docs_dir}", flush=True)

    out = os.path.join(WORK, "corpus")

    def fresh_fragmented_corpus():
        shutil.rmtree(out, ignore_errors=True)
        corpus_io.write_partitioned_corpus(
            docs, out, max_records_per_file=FRAG_ROWS
        )

    # ---- baseline: maintenance on an idle corpus ----
    print("[idle baseline]", flush=True)
    fresh_fragmented_corpus()
    idle_compact, rep = timed(
        "compact", lambda: corpus_io.compact_corpus(spark, out)
    )
    assert rep["compacted"], "baseline compaction found nothing fragmented"
    idle_layout, _ = timed(
        "layout",
        lambda: corpus_io.cluster_corpus_layout(
            spark, out, target_rows_per_file=20_000
        ),
    )

    # ---- interleaved: stream mid-flight, maintenance concurrent ----
    print("[interleaved]", flush=True)
    fresh_fragmented_corpus()
    breaks0 = corpus_io.BREAK_COUNT
    restored0 = corpus_io.BREAK_RESTORED_COUNT
    epochs = [0]
    stream_err: list[Exception] = []

    def run_stream():
        try:
            sdocs = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
                .parquet(docs_dir)
            )
            delta = corpus_io._delta_from_docs(sdocs)

            def sink(b, eid):
                epochs[0] += 1
                corpus_io.upsert_corpus_retrying(
                    b, out, max_records_per_file=FRAG_ROWS
                )

            ck = os.path.join(WORK, "ck_stream")
            shutil.rmtree(ck, ignore_errors=True)
            q = (
                delta.writeStream.foreachBatch(sink)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        except Exception as e:  # noqa: BLE001 - surfaced below
            stream_err.append(e)

    held_compact, held_layout = [0], [0]
    walls: dict[str, float] = {}
    t_stream0 = time.time()
    st = threading.Thread(target=run_stream)
    st.start()
    time.sleep(3)  # let a few epochs commit first
    walls["compact"], rep = timed(
        "compact (stream live)",
        lambda: retry_held(
            lambda: corpus_io.compact_corpus(spark, out), held_compact
        ),
    )
    walls["layout"], _ = timed(
        "layout (stream live)",
        lambda: retry_held(
            lambda: corpus_io.cluster_corpus_layout(
                spark, out, target_rows_per_file=20_000
            ),
            held_layout,
        ),
    )
    st.join()
    stream_wall = time.time() - t_stream0
    assert not stream_err, stream_err
    print(
        f"  stream: {stream_wall:.2f}s over {epochs[0]} epochs; "
        f"lease-held retries compact={held_compact[0]} "
        f"layout={held_layout[0]}",
        flush=True,
    )

    # ---- convergence: final content == batch delta-wins merge ----
    delta_b = corpus_io._delta_from_docs(docs)
    expected = delta_b.unionByName(
        docs.join(delta_b.select("doc_id"), "doc_id", "left_anti")
    )
    got = spark.read.parquet(out)
    n_exp, n_got = expected.count(), got.count()
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    ok = n_exp == n_got and diff == 0
    print(f"  convergence: expected={n_exp:,} got={n_got:,} diff={diff}",
          flush=True)
    assert ok, "interleaved run diverged from the serial merge"
    assert corpus_io.verify_manifest(spark, out)
    breaks = corpus_io.BREAK_COUNT - breaks0
    restored = corpus_io.BREAK_RESTORED_COUNT - restored0

    lines = [
        "",
        f"## Interleaved maintenance at the decade (x{REPLICAS} documents"
        " composite)",
        "",
        f"Generated by `tools/scale_maintenance.py {REPLICAS}`"
        f" ({n_docs:,} docs, {N_SRC_FILES} source partitions, fragmented at"
        f" {FRAG_ROWS} rows/file). Compaction + layout clustering run"
        " WHILE the streaming upsert twin is mid-stream"
        f" ({epochs[0]} epochs, each leaving small files); all three"
        " writers serialize on the per-corpus lease.",
        "",
        "| op | idle corpus | stream live | lease-held retries |",
        "|---|---|---|---|",
        f"| compact | {idle_compact:.2f}s | {walls['compact']:.2f}s |"
        f" {held_compact[0]} |",
        f"| layout | {idle_layout:.2f}s | {walls['layout']:.2f}s |"
        f" {held_layout[0]} |",
        "",
        f"Stream wall {stream_wall:.2f}s over {epochs[0]} epochs"
        " (each epoch waits out held leases via `upsert_corpus_retrying`"
        " — the bug this harness found at build time: without the"
        " retry, the FIRST maintenance op that interleaved between"
        " epochs KILLED the stream with MaintenanceLeaseHeld; pinned in"
        " tests/test_corpus_io.py). TTL breaks:"
        f" {breaks} fired, {restored} live-lease restores (expected 0/0"
        " — contention is waiting, never breaking). Convergence: final"
        f" corpus == batch delta-wins merge exactly ({n_got:,} rows,"
        " exceptAll both ways = 0) and the manifest verifies.",
    ]
    with open("/root/repo/SCALING_DECADE2.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to SCALING_DECADE2.md")


if __name__ == "__main__":
    main()
