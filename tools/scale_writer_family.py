"""Full writer family interleaved at the decade (VERDICT r12 #7): the
r12 composite maintenance run predated schema evolution and predicate
deletes — re-take it with ALL five writers in the mix (streaming
upsert, compaction, layout clustering, EVOLVING upsert, predicate
DELETE) so the lease-serialized convergence claim covers the whole
family.

Determinism by construction: every writer's key set is arithmetic-
disjoint from every other's, so the final corpus is the same
regardless of interleaving —

- stream upsert: updates ``doc_id % 7 == 0`` ('UPD: '), appends
  ``doc_id % 50 == 0`` shifted by +3,000,000 ('NEW: ')
  (``corpus_io._delta_from_docs``, the same delta the batch oracle
  uses);
- EVOLVING upsert: ``doc_id % 350 == 2`` (=> %7==2, %50==2 — touches
  neither stream set) gets 'EVO: ' text plus a brand-new ``tag``
  column (``allow_schema_evolution=True``);
- DELETE: ``doc_id % 350 == 1`` (%7==1, %50==1 — untouched by both
  upserts; appended ids are ≡0 mod 50 so never match) — removed and
  never re-added;
- compact / layout: content-preserving by contract.

Measured: per-op walls while the stream is live, lease-held retry
counts, TTL-break counters (must stay 0/0), and CONVERGENCE: the final
corpus (including the evolved ``tag`` column and the deletions) must
equal the relational expectation exactly, any interleaving.

Run (idle box): python tools/scale_writer_family.py [REPLICAS]
(default 1000; appends SCALING_DECADE2.md)
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
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
WORK = f"/dev/shm/graft_family_x{REPLICAS}"
N_SRC_FILES = 50
FILES_PER_TRIGGER = 5
FRAG_ROWS = 500


def build_docs_composite(spark) -> str:
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
    r = fn()
    w = time.time() - t0
    print(f"  {label}: {w:.2f}s", flush=True)
    return w, r


def retry_held(op, counter: list[int], deadline_sec: float = 900.0):
    from flink_stream_processing_refarch_spark.operators import corpus_io

    def count(_e):
        counter[0] += 1

    return corpus_io.retry_on_lease_held(
        op, max_wait_sec=deadline_sec, backoff_sec=0.2, on_held=count
    )


def main() -> None:
    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.operators import corpus_io

    spark = get_spark("scale_family")
    os.makedirs(WORK, exist_ok=True)
    docs_dir = build_docs_composite(spark)
    docs = spark.read.parquet(docs_dir)
    n_docs = docs.count()
    print(f"[composite] {n_docs:,} docs", flush=True)

    out = os.path.join(WORK, "corpus")
    shutil.rmtree(out, ignore_errors=True)
    corpus_io.write_partitioned_corpus(
        docs, out, max_records_per_file=FRAG_ROWS
    )
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
                    b, out, max_records_per_file=FRAG_ROWS,
                    allow_schema_evolution=True,
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

    evolve_delta = docs.filter(F.col("doc_id") % 350 == 2).select(
        "doc_id",
        F.concat(F.lit("EVO: "), F.col("text")).alias("text"),
        "source",
        F.lit("m").alias("tag"),
    )

    held = {k: [0] for k in ("compact", "evolve", "delete", "layout")}
    walls: dict[str, float] = {}
    deleted_rows = [0]
    t_stream0 = time.time()
    st = threading.Thread(target=run_stream)
    st.start()
    time.sleep(3)  # let a few epochs commit first
    walls["compact"], rep = timed(
        "compact (stream live)",
        lambda: retry_held(
            lambda: corpus_io.compact_corpus(spark, out), held["compact"]
        ),
    )
    walls["evolve"], _ = timed(
        "EVOLVING upsert (stream live)",
        lambda: retry_held(
            lambda: corpus_io.upsert_corpus(
                evolve_delta, out, max_records_per_file=FRAG_ROWS,
                allow_schema_evolution=True,
            ),
            held["evolve"],
        ),
    )
    walls["delete"], drep = timed(
        "predicate DELETE (stream live)",
        lambda: retry_held(
            lambda: corpus_io.delete_from_corpus(
                spark, out, F.col("doc_id") % 350 == 1
            ),
            held["delete"],
        ),
    )
    deleted_rows[0] = drep["deleted_rows"]
    walls["layout"], _ = timed(
        "layout (stream live)",
        lambda: retry_held(
            lambda: corpus_io.cluster_corpus_layout(
                spark, out, target_rows_per_file=20_000
            ),
            held["layout"],
        ),
    )
    st.join()
    stream_wall = time.time() - t_stream0
    assert not stream_err, stream_err
    print(
        f"  stream: {stream_wall:.2f}s over {epochs[0]} epochs; "
        f"held retries { {k: v[0] for k, v in held.items()} }; "
        f"deleted {deleted_rows[0]:,} rows",
        flush=True,
    )

    # ---- convergence: interleaving-independent relational expectation
    stream_delta = corpus_io._delta_from_docs(docs)
    nulltag = F.lit(None).cast("string")
    expected = (
        evolve_delta
        .unionByName(stream_delta.withColumn("tag", nulltag))
        .unionByName(
            docs.join(evolve_delta.select("doc_id"), "doc_id", "left_anti")
            .join(stream_delta.select("doc_id"), "doc_id", "left_anti")
            .filter(~(F.col("doc_id") % 350 == 1))
            .withColumn("tag", nulltag)
        )
    )
    got = corpus_io.read_corpus(spark, out)
    n_exp, n_got = expected.count(), got.count()
    diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    print(f"  convergence: expected={n_exp:,} got={n_got:,} diff={diff}",
          flush=True)
    assert n_exp == n_got and diff == 0, \
        "writer-family run diverged from the relational expectation"
    assert corpus_io.verify_manifest(spark, out)
    breaks = corpus_io.BREAK_COUNT - breaks0
    restored = corpus_io.BREAK_RESTORED_COUNT - restored0
    assert breaks == 0 and restored == 0, (breaks, restored)

    lines = [
        "",
        f"## Full writer family interleaved at the decade (x{REPLICAS},"
        " r13 — VERDICT r12 #7)",
        "",
        f"Generated by `tools/scale_writer_family.py {REPLICAS}`"
        f" ({n_docs:,} docs, fragmented at {FRAG_ROWS} rows/file): the"
        " streaming upsert twin runs its delta over"
        f" {epochs[0]} micro-batch epochs while compaction, an EVOLVING"
        " upsert (new `tag` column, allow_schema_evolution=True), a"
        f" predicate DELETE ({deleted_rows[0]:,} rows), and layout"
        " clustering each interleave once — five writers serialized"
        " only by the per-corpus lease. Key sets are arithmetic-"
        "disjoint so the final corpus is interleaving-independent.",
        "",
        "| op | wall (stream live) | lease-held retries |",
        "|---|---|---|",
    ]
    for k in ("compact", "evolve", "delete", "layout"):
        lines.append(f"| {k} | {walls[k]:.2f}s | {held[k][0]} |")
    lines += [
        "",
        f"Stream wall {stream_wall:.2f}s over {epochs[0]} epochs. TTL"
        f" breaks: {breaks} fired, {restored} live-lease restores"
        " (0/0 — contention is waiting, never breaking). Convergence:"
        f" final corpus == the relational expectation exactly"
        f" ({n_got:,} rows, exceptAll both ways = 0, evolved `tag`"
        " column and deletions included) and the manifest verifies —"
        " the lease-serialized convergence claim now covers the full"
        " five-writer family.",
    ]
    with open("/root/repo/SCALING_DECADE2.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to SCALING_DECADE2.md", flush=True)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
