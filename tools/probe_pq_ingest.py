"""Per-epoch instrumentation of pq_ingest_streaming (r14, VERDICT r13
#4): the entry has oscillated 1.5s <-> 9.3s across sweeps since r08
with its plan untouched — three rounds of "trigger-timing" footnotes.
This harness reproduces the entry inline (same split, same codebooks,
same sink) N times in one warm session and records EVERY micro-batch's
StreamingQueryProgress duration breakdown (triggerExecution,
queryPlanning, getBatch, addBatch, walCommit, commitOffsets, plus
observed input rows/files), so the oscillation's location is named
from evidence, not inference.

Findings (r14, idle box; full evidence chain in README r14):

- the variance lives entirely in ONE epoch's addBatch (420 ms normal,
  2.4-5.3 s inflated); offsets/WAL/planning flat;
- a JVM-only variant (size(embedding) instead of the pandas UDF) is
  FLAT (~150-190 ms addBatch) — the oscillator is the Python path;
- a trivial pandas UDF is flat even after 70 s idles (the worker
  reaper respawn is NOT the cost — preloading numpy/pandas in the
  daemon changed nothing, which falsified the import-tax hypothesis);
- per-call instrumentation inside the PQ UDF: fresh worker reaches
  the UDF in ~0.25 s, then the FIRST call's numpy body takes 7.5-8.5 s
  and every identical subsequent call 0.09-0.37 s;
- /proc/stat across one slow call: user 0.8 s, SYSTEM 18 s, STEAL
  14.8 s — the time is the VM's memory backend servicing first-touch
  faults on a freshly-mapped arena, not compute;
- fresh-process A/B of the encoder form (6 reps each): the old
  n x S x K x D broadcast first-call = 0.12-16.5 s (bimodal); the
  expanded ||x||^2 - 2 x.c + ||c||^2 form (D=8x smaller
  intermediates, bit-identical argmin) = 0.05-2.7 s.

Fix shipped at the source: similarity._pq_codes_udf now uses the
expanded exact-int64 form — allocation churn drops ~8x, warm encode
~10x faster, and the entry's fault-storm exposure is bounded. The
residual tail is the box's bursty steal, which hits any fresh
allocation anywhere; a real long-running ingest keeps its arenas warm.

Run (idle box): python tools/probe_pq_ingest.py [N_RUNS] [SF_DIR]
Prints one JSON line per run; paste the summary into README.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402

N_RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def one_run(spark, run_idx: int) -> dict:
    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.operators.similarity import (
        _pq_books_int,
        _pq_codes_udf,
    )
    from flink_stream_processing_refarch_spark.schemas import scratch_dir
    from flink_stream_processing_refarch_spark.streaming.jobs import (
        _emb_split_path,
    )

    t_wall = time.time()
    split = _emb_split_path(spark, SF_DIR)
    books_int = _pq_books_int(spark, SF_DIR)
    t_setup = time.time() - t_wall
    schema = spark.read.parquet(split).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(split)
    )
    coded = ev.select(
        "vec_id",
        _pq_codes_udf(books_int)(F.col("embedding")).alias("codes"),
    )
    out = scratch_dir("pq_probe_out_")
    ckpt = scratch_dir("pq_probe_ck_")
    t0 = time.time()
    q = (
        coded.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    w_stream = time.time() - t0
    t0 = time.time()
    n = spark.read.parquet(out).count()
    w_read = time.time() - t0
    epochs = []
    for p in q.recentProgress:
        d = p["durationMs"] if isinstance(p, dict) else json.loads(p.json)[
            "durationMs"
        ]
        pj = p if isinstance(p, dict) else json.loads(p.json)
        epochs.append(
            {
                "batchId": pj.get("batchId"),
                "numInputRows": pj.get("numInputRows"),
                "durationMs": d,
            }
        )
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    return {
        "run": run_idx,
        "setup": round(t_setup, 3),
        "stream_wall": round(w_stream, 3),
        "readback": round(w_read, 3),
        "rows": n,
        "epochs": epochs,
    }


def main() -> None:
    spark = get_spark("probe_pq_ingest")
    runs = [one_run(spark, i) for i in range(N_RUNS)]
    for r in runs:
        print(json.dumps(r), flush=True)
    walls = sorted(r["stream_wall"] for r in runs)
    print(
        json.dumps(
            {
                "summary": {
                    "stream_wall_min": walls[0],
                    "stream_wall_median": walls[len(walls) // 2],
                    "stream_wall_max": walls[-1],
                    "epoch_count_per_run": [len(r["epochs"]) for r in runs],
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
