"""Per-epoch instrumentation of pq_ingest_streaming (r14, VERDICT r13
#4): the entry has oscillated 1.5s <-> 9.3s across sweeps since r08
with its plan untouched — three rounds of "trigger-timing" footnotes.
This harness reproduces the entry inline (same split, same codebooks,
same sink) N times in one warm session and records EVERY micro-batch's
StreamingQueryProgress duration breakdown (triggerExecution,
queryPlanning, getBatch, addBatch, walCommit, commitOffsets, plus
observed input rows/files), so the oscillation's location is named
from evidence, not inference.

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
