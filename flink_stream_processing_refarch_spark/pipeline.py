"""CLI entry point — the ProcessTaxiStream.main equivalent
(flink-taxi-stream-processor/.../ProcessTaxiStream.java:65-166).

The reference's ParameterTool args map to local/cluster equivalents:

  reference (Kinesis/EMR/ES)          here
  --------------------------------    ----------------------------------
  InputStreamName + region            --source (parquet dir or wire-JSON dir)
  ElasticsearchEndpoint               --out-dir (ES-style bulk .ndjson files;
                                      swap the sink body for the ES connector)
  checkpoint dir (S3)                 --checkpoint
  RocksDB state backend               on by default (RocksDBStateStoreProvider)
  SHARD_GETRECORDS_* throttling       --max-files-per-trigger

Runs the single-query DAG fan-out pipeline: one stream, each micro-batch
cached once, Q1 + Q2 aggregates computed from it, bulk-written per sink
(SURVEY.md §4.1 'shared subplan').

Usage:
  python -m flink_stream_processing_refarch_spark.pipeline \
      --source /root/testdata/sf0.01 --out-dir /tmp/es_out
"""

from __future__ import annotations

import argparse

from .session import get_spark
from .streaming.jobs import run_taxi_pipeline


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="testdata sf dir (parquet)")
    p.add_argument("--out-dir", default=None, help="ES-style bulk sink dir")
    p.add_argument("--cpus", default=None, help="local parallelism override")
    args = p.parse_args(argv)

    spark = get_spark(
        "taxi-pipeline", master=f"local[{args.cpus}]" if args.cpus else None
    )
    spark.sparkContext.setLogLevel("WARN")
    res = run_taxi_pipeline(spark, args.source, out_dir=args.out_dir)
    n1 = res["pickup_count"].count()
    n2 = res["trip_duration"].count()
    print(
        f"pipeline complete: {n1} pickup_count docs, {n2} trip_duration docs"
        f" -> {res['out_dir']}"
    )


if __name__ == "__main__":
    main()
