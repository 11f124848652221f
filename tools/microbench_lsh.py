"""Micro-bench: LSH candidate-pair generation variants at sf0.1.

Compares (median of N warm runs, same session):
  A. current: window bucket-cap + band self-join (2 exchanges on the
     band key, signatures computed per join branch)
  B. bucket groupBy: collect_list per (band, bh), cap = size filter,
     pairs expanded in-bucket with array HOFs (1 exchange on the band
     key, signatures computed once for banding)
  C. no cap, self-join (the r01 shape) — reference point

All variants end with the same est_jaccard projection; A and B must
return identical rows.
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flink_stream_processing_refarch_spark.operators import dedup  # noqa: E402
from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N_RUNS = 3


def _est_jaccard(pairs, sigs):
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(dedup.N_HASHES)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(dedup.N_HASHES)],
    )
    agree = " + ".join(
        f"(CASE WHEN a{j} = b{j} THEN 1 ELSE 0 END)"
        for j in range(dedup.N_HASHES)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                f"CAST({agree} AS DOUBLE) / {dedup.N_HASHES}"
            ).alias("est_jaccard"),
        )
    )


def _bands(spark):
    sigs = dedup.minhash_signatures(spark, SF_DIR)
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(dedup._band_expr("spark", b)).alias("bh"),
                    )
                    for b in range(dedup.N_BANDS)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bh")
    return sigs, bands


def variant_a(spark):
    return dedup.q_dedup_minhash_lsh(spark, SF_DIR)


def variant_b(spark):
    sigs, bands = _bands(spark)
    bkt = (
        bands.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(
            (F.size("ids") >= 2) & (F.size("ids") <= dedup.LSH_BUCKET_CAP)
        )
    )
    pairs = (
        bkt.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    return _est_jaccard(pairs, sigs)


def variant_c(spark):
    sigs, bands = _bands(spark)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _est_jaccard(pairs, sigs)


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    variant_a(spark).count()

    rows = {}
    for name, fn in [("A_window_cap", variant_a), ("B_bucket_groupby", variant_b), ("C_no_cap", variant_c)]:
        walls = []
        for _ in range(N_RUNS):
            t0 = time.monotonic()
            n = fn(spark).count()
            walls.append(time.monotonic() - t0)
        rows[name] = n
        print(f"{name}: rows={n} median={statistics.median(walls):.2f}s walls={[round(w, 2) for w in walls]}")

    a = {tuple(r) for r in variant_a(spark).collect()}
    b = {tuple(r) for r in variant_b(spark).collect()}
    print("A == B:", a == b, f"(|A|={len(a)}, |B|={len(b)})")


if __name__ == "__main__":
    main()
