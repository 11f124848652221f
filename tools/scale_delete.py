"""Predicate takedown at the decade (VERDICT r12 #1): price
``delete_from_corpus`` against the x100 composite corpus, plus a x10
control, and SIGKILL a REAL delete mid-swap to time its recovery.

Claims under test:

- the MATCH SCAN is O(corpus) by design (an arbitrary predicate must
  read every row) — its wall grows ~linearly between the control and
  the decade corpus;
- the REWRITE is bounded by MATCHING partitions: a scoped predicate
  (3 of 20 sources) rewrites only those partitions regardless of
  corpus size, and a whole-partition pull REMOVES the partition via
  the staged swap's may_vanish path without rewriting anything;
- crash recovery of a killed delete is bounded by touched partitions,
  not rows: a real ``delete_from_corpus`` call — production code path,
  own SparkSession — is blocked mid-swap by a rename hook and
  SIGKILLed; the parent ages the dead holder's lease past its TTL (the
  documented arbitration) and times ``recover_corpus`` rollback
  separately from the optional O(corpus) ``verify_manifest`` pass.

Run (idle box): python tools/scale_delete.py [REPLICAS [REPLICAS2]]
(default 100 10; appends SCALING_DECADE2.md)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_stream_processing_refarch_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
REPLICAS2 = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def _composite(spark, reps: int):
    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.schemas import load_table

    base = load_table(spark, SF01, "documents").select(
        "doc_id", "text", "source"
    )
    return base.crossJoin(
        spark.range(reps).select(F.col("id").alias("rep"))
    ).select(
        (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
        "text",
        "source",
    )


def _mp_sigkilled_delete(out_dir: str, ready_file: str) -> None:
    """Spawn target: run the PRODUCTION delete_from_corpus with a
    rename hook that blocks after the 2nd live->trash displacement —
    the worker then waits (holding the lease, mid-swap) for SIGKILL,
    exactly what a machine crash leaves behind."""
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.operators import corpus_io
    from flink_stream_processing_refarch_spark.session import get_spark as gs

    spark = gs("scale_delete_victim")
    real_rename = os.rename
    trash_renames = [0]

    def blocking_rename(src, dst):
        real_rename(src, dst)
        if f"{os.sep}_trash_" in dst:
            trash_renames[0] += 1
            if trash_renames[0] == 2:
                with open(ready_file, "w") as f:
                    f.write("mid-swap")
                time.sleep(600)  # parent SIGKILLs here

    corpus_io.os.rename = blocking_rename
    # scoped scattered predicate: matches rows in several partitions
    corpus_io.delete_from_corpus(
        spark, out_dir, F.col("doc_id") % 7 == 0
    )


def price_deletes(spark, reps: int, work: str) -> dict:
    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.operators import corpus_io

    out = os.path.join(work, f"corpus_x{reps}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    manifest = corpus_io.write_partitioned_corpus(_composite(spark, reps), out)
    w_build = time.time() - t0
    n_rows = manifest["total_rows"]
    n_parts = len(manifest["partitions"])
    srcs = sorted(
        corpus_io._parse_pkey(("source",), k)[0]
        for k in manifest["partitions"]
    )

    # (a) the match scan alone — delete's first pass, O(corpus)
    t0 = time.time()
    n_match = (
        corpus_io._read_corpus(spark, out, ("source",))
        .filter(F.col("doc_id") % 13 == 0)
        .groupBy("source").count().count()
    )
    w_scan = time.time() - t0

    # (b) scattered delete across every partition (doc_id % 13)
    t0 = time.time()
    rep_all = corpus_io.delete_from_corpus(
        spark, out, F.col("doc_id") % 13 == 0
    )
    w_scattered = time.time() - t0

    # (c) scoped scattered delete: 3 of the sources — rewrite bounded
    # by the matching partitions, everything else untouched
    scoped = srcs[:3]
    t0 = time.time()
    rep_scoped = corpus_io.delete_from_corpus(
        spark, out,
        (F.col("doc_id") % 7 == 0) & (F.col("source").isin(scoped)),
    )
    w_scoped = time.time() - t0

    # (d) whole-partition pull (licensing takedown): may_vanish removal
    t0 = time.time()
    rep_pull = corpus_io.delete_from_corpus(
        spark, out, F.col("source") == srcs[-1]
    )
    w_pull = time.time() - t0
    assert rep_pull["removed_partitions"], rep_pull
    assert corpus_io.verify_manifest(spark, out)
    return {
        "rows": n_rows,
        "partitions": n_parts,
        "build": w_build,
        "scan": w_scan,
        "scan_parts": n_match,
        "scattered": w_scattered,
        "scattered_rows": rep_all["deleted_rows"],
        "scoped": w_scoped,
        "scoped_rows": rep_scoped["deleted_rows"],
        "pull": w_pull,
        "pull_rows": rep_pull["deleted_rows"],
    }


def crash_delete_and_recover(spark, reps: int, work: str) -> dict:
    import multiprocessing as mp

    from flink_stream_processing_refarch_spark.operators import corpus_io

    out = os.path.join(work, f"corpus_crash_x{reps}")
    shutil.rmtree(out, ignore_errors=True)
    manifest = corpus_io.write_partitioned_corpus(_composite(spark, reps), out)
    n_before = manifest["total_rows"]
    ready = os.path.join(work, f"ready_crash_x{reps}")
    if os.path.exists(ready):
        os.remove(ready)
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_mp_sigkilled_delete, args=(out, ready))
    p.start()
    try:
        for _ in range(6000):
            if os.path.exists(ready):
                break
            time.sleep(0.1)
        else:
            raise RuntimeError("victim delete never reached mid-swap")
    finally:
        p.kill()
        p.join(60)
    lease_path = os.path.join(out, corpus_io.LEASE)
    with open(lease_path) as f:
        held = json.load(f)
    held["acquired_at"] = time.time() - 2 * float(held["ttl_sec"])
    with open(lease_path, "w") as f:
        json.dump(held, f)
    t0 = time.time()
    report = corpus_io.recover_corpus(out)  # no spark: rollback only
    w_roll = time.time() - t0
    assert report["rolled_back"], report
    t0 = time.time()
    assert corpus_io.verify_manifest(spark, out)
    w_verify = time.time() - t0
    # the rollback restored the pre-delete corpus exactly
    from pyspark.sql import functions as F  # noqa: F401

    n_after = corpus_io.read_corpus(spark, out).count()
    assert n_after == n_before, (n_after, n_before)
    return {
        "restored": len(report["restored"]),
        "rollback": w_roll,
        "verify": w_verify,
    }


def main() -> None:
    spark = get_spark("scale_delete")
    work = "/dev/shm/graft_delete"
    os.makedirs(work, exist_ok=True)
    rows = []
    for reps in (REPLICAS, REPLICAS2):
        print(f"[x{reps}]", flush=True)
        r = price_deletes(spark, reps, work)
        print(f"  x{reps}: {r}", flush=True)
        rows.append((f"x{reps}", r))
    print("[crash: SIGKILLed delete mid-swap]", flush=True)
    cr = crash_delete_and_recover(spark, REPLICAS, work)
    print(f"  crash x{REPLICAS}: {cr}", flush=True)
    (l1, r1), (l2, r2) = rows
    ratio_rows = r1["rows"] / r2["rows"]
    ratio_scan = r1["scan"] / max(r2["scan"], 1e-9)
    lines = [
        "",
        "## Predicate takedown at the decade (VERDICT r12 #1)",
        "",
        f"Generated by `tools/scale_delete.py {REPLICAS} {REPLICAS2}`:"
        " `delete_from_corpus` priced on the composite corpus at two"
        " scales — the standalone match scan (the O(corpus) pass an"
        " arbitrary predicate must pay), a scattered delete touching"
        " every partition, a SCOPED scattered delete (3 of the"
        " sources; rewrite bounded by matching partitions), and a"
        " whole-partition pull (may_vanish removal, no rewrite). Then"
        " a REAL `delete_from_corpus` call (own SparkSession,"
        " production code path) is blocked after its 2nd live->trash"
        " rename and SIGKILLed mid-swap; the dead holder's lease is"
        " aged past its TTL and recovery is timed rollback-only,"
        " with the optional O(corpus) verify pass separate.",
        "",
        "| corpus | rows | match scan | scattered delete (all parts) |"
        " scoped delete (3 parts) | partition pull |",
        "|---|---|---|---|---|---|",
    ]
    for label, r in rows:
        lines.append(
            f"| {label} | {r['rows']:,} | {r['scan']:.2f}s |"
            f" {r['scattered']:.2f}s ({r['scattered_rows']:,} rows) |"
            f" {r['scoped']:.2f}s ({r['scoped_rows']:,} rows) |"
            f" {r['pull']:.2f}s ({r['pull_rows']:,} rows) |"
        )
    lines += [
        "",
        f"Rows grew {ratio_rows:.0f}x between control and decade; the"
        f" match scan moved {ratio_scan:.1f}x ({r2['scan']:.2f}s ->"
        f" {r1['scan']:.2f}s) — the O(corpus) pass, as designed. The"
        " scoped delete's rewrite stays bounded by its 3 matching"
        " partitions and the whole-partition pull never rewrites (the"
        " partition is displaced via may_vanish and the manifest drops"
        " it at the commit point).",
        "",
        f"SIGKILLed delete mid-swap (x{REPLICAS} corpus,"
        f" {cr['restored']} partitions displaced before the kill):"
        f" rollback {cr['rollback'] * 1000:.1f} ms — bounded by touched"
        " partitions, not rows (same metadata-only shape as the"
        " compact-crash decade row) — optional verify pass"
        f" {cr['verify']:.2f}s; the restored corpus equals the"
        " pre-delete corpus exactly (row-count asserted, manifest"
        " verified).",
    ]
    with open("/root/repo/SCALING_DECADE2.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended SCALING_DECADE2.md", flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
