"""Crash recovery at the decade (VERDICT r11 #7): SIGKILL a maintenance
writer mid-swap against the x100 composite corpus and time
``recover_corpus``.

Claim under test — recovery cost is bounded by the TOUCHED-PARTITION
count, not corpus rows: the rollback is pure partition-directory
metadata work (listdir + per-touched-partition renames + manifest key
existence checks), so the same crash shape must recover in ~the same
wall on a x10 corpus and a x100 corpus. The optional full
``verify_manifest`` read-back is the O(corpus) step and is timed
SEPARATELY — that contrast is exactly why recover_corpus makes the
verification optional (``spark=None`` skips it).

Crash construction: a REAL spawned process acquires the production
lease, reproduces ``_staged_swap_write``'s exact on-disk sequence over
``TOUCHED`` partitions (staged copies + ``_swaplist.json``, fence,
empty-trash marker, then per-partition renames), halts mid-swap with
half the partitions displaced-and-swapped and half displaced-only, and
is SIGKILLed — nothing after the kill runs, the lease stays on disk
exactly as a machine crash leaves it (same worker shape as
tests/test_corpus_io.py's cross-process pin, scaled up). The parent
ages the dead holder's lease past its TTL (the documented arbitration)
and runs recovery.

Run (idle box): python tools/scale_recovery.py [REPLICAS [REPLICAS2]]
(default 100 10 — measures the big corpus, then the small control;
appends SCALING_DECADE2.md)
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
FRAG_ROWS = 2_000  # leave several files per partition, like ingest does


def _mp_sigkill_mid_swap(out_dir: str, touched_json: str,
                         ready_file: str) -> None:
    """Spawn target (module-level, importable): real lease, real staged
    state over the given partitions, halt mid-swap, wait for SIGKILL."""
    from flink_stream_processing_refarch_spark.operators import corpus_io

    touched = json.load(open(touched_json))
    lease = corpus_io.corpus_lease(out_dir, "compact")
    token = lease.__enter__()  # deliberately never exited
    staging = os.path.join(out_dir, f"_staging_{token}")
    trash = os.path.join(out_dir, f"_trash_{token}")
    for pkey in touched:
        shutil.copytree(
            os.path.join(out_dir, pkey), os.path.join(staging, pkey)
        )
    with open(os.path.join(staging, corpus_io.SWAPLIST), "w") as f:
        json.dump(touched, f)
    corpus_io.check_lease(out_dir, token)
    os.makedirs(trash, exist_ok=True)
    # first half: fully swapped (displaced + staged version live);
    # second half: displaced only (live missing) — the worst mixed state
    half = len(touched) // 2
    for i, pkey in enumerate(touched):
        os.rename(
            os.path.join(out_dir, pkey), os.path.join(trash, pkey)
        )
        if i < half:
            os.rename(
                os.path.join(staging, pkey), os.path.join(out_dir, pkey)
            )
    with open(ready_file, "w") as f:
        f.write(token)
    time.sleep(600)  # parent SIGKILLs here


def crash_and_recover(spark, docs, label: str, work: str) -> dict:
    """Build a corpus from ``docs``, SIGKILL a mid-swap writer against
    it, recover, and return the timings + shape."""
    import multiprocessing as mp

    from flink_stream_processing_refarch_spark.operators import corpus_io

    out = os.path.join(work, f"corpus_{label}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    manifest = corpus_io.write_partitioned_corpus(
        docs, out, max_records_per_file=FRAG_ROWS
    )
    w_build = time.time() - t0
    pkeys = sorted(manifest["partitions"])
    touched = pkeys[: max(4, len(pkeys) // 2)]
    tj = os.path.join(work, f"touched_{label}.json")
    with open(tj, "w") as f:
        json.dump(touched, f)
    ready = os.path.join(work, f"ready_{label}")
    if os.path.exists(ready):
        os.remove(ready)
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_mp_sigkill_mid_swap, args=(out, tj, ready))
    p.start()
    try:
        for _ in range(3600):
            if os.path.exists(ready):
                break
            time.sleep(0.1)
        else:
            raise RuntimeError("writer never reached the mid-swap window")
    finally:
        p.kill()
        p.join(60)
    # age the dead holder's lease past its TTL (documented arbitration)
    lease_path = os.path.join(out, corpus_io.LEASE)
    with open(lease_path) as f:
        held = json.load(f)
    held["acquired_at"] = time.time() - 2 * float(held["ttl_sec"])
    with open(lease_path, "w") as f:
        json.dump(held, f)
    t0 = time.time()
    report = corpus_io.recover_corpus(out)  # no spark: rollback only
    w_roll = time.time() - t0
    assert sorted(report["restored"]) == sorted(touched), (
        label, report)
    t0 = time.time()
    ok = corpus_io.verify_manifest(spark, out)
    w_verify = time.time() - t0
    assert ok, f"{label}: post-recovery manifest verification failed"
    return {
        "rows": manifest["total_rows"],
        "partitions": len(pkeys),
        "touched": len(touched),
        "build": w_build,
        "rollback": w_roll,
        "verify": w_verify,
    }


def main() -> None:
    from pyspark.sql import functions as F

    from flink_stream_processing_refarch_spark.schemas import load_table

    spark = get_spark("scale_recovery")
    work = f"/dev/shm/graft_recovery_x{REPLICAS}"
    os.makedirs(work, exist_ok=True)
    base = load_table(spark, SF01, "documents").select(
        "doc_id", "text", "source"
    )
    rows = []
    for label, reps in ((f"x{REPLICAS}", REPLICAS),
                        (f"x{REPLICAS2}", REPLICAS2)):
        comp = base.crossJoin(
            spark.range(reps).select(F.col("id").alias("rep"))
        ).select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000))
            .alias("doc_id"),
            "text",
            "source",
        )
        print(f"[{label}]", flush=True)
        r = crash_and_recover(spark, comp, label, work)
        print(f"  {label}: {r}", flush=True)
        rows.append((label, r))
    (l1, r1), (l2, r2) = rows  # big first, small control second
    lines = [
        "",
        "## Crash recovery at the decade (VERDICT r11 #7)",
        "",
        f"Generated by `tools/scale_recovery.py {REPLICAS} {REPLICAS2}`:"
        " a REAL spawned process acquires the production lease,"
        " reproduces the staged swap's exact on-disk sequence over half"
        " the corpus's partitions (half of those fully swapped, half"
        " displaced-only), and is SIGKILLed mid-swap — nothing after"
        " the kill runs, the dead holder's lease stays on disk and is"
        " aged past its TTL before recovery (the documented"
        " arbitration). `recover_corpus` (rollback only, no read-back)"
        " is timed separately from the optional O(corpus)"
        " `verify_manifest` pass, which must succeed afterwards.",
        "",
        "| corpus | rows | partitions | touched | rollback wall |"
        " verify wall (O(corpus), optional) |",
        "|---|---|---|---|---|---|",
    ]
    for label, r in rows:
        lines.append(
            f"| {label} | {r['rows']:,} | {r['partitions']} |"
            f" {r['touched']} | {r['rollback'] * 1000:.1f} ms |"
            f" {r['verify']:.2f}s |"
        )
    ratio_rows = r1["rows"] / r2["rows"]
    ratio_roll = r1["rollback"] / max(r2["rollback"], 1e-9)
    lines += [
        "",
        f"Rows grew {ratio_rows:.0f}x between the control and the"
        f" decade corpus; rollback wall moved {ratio_roll:.1f}x"
        " (same touched-partition count both runs) — recovery cost is"
        " bounded by touched partitions, not corpus rows; the"
        " verify pass carries the data-sized cost and is the part"
        " recover_corpus makes optional.",
    ]
    with open("/root/repo/SCALING_DECADE2.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended recovery decade to SCALING_DECADE2.md")


if __name__ == "__main__":
    main()
