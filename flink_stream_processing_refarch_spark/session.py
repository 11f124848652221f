"""SparkSession factory tuned for this engine.

Local mode is the test harness; the config discipline (AQE, shuffle
partition sizing, Arrow, UTC) is what we would ship to a 1000-executor
cluster — only master/memory change there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .vendorpath import ensure_protobuf


def _export_pydaemon_pythonpath() -> str | None:
    """Export the repo root on PYTHONPATH and name the preload daemon.

    ``spark.python.daemon.module`` makes the JVM launch
    ``python -m <module>`` for the worker daemon; the module must be
    importable in that fresh interpreter, which only sees the
    ``PYTHONPATH`` env var — set it BEFORE the JVM spawns, exactly like
    :func:`vendorpath.ensure_protobuf`. Returns the module name to
    configure, or None to keep the stock daemon (repo layout changed,
    or ``SPARK_GRAFT_STOCK_DAEMON=1`` for A/B probes)."""
    if os.environ.get("SPARK_GRAFT_STOCK_DAEMON"):
        return None
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isfile(os.path.join(pkg_dir, "pydaemon.py")):
        return None
    repo_root = os.path.dirname(pkg_dir)
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if repo_root not in parts:
        os.environ["PYTHONPATH"] = (
            existing + os.pathsep + repo_root if existing else repo_root
        )
    return "flink_stream_processing_refarch_spark.pydaemon"


def get_spark(
    app_name: str = "flink_stream_processing_refarch_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    Defaults follow the env contract: ``local[$SPARK_GRAFT_CPUS]`` and
    shuffle partitions sized to the core count (not the 200 default, which
    produces tiny partitions locally; on a real cluster this is set to
    ~2-3x total cores instead).
    """
    # Must run before the JVM spawns: exports the miniproto vendor dir on
    # PYTHONPATH so Spark's python workers can import google.protobuf
    # (transformWithStateInPandas state protocol). No-op when the real
    # protobuf distribution is installed.
    ensure_protobuf()
    # Also before the JVM spawns: make the preloaded worker daemon
    # (`pydaemon.py` — numpy/pandas/pyarrow imported once in the daemon,
    # inherited COW by every forked worker) resolvable from the spawned
    # `python -m`. Removes the per-respawn import pass after Spark's
    # >60s idle-worker reaper and shares module memory across workers.
    daemon_module = _export_pydaemon_pythonpath()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # r14 optimization round: InferFiltersFromGenerate injects
        # `size(e) > 0 AND isnotnull(e)` below every explode; after
        # project-collapse both predicates re-evaluate the FULL array
        # expression, so every explode-of-computed-array plan (shingles,
        # word n-grams, minhash bands — the engine's hottest map work)
        # paid the array construction 3x per row. The arrays here are
        # non-empty by construction and the explode itself drops
        # null/empty inputs, so the inferred filters are semantically
        # redundant — excluding the rule changes no results (verified:
        # full 174-entry oracle sweep) and cut the decontaminate-shape
        # plan 2.5-3x (noop-isolated A/B: 2.8-3.1 s -> 0.8-1.2 s at
        # sf0.1). Scale-independent: the win is per-row map cost, not a
        # local-core-count artifact.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # testdata events.ts is TIMESTAMP(NANOS) — read as BIGINT nanos
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if daemon_module:
        builder = builder.config("spark.python.daemon.module", daemon_module)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
