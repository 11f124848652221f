"""Preloaded Python worker daemon: COW-share the heavy imports.

Spark forks Python workers from a long-lived daemon process
(``pyspark/daemon.py``) and its ``PythonWorkerFactory`` reaps workers
idle for more than one minute (``IDLE_WORKER_TIMEOUT_NS``, hardcoded —
not configurable as of Spark 4.1). A respawned worker lazily imports
numpy + pandas + pyarrow on its first Arrow batch. Preloading those
modules in the DAEMON process makes every forked worker inherit the
already-initialized modules via copy-on-write: a respawn costs a fork
instead of an import pass, and the interpreter/module memory is shared
across all 32 workers instead of duplicated per worker.

Scope honesty (README r14): this was built while chasing the
``pq_ingest_streaming`` bench oscillation and measurably did NOT fix
it — the real cost was first-touch fault storms on the bench VM's
memory backend hitting the encoder's oversized numpy intermediates,
fixed in ``similarity._pq_codes_udf``. The preload stays because it is
cheap, strictly reduces per-respawn import work (instrumented: a
preloaded fresh worker reaches the UDF body in ~0.25 s), and lowers
aggregate worker RSS on every pandas-UDF stage.

Activated by ``spark.python.daemon.module`` in ``session.get_spark``;
the JVM launches ``python -m flink_stream_processing_refarch_spark.pydaemon``, which the
session factory makes resolvable by exporting the repo root on
``PYTHONPATH`` before the JVM spawns (same pre-spawn contract as
``vendorpath.ensure_protobuf``). Preloading is an optimization only:
any import failure here is swallowed and the stock daemon behavior
(lazy per-worker imports) remains correct. ``SPARK_GRAFT_STOCK_DAEMON=1``
restores the stock daemon for A/B probes.
"""

from __future__ import annotations


def _preload() -> None:
    """Import the modules a pandas-UDF worker touches on its first batch.

    Best-effort by design — a worker can always import lazily, so the
    daemon must never fail to start because an optional preload did.
    """
    try:
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
    except Exception:  # pragma: no cover - absent libs fall back to lazy
        return
    try:
        # Arrow IPC + the pandas serializer stack used by ArrowStreamPandas
        # serializers; cheap once numpy/pandas/pyarrow are in.
        import pyarrow.ipc  # noqa: F401
        import pyspark.sql.pandas.serializers  # noqa: F401
        import pyspark.sql.pandas.types  # noqa: F401
    except Exception:  # pragma: no cover
        pass


if __name__ == "__main__":
    _preload()
    from pyspark.daemon import manager

    manager()
