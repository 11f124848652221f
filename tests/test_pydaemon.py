"""Preloaded worker daemon (pydaemon) wiring pins.

The daemon module is launched by the JVM as ``python -m`` in a fresh
interpreter that only sees PYTHONPATH — these pins keep the three
pieces of that contract from drifting apart: the module must import
standalone, the session factory must both export the path and set the
config, and a pandas UDF must round-trip through workers forked from
the custom daemon (the conftest session already runs under it).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pandas as pd
from pyspark.sql import functions as F


def test_pydaemon_module_imports_and_preloads():
    from flink_stream_processing_refarch_spark import pydaemon

    # best-effort by contract: must never raise
    pydaemon._preload()


def test_pydaemon_resolvable_in_fresh_interpreter():
    """Exactly what the JVM does: fresh python, PYTHONPATH-only import."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo_root)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import flink_stream_processing_refarch_spark.pydaemon as d; d._preload(); "
            "import sys; print('numpy' in sys.modules and 'pandas' in sys.modules)",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip() == "True"


def test_session_configures_daemon_and_udfs_run(spark):
    assert (
        spark.conf.get("spark.python.daemon.module", "")
        == "flink_stream_processing_refarch_spark.pydaemon"
    )
    # PYTHONPATH export happened before the JVM spawned
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert repo_root in os.environ.get("PYTHONPATH", "").split(os.pathsep)

    @F.pandas_udf("long")
    def twice(x: pd.Series) -> pd.Series:
        return x * 2

    got = (
        spark.range(0, 10, 1, 4)
        .select(F.sum(twice("id")).alias("s"))
        .collect()[0]["s"]
    )
    assert got == 90
