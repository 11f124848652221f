"""Vendored-dependency path management.

The only vendored dependency is ``vendor/miniproto`` — a minimal
pure-Python ``google.protobuf`` runtime that unblocks
``transformWithStateInPandas`` (its JVM<->Python state protocol is
protobuf-framed; pyspark ships the generated ``StateMessage_pb2`` module
but not the runtime). See ``vendor/miniproto/google/protobuf/__init__.py``
for scope and the reasoning.

Policy: a real ``protobuf`` installation always wins. The vendor
directory is appended only after ``import google.protobuf`` fails, and is
exported through ``PYTHONPATH`` so Spark's spawned Python workers (which
import the state-client modules when unpickling a StatefulProcessor)
resolve it too. The env export must therefore happen BEFORE the first
``SparkSession`` is created in the process — ``session.get_spark`` calls
:func:`ensure_protobuf` for exactly that reason.
"""

from __future__ import annotations

import os
import sys

_VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vendor",
    "miniproto",
)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable, preferring a real install.

    Returns True if the import works afterwards (real or vendored),
    False if even the vendored fallback is unavailable (repo layout
    changed) — callers gate transformWithStateInPandas on this.
    """
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_VENDOR_DIR, "google", "protobuf")):
        return False
    if _VENDOR_DIR not in sys.path:
        # append, not prepend: anything already importable keeps priority
        sys.path.append(_VENDOR_DIR)
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if _VENDOR_DIR not in parts:
        os.environ["PYTHONPATH"] = (
            existing + os.pathsep + _VENDOR_DIR if existing else _VENDOR_DIR
        )
    # a failed `import google` (namespace miss) can leave a partial entry
    for mod in ("google", "google.protobuf"):
        if mod in sys.modules and not hasattr(sys.modules[mod], "__path__"):
            del sys.modules[mod]
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_protobuf_for_session(spark) -> bool:
    """:func:`ensure_protobuf`, plus late-binding for a live JVM.

    ``os.environ['PYTHONPATH']`` only reaches Spark's python workers when
    set before the JVM spawns. If the caller (e.g. an external driver
    harness) created its SparkSession before importing this engine, the
    spawned transformWithStateInPandas runner would miss the vendor dir —
    so also merge it into ``sc.environment``, which the JVM folds into
    every spawned python worker's PYTHONPATH per-function (verified
    against the StreamingPythonRunner spawn path). Harmless if protobuf
    is real or the JVM already has the path.
    """
    if not ensure_protobuf():
        return False
    import google.protobuf as _gp

    vendored = (getattr(_gp, "__file__", "") or "").startswith(_VENDOR_DIR) or any(
        p.startswith(_VENDOR_DIR) for p in getattr(_gp, "__path__", [])
    )
    if not vendored:
        return True  # real protobuf: workers resolve it from site-packages
    sc = spark.sparkContext
    prev = sc.environment.get("PYTHONPATH", "")
    if _VENDOR_DIR not in prev.split(os.pathsep):
        sc.environment["PYTHONPATH"] = (
            prev + os.pathsep + _VENDOR_DIR if prev else _VENDOR_DIR
        )
    return True
