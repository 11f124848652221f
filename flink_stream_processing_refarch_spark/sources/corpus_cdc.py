"""Corpus CDC as a Structured Streaming SOURCE (r14).

The batch CDC readers (``corpus_changes_since`` /
``corpus_changes_vs_manifest``) answer "what changed since X" on
demand; this module turns the same metadata into a continuous feed —
``spark.readStream.format("corpus_cdc")`` — the shape a standing
incremental consumer (index maintainer, mirror sync, embedding
backfill) actually wants, and the corpus-side analogue of a table
format's streaming source (e.g. Delta's, which this deliberately
mirrors in contract, not code).

Built on Spark 4's Python DataSource API (``pyspark.sql.datasource``
— the official extension point for custom sources, executed over
Arrow):

- OFFSETS are commit tokens. Each micro-batch covers the commit-log
  interval (start_token, end_token]; both endpoints' stamped manifests
  live in ``_manifest_history/`` (every commit mirrors one), so the
  batch's change set is an O(partitions-dict) diff
  (``corpus_io._diff_partitions``) — no data scanned to PLAN a batch.
- PARTITIONS: one ``InputPartition`` per changed corpus partition
  (its exact committed file list rides in the task) plus one per
  removed partition (a tombstone task). Reads happen executor-side
  via pyarrow over only the changed files — O(changed), never
  O(corpus), the same scale shape as the batch readers.
- ROWS: the changed partition's CURRENT-as-of-end_token content with
  ``_change_type='update'``, or a single all-null-data tombstone with
  ``_change_type='remove'`` per removed partition. ``_commit_token``
  carries the batch's end token (batch-INTERVAL metadata: how commits
  group into micro-batches depends on poll timing, so exactly-once
  consumers key on the row content + change type, which IS
  batch-split-invariant, not on the token column).
- REPLAY: offsets are durable in the stream's checkpoint; a restarted
  query re-plans the same (start, end] interval from the same two
  history manifests — deterministic while the tokens stay within the
  16-commit history window. A consumer further behind than that gets
  the same loud ``ValueError`` contract as the batch reader (resync
  via ``corpus_changes_vs_manifest``, then restart the stream from
  the current token).

Schema is FIXED at stream start (current manifest schema + typed
partition columns + the two CDC columns). A mid-stream widening
surfaces as nulls for the new column until the consumer restarts —
the standard streaming-source contract (schema_changed is visible in
the manifests for consumers that care).

Scale notes: the per-batch planning cost is two history-manifest
reads on the driver; the read cost is the changed files only,
pyarrow-batched executor-side. At 100 TB the same design points at
the metastore's manifest log and object-store files; nothing here
holds state proportional to the corpus.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

CHANGE_COL = "_change_type"
TOKEN_COL = "_commit_token"


class _CdcTask(InputPartition):
    """One changed (or removed) corpus partition in one micro-batch."""

    def __init__(self, out_dir, pkey, files, kind, end_token):
        self.out_dir = out_dir
        self.pkey = pkey
        self.files = tuple(files)
        self.kind = kind  # "update" | "remove"
        self.end_token = end_token


def _manifest_at(out_dir: str, token: str) -> dict:
    from ..operators.corpus_io import MANIFEST_HISTORY, MANIFEST_HISTORY_KEEP

    path = os.path.join(out_dir, MANIFEST_HISTORY, f"manifest_{token}.json")
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"corpus_cdc: no history manifest for offset token {token!r} "
            f"— the stream fell more than {MANIFEST_HISTORY_KEEP} commits "
            "behind (or the corpus was recreated). Resync via "
            "corpus_changes_vs_manifest with a retained manifest, then "
            "restart the stream from the current token"
        ) from None


def _cdc_schema(manifest: dict) -> StructType:
    from pyspark.sql.types import StringType, StructField

    if manifest.get("schema") is None:
        raise ValueError(
            "corpus_cdc: the corpus manifest records no schema "
            "(pre-r12 corpus) — rewrite once with any writer first"
        )
    base = StructType.fromJson(manifest["schema"])
    return StructType(
        list(base.fields)
        + [
            StructField(CHANGE_COL, StringType(), False),
            StructField(TOKEN_COL, StringType(), False),
        ]
    )


class CorpusCDCStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._out = options["path"]
        self._since = options.get("since_token")

    # -- offsets ------------------------------------------------------
    def initialOffset(self) -> dict:
        from ..operators.corpus_io import _current_manifest

        token = self._since or _current_manifest(self._out)["writer_token"]
        # fail fast if the start token is already past the history
        _manifest_at(self._out, token)
        return {"token": token}

    def latestOffset(self) -> dict:
        from ..operators.corpus_io import _current_manifest

        return {"token": _current_manifest(self._out)["writer_token"]}

    # -- planning (driver, metadata-only) -----------------------------
    def partitions(self, start: dict, end: dict):
        if start["token"] == end["token"]:
            return [
                _CdcTask(self._out, "", (), "noop", end["token"])
            ]  # Spark requires >=1 partition; the task yields nothing
        old = _manifest_at(self._out, start["token"])
        new = _manifest_at(self._out, end["token"])
        from ..operators.corpus_io import _diff_partitions

        changed, removed, _schema_changed = _diff_partitions(old, new)
        files = new.get("files") or {}
        missing = [p for p in changed if not files.get(p)]
        if missing:
            raise ValueError(
                f"corpus_cdc: manifest {end['token']!r} records no file "
                f"list for changed partition(s) {missing} (pre-r14 "
                "manifest?) — the feed cannot name that version's bytes; "
                "rewrite the corpus once with any r14 writer"
            )
        # one task per changed FILE, not per changed partition: the
        # batch's read parallelism must track the changed data volume
        # (a single hot partition still fans out across executors),
        # matching how the JVM parquet scan would split the same files
        tasks = [
            _CdcTask(self._out, pkey, (name,), "update", end["token"])
            for pkey in changed
            for name in (files.get(pkey) or ())
        ] + [
            _CdcTask(self._out, pkey, (), "remove", end["token"])
            for pkey in removed
        ]
        return tasks or [
            _CdcTask(self._out, "", (), "noop", end["token"])
        ]

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint

    # -- execution (executor-side, changed files only) ----------------
    def read(self, partition: _CdcTask):
        """Yields pyarrow RecordBatches (the API's Arrow fast path —
        rows never pass through Python objects; a tuple-yield version
        measured ~6x slower than the plain JVM corpus read at the
        x1000 decade, the Arrow form is what makes the O(changed)
        claim hold in wall time, see SCALING_DECADE2.md)."""
        if partition.kind == "noop":
            return
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self._schema)
        fields = self._schema.fields[:-2]  # data + partition columns
        pvals = _pkey_values(partition.pkey, fields)

        def const(val, idx, n):
            return pa.array([val] * n, type=arrow_schema.field(idx).type)

        if partition.kind == "remove":
            yield pa.RecordBatch.from_arrays(
                [const(pvals.get(f.name), i, 1) for i, f in enumerate(fields)]
                + [
                    const("remove", len(fields), 1),
                    const(partition.end_token, len(fields) + 1, 1),
                ],
                schema=arrow_schema,
            )
            return
        import pyarrow.parquet as pq

        for name in partition.files:
            table = pq.read_table(
                os.path.join(partition.out_dir, partition.pkey, name)
            )
            n = table.num_rows
            arrays = []
            for i, f in enumerate(fields):
                if f.name in table.column_names:
                    col = table.column(f.name)
                    col = col.cast(arrow_schema.field(i).type)
                    arrays.append(col.combine_chunks())
                else:
                    # partition column (not stored in the file) or a
                    # column newer than this file (schema widening):
                    # constant partition value / null-fill
                    arrays.append(const(pvals.get(f.name), i, n))
            arrays.append(const("update", len(fields), n))
            arrays.append(const(partition.end_token, len(fields) + 1, n))
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def _pkey_values(pkey: str, fields) -> dict:
    """Typed partition values parsed from the Hive-escaped pkey, cast
    per the declared schema (partition values are physically strings;
    the manifest schema knows their true type)."""
    from ..operators.corpus_io import HIVE_NULL, _hive_unescape

    out = {}
    if not pkey:
        return out
    ftypes = {f.name: f.dataType.typeName() for f in fields}
    for part in pkey.split("/"):
        k, _, v = part.partition("=")
        if v == HIVE_NULL:
            out[k] = None
            continue
        val = _hive_unescape(v)
        t = ftypes.get(k, "string")
        if t in ("long", "integer", "short", "byte"):
            out[k] = int(val)
        elif t in ("double", "float"):
            out[k] = float(val)
        else:
            out[k] = val
    return out


class CorpusCDCDataSource(DataSource):
    """``spark.readStream.format("corpus_cdc").option("path", dir)``.

    Options: ``path`` (corpus root, required); ``since_token``
    (optional — start the feed after that commit; default = the
    current commit at stream start, i.e. future changes only)."""

    @classmethod
    def name(cls) -> str:
        return "corpus_cdc"

    def schema(self) -> StructType:
        from ..operators.corpus_io import _current_manifest

        return _cdc_schema(_current_manifest(self.options["path"]))

    def streamReader(self, schema: StructType) -> CorpusCDCStreamReader:
        return CorpusCDCStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotent session registration of the corpus_cdc format."""
    spark.dataSource.register(CorpusCDCDataSource)
