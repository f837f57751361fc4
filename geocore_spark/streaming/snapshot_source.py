"""Snapshot change feed as a native Structured Streaming SOURCE — the
Spark 4 Python Data Source API over sources/snapshots.py's commit log:

    from geocore_spark.streaming.snapshot_source import register
    register(spark)
    ch = (spark.readStream.format("snapshot_changes")
          .option("path", table_root)
          .option("startingVersion", 0)        # default: table start
          .load())
    # ch: table columns + _change_type ('insert'|'delete') + _commit_version

This is the push counterpart of polling ``read_changes``: a long-lived
incremental consumer (replicate a table, maintain a rollup, feed a
downstream index) gets offset tracking, restart recovery and
micro-batch scheduling from the streaming engine instead of hand-rolled
cursors. Offsets are commit-log versions — {"version": N} — so replay
is deterministic (manifests are immutable) and a restart resumes from
the checkpointed version exactly.

Scale + execution shape:

- **Planning is metadata-only and JVM-free.** The driver-side planner
  reads manifests through ``pyarrow.fs`` (works for file://, hdfs://,
  s3://): one JSON per version, never a data-file listing. Each
  micro-batch plans one InputPartition per changed FILE, so read
  parallelism == changed-file count, and a partition reads only its own
  file (plus, for delete commits, the commit's vector files) in the
  Python worker via pyarrow — O(changed bytes) per batch, never a table
  scan.
- **Rows travel as Arrow RecordBatches** cast to the declared schema
  (name-based reconciliation like the batch reader: columns added later
  null-fill, dropped ones are projected away), not per-row tuples.
- **Refusals match read_changes**: an overwrite/rollback commit in the
  offset range fails the stream loudly (not row-incremental); an
  expired manifest mid-range likewise — expire policy must retain the
  versions between a consumer's checkpoints.

Known edge: a table ROOT containing a literal ``%`` double-unquotes in
the JVM-free path resolution (the batch reader handles it exactly —
sources/stats.decode_file_url); spaces and unicode are fine.

Trigger note: the Python data source API (4.1) does not expose
Trigger.AvailableNow support, so Spark logs a warning and falls back to
single-batch execution for that trigger — the drain still lands every
pending commit in one batch and checkpoints it (pinned by tests); use
processingTime triggers for continuous tailing.

The schema is fixed at stream start (the latest manifest's, in
streaming a schema can't change mid-query); commits that evolve the
schema are metadata-only and replay fine, but columns added AFTER the
stream started only appear on restart.

Reference analogue: the reference's warehouse consumers get this from
Snowflake streams/tasks (woodgilber/GeoCore modeling/datasets/base.py
warehouse tables); here the engine owns the feed end to end.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

# column names mirror sources/snapshots.py (kept in sync by
# tests/test_snapshot_source.py::test_reserved_names_match)
_DV_FILE = "_gc_file"
_DV_POS = "_gc_pos"
_CDC_TYPE = "_change_type"
_CDC_VERSION = "_commit_version"


# ---------------------------------------------------------------------------
# JVM-free manifest access (planner runs in a plain Python process)
# ---------------------------------------------------------------------------


def _fs_for(path: str):
    from pyarrow import fs as pafs

    if "://" not in path:
        return pafs.LocalFileSystem(), path
    if path.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return pafs.LocalFileSystem(), unquote(urlparse(path).path)
    f, p = pafs.FileSystem.from_uri(path)
    return f, p


def _read_json(root: str, name: str) -> dict:
    f, p = _fs_for(root.rstrip("/") + "/" + name)
    with f.open_input_file(p) as fh:
        return json.loads(fh.read().decode("utf-8"))


def _latest_version(root: str) -> int | None:
    from pyarrow import fs as pafs

    f, p = _fs_for(root.rstrip("/") + "/_log")
    infos = f.get_file_info(pafs.FileSelector(p, allow_not_found=True))
    vs = []
    for i in infos:
        n = i.base_name
        if n.startswith("v") and n.endswith(".json"):
            vs.append(int(n[1:-5]))
    return max(vs) if vs else None


def _manifest(root: str, version: int) -> dict:
    try:
        return _read_json(root, f"_log/v{version:08d}.json")
    except FileNotFoundError:
        raise ValueError(
            f"snapshot version {version} at {root} has no manifest "
            "(expired or never committed) — the stream's offset range is "
            "gone; expire policy must retain versions between consumer "
            "checkpoints"
        )


def _local(path: str) -> str:
    """pyarrow-readable path from a manifest's (possibly URI) file path."""
    _, p = _fs_for(path)
    return p


# ---------------------------------------------------------------------------
# the data source
# ---------------------------------------------------------------------------


@dataclass
class _Piece(InputPartition):
    kind: str  # 'insert' | 'delete'
    file: str  # the data file this partition reads (manifest spelling)
    version: int
    dv_files: tuple  # delete partitions: the commit's NEW vector files
    esc: str = ""  # delete partitions: the file's URI-escaped vector spelling


class SnapshotChangeReader(DataSourceStreamReader):
    def __init__(self, root: str, schema: StructType, start_version: int):
        self._root = root
        self._schema = schema
        self._start = start_version

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        latest = _latest_version(self._root)
        if latest is None:
            raise ValueError(f"no committed snapshot at {self._root}")
        return {"version": latest}

    def partitions(self, start: dict, end: dict):
        pieces: list[_Piece] = []
        since, until = start["version"], end["version"]
        prev = _manifest(self._root, since) if since >= 1 else None
        for v in range(since + 1, until + 1):
            m = _manifest(self._root, v)
            op = m["operation"]
            if op in ("overwrite", "rollback"):
                raise ValueError(
                    f"v{v} is a {op!r} commit — not row-incremental; "
                    "restart the stream from a full snapshot instead"
                )
            if op in ("create", "append", "merge"):
                if op == "merge":
                    new_dv = sorted(
                        set(m["delete_files"])
                        - set(prev["delete_files"] if prev else [])
                    )
                    pieces += self._delete_pieces(new_dv, v)
                new = sorted(
                    set(m["data_files"]) - set(prev["data_files"] if prev else [])
                )
                pieces += [_Piece("insert", f, v, ()) for f in new]
            elif op == "delete":
                new_dv = sorted(
                    set(m["delete_files"])
                    - set(prev["delete_files"] if prev else [])
                )
                pieces += self._delete_pieces(new_dv, v)
            elif op not in ("rewrite", "evolve", "compact"):
                raise ValueError(f"unknown commit operation {op!r} at v{v}")
            prev = m
        # zero-partition plans upset some engine paths; an empty piece
        # list is legal here (Spark handles empty batches)
        return pieces

    def _delete_pieces(self, new_dv: list[str], version: int) -> list[_Piece]:
        if not new_dv:
            return []
        import pyarrow.parquet as pq

        named: set[str] = set()
        for vf in new_dv:
            named |= set(
                pq.read_table(_local(vf), columns=[_DV_FILE])[_DV_FILE]
                .to_pylist()
            )
        # vector _gc_file holds Spark's URI-escaped file_path; manifests
        # and therefore insert pieces hold the decoded rendering — one
        # partition per NAMED file, vectors re-read (and filtered to the
        # file) worker-side so position lists never ride the plan
        from urllib.parse import unquote

        return [
            _Piece("delete", unquote(f), version, tuple(new_dv), esc=f)
            for f in sorted(named)
        ]

    def read(self, partition: _Piece):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        out_schema = to_arrow_schema(self._schema)
        data_fields = [
            f for f in out_schema
            if f.name not in (_CDC_TYPE, _CDC_VERSION)
        ]
        t = pq.read_table(_local(partition.file))
        if partition.kind == "delete":
            # this commit's vectors, filtered to THIS file: compare in
            # the vectors' own URI-escaped spelling (carried on the
            # piece), never re-encode — quote()'s safe-set would have to
            # match Spark's escaping exactly
            import pyarrow.compute as pc

            pos: list[int] = []
            for vf in partition.dv_files:
                vt = pq.read_table(_local(vf))
                mask = pc.equal(vt[_DV_FILE], partition.esc)
                pos += vt.filter(mask)[_DV_POS].to_pylist()
            t = t.take(sorted(pos))
        n = t.num_rows
        cols = []
        for f in data_fields:
            if f.name in t.column_names:
                cols.append(t[f.name].combine_chunks().cast(f.type))
            else:  # added after this file was written: null-fill
                cols.append(pa.nulls(n, type=f.type))
        cols.append(
            pa.array([partition.kind] * n, type=pa.string()).cast(
                out_schema.field(_CDC_TYPE).type
            )
        )
        cols.append(
            pa.array([partition.version] * n, type=pa.int32()).cast(
                out_schema.field(_CDC_VERSION).type
            )
        )
        yield from pa.Table.from_arrays(cols, schema=out_schema).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint


class SnapshotChangeDataSource(DataSource):
    """spark.readStream.format("snapshot_changes").option("path", root)"""

    @classmethod
    def name(cls) -> str:
        return "snapshot_changes"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("option 'path' (the snapshot table root) is required")
        return root

    def schema(self) -> StructType:
        latest = _latest_version(self._root())
        if latest is None:
            raise ValueError(f"no committed snapshot at {self._root()}")
        m = _manifest(self._root(), latest)
        base = StructType.fromJson(json.loads(m["schema"]))
        from pyspark.sql.types import IntegerType, StringType, StructField

        return StructType(
            list(base.fields)
            + [
                StructField(_CDC_TYPE, StringType(), False),
                StructField(_CDC_VERSION, IntegerType(), False),
            ]
        )

    def streamReader(self, schema: StructType) -> SnapshotChangeReader:
        start = int(self.options.get("startingVersion", 0))
        return SnapshotChangeReader(self._root(), schema, start)


def register(spark) -> None:
    """Register the format; idempotent per session."""
    spark.dataSource.register(SnapshotChangeDataSource)
