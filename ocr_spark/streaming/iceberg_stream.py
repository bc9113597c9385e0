"""Incremental (tailing) read of an iceberg-lite table as a streaming source.

Real Iceberg exposes committed appends as a micro-batch stream
(``spark.readStream.format("iceberg").option("stream-from-timestamp", ...)``);
this is the same contract for iceberg-lite, built on PySpark 4's Python
DataSource API (``pyspark.sql.datasource``): the stream OFFSET is the table's
manifest **sequence number**, each micro-batch reads exactly the data files
first published by the snapshots in ``(start, end]``, and only COMMITTED
snapshots are ever visible (a crashed writer's orphan data dir has no
manifest, so the tailer never sees it — the same read-committed guarantee as
the batch path, tests/test_resume.py).

Why this matters at crawl scale: the ingest pipeline appends a snapshot per
segment; downstream consumers (dedup increments, validators, metrics) want
"every committed row exactly once" without rescanning the 10^12-row table.
Offsets are snapshot sequences — restart from checkpoint resumes at the last
committed sequence, never re-reading or skipping a snapshot (exactly-once
per row with the parquet/memory sinks' idempotent commit).

Semantics mirror Iceberg's incremental read:
- only APPEND snapshots stream (an append's entry set is a superset of its
  parent's). overwrite / compact / merge_into REPLACE files; replaying them
  would duplicate or re-emit rewritten rows, so by default the reader raises
  — ``onReplace=ignore`` skips them instead (documented lossy: rows first
  added BY a replacing snapshot are not streamed), matching Iceberg's
  refusal of non-append history in incremental scans.
- partition-parallel: each parquet FILE of each new snapshot is one input
  partition, read on executors with pyarrow and yielded as Arrow record
  batches (zero row-at-a-time Python). Hive partition values recorded in
  the manifest entry are restored as constant columns, like the batch
  reader's ``basePath`` handling.

Reference analog: the segment lifecycle's "process only segments not yet
committed" resume scan (batch_folder_process.py:819-876) — transposed from
a per-run directory diff to a durable streaming offset.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..sources.iceberg_lite import IcebergLiteTable

FORMAT_NAME = "iceberg_lite_stream"


@dataclass
class _FilePartition(InputPartition):
    path: str
    # (col, value) pairs from the manifest entry's hive partition dir,
    # restored as constant columns (parquet files under col=val dirs do
    # not store the column itself)
    partition_values: tuple


def _own_entries(snap: dict) -> list[dict]:
    """The entries a snapshot ADDED: its data lives under
    data/<snapshot_id>/ (manifests record the cumulative entry set)."""
    sid = snap["snapshot_id"]
    marker = f"{os.sep}{sid}"
    out = []
    for e in IcebergLiteTable._entries_of(snap):
        base = e.get("base", e["dir"])
        if base.rstrip(os.sep).endswith(marker):
            out.append(e)
    return out


def _is_append(snap: dict, parent: dict | None) -> bool:
    """Append <=> every parent entry survives into this snapshot.
    overwrite/compact/merge_into rewrite or drop parent files."""
    if parent is None:
        return True
    cur = {e["dir"] for e in IcebergLiteTable._entries_of(snap)}
    prev = {e["dir"] for e in IcebergLiteTable._entries_of(parent)}
    return prev <= cur


def _parquet_files(data_dir: str) -> list[str]:
    files = []
    for root, _, names in os.walk(data_dir):
        for fn in sorted(names):
            if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                files.append(os.path.join(root, fn))
    return files


class IcebergLiteStreamReader(DataSourceStreamReader):
    """Offsets are ``{"sequence": n}`` = "all snapshots with sequence <= n
    consumed". partitions() (driver) lists the new snapshots' parquet files;
    read() (executors) streams each file's Arrow batches."""

    def __init__(self, root: str, schema: StructType, options: dict):
        self._root = root
        self._schema = schema
        start = int(options.get("startingsequence", "-1"))
        self._initial = start
        self._on_replace = str(options.get("onreplace", "fail")).lower()
        if self._on_replace not in ("fail", "ignore"):
            raise ValueError(
                f"onReplace must be fail|ignore, got {self._on_replace!r}"
            )

    # -- offsets (driver) ---------------------------------------------------
    def initialOffset(self) -> dict:
        return {"sequence": self._initial}

    def latestOffset(self) -> dict:
        snap = IcebergLiteTable(self._root).current_snapshot()
        seq = snap["sequence"] if snap else self._initial
        return {"sequence": max(seq, self._initial)}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["sequence"], end["sequence"]
        table = IcebergLiteTable(self._root)
        snaps = {s["sequence"]: s for s in table.snapshots()}
        parts: list[_FilePartition] = []
        for seq in range(lo + 1, hi + 1):
            snap = snaps.get(seq)
            if snap is None:
                # expired between latestOffset and here; its rows are gone
                # from every later manifest too — fail loud like Iceberg
                raise ValueError(
                    f"snapshot sequence {seq} expired before it was streamed"
                )
            if not _is_append(snap, snaps.get(seq - 1)):
                if self._on_replace == "fail":
                    raise ValueError(
                        f"snapshot {snap['snapshot_id']} (sequence {seq}) "
                        "replaces files (overwrite/compact/merge); "
                        "incremental read supports append-only history — "
                        "set onReplace=ignore to skip replace snapshots"
                    )
                continue
            for e in _own_entries(snap):
                pv = tuple(sorted((e.get("partition") or {}).items()))
                for f in _parquet_files(e["dir"]):
                    parts.append(_FilePartition(path=f, partition_values=pv))
        # empty batches are legal (planner still needs >=1 partition on
        # some paths; returning [] is supported by the Python source API)
        return parts

    # -- data (executors) ---------------------------------------------------
    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        table = pq.read_table(partition.path)
        n = table.num_rows
        for col, val in partition.partition_values:
            if col not in table.column_names:
                field = target.field(col) if col in target.names else None
                typ = field.type if field is not None else pa.string()
                table = table.append_column(
                    col, pa.array([val] * n, type=pa.string()).cast(typ)
                )
        # align column order + types with the declared stream schema
        table = table.select(target.names).cast(pa.schema(target))
        for batch in table.to_batches():
            yield batch

    def commit(self, end: dict) -> None:
        # offsets are durable in the query checkpoint; the table keeps its
        # own snapshots until expire_snapshots(), nothing to clean up here
        pass


class IcebergLiteStreamDataSource(DataSource):
    """``spark.readStream.format("iceberg_lite_stream")`` source.

    Options:
      path              table root (required)
      startingSequence  last-consumed sequence (default -1 = from genesis;
                        pass the current sequence to tail only NEW appends)
      onReplace         fail (default) | ignore — what to do when history
                        contains an overwrite/compact/merge snapshot
    Schema: pass ``.schema(...)`` explicitly, or it is inferred from the
    newest committed snapshot's parquet footer + manifest partition keys.
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("iceberg_lite_stream requires option 'path'")
        return root

    def schema(self) -> str:
        from pyspark.sql.pandas.types import from_arrow_schema
        import pyarrow.parquet as pq

        table = IcebergLiteTable(self._root())
        entries = table.entries()
        if not entries:
            raise ValueError(
                "cannot infer schema: table has no committed snapshot; "
                "pass .schema(...) explicitly"
            )
        e = entries[-1]
        files = _parquet_files(e["dir"])
        struct = from_arrow_schema(pq.read_schema(files[0]))
        for col in (e.get("partition") or {}):
            if col not in struct.names:
                struct = struct.add(col, "string")
        return struct

    def streamReader(self, schema: StructType) -> IcebergLiteStreamReader:
        return IcebergLiteStreamReader(self._root(), schema, dict(self.options))


def register(spark) -> None:
    """Idempotent registration of the source with a SparkSession."""
    spark.dataSource.register(IcebergLiteStreamDataSource)


def read_table_stream(spark, root: str, schema=None,
                      starting_sequence: int = -1,
                      on_replace: str = "fail"):
    """Convenience: a streaming DataFrame tailing committed appends of the
    iceberg-lite table at ``root``."""
    register(spark)
    reader = (
        spark.readStream.format(FORMAT_NAME)
        .option("path", root)
        .option("startingSequence", str(starting_sequence))
        .option("onReplace", on_replace)
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load()
