"""Iceberg-lite: snapshot-committed parquet tables with atomic manifests.

The sandbox has no Iceberg jars, so this implements the minimal subset the
contract needs — snapshot commits, append-only manifests, read-of-committed-
only, and resume — as parquet data files + JSON manifests with rename-based
atomic publication. The API is table-shaped so real Iceberg (``writeTo()``/
``system.snapshots``) is a drop-in at deploy time.

This is the graft analog of the reference's idempotent segment lifecycle:
clear-then-reprocess per segment, artifacts landing atomically next to the
input, a failed segment leaving others unaffected
(batch_folder_process.py:819-822,853-876; SURVEY §3.2).

Layout:
    <root>/data/<snapshot_id>/part-*.parquet     -- written FIRST
    <root>/manifests/<seq:012d>-<snapshot_id>.json  -- renamed-in LAST (commit point)

A snapshot's manifest records its own data dir plus its parent chain; readers
list manifests, take the max sequence number, and read the union of data dirs
reachable from it. A crash between data write and manifest rename leaves an
orphan data dir that no reader ever sees — no partial visibility (tested by
crash injection in tests/test_resume.py).

Concurrency: single-writer per table (the batch driver), like the reference's
sequential outer segment loop. Sequence numbers make last-writer-wins explicit.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class IcebergLiteTable:
    def __init__(self, root: str):
        self.root = root
        self._manifest_dir = os.path.join(root, "manifests")
        self._data_dir = os.path.join(root, "data")

    # -- internals -----------------------------------------------------------
    def _manifests(self) -> list[str]:
        if not os.path.isdir(self._manifest_dir):
            return []
        return sorted(f for f in os.listdir(self._manifest_dir) if f.endswith(".json"))

    def _load(self, name: str) -> dict:
        with open(os.path.join(self._manifest_dir, name)) as f:
            return json.load(f)

    # -- public API (Iceberg-shaped) ------------------------------------------
    def current_snapshot(self) -> dict | None:
        ms = self._manifests()
        return self._load(ms[-1]) if ms else None

    def snapshots(self) -> list[dict]:
        return [self._load(m) for m in self._manifests()]

    def exists(self) -> bool:
        return bool(self._manifests())

    def data_dirs(self) -> list[str]:
        snap = self.current_snapshot()
        return list(snap["data_dirs"]) if snap else []

    def append(self, df: DataFrame, properties: dict | None = None) -> str:
        """Write df as parquet, then atomically publish a new snapshot whose
        manifest = parent data dirs + the new dir. Returns snapshot_id."""
        snapshot_id = uuid.uuid4().hex[:16]
        out_dir = os.path.join(self._data_dir, snapshot_id)
        df.write.mode("errorifexists").parquet(out_dir)

        parent = self.current_snapshot()
        seq = (parent["sequence"] + 1) if parent else 0
        manifest = {
            "snapshot_id": snapshot_id,
            "sequence": seq,
            "parent_id": parent["snapshot_id"] if parent else None,
            "data_dirs": (parent["data_dirs"] if parent else []) + [out_dir],
            "properties": properties or {},
        }
        os.makedirs(self._manifest_dir, exist_ok=True)
        tmp = os.path.join(self._manifest_dir, f".tmp-{snapshot_id}.json")
        final = os.path.join(self._manifest_dir, f"{seq:012d}-{snapshot_id}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # the commit point (atomic on POSIX)
        return snapshot_id

    def overwrite(self, df: DataFrame, properties: dict | None = None) -> str:
        """New snapshot that replaces all prior data (logical truncate+append)."""
        snapshot_id = uuid.uuid4().hex[:16]
        out_dir = os.path.join(self._data_dir, snapshot_id)
        df.write.mode("errorifexists").parquet(out_dir)
        parent = self.current_snapshot()
        seq = (parent["sequence"] + 1) if parent else 0
        manifest = {
            "snapshot_id": snapshot_id,
            "sequence": seq,
            "parent_id": parent["snapshot_id"] if parent else None,
            "data_dirs": [out_dir],
            "properties": properties or {},
        }
        os.makedirs(self._manifest_dir, exist_ok=True)
        tmp = os.path.join(self._manifest_dir, f".tmp-{snapshot_id}.json")
        final = os.path.join(self._manifest_dir, f"{seq:012d}-{snapshot_id}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)
        return snapshot_id

    def read(self, spark: SparkSession, schema: str | None = None) -> DataFrame | None:
        """DataFrame over all committed data; None if no snapshot exists."""
        dirs = self.data_dirs()
        if not dirs:
            return None
        reader = spark.read
        if schema:
            reader = reader.schema(schema)
        return reader.parquet(*dirs)

    def read_at(self, spark: SparkSession, sequence: int,
                schema: str | None = None) -> DataFrame | None:
        """Time travel: DataFrame over the data visible at snapshot
        ``sequence`` (Iceberg's VERSION AS OF). Snapshots are immutable —
        an old sequence reads identically forever, regardless of appends,
        overwrites, or compactions committed after it."""
        for snap in self.snapshots():
            if snap["sequence"] == sequence:
                if not snap["data_dirs"]:
                    return None
                reader = spark.read
                if schema:
                    reader = reader.schema(schema)
                return reader.parquet(*snap["data_dirs"])
        raise ValueError(f"no snapshot with sequence {sequence}")

    def compact(self, spark: SparkSession, target_partitions: int,
                schema: str | None = None) -> str | None:
        """Rewrite the table's current contents into one fresh data dir with
        ``target_partitions`` files (Iceberg's rewrite_data_files). At crawl
        scale, chunked appends accumulate small files whose per-file open +
        footer cost comes to dominate scans; compaction restores scan-sized
        files. Readers are never disturbed: the rewrite is just another
        snapshot commit, and time-travel reads of pre-compaction sequences
        still see the old dirs (nothing is deleted)."""
        df = self.read(spark, schema)
        if df is None:
            return None
        return self.overwrite(
            df.coalesce(target_partitions),
            properties={"operation": "compact", "target_partitions": target_partitions},
        )
