"""Iceberg-lite: snapshot-committed parquet tables with atomic manifests.

The sandbox has no Iceberg jars, so this implements the minimal subset the
contract needs — snapshot commits, append-only manifests, read-of-committed-
only, resume, and MANIFEST-LEVEL PRUNING — as parquet data files + JSON
manifests with rename-based atomic publication. The API is table-shaped so
real Iceberg (``writeTo()``/``system.snapshots``) is a drop-in at deploy time.

This is the graft analog of the reference's idempotent segment lifecycle:
clear-then-reprocess per segment, artifacts landing atomically next to the
input, a failed segment leaving others unaffected
(batch_folder_process.py:819-822,853-876; SURVEY §3.2), plus its
directory-structure work pruning (batch_folder_process.py:763-787,
one_key_process.py:705-722) transposed to manifest metadata: each manifest
entry records the data dir's partition values and per-column min/max stats,
and ``read(partition_eq=..., ranges=...)`` selects data dirs BEFORE
``spark.read.parquet`` ever sees them. At crawl scale this is the single
biggest scan lever: a predicate on the partition column or a stats column
skips whole committed segments without opening a single footer.

Layout:
    <root>/data/<snapshot_id>/[<col>=<val>/]part-*.parquet  -- written FIRST
    <root>/manifests/<seq:012d>-<snapshot_id>.json  -- renamed-in LAST (commit)

A snapshot's manifest records its own entries plus its parent chain; readers
list manifests, take the max sequence number, and read the union of entries
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
from pyspark.sql import functions as F


def _json_safe(v):
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    return str(v)


class IcebergLiteTable:
    def __init__(self, root: str):
        self.root = root
        self._manifest_dir = os.path.join(root, "manifests")
        self._data_dir = os.path.join(root, "data")

    # -- internals -----------------------------------------------------------
    def _manifests(self) -> list[str]:
        if not os.path.isdir(self._manifest_dir):
            return []
        # exclude '.tmp-*.json': a crash between write and rename leaves a
        # possibly-truncated tmp manifest that must never be read as a
        # snapshot (json.load would poison every maintenance op)
        return sorted(
            f
            for f in os.listdir(self._manifest_dir)
            if f.endswith(".json") and not f.startswith(".")
        )

    def _load(self, name: str) -> dict:
        with open(os.path.join(self._manifest_dir, name)) as f:
            return json.load(f)

    @staticmethod
    def _entries_of(snap: dict) -> list[dict]:
        """Manifest entries, tolerating the pre-stats manifest format (bare
        data_dirs) by synthesizing metadata-free entries."""
        if "entries" in snap:
            return snap["entries"]
        return [
            {"dir": d, "base": d, "partition": {}, "stats": {}}
            for d in snap.get("data_dirs", [])
        ]

    @staticmethod
    def _footer_stats(data_dir: str,
                      stats_cols: tuple[str, ...]) -> dict[str, list]:
        """Per-column [min, max] for a freshly-written data dir, read from
        the parquet FOOTERS (pyarrow metadata) — no Spark job, no second
        scan of the data pages. This is how real Iceberg collects entry
        stats; at ingest scale the old ``spark.read.parquet(...).agg(...)``
        pass doubled the write path's read volume.

        Parquet string/binary stats may be footer-truncated (parquet-mr
        truncates long values, keeping min a valid lower bound and max a
        valid upper bound), so the recorded range is conservative — exactly
        what ``select_entries`` range pruning requires.
        """
        import pyarrow.parquet as pq

        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for root, _, files in os.walk(data_dir):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(root, fn)).metadata
                idx = {
                    md.schema.column(i).path: i
                    for i in range(md.num_columns)
                }
                for c in stats_cols:
                    i = idx.get(c)
                    if i is None:
                        continue
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(i).statistics
                        if st is None or not st.has_min_max:
                            continue
                        if c not in mins or st.min < mins[c]:
                            mins[c] = st.min
                        if c not in maxs or st.max > maxs[c]:
                            maxs[c] = st.max
        return {
            c: [_json_safe(mins[c]), _json_safe(maxs[c])]
            for c in stats_cols
            if c in mins and c in maxs
        }

    def _collect_entries(self, spark: SparkSession, out_dir: str,
                         partition_by: str | None,
                         stats_cols: tuple[str, ...]) -> list[dict]:
        """Metadata for a freshly-written data dir: one entry per partition
        subdir (Hive layout) or one for the whole dir, with min/max stats
        per requested column, read from parquet footers (``_footer_stats``).
        """
        if partition_by:
            subdirs = sorted(
                d for d in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, d)) and "=" in d
            )
            return [
                {
                    "dir": os.path.join(out_dir, d),
                    "base": out_dir,
                    "partition": {d.split("=", 1)[0]: d.split("=", 1)[1]},
                    "stats": (
                        self._footer_stats(os.path.join(out_dir, d), stats_cols)
                        if stats_cols else {}
                    ),
                }
                for d in subdirs
            ]
        return [{
            "dir": out_dir,
            "base": out_dir,
            "partition": {},
            "stats": (
                self._footer_stats(out_dir, stats_cols) if stats_cols else {}
            ),
        }]

    def _commit(self, entries: list[dict], snapshot_id: str,
                properties: dict | None) -> str:
        parent = self.current_snapshot()
        seq = (parent["sequence"] + 1) if parent else 0
        manifest = {
            "snapshot_id": snapshot_id,
            "sequence": seq,
            "parent_id": parent["snapshot_id"] if parent else None,
            "entries": entries,
            # kept for tooling/back-compat: the flat dir list
            "data_dirs": [e["dir"] for e in entries],
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

    # -- public API (Iceberg-shaped) ------------------------------------------
    def current_snapshot(self) -> dict | None:
        ms = self._manifests()
        return self._load(ms[-1]) if ms else None

    def snapshots(self) -> list[dict]:
        return [self._load(m) for m in self._manifests()]

    def exists(self) -> bool:
        return bool(self._manifests())

    def entries(self) -> list[dict]:
        snap = self.current_snapshot()
        return self._entries_of(snap) if snap else []

    def data_dirs(self) -> list[str]:
        return [e["dir"] for e in self.entries()]

    def append(self, df: DataFrame, properties: dict | None = None,
               partition_by: str | None = None,
               stats_cols: tuple[str, ...] = ()) -> str:
        """Write df as parquet, then atomically publish a new snapshot whose
        manifest = parent entries + the new entries. ``partition_by`` writes
        Hive-layout subdirs recorded as separate prunable entries;
        ``stats_cols`` records per-entry min/max for those columns.
        Returns snapshot_id."""
        snapshot_id = uuid.uuid4().hex[:16]
        out_dir = os.path.join(self._data_dir, snapshot_id)
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(out_dir)
        new = self._collect_entries(df.sparkSession, out_dir, partition_by,
                                    tuple(stats_cols))
        parent = self.current_snapshot()
        entries = (self._entries_of(parent) if parent else []) + new
        return self._commit(entries, snapshot_id, properties)

    def overwrite(self, df: DataFrame, properties: dict | None = None,
                  partition_by: str | None = None,
                  stats_cols: tuple[str, ...] = ()) -> str:
        """New snapshot that replaces all prior data (logical truncate+append)."""
        snapshot_id = uuid.uuid4().hex[:16]
        out_dir = os.path.join(self._data_dir, snapshot_id)
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(out_dir)
        new = self._collect_entries(df.sparkSession, out_dir, partition_by,
                                    tuple(stats_cols))
        return self._commit(new, snapshot_id, properties)

    def select_entries(self, partition_eq: dict | None = None,
                       ranges: dict | None = None) -> list[dict]:
        """Manifest entries that MAY satisfy the predicate — conservative
        pruning: an entry is dropped only when its recorded metadata proves
        it cannot match (unknown partition values / missing stats keep it).

        partition_eq: {col: value} — drop entries whose recorded partition
          value differs (values compare as strings, the Hive-dir encoding).
        ranges: {col: (lo, hi)} inclusive — drop entries whose recorded
          [min, max] for col does not overlap [lo, hi].
        """
        from urllib.parse import unquote

        keep = []
        for e in self.entries():
            ok = True
            for col, v in (partition_eq or {}).items():
                pv = e.get("partition", {}).get(col)
                # recorded values come from Hive-escaped dir names
                # ('a b' -> 'a%20b'); compare both forms so escapable
                # characters never cause a FALSE prune (conservative:
                # either representation matching keeps the entry)
                if (
                    pv is not None
                    and str(pv) != str(v)
                    and unquote(str(pv)) != str(v)
                ):
                    ok = False
                    break
            if ok:
                for col, (lo, hi) in (ranges or {}).items():
                    st = e.get("stats", {}).get(col)
                    if st and st[0] is not None and st[1] is not None:
                        if st[1] < lo or st[0] > hi:
                            ok = False
                            break
            if ok:
                keep.append(e)
        return keep

    def read(self, spark: SparkSession, schema: str | None = None,
             partition_eq: dict | None = None,
             ranges: dict | None = None) -> DataFrame | None:
        """DataFrame over committed data matching the predicate; None if no
        snapshot exists, an EMPTY frame (schema required) if everything was
        pruned. Hive-partitioned entries read with their snapshot basePath so
        the partition column is restored; dirs group by base to keep one
        scan per snapshot."""
        if not self.exists():
            return None
        entries = self.select_entries(partition_eq, ranges)
        if not entries:
            if schema is None:
                raise ValueError(
                    "all entries pruned; pass a schema to get an empty frame"
                )
            return spark.createDataFrame([], schema)
        by_base: dict[str, list[str]] = {}
        for e in entries:
            by_base.setdefault(e.get("base", e["dir"]), []).append(e["dir"])
        parts = []
        for base, dirs in sorted(by_base.items()):
            reader = spark.read.option("basePath", base)
            if schema:
                reader = reader.schema(schema)
            parts.append(reader.parquet(*sorted(dirs)))
        df = parts[0]
        for p in parts[1:]:
            # schema evolution (Iceberg add/drop-column semantics): snapshots
            # written with different schemas union on the column-name union,
            # absent columns reading as NULL — old rows get NULL for columns
            # added later, and a column dropped from new snapshots survives
            # for old rows. Column order follows the oldest snapshot, new
            # columns appended (deterministic: bases sort by snapshot dir).
            df = df.unionByName(p, allowMissingColumns=True)
        return df

    def read_at(self, spark: SparkSession, sequence: int,
                schema: str | None = None) -> DataFrame | None:
        """Time travel: DataFrame over the data visible at snapshot
        ``sequence`` (Iceberg's VERSION AS OF). Snapshots are immutable —
        an old sequence reads identically forever, regardless of appends,
        overwrites, or compactions committed after it."""
        for snap in self.snapshots():
            if snap["sequence"] == sequence:
                entries = self._entries_of(snap)
                if not entries:
                    return None
                by_base: dict[str, list[str]] = {}
                for e in entries:
                    by_base.setdefault(e.get("base", e["dir"]), []).append(e["dir"])
                parts = []
                for base, dirs in sorted(by_base.items()):
                    reader = spark.read.option("basePath", base)
                    if schema:
                        reader = reader.schema(schema)
                    parts.append(reader.parquet(*sorted(dirs)))
                df = parts[0]
                for p in parts[1:]:
                    df = df.unionByName(p, allowMissingColumns=True)
                return df
        raise ValueError(f"no snapshot with sequence {sequence}")

    def data_bytes(self) -> int:
        """Total on-disk bytes of the current snapshot's data files —
        directory metadata only, no Spark job, no footer parse."""
        total = 0
        for e in self.entries():
            for root, _, files in os.walk(e["dir"]):
                for fn in files:
                    if not fn.startswith(("_", ".")):
                        total += os.path.getsize(os.path.join(root, fn))
        return total

    def compact(self, spark: SparkSession, target_partitions: int | None = None,
                schema: str | None = None,
                partition_by: str | None = None,
                stats_cols: tuple[str, ...] = (),
                target_file_mb: int | None = None) -> str | None:
        """Rewrite the table's current contents into one fresh data dir
        (Iceberg's rewrite_data_files). At crawl scale, chunked appends
        accumulate small files whose per-file open + footer cost comes to
        dominate scans; compaction restores scan-sized files.

        Sizing: pass ``target_partitions`` for an explicit file count, or
        ``target_file_mb`` to size by bytes the way real Iceberg does —
        the file count is computed from the CURRENT snapshot's on-disk
        bytes (directory metadata, no extra scan), so a table that grew
        10x compacts into 10x more files, not 10x bigger ones. Pass
        ``partition_by``/``stats_cols`` to (re)build pruning metadata for
        the compacted layout. Readers are never disturbed: the rewrite is
        just another snapshot commit, and time-travel reads of
        pre-compaction sequences still see the old dirs (nothing is
        deleted)."""
        if target_partitions is None:
            if target_file_mb is None:
                raise ValueError("pass target_partitions or target_file_mb")
            target_partitions = max(
                1, -(-self.data_bytes() // (target_file_mb << 20))
            )
        df = self.read(spark, schema)
        if df is None:
            return None
        return self.overwrite(
            df.coalesce(target_partitions),
            properties={"operation": "compact", "target_partitions": target_partitions},
            partition_by=partition_by,
            stats_cols=stats_cols,
        )

    def merge_into(self, spark: SparkSession, source: DataFrame,
                   key_cols: tuple[str, ...] | list[str],
                   schema: str | None = None,
                   when_matched: str = "update",
                   partition_by: str | None = None,
                   stats_cols: tuple[str, ...] = (),
                   properties: dict | None = None) -> str:
        """Iceberg-style MERGE INTO with copy-on-write at FILE granularity:
        ``when_matched='update'`` upserts (matched target rows replaced by
        the source row, unmatched source rows inserted);
        ``when_matched='delete'`` deletes matched rows (nothing inserted).
        ``source`` must be unique on ``key_cols`` (MERGE's standard
        precondition) and, for 'update', carry the target's columns.

        The scale property (Iceberg's copy-on-write MERGE): only data
        files whose recorded metadata MIGHT contain a matching key are
        rewritten. Affected entries are chosen by manifest pruning —
        min/max stats on the first key column (when recorded via
        ``stats_cols``) against the source's key range, plus partition
        values against the source's distinct partition values — and every
        other entry is carried into the new snapshot VERBATIM, untouched
        and unread. At 10^12 rows an upsert batch touching one crawl
        segment rewrites that segment's files only; the pruning is
        conservative (entries without stats are treated as affected).

        The rewrite itself is one anti-join (target-survivors) plus, for
        'update', a unionByName with the source — AQE broadcasts the
        source keys when the batch is small, which is the common
        ingest-fixup shape. Commit is the same atomic manifest rename as
        append/overwrite; concurrent readers and time travel see either
        the old or the new snapshot, never a mix.
        """
        if when_matched not in ("update", "delete"):
            raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
        key_cols = list(key_cols)
        if not self.exists():
            if when_matched == "delete":
                raise ValueError("merge_into(delete) on a table with no snapshot")
            return self.append(source, properties=properties,
                               partition_by=partition_by, stats_cols=stats_cols)

        # -- manifest pruning: which entries MIGHT hold a matching key? ----
        k0 = key_cols[0]
        ranges = None
        if k0 in source.columns:
            lo_hi = source.agg(F.min(k0), F.max(k0)).first()
            if lo_hi[0] is not None:
                ranges = {k0: (lo_hi[0], lo_hi[1])}
        candidates = self.select_entries(ranges=ranges)
        part_col = next(iter(candidates[0]["partition"]), None) if candidates else None
        if part_col and part_col in source.columns:
            vals = {
                str(r[0])
                for r in source.select(part_col).distinct().collect()
            }
            candidates = [
                e for e in candidates
                if e["partition"].get(part_col) is None
                or str(e["partition"][part_col]) in vals
            ]
        affected_dirs = {e["dir"] for e in candidates}
        untouched = [e for e in self.entries() if e["dir"] not in affected_dirs]

        # -- rewrite only the affected files -------------------------------
        snapshot_id = uuid.uuid4().hex[:16]
        out_dir = os.path.join(self._data_dir, snapshot_id)
        src_keys = source.select(*key_cols).dropDuplicates(key_cols)
        if candidates:
            by_base: dict[str, list[str]] = {}
            for e in candidates:
                by_base.setdefault(e.get("base", e["dir"]), []).append(e["dir"])
            parts = []
            for base, dirs in sorted(by_base.items()):
                reader = spark.read.option("basePath", base)
                if schema:
                    reader = reader.schema(schema)
                parts.append(reader.parquet(*sorted(dirs)))
            target = parts[0]
            for p in parts[1:]:
                target = target.unionByName(p, allowMissingColumns=True)
            survivors = target.join(src_keys, key_cols, "left_anti")
        else:
            survivors = None
        if when_matched == "update":
            src_rows = (
                source.select(*survivors.columns) if survivors is not None else source
            )
            result = (
                survivors.unionByName(src_rows) if survivors is not None else src_rows
            )
        else:
            result = survivors
        new_entries: list[dict] = []
        if result is not None:
            writer = result.write.mode("errorifexists")
            if partition_by:
                writer = writer.partitionBy(partition_by)
            writer.parquet(out_dir)
            new_entries = self._collect_entries(
                spark, out_dir, partition_by, tuple(stats_cols)
            )
        props = {
            "operation": "merge",
            "when_matched": when_matched,
            "key_cols": key_cols,
            "entries_rewritten": len(candidates),
            "entries_untouched": len(untouched),
            **(properties or {}),
        }
        return self._commit(untouched + new_entries, snapshot_id, props)

    # -- maintenance (Iceberg's expire_snapshots / remove_orphan_files) -------
    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` snapshots and delete data
        dirs no surviving snapshot references (Iceberg's expire_snapshots).
        Time travel to expired sequences stops working — that is the point:
        the storage they pinned is reclaimed. Readers of surviving
        snapshots are untouched (their entries are preserved verbatim).
        Returns {"manifests_removed": n, "dirs_removed": n}."""
        import shutil

        ms = self._manifests()
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        drop, keep = ms[:-keep_last], ms[-keep_last:]
        live = set()
        for name in keep:
            for e in self._entries_of(self._load(name)):
                live.add(os.path.realpath(e["dir"]))
        removed_dirs = 0
        for name in drop:
            for e in self._entries_of(self._load(name)):
                d = os.path.realpath(e["dir"])
                if d not in live and os.path.isdir(d):
                    shutil.rmtree(d, ignore_errors=True)
                    removed_dirs += 1
                    live.add(d)  # count each dir once
            os.remove(os.path.join(self._manifest_dir, name))
        return {"manifests_removed": len(drop), "dirs_removed": removed_dirs}

    def remove_orphans(self, older_than_s: float = 3600.0) -> list[str]:
        """Delete data dirs referenced by NO manifest — the leftovers of a
        crash between data write and manifest rename (the crash-injection
        window tests/test_resume.py exercises). Never touches a referenced
        dir, so it is safe to run concurrently with readers.

        ``older_than_s``: only dirs whose mtime is at least this old are
        deleted (real Iceberg's remove_orphan_files ``older_than`` guard)
        — an IN-FLIGHT append's data dir is also unreferenced until its
        manifest renames in, and deleting it would destroy data the
        append is about to commit. Crash leftovers are by definition old;
        a live write is by definition recent. Also removes stale
        ``.tmp-*`` manifests past the same age. Returns the removed dirs."""
        import shutil
        import time

        referenced = set()
        for snap in self.snapshots():
            for e in self._entries_of(snap):
                # entries may be partition subdirs: the snapshot dir is the
                # unit of write, so protect each entry's base (and itself)
                referenced.add(os.path.realpath(e.get("base", e["dir"])))
                referenced.add(os.path.realpath(e["dir"]))
        cutoff = time.time() - older_than_s
        removed = []
        if os.path.isdir(self._data_dir):
            for d in sorted(os.listdir(self._data_dir)):
                full = os.path.realpath(os.path.join(self._data_dir, d))
                if full not in referenced and os.path.getmtime(full) < cutoff:
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(full)
        if os.path.isdir(self._manifest_dir):
            for f in os.listdir(self._manifest_dir):
                full = os.path.join(self._manifest_dir, f)
                if f.startswith(".tmp-") and os.path.getmtime(full) < cutoff:
                    os.remove(full)
        return removed
