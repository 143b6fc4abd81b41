"""Iceberg-lite table layer.

No Iceberg runtime jars exist in this sandbox (offline), so the engine
implements the Iceberg *semantics* it needs — snapshot manifests over
immutable partitioned Parquet data files, atomic commit by pointer
swap, time-travel by snapshot id — as a thin layer with the same API
shape as spark.read.format("iceberg"). Swapping in a real
iceberg-spark-runtime jar replaces this module with
``df.writeTo(tbl).append()`` / ``spark.read.table(tbl)`` and nothing
else changes (readers get a DataFrame either way).

Layout:
  <root>/data/<uuid>/...parquet       immutable data files per commit
  <root>/meta/snap-<n>.json           snapshot: schema + file list + parent
  <root>/meta/CURRENT                 pointer to the live snapshot (atomic rename)

Schema evolution (VERDICT r03 next-#8, the Iceberg v3 default-value
semantics a 100 TB pipeline hits first): `add_column` commits a
metadata-only snapshot — no data file is rewritten — recording the new
column and its default; readers materialize the default for rows in
files written before the column existed, while snapshots from before
the evolution keep serving the old schema untouched.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["IceLiteTable"]


class IceLiteTable:
    def __init__(self, root: str):
        self.root = root
        self.meta = os.path.join(root, "meta")
        os.makedirs(self.meta, exist_ok=True)

    # -- commit chain -----------------------------------------------------
    def _current_snapshot(self) -> dict | None:
        cur = os.path.join(self.meta, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            name = f.read().strip()
        with open(os.path.join(self.meta, name)) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        snaps = sorted(
            f for f in os.listdir(self.meta) if f.startswith("snap-"))
        out = []
        for s in snaps:
            with open(os.path.join(self.meta, s)) as f:
                out.append(json.load(f))
        return out

    def _commit(self, files: list[str], schema_json: str, parent: dict | None,
                op: str, defaults: dict | None = None,
                dropped: list[str] | None = None,
                new_stats: dict | None = None,
                extra: dict | None = None) -> dict:
        sid = (parent["snapshot_id"] + 1) if parent else 0
        if defaults is None:
            defaults = dict(parent.get("defaults", {})) if parent else {}
        if dropped is None:
            dropped = list(parent.get("dropped", [])) if parent else []
        # per-data-file column stats (the Iceberg manifest min/max that
        # scan planning prunes on): carry the parent's entries for every
        # file still live, add this commit's. Files without stats are
        # simply absent — readers treat them conservatively (always
        # scanned), so stats are strictly an optimization, never a
        # correctness dependency.
        stats = {d: v for d, v in (parent.get("stats", {}) if parent
                                   else {}).items() if d in files}
        stats.update(new_stats or {})
        snap = {
            "snapshot_id": sid,
            "operation": op,
            "schema": schema_json,
            "files": files,
            "defaults": defaults,
            "dropped": dropped,
            "stats": stats,
            "parent": parent["snapshot_id"] if parent else None,
        }
        if extra:
            snap.update(extra)  # op-specific audit keys, persisted
        name = f"snap-{sid:06d}.json"
        with open(os.path.join(self.meta, name), "w") as f:
            json.dump(snap, f)
        tmp = os.path.join(self.meta, f".CURRENT.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(name)
        os.replace(tmp, os.path.join(self.meta, "CURRENT"))  # atomic swap
        return snap

    # -- write ------------------------------------------------------------
    def _align_to_snapshot(self, df: DataFrame, snap: dict) -> DataFrame:
        """Validate + project an incoming append against the LIVE
        snapshot schema (ADVICE r04: committing df.schema wholesale let
        an append silently revert an add_column evolution, or resurrect
        a dropped column). Extra columns — including previously dropped
        names — are rejected; columns the writer predates are filled
        with their recorded evolution default; present columns are cast
        to the snapshot type."""
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        defaults = snap.get("defaults", {})
        have = set(df.columns)
        known = set(schema.fieldNames())
        extra = have - known
        if extra:
            dropped = sorted(extra & set(snap.get("dropped", [])))
            if dropped:
                raise ValueError(
                    f"append carries dropped column(s) {dropped}: writing "
                    "them would resurrect the column for name-based reads")
            raise ValueError(
                f"append schema has column(s) {sorted(extra)} not in the "
                "live snapshot schema; evolve with add_column first")
        cols = []
        for f in schema.fields:
            if f.name in have:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            elif f.name in defaults:
                cols.append(F.lit(defaults[f.name]).cast(f.dataType)
                            .alias(f.name))
            else:
                raise ValueError(
                    f"append is missing required column {f.name!r} "
                    "(no evolution default recorded)")
        return df.select(*cols)

    def append(self, df: DataFrame, partition_by: tuple[str, ...] = (),
               stats_cols: tuple[str, ...] = ()) -> dict:
        """Append df as a new snapshot (previous files remain live).
        The incoming df is validated/aligned against the live snapshot
        schema — the snapshot schema, not df.schema, is what commits.
        `stats_cols` records this data file's min/max for those columns
        in the manifest (one tiny aggregate over the COMMITTED file —
        never over `df`, whose lineage Spark would recompute and which
        could therefore disagree with the rows actually written if the
        input is non-deterministic) — the hook `read_pruned` plans
        against."""
        parent = self._current_snapshot()
        schema_json = df.schema.json()
        if parent is not None:
            df = self._align_to_snapshot(df, parent)
            schema_json = parent["schema"]
        for c in stats_cols:  # fail BEFORE the write, not after
            self._check_stats_type(df.schema[c].dataType, c)
        dirname = os.path.join(self.root, "data", uuid.uuid4().hex)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(dirname)
        new_stats = None
        if stats_cols:
            aggs = []
            for c in stats_cols:
                aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
            # Re-read the committed file: the manifest must describe
            # what's on disk, not what a lineage replay of df yields.
            row = df.sparkSession.read.parquet(dirname).agg(*aggs).collect()[0]
            per_col = {c: [self._stat_safe(row[f"_mn_{c}"], -1),
                           self._stat_safe(row[f"_mx_{c}"], +1)]
                       for c in stats_cols
                       if row[f"_mn_{c}"] is not None}  # empty file →
            # no stats recorded → conservatively always scanned
            new_stats = {dirname: per_col} if per_col else None
        files = (parent["files"] if parent else []) + [dirname]
        return self._commit(files, schema_json, parent, "append",
                            new_stats=new_stats)

    def overwrite(self, df: DataFrame, partition_by: tuple[str, ...] = ()) -> dict:
        """Full replace: df's schema BECOMES the table schema, and the
        evolution metadata (defaults, dropped names) resets — no
        pre-overwrite data file survives for it to apply to."""
        dirname = os.path.join(self.root, "data", uuid.uuid4().hex)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(dirname)
        parent = self._current_snapshot()
        return self._commit([dirname], df.schema.json(), parent, "overwrite",
                            defaults={}, dropped=[])

    def merge_into(self, spark: SparkSession, updates: DataFrame,
                   key: str | tuple = ("pid",),
                   partition_by: tuple[str, ...] = ()) -> dict:
        """Iceberg-style MERGE (upsert): update rows replace live rows
        with the same key; unmatched update rows insert. Copy-on-write
        at DATA-FILE granularity, the part that matters at 100 TB: one
        distributed pass tags every live file dir and finds which dirs
        actually hold matched keys (broadcast semi join on the update
        keys — a CDC batch is small by assumption); only those dirs are
        rewritten (anti join + union), every untouched dir carries into
        the new snapshot by reference. Time-travel to pre-merge
        snapshots is unaffected (old snapshots keep the old file list).

        Like Iceberg MERGE, a CDC batch carrying the same key more than
        once is rejected (ValueError) — silently inserting every
        duplicate would corrupt the upsert invariant of one live row
        per key. Note one documented divergence from full Iceberg
        semantics: if the TABLE already holds several live rows for a
        key (it was never deduplicated), all of them are replaced by
        the single update row rather than raising.
        """
        keys = [key] if isinstance(key, str) else list(key)
        parent = self._current_snapshot()
        if parent is None:
            missing = [k for k in keys if k not in updates.columns]
            if missing:
                raise ValueError(
                    f"merge key(s) {missing} not in table schema")
            self._check_update_keys_unique(updates, keys)
            return self.append(updates, partition_by)
        updates = self._align_to_snapshot(updates, parent)
        schema = T.StructType.fromJson(json.loads(parent["schema"]))
        defaults = parent.get("defaults", {})
        missing = [k for k in keys if k not in schema.fieldNames()]
        if missing:
            raise ValueError(f"merge key(s) {missing} not in table schema")
        self._check_update_keys_unique(updates, keys)
        tagged = None
        for i, p in enumerate(parent["files"]):
            d = self._project(spark.read.parquet(p), schema, defaults) \
                .withColumn("_icelite_dir", F.lit(i))
            tagged = d if tagged is None else tagged.unionByName(d)
        upd_keys = updates.select(*keys)
        matched = {
            r["_icelite_dir"]
            for r in tagged.join(F.broadcast(upd_keys), keys)
            .select("_icelite_dir").distinct().collect()
        }
        keep = [p for i, p in enumerate(parent["files"]) if i not in matched]
        new_rows = updates
        if matched:
            survivors = (
                tagged.filter(F.col("_icelite_dir")
                              .isin(*[int(m) for m in matched]))
                .drop("_icelite_dir")
                .join(F.broadcast(upd_keys), keys, "left_anti"))
            new_rows = survivors.unionByName(updates)
        dirname = os.path.join(self.root, "data", uuid.uuid4().hex)
        w = new_rows.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(dirname)
        return self._commit(keep + [dirname], parent["schema"], parent,
                            "merge")

    def delete_where(self, spark: SparkSession, predicate: str) -> dict:
        """Iceberg-style row-level DELETE, completing the DML triad
        (append / merge_into / delete): copy-on-write at DATA-FILE
        granularity — one distributed pass finds which live dirs hold
        ANY row matching `predicate` (a SQL expression string); only
        those dirs rewrite (survivors = NOT predicate), every untouched
        dir carries into the new snapshot by reference, and pre-delete
        snapshots time-travel unchanged. Returns the new snapshot; the
        commit PERSISTS how many dirs were rewritten vs carried
        (`deleted_dirs` / `carried_dirs` keys inside snap-NNNNNN.json,
        visible to snapshots() and time-travel readers)."""
        parent = self._current_snapshot()
        if parent is None:
            raise FileNotFoundError(f"empty table at {self.root}")
        schema = T.StructType.fromJson(json.loads(parent["schema"]))
        defaults = parent.get("defaults", {})
        tagged = None
        for i, p in enumerate(parent["files"]):
            d = self._project(spark.read.parquet(p), schema, defaults) \
                .withColumn("_icelite_dir", F.lit(i))
            tagged = d if tagged is None else tagged.unionByName(d)
        hit = {
            r["_icelite_dir"]
            for r in tagged.filter(predicate)
            .select("_icelite_dir").distinct().collect()
        }
        keep = [p for i, p in enumerate(parent["files"]) if i not in hit]
        files = keep
        if hit:
            survivors = (
                tagged.filter(F.col("_icelite_dir")
                              .isin(*[int(m) for m in hit]))
                .drop("_icelite_dir")
                .filter(f"NOT ({predicate})"))
            dirname = os.path.join(self.root, "data", uuid.uuid4().hex)
            survivors.write.mode("overwrite").parquet(dirname)
            files = keep + [dirname]
        return self._commit(files, parent["schema"], parent, "delete",
                            extra={"deleted_dirs": len(hit),
                                   "carried_dirs": len(keep)})

    # -- maintenance -------------------------------------------------------
    def compact(self, spark: SparkSession, min_rows: int = 100_000) -> dict:
        """Small-file compaction — the table-maintenance op every
        lakehouse runs (Iceberg `rewrite_data_files`): every data dir
        holding fewer than `min_rows` rows is folded into ONE new
        consolidated dir; large dirs carry into the new snapshot BY
        REFERENCE (never rewritten — the 100 TB property). Row content
        is bit-identical before and after; pre-compaction snapshots
        time-travel to the old file list untouched.

        Columns a small file predates are materialized with their
        recorded evolution defaults in the rewrite — exactly the value
        a read would have filled, so reads are unchanged. The rewrite
        is sized to `min_rows`-row output partitions. No-op (returns
        the live snapshot) when fewer than two dirs are small."""
        parent = self._current_snapshot()
        if parent is None:
            raise FileNotFoundError(f"empty table at {self.root}")
        schema = T.StructType.fromJson(json.loads(parent["schema"]))
        defaults = parent.get("defaults", {})
        sizes = [(p, spark.read.parquet(p).count())
                 for p in parent["files"]]
        small = [p for p, n in sizes if n < min_rows]
        if len(small) <= 1:
            return parent
        keep = [p for p, n in sizes if n >= min_rows]
        total = sum(n for p, n in sizes if p in set(small))
        merged = None
        for p in small:
            d = self._project(spark.read.parquet(p), schema, defaults)
            merged = d if merged is None else merged.unionByName(d)
        dirname = os.path.join(self.root, "data", uuid.uuid4().hex)
        merged.repartition(max(1, -(-total // min_rows))) \
            .write.mode("overwrite").parquet(dirname)
        return self._commit(keep + [dirname], parent["schema"], parent,
                            "compact")

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Snapshot expiry + orphan-file cleanup — the other half of
        table maintenance next to compact() (Iceberg's
        `expire_snapshots` / `remove_orphan_files`): drop all but the
        newest `keep_last` snapshot manifests, then delete every data
        dir no RETAINED snapshot references. Time-travel to expired
        snapshots is gone by design; the live snapshot (and everything
        still referenced by a retained one) is untouched, so readers
        see identical rows before and after. Returns
        {"snapshots_removed", "snapshots_kept", "orphans_removed",
        "dirs_kept"} — the audit counters a vacuum job logs.

        At 100 TB this is pure metadata work plus unlinks: no data
        file is read or rewritten, which is exactly why expiry (not
        rewrite) is how lakehouses reclaim space."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (the live snapshot "
                             "can never expire)")
        snaps = sorted(
            f for f in os.listdir(self.meta) if f.startswith("snap-"))
        if not snaps:
            raise FileNotFoundError(f"empty table at {self.root}")
        drop, keep = snaps[:-keep_last], snaps[-keep_last:]
        referenced: set[str] = set()
        for name in keep:
            with open(os.path.join(self.meta, name)) as f:
                referenced.update(json.load(f)["files"])
        for name in drop:
            os.remove(os.path.join(self.meta, name))
        data_root = os.path.join(self.root, "data")
        orphans = 0
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                full = os.path.join(data_root, d)
                if full not in referenced:
                    shutil.rmtree(full, ignore_errors=True)
                    orphans += 1
        return {"snapshots_removed": len(drop),
                "snapshots_kept": len(keep),
                "orphans_removed": orphans,
                "dirs_kept": len(referenced)}

    # -- schema evolution -------------------------------------------------
    def add_column(self, name: str, sql_type: str, default=None) -> dict:
        """Metadata-only commit: add `name` to the schema with a
        default for pre-existing rows. No data file is touched — the
        point of Iceberg-style evolution at 100 TB. Reads at or after
        this snapshot surface the column (default-filled for old
        files); time-travel to earlier snapshots never sees it."""
        parent = self._current_snapshot()
        if parent is None:
            raise FileNotFoundError(f"empty table at {self.root}")
        schema = T.StructType.fromJson(json.loads(parent["schema"]))
        if name in schema.fieldNames():
            raise ValueError(f"column {name!r} already exists")
        if name in parent.get("dropped", []):
            # this layer maps columns by NAME (no Iceberg field ids):
            # re-adding a dropped name would resurrect stale values
            # from pre-drop data files instead of the new default
            raise ValueError(
                f"column {name!r} was previously dropped; name-based "
                "projection cannot re-add it without field ids — pick a "
                "new name")
        schema = schema.add(name, sql_type, True)
        defaults = dict(parent.get("defaults", {}))
        defaults[name] = default
        return self._commit(parent["files"], schema.json(), parent,
                            "evolve", defaults)

    def drop_column(self, name: str) -> dict:
        """Metadata-only column drop: data files keep the physical
        column; reads at or after this snapshot never project it, and
        time-travel to earlier snapshots still sees it."""
        parent = self._current_snapshot()
        if parent is None:
            raise FileNotFoundError(f"empty table at {self.root}")
        schema = T.StructType.fromJson(json.loads(parent["schema"]))
        if name not in schema.fieldNames():
            raise ValueError(f"column {name!r} does not exist")
        schema = T.StructType([f for f in schema.fields if f.name != name])
        defaults = {k: v for k, v in parent.get("defaults", {}).items()
                    if k != name}
        dropped = sorted(set(parent.get("dropped", [])) | {name})
        return self._commit(parent["files"], schema.json(), parent,
                            "evolve", defaults, dropped)

    # -- read -------------------------------------------------------------
    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Read the live snapshot, or time-travel to `snapshot_id`.
        Projects every data file to the SNAPSHOT's schema: columns a
        file predates are filled with the recorded evolution default
        (null if none) — old snapshots keep their old schema."""
        if snapshot_id is None:
            snap = self._current_snapshot()
        else:
            with open(os.path.join(self.meta, f"snap-{snapshot_id:06d}.json")) as f:
                snap = json.load(f)
        if snap is None or not snap["files"]:
            raise FileNotFoundError(f"empty table at {self.root}")
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        defaults = snap.get("defaults", {})
        dfs = [self._project(spark.read.parquet(p), schema, defaults)
               for p in snap["files"]]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def read_pruned(self, spark: SparkSession, col: str, lo, hi,
                    snapshot_id: int | None = None
                    ) -> tuple[DataFrame, int, int]:
        """Scan-planning against the manifest stats: read only the data
        files whose recorded [min, max] for `col` overlaps [lo, hi]
        (files with no recorded stats for `col` are ALWAYS scanned —
        stats prune, they never filter), then apply the real predicate
        on top. Returns (df, files_scanned, files_total). This is the
        100 TB point of the layout operators: cluster_by_zorder/
        _hilbert + per-file stats turn a range predicate into skipping
        almost every file before a single row is read."""
        if snapshot_id is None:
            snap = self._current_snapshot()
        else:
            with open(os.path.join(self.meta,
                                   f"snap-{snapshot_id:06d}.json")) as f:
                snap = json.load(f)
        if snap is None or not snap["files"]:
            raise FileNotFoundError(f"empty table at {self.root}")
        stats = snap.get("stats", {})
        # normalize the probe bounds the same way the manifest stored
        # its stats (datetime → isoformat, Decimal → widened float) so
        # the Python <=/>= below compares like with like; widening goes
        # OUTWARD on the probe too (lo down, hi up) — conservative.
        lo_n = self._stat_safe(lo, -1)
        hi_n = self._stat_safe(hi, +1)
        keep = []
        for d in snap["files"]:
            s = stats.get(d, {}).get(col)
            if s is None or (s[1] >= lo_n and s[0] <= hi_n):
                keep.append(d)
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        defaults = snap.get("defaults", {})
        dfs = [self._project(spark.read.parquet(p), schema, defaults)
               for p in keep]
        if not dfs:
            out = spark.createDataFrame([], schema)
        else:
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
        out = out.filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
        return out, len(keep), len(snap["files"])

    def read_incremental(self, spark: SparkSession, from_snapshot: int,
                         to_snapshot: int | None = None
                         ) -> tuple[DataFrame, int, int]:
        """Incremental (CDC-style append) scan — Iceberg's
        `incremental read` / Delta's `readChangeFeed` for appends: the
        rows in data files PRESENT in `to_snapshot` (default: current)
        but ABSENT from `from_snapshot`. Manifests are file LISTS, so
        the changed-data computation is a set difference over file
        paths — no data is read to answer "what's new", which is the
        whole point at 100 TB: a consumer polling a petabyte table
        reads only the appended files, never rescans history. Files
        are projected to `to_snapshot`'s schema (evolution defaults
        applied), so a reader started before an add_column sees the
        new column on old-file rows as its recorded default.

        Only append/compact-style commits are faithfully representable
        this way (a delete_where REWRITES dirs, so its rewritten files
        surface as "new" — same caveat Iceberg's incremental scan
        documents: append-only history required). Returns
        (df, files_new, files_total_at_to)."""
        with open(os.path.join(self.meta,
                               f"snap-{from_snapshot:06d}.json")) as f:
            base = json.load(f)
        if to_snapshot is None:
            snap = self._current_snapshot()
            if snap is None:
                raise FileNotFoundError(f"empty table at {self.root}")
        else:
            with open(os.path.join(self.meta,
                                   f"snap-{to_snapshot:06d}.json")) as f:
                snap = json.load(f)
        new_files = [p for p in snap["files"] if p not in set(base["files"])]
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        defaults = snap.get("defaults", {})
        if not new_files:
            return spark.createDataFrame([], schema), 0, len(snap["files"])
        dfs = [self._project(spark.read.parquet(p), schema, defaults)
               for p in new_files]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out, len(new_files), len(snap["files"])

    @staticmethod
    def _check_update_keys_unique(updates: DataFrame, keys: list) -> None:
        """Iceberg MERGE semantics: a CDC batch carrying the same key
        more than once is rejected — silently inserting every
        duplicate would corrupt the one-live-row-per-key invariant.
        Runs AFTER schema/key validation so those raise first."""
        dup = (updates.groupBy(*keys).count()
               .filter(F.col("count") > 1).limit(1).collect())
        if dup:
            bad = {k: dup[0][k] for k in keys}
            raise ValueError(
                f"merge_into updates batch has duplicate key {bad}: "
                "Iceberg MERGE rejects multiple matches per key — "
                "deduplicate the CDC batch first")

    # -- manifest-stats value handling --------------------------------------
    _STATS_OK = (T.NumericType, T.StringType, T.BooleanType,
                 T.DateType, T.TimestampType, T.TimestampNTZType)

    @classmethod
    def _check_stats_type(cls, dt: T.DataType, col: str) -> None:
        """stats_cols must be orderable AND JSON-representable; reject
        binary/array/map/struct upfront so a bad append fails before
        any data file lands (no orphaned data dir)."""
        if not isinstance(dt, cls._STATS_OK):
            raise TypeError(
                f"stats_cols column {col!r} has type {dt.simpleString()}; "
                "manifest min/max stats support numeric, string, boolean, "
                "date and timestamp columns only")

    @staticmethod
    def _stat_safe(v, side: int):
        """Coerce a min/max stat to a JSON-safe primitive whose Python
        </>= ordering matches the column's ordering. `side` is -1 for a
        min and +1 for a max: any lossy coercion widens OUTWARD so
        pruning stays conservative (never skips a matching file).

        datetime/date → isoformat strings (zero-padded → lexicographic
        order == chronological order); Decimal → float, nudged outward
        with nextafter when the float rounds inward."""
        import datetime
        import decimal
        import math

        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        if isinstance(v, decimal.Decimal):
            f = float(v)
            d = decimal.Decimal(f)
            if (side < 0 and d > v) or (side > 0 and d < v):
                f = math.nextafter(f, -math.inf if side < 0 else math.inf)
            return f
        raise TypeError(f"cannot serialize manifest stat {v!r} "
                        f"({type(v).__name__})")

    @staticmethod
    def _project(d: DataFrame, schema: T.StructType,
                 defaults: dict) -> DataFrame:
        """Project one data file's frame to a snapshot schema, filling
        columns the file predates with their evolution default."""
        have = set(d.columns)
        cols = []
        for f in schema.fields:
            if f.name in have:
                cols.append(F.col(f.name))
            else:
                cols.append(F.lit(defaults.get(f.name))
                            .cast(f.dataType).alias(f.name))
        return d.select(*cols)
