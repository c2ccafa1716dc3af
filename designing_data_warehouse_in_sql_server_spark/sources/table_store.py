"""Versioned parquet table store: the warehouse storage layer.

Delta Lake is unavailable in this environment, so this implements the
same contract the reference gets from SQL Server tables (and that a
cluster deployment would get from Delta — SURVEY.md §1.3): atomic
overwrites, MERGE upserts, TRUNCATE, time travel, and a Change Data Feed.

Layout:  <root>/<table>/v<N>/part-*.parquet  +  <root>/<table>/LATEST
The LATEST pointer is swapped with an atomic rename, so readers always
see a complete version (snapshot isolation, writer-wins).

Reference parity:
- S5 append sink (extract_weather.py:57-67) -> append()
- S6/J4/J5 MERGE sinks (transform_load.sql:43,50) -> merge()
- S7 truncate staging (README.md:228) -> truncate()
- S8 CDC enablement (CDC.sql:1-2) -> read_changes() / the _cdc log
- M4 flag update (transform_load.sql:73) -> update()
- System-versioned history (README.md:88-91) -> time_travel()

Scale notes: merge() is a single full-outer shuffle join on the merge
keys plus a rewrite of the target. Tables created with ``partition_by``
get the Delta-style pruned merge: only partitions present in the source
are joined and rewritten; every untouched partition's files are
hard-linked from the previous version (no read, no write, no copy).
At 100 TB with a date-partitioned fact and daily increments, a merge
touches one partition out of thousands — the rewrite cost is
proportional to the increment, not the table. Partition columns must be
functionally dependent on the merge keys (e.g. partition year derives
from a key date) so a key can never move across partitions; this is the
same contract Delta's partition-pruned MERGE relies on.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CDC_INSERT = "insert"
CDC_UPDATE_PRE = "update_preimage"
CDC_UPDATE_POST = "update_postimage"
CDC_DELETE = "delete"


class TableStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths / versions ---------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer(self, name: str) -> str:
        return os.path.join(self._dir(name), "LATEST")

    def current_version(self, name: str) -> int | None:
        try:
            with open(self._pointer(name)) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def exists(self, name: str) -> bool:
        return self.current_version(name) is not None

    def _commit(self, name: str, version: int) -> None:
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._pointer(name))  # atomic pointer swap

    # -- reads ---------------------------------------------------------------
    def read(self, name: str) -> DataFrame:
        v = self.current_version(name)
        if v is None:
            raise FileNotFoundError(f"table {name!r} does not exist in {self.root}")
        return self.time_travel(name, v)

    def time_travel(self, name: str, version: int) -> DataFrame:
        """Read a specific historical version (Delta time-travel analog;
        covers the reference's system-versioned dim history, README.md:91)."""
        return self.spark.read.parquet(os.path.join(self._dir(name), f"v{version}"))

    # -- partition spec ---------------------------------------------------------
    def _spec_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "PARTITION_SPEC")

    def partition_spec(self, name: str) -> list[str]:
        try:
            with open(self._spec_path(name)) as fh:
                return [c for c in fh.read().split(",") if c]
        except FileNotFoundError:
            return []

    # -- writes ----------------------------------------------------------------
    def _write_version(self, name: str, df: DataFrame, link_untouched: bool = False) -> int:
        v = (self.current_version(name) or 0) + 1
        os.makedirs(self._dir(name), exist_ok=True)
        vdir = os.path.join(self._dir(name), f"v{v}")
        spec = self.partition_spec(name)
        writer = df.write.mode("overwrite")
        if spec:
            writer = writer.partitionBy(*spec)
        writer.parquet(vdir)
        if link_untouched and spec:
            self._link_untouched(name, vdir)
        self._commit(name, v)
        return v

    def _link_untouched(self, name: str, vdir: str) -> None:
        """Hard-link every partition directory of the previous version that
        the current write did not produce — file reuse, zero data motion
        (the pruned-merge fast path). A touched partition always has output
        rows (full-outer merge keeps all target rows), so dir existence in
        the new version is exactly touchedness."""
        prev = self.current_version(name)
        if prev is None:
            return
        prev_dir = os.path.join(self._dir(name), f"v{prev}")
        for dirpath, _dirnames, filenames in os.walk(prev_dir):
            if not any(fn.endswith(".parquet") for fn in filenames):
                continue  # not a leaf partition dir
            rel = os.path.relpath(dirpath, prev_dir)
            if rel == "." or "=" not in rel:
                continue
            dst = os.path.join(vdir, rel)
            if os.path.exists(dst):
                continue  # written by this merge -> touched
            os.makedirs(dst)
            for fn in filenames:
                if fn.endswith(".parquet"):
                    os.link(os.path.join(dirpath, fn), os.path.join(dst, fn))

    def overwrite(
        self, name: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> int:
        """Full overwrite; ``partition_by`` (sticky across later writes)
        lays the table out hive-style so reads get partition pruning and
        merges get partition-restricted rewrites."""
        if partition_by is not None:
            os.makedirs(self._dir(name), exist_ok=True)
            with open(self._spec_path(name), "w") as fh:
                fh.write(",".join(partition_by))
        return self._write_version(name, df)

    def append(self, name: str, df: DataFrame) -> int:
        """Batch append (replaces the reference's row-at-a-time INSERT loop,
        extract_weather.py:57-67)."""
        if self.exists(name):
            df = self.read(name).unionByName(df)
        return self._write_version(name, df)

    def truncate(self, name: str) -> int:
        return self._write_version(name, self.read(name).limit(0))

    def update(self, name: str, set_exprs: dict[str, F.Column], where: F.Column | None = None) -> int:
        """In-place UPDATE analog (M4, transform_load.sql:73): recompute
        columns behind an optional predicate and rewrite."""
        df = self.read(name)
        for col, expr in set_exprs.items():
            new_val = expr if where is None else F.when(where, expr).otherwise(F.col(col))
            df = df.withColumn(col, new_val)
        return self._write_version(name, df)

    def drop(self, name: str) -> None:
        shutil.rmtree(self._dir(name), ignore_errors=True)

    # -- MERGE ------------------------------------------------------------------
    def merge(
        self,
        name: str,
        source: DataFrame,
        on: list[str],
        update_cols: list[str] | None = None,
        insert_only: bool = False,
        capture_cdc: bool = True,
    ) -> int:
        """MERGE INTO <name> USING source ON <on> — Delta-MERGE semantics.

        WHEN MATCHED THEN UPDATE SET update_cols (all non-key source columns
        when None; skipped entirely when insert_only, matching the
        reference's dim merge transform_load.sql:43-47).
        WHEN NOT MATCHED THEN INSERT *.

        Raises if the source has duplicate merge keys (same as Delta's
        multiple-source-rows-matched error).

        On a partitioned table (``overwrite(..., partition_by=...)``) the
        merge is partition-pruned: only partitions present in the source
        are scanned, joined, and rewritten; untouched partitions are
        hard-linked into the new version unchanged. Requires partition
        columns functionally dependent on the merge keys (a key never
        moves between partitions).
        """
        target = self.read(name)
        dup = source.groupBy(*on).count().filter(F.col("count") > 1)
        if dup.take(1):
            raise ValueError(f"merge source has duplicate keys on {on}")

        spec = self.partition_spec(name)
        pruned = bool(spec) and all(c in source.columns for c in spec)
        if pruned:
            # touched partitions: distinct partition tuples in the source.
            # Partitions are coarse by design (years, sources), so the
            # driver-side collect is bounded and small.
            touched = [tuple(r) for r in source.select(*spec).distinct().collect()]
            pred = F.lit(False)
            for t in touched:
                conj = F.lit(True)
                for c, v in zip(spec, t):
                    conj = conj & (F.col(c) == F.lit(v))
                pred = pred | conj
            target = target.filter(pred)  # partition pruning hits the scan

        t = target.alias("t")
        s = source.alias("s")
        matched = F.col("s.__present").isNotNull() & F.col("t.__present").isNotNull()
        s_only = F.col("s.__present").isNotNull() & F.col("t.__present").isNull()

        t = t.withColumn("__present", F.lit(1)).alias("t")
        s = s.withColumn("__present", F.lit(1)).alias("s")
        cond = None
        for k in on:
            c = F.col(f"t.{k}") == F.col(f"s.{k}")
            cond = c if cond is None else (cond & c)
        joined = t.join(s, cond, "full_outer")

        data_cols = [c for c in target.columns if c not in on]
        source_cols = set(source.columns)
        if update_cols is None:
            upd = [c for c in data_cols if c in source_cols]
        else:
            upd = list(update_cols)

        out_cols = []
        for k in on:
            out_cols.append(F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k))
        for c in data_cols:
            t_val = F.col(f"t.{c}")
            s_val = F.col(f"s.{c}") if c in source_cols else F.lit(None)
            if insert_only or c not in upd:
                val = F.when(s_only, s_val).otherwise(t_val)
            else:
                val = F.when(s_only | matched, s_val).otherwise(t_val)
            out_cols.append(val.alias(c))
        action = (
            F.when(s_only, F.lit(CDC_INSERT))
            .when(matched & ~F.lit(insert_only), F.lit("update"))
            .otherwise(F.lit("keep"))
        )
        result = joined.select(*out_cols, action.alias("__action"))

        if capture_cdc:
            self._log_cdc(name, result, joined, on, data_cols, insert_only)
        v = self._write_version(name, result.drop("__action"), link_untouched=pruned)
        return v

    # -- CDC (S8: Delta Change Data Feed analog) --------------------------------
    def _cdc_table(self, name: str) -> str:
        return f"_cdc__{name}"

    def _log_cdc(
        self,
        name: str,
        result: DataFrame,
        joined: DataFrame,
        on: list[str],
        data_cols: list[str],
        insert_only: bool,
    ) -> None:
        next_v = (self.current_version(name) or 0) + 1
        inserts = result.filter(F.col("__action") == CDC_INSERT).withColumn(
            "_change_type", F.lit(CDC_INSERT)
        )
        changes = inserts
        if not insert_only:
            post = result.filter(F.col("__action") == "update").withColumn(
                "_change_type", F.lit(CDC_UPDATE_POST)
            )
            pre_cols = [F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k) for k in on]
            pre_cols += [F.col(f"t.{c}").alias(c) for c in data_cols]
            pre = (
                joined.filter(
                    F.col("t.__present").isNotNull() & F.col("s.__present").isNotNull()
                )
                .select(*pre_cols)
                .withColumn("__action", F.lit("update"))
                .withColumn("_change_type", F.lit(CDC_UPDATE_PRE))
            )
            changes = changes.unionByName(post).unionByName(pre)
        changes = changes.drop("__action").withColumn("_commit_version", F.lit(next_v))
        cdc = self._cdc_table(name)
        if self.exists(cdc):
            changes = self.read(cdc).unionByName(changes)
        self._write_version(cdc, changes)
        # append-only copy for streaming consumers (file source sees only
        # new files; see streaming/cdc.py)
        stream_dir = os.path.join(self.root, "_cdc_stream", name)
        changes.filter(F.col("_commit_version") == next_v).write.mode("append").parquet(
            stream_dir
        )

    def read_changes(self, name: str, starting_version: int = 0) -> DataFrame:
        """Batch read of the change feed (Delta's
        ``read.option('readChangeFeed')`` analog; streaming consumers use
        ``streaming.cdc.stream_changes``)."""
        cdc = self._cdc_table(name)
        if not self.exists(cdc):
            raise FileNotFoundError(f"no change feed for table {name!r}")
        return self.read(cdc).filter(F.col("_commit_version") >= starting_version)
