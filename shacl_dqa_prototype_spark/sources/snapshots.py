"""Snapshot-log table: the sandbox rendering of an Iceberg table.

north_rule: "resumes from the last committed Iceberg snapshot". The
container has no Iceberg runtime jar, so this module implements the part
of the table-format contract the pipeline depends on — atomic commits,
snapshot isolation, time travel, and safe vacuum — over plain parquet:

    table_dir/
      data/<snapshot-uuid>/...parquet   (one directory per commit)
      snapshots.jsonl                   (append-only commit log)

Commit protocol (same ordering Iceberg uses):
  1. write the new data directory — INVISIBLE to readers, nothing points
     at it yet;
  2. append ONE JSON line to snapshots.jsonl naming the new table state
     (for appends: parent's dirs + the new dir; for overwrites: the new
     dir alone).
A job killed between 1 and 2 leaves an orphan directory only — readers
still see the parent snapshot, exactly the Iceberg crash story. The log
line is a single O_APPEND write + flush, atomic for concurrent readers
on a local/posix filesystem; a real deployment swaps this file for the
catalog's atomic swap (which is also the only piece Iceberg itself
delegates to the catalog).

Reads resolve a snapshot (latest by default, any historical id for time
travel) to its directory list and load them with an EXPLICIT schema, so
an empty table (zero data dirs) still reads back as a typed empty
DataFrame.

Scale note: the log grows one line per commit and is read driver-side —
O(#commits), never O(data). Data files are only ever appended or dropped
whole-directory (expire), so no commit rewrites existing data.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SnapshotTable:
    def __init__(self, spark: SparkSession, table_dir: str, schema: StructType):
        self.spark = spark
        self.table_dir = table_dir
        self.schema = schema
        self.data_dir = os.path.join(table_dir, "data")
        self.log_path = os.path.join(table_dir, "snapshots.jsonl")
        os.makedirs(self.data_dir, exist_ok=True)

    # ---- log ------------------------------------------------------------

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self.log_path):
            return []
        with open(self.log_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def current(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def _append_log(self, rec: dict) -> None:
        with open(self.log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())

    # ---- commits --------------------------------------------------------

    def _write_data(self, df: DataFrame, bucket_col: str | None,
                    n_buckets: int) -> str:
        """Step 1: write the (invisible) data directory for this commit."""
        dirname = uuid.uuid4().hex[:16]
        path = os.path.join(self.data_dir, dirname)
        if bucket_col:
            (
                df.withColumn(
                    "_bucket", F.pmod(F.xxhash64(bucket_col), F.lit(n_buckets)))
                .repartition("_bucket")
                .write.mode("overwrite").partitionBy("_bucket").parquet(path)
            )
        else:
            df.write.mode("overwrite").parquet(path)
        return dirname

    def _commit(self, df: DataFrame, operation: str,
                bucket_col: str | None, n_buckets: int,
                extra: dict | None = None) -> str:
        parent = self.current()
        dirname = self._write_data(df, bucket_col, n_buckets)
        dirs = [dirname] if operation == "overwrite" else (
            (parent["dirs"] if parent else []) + [dirname]
        )
        snapshot_id = uuid.uuid4().hex[:16]
        # dir → bucket_col for every dir this snapshot references: read()
        # resolves each dir with the layout it was WRITTEN with (Iceberg's
        # partition-spec-per-file analog), so append chains may change
        # layout. Carried in full on every record so expire_snapshots can
        # drop old records without losing still-referenced dirs' layouts.
        parent_layouts = (parent or {}).get("dir_layouts") or {}
        dir_layouts = ({k: v for k, v in parent_layouts.items() if k in dirs}
                       if operation != "overwrite" else {})
        dir_layouts[dirname] = bucket_col
        self._append_log({
            "snapshot_id": snapshot_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "ts": time.time(),
            "operation": operation,
            "dirs": dirs,
            "dir_layouts": dir_layouts,
            "bucket_col": bucket_col,
            "n_buckets": n_buckets if bucket_col else None,
            **(extra or {}),
        })
        return snapshot_id

    def commit_append(self, df: DataFrame, bucket_col: str | None = None,
                      n_buckets: int = 32, extra: dict | None = None) -> str:
        """Append df as a new snapshot; prior data dirs are reused as-is.
        ``extra`` lands in the log record (e.g. a streaming epoch id, used
        for replay idempotence)."""
        return self._commit(df, "append", bucket_col, n_buckets, extra)

    def commit_overwrite(self, df: DataFrame, bucket_col: str | None = None,
                         n_buckets: int = 32, extra: dict | None = None) -> str:
        """Replace the table contents; old snapshots stay time-travelable
        until expire_snapshots drops them."""
        return self._commit(df, "overwrite", bucket_col, n_buckets, extra)

    # ---- reads ----------------------------------------------------------

    def read(self, snapshot_id: str | None = None) -> DataFrame:
        """Latest snapshot by default; pass snapshot_id for time travel."""
        snaps = self.snapshots()
        if snapshot_id is None:
            snap = snaps[-1] if snaps else None
        else:
            snap = next((s for s in snaps if s["snapshot_id"] == snapshot_id), None)
            if snap is None:
                raise KeyError(f"unknown snapshot {snapshot_id!r}")
        if snap is None or not snap["dirs"]:
            return self.spark.createDataFrame([], self.schema)
        # each dir is read with the layout its OWN commit recorded — a
        # single multi-root read would force one partition layout onto all
        # dirs (Spark partition discovery rejects mixed roots outright).
        # One relation per commit dir, unioned; compact with
        # commit_overwrite/expire_snapshots when the commit count grows.
        layout_of = snap.get("dir_layouts") or {}
        from pyspark.sql.types import IntegerType, StructField
        bucketed_schema = StructType(
            self.schema.fields + [StructField("_bucket", IntegerType(), True)])
        parts = []
        for d in snap["dirs"]:
            path = os.path.join(self.data_dir, d)
            # legacy logs (no per-commit "dir") fall back to the resolved
            # snapshot's layout
            bucketed = layout_of.get(d, snap.get("bucket_col"))
            if bucketed:
                parts.append(self.spark.read.schema(bucketed_schema)
                             .parquet(path).drop("_bucket"))
            else:
                parts.append(self.spark.read.schema(self.schema).parquet(path))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # ---- maintenance ----------------------------------------------------

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Drop history: keep the last ``keep_last`` snapshots, delete data
        dirs no kept snapshot references (orphan dirs from crashed commits
        are removed too). Returns the deleted dir names."""
        snaps = self.snapshots()
        kept = snaps[-keep_last:] if keep_last > 0 else []
        referenced = {d for s in kept for d in s["dirs"]}
        deleted = []
        for d in os.listdir(self.data_dir):
            if d not in referenced:
                shutil.rmtree(os.path.join(self.data_dir, d), ignore_errors=True)
                deleted.append(d)
        # rewrite the log to the kept tail (tmp + atomic rename)
        tmp = self.log_path + ".tmp"
        with open(tmp, "w") as f:
            for s in kept:
                f.write(json.dumps(s) + "\n")
        os.replace(tmp, self.log_path)
        return deleted
