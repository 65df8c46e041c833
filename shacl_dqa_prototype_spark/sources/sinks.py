"""A8/A9/E6/E7 — triple sink, report sinks, manifest + resume.

north_rule: triples partitioned by subject hash; every stage commits a
manifest row (per-partition lineage + counters) so a killed job resumes
from the last committed snapshot.

Sandbox note: Iceberg's runtime jar is not baked into this container, so
the sink writes parquet with an explicit ``s_bucket = pmod(xxhash64(s), N)``
partition column — the exact layout ``bucket(N, s)`` would give on Iceberg
(same pruning, same co-location); the writer API is isolated here so the
Iceberg path is a one-line swap (`.format("iceberg")`).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import IntegerType, StructField, StructType

from shacl_dqa_prototype_spark.schemas import MANIFEST_SCHEMA, TRIPLES_SCHEMA


def write_triples(triples: DataFrame, path: str, n_buckets: int = 32) -> None:
    """E6: materialize T partitioned by subject hash.

    One shuffle keyed on the bucket, then a partitioned write — downstream
    per-subject work (groupBy('s'), self-joins on s) reuses the layout."""
    (
        triples.withColumn("s_bucket", F.pmod(F.xxhash64("s"), F.lit(n_buckets)))
        .repartition("s_bucket")
        .write.mode("overwrite")
        .partitionBy("s_bucket")
        .parquet(path)
    )


def read_triples(spark: SparkSession, path: str) -> DataFrame:
    # Explicit schema: an empty KG writes zero parquet footers, which would
    # break schema inference on read-back. Build a fresh StructType —
    # StructType.add mutates in place, so never .add on the shared constant.
    schema = StructType(
        TRIPLES_SCHEMA.fields + [StructField("s_bucket", IntegerType(), True)]
    )
    return spark.read.schema(schema).parquet(path).drop("s_bucket")


class Manifest:
    """E7: append-only per-stage commit log backed by JSON lines.

    A stage is 'committed' when a row with status=committed exists AND its
    payload path is readable. ``resume`` = skip stages already committed.
    (On a real deployment this is an Iceberg table written with
    snapshot-per-stage commits; JSONL keeps the sandbox dependency-free
    while preserving the exact protocol.)"""

    def __init__(self, workdir: str, run_id: str | None = None):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, "manifest.jsonl")
        self.run_id = run_id or uuid.uuid4().hex[:12]

    def _rows(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def committed(self, stage: str) -> dict | None:
        """Latest committed row for a stage (any run — resume crosses runs)."""
        rows = [r for r in self._rows() if r["stage"] == stage and r["status"] == "committed"]
        if not rows:
            return None
        row = max(rows, key=lambda r: r["seq"])
        payload = json.loads(row.get("payload") or "{}")
        out_path = payload.get("path")
        if out_path and not os.path.exists(out_path):
            return None  # snapshot vanished → not resumable
        return row

    def commit(self, stage: str, rows: int, partitions: int, payload: dict | None = None) -> None:
        # wall clock, NOT time.monotonic_ns(): committed() orders rows
        # across RUNS by seq, and monotonic time resets on reboot — a
        # re-run after reboot would lose to a high-uptime row from before
        # it and resume() would silently read the stale snapshot
        seq = int(time.time_ns())
        rec = {
            "run_id": self.run_id,
            "stage": stage,
            "status": "committed",
            "rows": int(rows),
            "partitions": int(partitions),
            "payload": json.dumps(payload or {}),
            "seq": seq,
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def as_df(self, spark: SparkSession) -> DataFrame:
        rows = self._rows()
        return spark.createDataFrame(rows, schema=MANIFEST_SCHEMA) if rows else spark.createDataFrame([], MANIFEST_SCHEMA)


def write_report_csv(report: DataFrame, path: str) -> None:
    """A6: the small final report → one CSV (coalesce(1) is safe: report
    cardinality is O(#metrics × #properties), thousands at most)."""
    report.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def write_report_json(report: DataFrame, path: str) -> None:
    report.coalesce(1).write.mode("overwrite").json(path)
