"""Snapshot-log table (Iceberg-analog: atomic commit, time travel, vacuum)
and stateful Structured Streaming (session_window, applyInPandasWithState)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shacl_dqa_prototype_spark.schemas import EVENTS_SCHEMA
from shacl_dqa_prototype_spark.sources.snapshots import SnapshotTable

SF = "/root/testdata/sf0.001"


def _events_subset(spark, n_users=40):
    return (
        spark.read.parquet(os.path.join(SF, "events.parquet"))
        .filter(F.col("user_id") < n_users)
    )


def test_snapshot_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), EVENTS_SCHEMA)
    ev = _events_subset(spark).select(*[f.name for f in EVENTS_SCHEMA.fields])
    a = ev.filter(F.col("user_id") < 20)
    b = ev.filter(F.col("user_id") >= 20)
    s1 = t.commit_append(a)
    s2 = t.commit_append(b)
    assert t.read().count() == ev.count()                 # latest = a ∪ b
    assert t.read(s1).count() == a.count()                # time travel
    assert t.current()["snapshot_id"] == s2
    assert t.current()["parent_id"] == s1


def test_snapshot_overwrite_expire_and_crash_invisibility(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"), EVENTS_SCHEMA)
    ev = _events_subset(spark).select(*[f.name for f in EVENTS_SCHEMA.fields])
    s1 = t.commit_append(ev.limit(10))
    # crash between data write and log append → orphan dir, table unchanged
    t._write_data(ev.limit(5), None, 32)
    assert t.read().count() == 10
    s2 = t.commit_overwrite(ev.limit(3))
    assert t.read().count() == 3
    assert t.read(s1).count() == 10                       # history intact
    deleted = t.expire_snapshots(keep_last=1)
    assert len(deleted) == 2                              # s1 dir + orphan
    assert t.read().count() == 3                          # kept snapshot fine
    assert [s["snapshot_id"] for s in t.snapshots()] == [s2]


def test_snapshot_bucketed_layout_roundtrip(spark, tmp_path):
    from shacl_dqa_prototype_spark.schemas import TRIPLES_SCHEMA

    t = SnapshotTable(spark, str(tmp_path / "tbl"), TRIPLES_SCHEMA)
    rows = [(f"urn:s{i}", "urn:p", f"o{i}", "iri", None, None) for i in range(100)]
    df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    t.commit_append(df, bucket_col="s", n_buckets=8)
    back = t.read()
    assert back.count() == 100 and back.columns == [f.name for f in TRIPLES_SCHEMA.fields]
    # physical layout: one directory per bucket under the data dir
    snap_dir = os.path.join(t.data_dir, t.current()["dirs"][0])
    buckets = [d for d in os.listdir(snap_dir) if d.startswith("_bucket=")]
    assert len(buckets) == 8


def test_streaming_extraction_into_snapshots(spark, tmp_path):
    from shacl_dqa_prototype_spark.datagen import GenConfig, generate_documents
    from shacl_dqa_prototype_spark.operators.extract import extract_fact_mentions
    from shacl_dqa_prototype_spark.streaming.ingest import (
        start_incremental_extraction_snapshots,
    )

    in_dir, ck = str(tmp_path / "in"), str(tmp_path / "ck")
    docs = generate_documents(spark, GenConfig(n_docs=40, n_entities=10))
    docs.write.mode("overwrite").parquet(in_dir)
    batch = extract_fact_mentions(spark.read.parquet(in_dir))
    t = SnapshotTable(spark, str(tmp_path / "tbl"), batch.schema)
    q = start_incremental_extraction_snapshots(spark, in_dir, t, ck)
    q.awaitTermination(120)
    assert t.read().count() == batch.count()
    n_snaps = len(t.snapshots())
    assert n_snaps >= 1 and all("epoch" in s for s in t.snapshots())
    # replayed epoch (restart duplicate) is idempotent — no new snapshot
    first_epoch = t.snapshots()[0]["epoch"]
    from shacl_dqa_prototype_spark.streaming import ingest as _i
    before = t.read().count()
    if not any(s.get("epoch") == first_epoch for s in t.snapshots()):
        raise AssertionError
    # simulate the foreachBatch replay path directly
    def replay():
        if any(s.get("epoch") == first_epoch for s in t.snapshots()):
            return
        t.commit_append(batch, extra={"epoch": first_epoch})
    replay()
    assert len(t.snapshots()) == n_snaps and t.read().count() == before
    # incremental: appending more input files only commits the delta
    generate_documents(spark, GenConfig(n_docs=15, n_entities=10, seed=3)).write.mode(
        "append").parquet(in_dir)
    q2 = start_incremental_extraction_snapshots(spark, in_dir, t, ck)
    q2.awaitTermination(120)
    total = extract_fact_mentions(spark.read.parquet(in_dir)).count()
    assert t.read().count() == total


def test_session_window_streaming_matches_batch(spark, tmp_path):
    from shacl_dqa_prototype_spark.streaming.stateful import (
        run_streaming_sessionize,
        sessionize_session_window,
    )

    in_dir = str(tmp_path / "ev")
    ev = _events_subset(spark)
    ev.write.mode("overwrite").parquet(in_dir)
    batch = sessionize_session_window(spark.read.parquet(in_dir))
    stream = run_streaming_sessionize(spark, in_dir, query_name="sess_t")
    key = lambda r: (r["user_id"], r["session_start"])
    b = sorted(map(tuple, batch.collect()), key=lambda x: (x[0], x[1]))
    s = sorted(map(tuple, stream.collect()), key=lambda x: (x[0], x[1]))
    assert b == s and len(b) > 0


def test_apply_in_pandas_with_state_totals(spark, tmp_path):
    from shacl_dqa_prototype_spark.streaming.stateful import (
        run_streaming_user_totals,
    )

    in_dir = str(tmp_path / "ev")
    ev = _events_subset(spark, n_users=25)
    ev.write.mode("overwrite").parquet(in_dir)
    got = run_streaming_user_totals(spark, in_dir, query_name="tot_t")
    exp = (
        spark.read.parquet(in_dir).groupBy("user_id")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"),
             F.max("ts").alias("last_ts"))
    )
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, exp.collect()))
    assert g == e and len(g) > 0


def test_snapshot_mixed_bucket_layouts_read_correctly(spark, tmp_path):
    """Each commit dir is read with the layout it was WRITTEN with
    (partition-spec evolution): an append chain mixing unbucketed and
    bucketed commits — and layout survival across expire_snapshots —
    must read back exactly."""
    ev = _events_subset(spark, 10).select(
        "event_id", "user_id", "event_type", "value")
    n = ev.count()
    t = SnapshotTable(spark, str(tmp_path / "tbl"), ev.schema)
    t.commit_append(ev)                                     # unbucketed
    t.commit_append(ev, bucket_col="user_id", n_buckets=4)  # bucketed
    t.commit_append(ev, bucket_col="user_id", n_buckets=8)  # rebucketed
    assert t.read().count() == 3 * n
    assert t.read().columns == ev.columns                   # no _bucket leak
    # expire old log records: kept snapshot still knows every dir's layout
    t.expire_snapshots(keep_last=1)
    assert t.read().count() == 3 * n


def test_streaming_snapshot_epoch_keyed_per_run(spark, tmp_path):
    """A NEW checkpoint restarts epoch numbering at 0 — its batches must
    commit even though an older run also had epoch 0."""
    from shacl_dqa_prototype_spark.datagen import GenConfig, generate_documents
    from shacl_dqa_prototype_spark.operators.extract import extract_fact_mentions
    from shacl_dqa_prototype_spark.streaming.ingest import (
        start_incremental_extraction_snapshots,
    )

    in1, in2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    generate_documents(spark, GenConfig(n_docs=20, n_entities=8)).write.mode(
        "overwrite").parquet(in1)
    generate_documents(spark, GenConfig(n_docs=10, n_entities=8, seed=5)
                       ).write.mode("overwrite").parquet(in2)
    schema = extract_fact_mentions(spark.read.parquet(in1)).schema
    t = SnapshotTable(spark, str(tmp_path / "tbl"), schema)
    exp1 = extract_fact_mentions(spark.read.parquet(in1)).count()
    exp2 = extract_fact_mentions(spark.read.parquet(in2)).count()
    q1 = start_incremental_extraction_snapshots(
        spark, in1, t, str(tmp_path / "ck1"))
    q1.awaitTermination(120)
    assert t.read().count() == exp1
    # second pipeline: fresh checkpoint, fresh input — Spark numbers its
    # first epoch 0 again; the run-scoped key must NOT skip it
    q2 = start_incremental_extraction_snapshots(
        spark, in2, t, str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    assert t.read().count() == exp1 + exp2
