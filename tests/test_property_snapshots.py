"""Model-based property test for SnapshotTable: a random sequence of
append / keyed-upsert / keyed-delete / compact operations is applied both
to the table and to a plain python row-list model; after the run, the
CURRENT read and the TIME-TRAVEL read at every recorded snapshot must
match the model's state as of that snapshot. Pins last-writer-wins upsert
(replacing ALL rows of a key, including append-duplicated ones), delete
semantics, compaction content-neutrality, and snapshot immutability under
later writes — on operation interleavings the example tests don't cover.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

_key = st.sampled_from([f"k{i}" for i in range(5)])

_op = st.one_of(
    st.tuples(st.just("append"),
              st.lists(st.tuples(_key, st.integers(0, 9)),
                       min_size=1, max_size=3)),
    st.tuples(st.just("upsert"),
              st.dictionaries(_key, st.integers(10, 19),
                              min_size=1, max_size=3)),
    st.tuples(st.just("delete"),
              st.lists(_key, min_size=1, max_size=2, unique=True)),
    st.tuples(st.just("compact"), st.none()),
)


@settings(max_examples=6, deadline=None)
@given(ops=st.lists(_op, min_size=1, max_size=6))
def test_snapshot_table_matches_list_model(spark, ops):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from shacl_dqa_prototype_spark.sources.snapshots import SnapshotTable

    schema = StructType([StructField("k", StringType(), False),
                         StructField("v", LongType(), False)])
    tdir = tempfile.mkdtemp(prefix="snapprop_")
    try:
        table = SnapshotTable(spark, tdir, schema)
        model: list[tuple[str, int]] = []
        history: list[tuple[str, list[tuple[str, int]]]] = []
        for kind, arg in ops:
            if kind == "append":
                sid = table.commit_append(
                    spark.createDataFrame(arg, schema),
                    bucket_col="k", n_buckets=4)
                model = model + [(k, v) for k, v in arg]
            elif kind == "upsert":
                sid = table.merge_upsert(
                    spark.createDataFrame(list(arg.items()), schema),
                    key_col="k", n_buckets=4)
                model = ([r for r in model if r[0] not in arg]
                         + sorted(arg.items()))
            elif kind == "delete":
                sid = table.merge_delete(
                    spark.createDataFrame([(k,) for k in arg], "k string"),
                    key_col="k", n_buckets=4)
                model = [r for r in model if r[0] not in arg]
            else:
                sid = table.compact(max_dirs=1)
                if sid is None:  # nothing to fold — no snapshot recorded
                    continue
            history.append((sid, sorted(model)))

        for sid, state in history:
            got = sorted((r["k"], r["v"])
                         for r in table.read(snapshot_id=sid).collect())
            assert got == state, (ops, sid)
        cur = sorted((r["k"], r["v"]) for r in table.read().collect())
        assert cur == sorted(model), ops
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
