"""Incremental DQA parity: folding a corpus in as two snapshot appends
must yield EXACTLY the batch plan's profile and violations for every
state-derivable family — and never rescan old triples."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as core
from shacl_dqa_prototype_spark.plans.constraints import compile_data_constraints
from shacl_dqa_prototype_spark.plans.incremental import (
    IncrementalDQAState,
    apply_delta,
    profile_from_state,
    violations_from_state,
)
from shacl_dqa_prototype_spark.plans.profile import profile_graph

SF = "/root/testdata/sf0.001"

DERIVABLE = [
    "UsageHashURIsEntities", "LabelForEntities", "InterlinkingCompleteness",
    "URIsLengthEntities", "URIsParametersEntities", "ProlixFeatures",
    "SelfDescriptiveFormat", "BlankNodesUsageEntities",
    "DifferentLanguagesLabelsEntities", "DifferentLanguagesDescriptionsEntities",
    "FunctionalProperty", "InverseFunctionalPropertyUniqueness",
]


def _fold_in_two(spark, tmp_path, T):
    state = IncrementalDQAState.open(spark, str(tmp_path / "state"))
    ifp = [t.term for t in core.ENTRY_VOCAB if t.inverse_functional]
    split = F.abs(F.xxhash64("s")) % 2 == 0
    apply_delta(state, T.filter(split), core.ENTRY_CFG, ifp, n_buckets=4)
    apply_delta(state, T.filter(~split), core.ENTRY_CFG, ifp, n_buckets=4)
    return state


def test_incremental_profile_matches_batch(spark, tmp_path):
    T = core._triples(spark, SF)
    state = _fold_in_two(spark, tmp_path, T)
    prof = profile_from_state(state)
    batch = profile_graph(T, core.ENTRY_CFG.type_property,
                          core.ENTRY_CFG.labeling_property,
                          core.ENTRY_CFG.description_property,
                          core.ENTRY_CFG.interlinking_property)
    row = prof["scalars"].first()
    assert row["num_triples"] == batch.num_triples
    assert row["num_properties"] == batch.num_properties
    assert row["num_entities"] == batch.num_entities
    assert row["num_classes"] == batch.num_classes
    assert row["num_entities_label"] == batch.num_entities_label
    assert row["num_entities_interlinking"] == batch.num_entities_interlinking
    assert row["num_entities_description"] == batch.num_entities_description
    for key, batch_df in [
        ("triples_per_property", batch.triples_per_property),
        ("subjects_per_property", batch.subjects_per_property),
        ("entities_per_class", batch.entities_per_class),
    ]:
        inc = sorted(map(tuple, prof[key].collect()))
        ref = sorted(map(tuple, batch_df.collect()))
        assert inc == ref, key

    # state itself is snapshot-versioned: the pre-second-delta state is
    # still readable (rollback / audit)
    snaps = state.ps_counts.snapshots()
    assert len(snaps) == 2
    n_after_first = state.ps_counts.read(snaps[0]["snapshot_id"]).count()
    assert 0 < n_after_first < state.ps_counts.read().count()


def test_incremental_violations_match_batch(spark, tmp_path):
    T = core._triples(spark, SF)
    state = _fold_in_two(spark, tmp_path, T)
    inc_v = violations_from_state(state, core.ENTRY_VOCAB, core.ENTRY_CFG)
    batch_v = compile_data_constraints(
        T, core.ENTRY_VOCAB, core.ENTRY_DISJOINT, core.ENTRY_CFG).violations
    for metric in DERIVABLE:
        inc = sorted(map(tuple, inc_v.filter(F.col("metric") == metric)
                         .select("item", "focus").distinct().collect()))
        ref = sorted(map(tuple, batch_v.filter(F.col("metric") == metric)
                         .select("item", "focus").distinct().collect()))
        assert inc == ref, f"{metric}: {len(inc)} vs {len(ref)}"
