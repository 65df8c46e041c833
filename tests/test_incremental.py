"""Incremental DQA parity: folding a corpus in as two snapshot appends
must yield EXACTLY the batch plan's profile and violations for every
state-derivable family — and never rescan old triples."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
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
    # append-monotone tier: per-triple filter families served from the
    # append-only violations log
    "UsageExternalURIEntities", "MisuseOwlObjectProperties",
    "MisuseOwlDatatypeProperties", "DeprecatedClasses",
    "DeprecatedProperties", "MisplacedProperties", "MisplacedClasses",
    "IrreflexiveProperty", "CorrectRange", "MalformedLiteral",
    # retractable anti-join families: state ⋈ state derivations
    "CorrectDomain", "AsymmetricProperty", "EntitiesDisjointClasses",
    "SchemaCompletenessClassUsage",
]


def _fold_in_two(spark, tmp_path, T):
    state = IncrementalDQAState.open(spark, str(tmp_path / "state"))
    split = F.abs(F.xxhash64("s")) % 2 == 0
    apply_delta(state, T.filter(split), core.ENTRY_CFG, core.ENTRY_VOCAB,
                n_buckets=4, delta_id="d1")
    apply_delta(state, T.filter(~split), core.ENTRY_CFG, core.ENTRY_VOCAB,
                n_buckets=4, delta_id="d2")
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
    inc_v = violations_from_state(state, core.ENTRY_VOCAB, core.ENTRY_CFG,
                                  disjoint_pairs=core.ENTRY_DISJOINT)
    batch_v = compile_data_constraints(
        T, core.ENTRY_VOCAB, core.ENTRY_DISJOINT, core.ENTRY_CFG).violations
    # the sh:class range branch (retractable anti-join) must be exercised,
    # not vacuous — it used to be the batch-only tier
    assert any(t.range is not None and t.range_kind == "class"
               for t in core.ENTRY_VOCAB)
    for metric in DERIVABLE:
        cond = F.col("metric") == metric
        inc = sorted(map(tuple, inc_v.filter(cond)
                         .select("item", "focus").distinct().collect()))
        ref = sorted(map(tuple, batch_v.filter(cond)
                         .select("item", "focus").distinct().collect()))
        assert inc == ref, f"{metric}: {len(inc)} vs {len(ref)}"
        if metric in ("LabelForEntities", "FunctionalProperty",
                      "MalformedLiteral", "IrreflexiveProperty",
                      "SelfDescriptiveFormatProperties", "CorrectRange",
                      "AsymmetricProperty", "EntitiesDisjointClasses"):
            assert inc, f"{metric} parity is vacuous (0 rows)"


def test_apply_delta_idempotent_on_retry(spark, tmp_path):
    """Re-applying an already-committed delta_id is a no-op on every
    table — sum-merged ps_counts would otherwise double-count."""
    T = core._triples(spark, SF)
    state = _fold_in_two(spark, tmp_path, T)
    tables = (state.subj_flags, state.ps_counts, state.cls_pairs,
              state.po_pairs, state.dom_pairs, state.spo_pairs,
              state.mono_violations)
    before = {
        "n_triples": state.ps_counts.read().agg(F.sum("n")).first()[0],
        "mono": state.mono_violations.read().count(),
        "snaps": [len(t.snapshots()) for t in tables],
    }
    split = F.abs(F.xxhash64("s")) % 2 == 0
    apply_delta(state, T.filter(~split), core.ENTRY_CFG, core.ENTRY_VOCAB,
                n_buckets=4, delta_id="d2")  # retry of the second delta
    assert state.ps_counts.read().agg(F.sum("n")).first()[0] == before["n_triples"]
    assert state.mono_violations.read().count() == before["mono"]
    assert [len(t.snapshots()) for t in tables] == before["snaps"]


def test_merge_commits_rewrite_only_touched_buckets(spark, tmp_path):
    """A small second delta must leave the data files of untouched state
    buckets byte-identical — the whole point of bucket-pruned commits."""
    import glob
    import hashlib
    import os

    T = core._triples(spark, SF).persist()
    state = IncrementalDQAState.open(spark, str(tmp_path / "state"))
    big = T.limit(20000)
    apply_delta(state, big, core.ENTRY_CFG, core.ENTRY_VOCAB,
                n_buckets=16, delta_id="d1")

    def file_hashes():
        out = {}
        for f in glob.glob(str(tmp_path / "state" / "ps_counts" / "**" / "*.parquet"),
                           recursive=True):
            with open(f, "rb") as fh:
                out[os.path.relpath(f, tmp_path)] = hashlib.md5(fh.read()).hexdigest()
        return out

    before = file_hashes()
    # a delta touching ONE subject → at most a couple of buckets
    one = T.filter(F.col("s") == T.select("s").first()["s"])
    apply_delta(state, one, core.ENTRY_CFG, core.ENTRY_VOCAB,
                n_buckets=16, delta_id="d2")
    after = file_hashes()
    T.unpersist()

    surviving = {k: v for k, v in before.items() if k in after}
    assert surviving, "old data dirs must be carried by reference"
    assert all(after[k] == v for k, v in surviving.items())
    # most of the 16 buckets must be carried over untouched, not rewritten
    assert len(surviving) >= 12, (len(surviving), len(before))
    # and the merged view is still exact
    assert (state.ps_counts.read().agg(F.sum("n")).first()[0]
            == big.unionByName(one).count())


def test_incremental_scores_match_batch_report(spark, tmp_path):
    """score_from_state must reproduce the ENTIRE batch report — every
    shape row and the meta rollup, scores and violation counts — from
    state alone (no triple scan)."""
    from shacl_dqa_prototype_spark.plans.dqa import run_data_dqa
    from shacl_dqa_prototype_spark.plans.incremental import score_from_state

    T = core._triples(spark, SF)
    state = _fold_in_two(spark, tmp_path, T)
    inc = score_from_state(state, core.ENTRY_VOCAB, core.ENTRY_CFG,
                           disjoint_pairs=core.ENTRY_DISJOINT)
    batch = run_data_dqa(T, core.ENTRY_VOCAB, core.ENTRY_DISJOINT,
                         core.ENTRY_CFG)
    cols = ["target", "dimension", "metric", "item", "score_kind",
            "measure", "num_violations"]
    def _key(t):
        return tuple((x is None, x) for x in t)

    inc_rows = sorted((tuple(r) for r in inc.select(*cols).collect()), key=_key)
    batch_rows = sorted((tuple(r) for r in batch.select(*cols).collect()),
                        key=_key)
    assert inc_rows == batch_rows


def test_vacuum_bounds_state_and_preserves_idempotence(spark, tmp_path):
    """vacuum() (r5): compact+expire over all 7 state tables must (a)
    preserve every table's contents exactly, (b) fold each log to one
    snapshot, (c) shrink the on-disk dir chain, and (d) keep apply_delta
    replay-idempotent — the vacuum carries the applied delta_ids forward
    in the compaction record, so a replayed old delta is still a no-op."""
    import os

    T = core._triples(spark, SF)
    state = _fold_in_two(spark, tmp_path, T)

    def dir_count(root):
        return sum(len(fs) for _, _, fs in os.walk(root))

    rows_before = {n: t.read().count() for n, t in state.tables().items()}
    n_before = state.ps_counts.read().agg(F.sum("n")).first()[0]
    files_before = dir_count(str(tmp_path / "state"))

    deleted = state.vacuum(orphan_grace_s=0.0)
    assert any(v > 0 for v in deleted.values())

    assert {n: t.read().count()
            for n, t in state.tables().items()} == rows_before
    # ≤1: a family whose folds were all empty never committed (dom_pairs
    # on this vocab) and stays at zero snapshots
    assert all(len(t.snapshots()) <= 1 for t in state.tables().values())
    assert dir_count(str(tmp_path / "state")) < files_before
    tip = state.ps_counts.current()
    assert set(tip["applied_delta_ids"]) == {"d1", "d2"}

    # replaying a pre-vacuum delta is STILL a no-op
    split = F.abs(F.xxhash64("s")) % 2 == 0
    apply_delta(state, T.filter(split), core.ENTRY_CFG, core.ENTRY_VOCAB,
                n_buckets=4, delta_id="d1")
    assert state.ps_counts.read().agg(F.sum("n")).first()[0] == n_before
    assert all(len(t.snapshots()) <= 1 for t in state.tables().values())

    # and a genuinely NEW delta still applies after the vacuum
    apply_delta(state, T.filter(split).limit(0), core.ENTRY_CFG,
                core.ENTRY_VOCAB, n_buckets=4, delta_id="d3")
    assert state.ps_counts.read().agg(F.sum("n")).first()[0] == n_before


def test_apply_delta_dedups_within_delta(spark, tmp_path):
    """A duplicate triple WITHIN one delta must not inflate the
    sum-merged ps_counts — batch reads dropDuplicates() the triple table,
    and a duplicated functional-property assertion produced a false
    FunctionalProperty violation (review finding)."""
    from shacl_dqa_prototype_spark.plans.constraints import (
        DQAConfig,
        VocabTerm,
    )
    from shacl_dqa_prototype_spark.plans.incremental import (
        IncrementalDQAState,
        apply_delta,
        profile_from_state,
        violations_from_state,
    )

    cfg = DQAConfig(base_uri="urn:x:", type_property="rdf:type")
    terms = [VocabTerm("urn:p:fp", "object_property", functional=True)]
    state = IncrementalDQAState.open(spark, str(tmp_path / "st"))
    row = ("urn:x:s1", "urn:p:fp", "urn:x:o1", "iri", None, None)
    delta = spark.createDataFrame(
        [row, row],  # same triple asserted twice in one delta
        "s string, p string, o string, o_kind string, "
        "o_dtype string, o_lang string")
    apply_delta(state, delta, cfg, terms, n_buckets=4, delta_id="d1")
    prof = profile_from_state(state)
    assert prof["scalars"].first()["num_triples"] == 1
    v = violations_from_state(state, terms, cfg)
    assert v.filter(v.metric.contains("Functional")).count() == 0


# ---------------------------------------------------------------------------
# Randomized parity: for ARBITRARY small triple sets and ARBITRARY splits
# into 1-3 deltas, the incremental state must reproduce the batch
# compiler's violations exactly. The fixed-corpus tests above pin the real
# entry fixture; this one walks the semantic corners hypothesis finds
# (mutual follows pairs, re-typed subjects across deltas, exempt types
# landing in a later delta than the violation they retract, ill-formed
# date literals, bnodes) that a hand-written fixture may miss.
# ---------------------------------------------------------------------------

_h_subj = st.sampled_from(
    [f"urn:s:{i}" for i in range(4)] + ["_:b0", "urn:e#h1"])
_h_ent = st.sampled_from(
    [f"urn:s:{i}" for i in range(4)] + ["urn:o:1", "urn:o:2"])
_h_cls = st.sampled_from([
    "urn:c:Customer", "urn:c:Supplier", "urn:c:PreferredCustomer",
    "urn:c:Order", "urn:c:Unknown",
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#Statement",   # prolix
    "http://www.w3.org/2002/07/owl#NamedIndividual",          # exempt
])
_h_oprop = st.sampled_from([
    "urn:p:hasCustomer",    # class range → retractable anti-join tier
    "urn:p:hasSupplier",    # functional
    "urn:p:inNation",       # inverse-functional
    "urn:p:follows",        # asymmetric
    "urn:p:refs",           # irreflexive (monotone tier)
    "urn:p:partOf",
    core.ENTRY_CFG.interlinking_property,
])
_h_row = st.one_of(
    st.tuples(_h_subj, st.just(core.ENTRY_CFG.type_property), _h_cls,
              st.just("iri"), st.none(), st.none()),
    st.tuples(_h_subj, _h_oprop, _h_ent,
              st.just("iri"), st.none(), st.none()),
    st.tuples(_h_subj, st.just(core.ENTRY_CFG.labeling_property),
              st.sampled_from(["A", "B"]), st.just("literal"),
              st.none(), st.sampled_from([None, "en"])),
    st.tuples(_h_subj, st.just(core.ENTRY_CFG.description_property),
              st.sampled_from(["d1", "d2"]), st.just("literal"),
              st.none(), st.sampled_from([None, "en"])),
    st.tuples(_h_subj, st.just("urn:p:orderedOn"),
              st.sampled_from(["2024-01-02", "not-a-date", "2024-1-2"]),
              st.just("literal"),
              st.just("http://www.w3.org/2001/XMLSchema#date"), st.none()),
)


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_incremental_matches_batch_on_random_splits(spark, data):
    import shutil
    import tempfile

    rows = sorted({r for r in data.draw(
        st.lists(_h_row, min_size=1, max_size=22))},
        key=lambda r: tuple(x or "" for x in r))
    k = data.draw(st.integers(min_value=1, max_value=3))
    assign = data.draw(st.lists(
        st.integers(min_value=0, max_value=k - 1),
        min_size=len(rows), max_size=len(rows)))

    T = spark.createDataFrame(
        rows, "s string, p string, o string, o_kind string, "
              "o_dtype string, o_lang string")
    batch_plan = compile_data_constraints(
        T, core.ENTRY_VOCAB, core.ENTRY_DISJOINT, core.ENTRY_CFG)

    def _vset(df):
        return {(r["metric"], r["item"], r["focus"]) for r in
                df.filter(F.col("metric").isin(DERIVABLE))
                .select("metric", "item", "focus").distinct().collect()}

    state_dir = tempfile.mkdtemp(prefix="incr_prop_")
    try:
        state = IncrementalDQAState.open(spark, state_dir)
        for d in range(k):
            delta_rows = [r for r, a in zip(rows, assign) if a == d]
            delta = spark.createDataFrame(delta_rows or [], T.schema)
            apply_delta(state, delta, core.ENTRY_CFG, core.ENTRY_VOCAB,
                        n_buckets=4, delta_id=f"d{d}")
        inc_v = violations_from_state(
            state, core.ENTRY_VOCAB, core.ENTRY_CFG,
            disjoint_pairs=core.ENTRY_DISJOINT)
        assert _vset(inc_v) == _vset(batch_plan.violations), (rows, assign)
        n_inc = profile_from_state(state)["scalars"].first()["num_triples"]
        assert (n_inc or 0) == len(rows), (rows, assign)
    finally:
        batch_plan.unpersist()
        shutil.rmtree(state_dir, ignore_errors=True)
