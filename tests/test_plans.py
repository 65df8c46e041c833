"""Plan-regression tests: the physical plans the engine promises are
asserted, not just eyeballed — a refactor that silently drops a pushed
filter, de-broadcasts a dimension join, or sneaks a row-at-a-time Python
UDF into a hot path fails CI, the same way a wrong result would.

All assertions run on `explainString("formatted")` of the driver-contract
queries at sf0.001 (plan shape is scale-invariant; AQE leaf markers are).
"""

from __future__ import annotations

import re

import pytest

SF = "/root/testdata/sf0.001"


def _op_count(s: str, op: str) -> int:
    """Count operator occurrences via the detail-section headers
    ('(3) Exchange') — formatted mode prints each operator twice."""
    return len(re.findall(rf"^\(\d+\) {op}\b", s, re.M))


def _explain(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as e

    return e.queries()


def test_tpch_q1_scan_is_pruned_and_pushed(spark, contract):
    """The scan must read only the 6 needed columns (of 16) and push the
    shipdate predicate into the parquet reader."""
    s = _explain(spark, contract["tpch_q1_pricing"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in s
    # column pruning: wide lineitem columns absent from ReadSchema
    read_schema = next(l for l in s.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema
    # map-side partial aggregation, exactly one shuffle
    assert "partial_sum" in s
    assert _op_count(s, "Exchange") == 1


def test_dimension_joins_broadcast(spark, contract):
    """Small-dimension joins must be broadcast, never shuffled-merge."""
    for name in ("top_customer_per_nation", "customers_without_orders",
                 "kg_link_entities"):
        s = _explain(spark, contract[name](spark, SF))
        assert "BroadcastHashJoin" in s, name
        assert "SortMergeJoin" not in s, f"{name}: dimension join shuffled"


def test_tpch_q3_q5_star_join_shape(spark, contract):
    """The multi-join analytics queries must keep every selective filter
    in the parquet scan, broadcast the dimension sides, and express the
    Q3 TopK as a sort-limit — never a global sort or a merge join."""
    s3 = _explain(spark, contract["tpch_q3_shipping"](spark, SF))
    assert "EqualTo(c_mktsegment,BUILDING)" in s3
    assert "GreaterThan(l_shipdate" in s3 and "LessThan(o_orderdate" in s3
    assert "BroadcastHashJoin" in s3 and "SortMergeJoin" not in s3
    assert _op_count(s3, "TakeOrderedAndProject") >= 1
    assert _op_count(s3, "Sort") == 0          # TopK, not a full sort
    s5 = _explain(spark, contract["tpch_q5_local_supplier"](spark, SF))
    assert "EqualTo(r_name,ASIA)" in s5
    assert "BroadcastHashJoin" in s5 and "SortMergeJoin" not in s5
    # co-nationality folds into the supplier join: no extra fact shuffle
    assert "BatchEvalPython" not in s5 and "Cartesian" not in s5


def test_window_top1_single_shuffle_per_key(spark, contract):
    """row_number top-1 per nation: one hash-partitioning exchange on the
    window key feeds the sort+window — no extra global sort."""
    s = _explain(spark, contract["top_customer_per_nation"](spark, SF))
    assert "Window" in s
    assert "hashpartitioning(n_nationkey" in s or "hashpartitioning(c_nationkey" in s


def test_exact_dedup_is_one_aggregation(spark, contract):
    """Exact dedup = hash groupBy on the digest: partial agg + 1 shuffle
    (+ AQE output exchange), no join, no sort."""
    s = _explain(spark, contract["dedup_exact"](spark, SF))
    assert "SortMergeJoin" not in s and "Join" not in s
    assert "partial_" in s


def test_constraint_compiler_is_fused(spark):
    """Lock in the fused constraint compiler (r3): every per-row filter
    family folds into exactly TWO scan+explode branches — one over the
    per-subject flags aggregate, one over the triple table — so the full
    violations union stays bounded (≤ 10 branches) no matter how many
    metrics the vocab induces. A refactor that quietly re-expands a family
    back into its own union branch (= its own scan of T at 100 TB) fails
    here before it shows up as a bench regression."""
    import __spark_entry__ as e
    from shacl_dqa_prototype_spark.plans.constraints import (
        compile_data_constraints,
    )

    plan = compile_data_constraints(
        e._triples(spark, SF), e.ENTRY_VOCAB, e.ENTRY_DISJOINT, e.ENTRY_CFG)
    metrics = set().union(*plan.part_metrics)
    assert len(metrics) >= 20, "vocab should induce many metric families"
    assert len(plan.parts) <= 10, (
        f"{len(plan.parts)} union branches — fusion regressed")
    s = _explain(spark, plan.violations)
    assert _op_count(s, "Generate") == 2, "expected exactly 2 fused explodes"
    assert "BatchEvalPython" not in s


# Representative slice of every operator family; kept small enough that the
# sweep stays under ~2 min of plan-building.
SWEEP = [
    "profile_scalars", "profile_entities_per_class", "profile_degree_topk",
    "profile_literal_datatypes", "profile_degree_distribution",
    "shape_functional_property", "shape_correct_range_class",
    "shape2_misplaced_props", "dqa_scores", "dqa2_meta_rollup",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_neardup",
    "dedup_ngram_novelty", "text_unigram_logprob", "events_asof_nearest",
    "tpch_q3_shipping", "tpch_q5_local_supplier",
    "sim_topk_cosine", "sim_ann_ivf",
    "text_token_count", "text_fingerprint",
    "pipe_pack_sequences", "pipe_stratified_sample", "pipe_redact_pii",
    "pipe_global_shuffle", "text_repetition", "text_length_profile",
    "kg_extract_mentions", "kg_link_entities", "kg_media_features",
    "events_sessionize", "rdf_ntriples_roundtrip", "rdf_turtle_roundtrip",
    "text_vocab_top_tokens", "text_quality_gate", "pipe_source_filter",
    "dedup_dup_ngram_fraction", "events_asof_join", "events_rolling_1h",
    "pipe_mixture_plan", "dedup_keep_best",
    "pipe_chunk_documents", "text_bm25", "kg_triangle_count", "pipe_curate",
    "events_interval_join", "events_cube", "events_pivot", "text_langid",
    "text_tfidf_top_terms", "text_cooccurrence_pmi", "sim_centroid_cosine",
    "kg_media_dedup",
]


def test_langid_plan_stays_codegen_sized(spark, contract):
    """Lock in the array_max argmax (r5): the original 12-deep nested-WHEN
    chain had Catalyst inlining every marker-score expression per nesting
    level — the generated processNext() blew past the JVM's 64 KB method
    limit and the whole projection fell back to interpreted evaluation
    (ERROR CodeGenerator in the sf0.1 gate log, ~10x slower). The blown-up
    plan's projection printed >100 CASE WHENs and megabytes of text; the
    struct-argmax plan is a few KB with exactly one array_max."""
    s = _explain(spark, contract["text_langid"](spark, SF))
    assert "array_max" in s
    assert len(s) < 50_000, f"langid plan exploded to {len(s)} chars"
    assert s.count("CASE WHEN") < 10


def test_interval_join_is_equi_not_nested_loop(spark, contract):
    """The binned range join must plan as an EQUI hash join on
    (key, bin) — a BETWEEN theta-join would appear as
    BroadcastNestedLoopJoin/CartesianProduct and melt at scale."""
    s = _explain(spark, contract["events_interval_join"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in s
    assert "CartesianProduct" not in s
    assert ("BroadcastHashJoin" in s or "SortMergeJoin" in s
            or "ShuffledHashJoin" in s)


@pytest.mark.parametrize("name", SWEEP)
def test_no_rowwise_python_or_cartesian(spark, contract, name):
    """No contract plan may contain a row-at-a-time Python UDF
    (BatchEvalPython — Arrow-batched ArrowEvalPython/mapInPandas are the
    only Python surfaces allowed) or an unconditional CartesianProduct."""
    s = _explain(spark, contract[name](spark, SF))
    assert "BatchEvalPython" not in s, f"{name}: row-wise Python UDF"
    assert "CartesianProduct" not in s, f"{name}: cartesian join"


def test_quality_gate_has_no_exchange(spark, contract):
    """quality_gate promises a single narrow map over the corpus — any
    Exchange in its plan is a regression."""
    s = _explain(spark, contract["text_quality_gate"](spark, SF))
    assert _op_count(s, "Exchange") == 0


def test_asof_join_is_joinless_one_window(spark, contract):
    """asof_join promises UNION + window: zero join operators, and the
    only exchanges are the window partitioning (plus the tiny right-side
    dedup the entry does)."""
    s = _explain(spark, contract["events_asof_join"](spark, SF))
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert _op_count(s, j) == 0, j
    assert _op_count(s, "Window") >= 1
    assert _op_count(s, "Exchange") <= 2


def test_vocab_top_tokens_take_ordered(spark, contract):
    """Global top-k must be TakeOrdered (per-partition heap + k-row driver
    merge), never a global Sort across the full token table."""
    s = _explain(spark, contract["text_vocab_top_tokens"](spark, SF))
    assert _op_count(s, "TakeOrderedAndProject") == 1
    assert "partial_count" in s  # map-side combine before the shuffle


def test_dup_ngram_fraction_bounded_shuffles(spark, contract):
    """The frequency-join-free formulation: bounded exchanges (agg,
    shingle window, doc agg, join alignment), no shingle self-join."""
    s = _explain(spark, contract["dedup_dup_ngram_fraction"](spark, SF))
    assert _op_count(s, "Exchange") <= 5
    assert "partial_count" in s
