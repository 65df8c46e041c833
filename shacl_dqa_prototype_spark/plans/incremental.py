"""Incremental DQA: exact maintenance of profile + delta-safe constraint
families across snapshot APPENDs, without rescanning old triples.

At 100 TB a corpus grows by appends; re-running the whole DQA per append
re-reads everything. The states below are classic incremental-view-
maintenance aggregates — each merge is ONE co-partitioned shuffle of
(delta-aggregate ∪ state), never a scan of historical triples:

  subj_flags  (s, is_entity, is_exempt, has_label, has_ilp, is_prolix,
               lbl_nolang, dsc_nolang)        merge: groupBy(s) bool-max
  ps_counts   (p, s, n)                       merge: groupBy(p,s) sum
  cls_pairs   (cls, s)                        merge: union-distinct
  po_pairs    (p, o, s)  [IFP props only]     merge: union-distinct

Derived EXACTLY from state (parity with the batch plan is asserted in
tests/test_incremental.py):
  * profile: num_triples / num_properties / triples_per_property (sums
    over ps_counts), subjects_per_property (row counts), num_entities /
    label/ilp coverage (subj_flags), entities_per_class (cls_pairs);
  * entity-scoped families C2/C3/C6/C8-C13/C15 (filters on subj_flags);
  * C24 FunctionalProperty (ps_counts n > 1 for functional props);
  * C23 IFP uniqueness (po_pairs grouped, >1 distinct subject).

Families that need a join against the FULL triple set (domain/range/
disjoint/asymmetric...) are not state-mergeable — for those the caller
re-evaluates over the snapshot table's current view (documented split;
the expensive entity-scoped + counting families above dominate volume).

State lives in SnapshotTables, so DQA state itself is atomic, resumable,
and time-travelable: a killed update leaves the previous state snapshot
intact, and any historical state can be re-read.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from shacl_dqa_prototype_spark.plans.constraints import DQAConfig, VocabTerm
from shacl_dqa_prototype_spark.sources.snapshots import SnapshotTable
from shacl_dqa_prototype_spark.functions.terms import EXEMPT_TYPES, PROLIX_CLASSES

_FLAGS = ["is_entity", "is_exempt", "has_label", "has_ilp", "has_desc",
          "is_prolix", "lbl_nolang", "dsc_nolang"]

SUBJ_FLAGS_SCHEMA = StructType(
    [StructField("s", StringType(), False)]
    + [StructField(f, BooleanType(), True) for f in _FLAGS]
)
PS_COUNTS_SCHEMA = StructType([
    StructField("p", StringType(), False),
    StructField("s", StringType(), False),
    StructField("n", LongType(), False),
])
CLS_PAIRS_SCHEMA = StructType([
    StructField("cls", StringType(), False),
    StructField("s", StringType(), False),
])
PO_PAIRS_SCHEMA = StructType([
    StructField("p", StringType(), False),
    StructField("o", StringType(), False),
    StructField("s", StringType(), False),
])


@dataclass
class IncrementalDQAState:
    subj_flags: SnapshotTable
    ps_counts: SnapshotTable
    cls_pairs: SnapshotTable
    po_pairs: SnapshotTable

    @classmethod
    def open(cls, spark: SparkSession, state_dir: str) -> "IncrementalDQAState":
        return cls(
            subj_flags=SnapshotTable(
                spark, os.path.join(state_dir, "subj_flags"), SUBJ_FLAGS_SCHEMA),
            ps_counts=SnapshotTable(
                spark, os.path.join(state_dir, "ps_counts"), PS_COUNTS_SCHEMA),
            cls_pairs=SnapshotTable(
                spark, os.path.join(state_dir, "cls_pairs"), CLS_PAIRS_SCHEMA),
            po_pairs=SnapshotTable(
                spark, os.path.join(state_dir, "po_pairs"), PO_PAIRS_SCHEMA),
        )


def _delta_subj_flags(delta: DataFrame, cfg: DQAConfig) -> DataFrame:
    p, o = F.col("p"), F.col("o")
    return delta.groupBy("s").agg(
        F.max(p == cfg.type_property).alias("is_entity"),
        F.max((p == cfg.type_property) & o.isin(EXEMPT_TYPES)).alias("is_exempt"),
        F.max(p == cfg.labeling_property).alias("has_label"),
        F.max(p == cfg.interlinking_property).alias("has_ilp"),
        F.max(p == cfg.description_property).alias("has_desc"),
        F.max((p == cfg.type_property) & o.isin(PROLIX_CLASSES)).alias("is_prolix"),
        F.max((p == cfg.labeling_property) & F.col("o_lang").isNull()).alias("lbl_nolang"),
        F.max((p == cfg.description_property) & F.col("o_lang").isNull()).alias("dsc_nolang"),
    )


def apply_delta(
    state: IncrementalDQAState,
    delta: DataFrame,
    cfg: DQAConfig,
    ifp_props: list[str],
    n_buckets: int = 32,
) -> None:
    """Fold one appended triple batch into the DQA state.

    Each state table gets ONE new overwrite snapshot = merge(old, delta
    aggregate). Old snapshots stay readable (time travel / rollback); call
    expire_snapshots to vacuum. Merges shuffle only |state| + |delta-agg|
    rows — historical triples are never re-read."""
    # subj_flags: bool-max merge, bucketed by s so successive merges and
    # downstream per-subject work share the layout
    merged_flags = (
        state.subj_flags.read()
        .unionByName(_delta_subj_flags(delta, cfg))
        .groupBy("s")
        .agg(*[F.max(f).alias(f) for f in _FLAGS])
    )
    state.subj_flags.commit_overwrite(merged_flags, bucket_col="s",
                                      n_buckets=n_buckets)

    merged_ps = (
        state.ps_counts.read()
        .unionByName(delta.groupBy("p", "s").agg(F.count("*").alias("n")))
        .groupBy("p", "s").agg(F.sum("n").cast("long").alias("n"))
    )
    state.ps_counts.commit_overwrite(merged_ps, bucket_col="s",
                                     n_buckets=n_buckets)

    merged_cls = (
        state.cls_pairs.read()
        .unionByName(
            delta.filter(F.col("p") == cfg.type_property)
            .select(F.col("o").alias("cls"), "s"))
        .distinct()
    )
    state.cls_pairs.commit_overwrite(merged_cls, bucket_col="s",
                                     n_buckets=n_buckets)

    merged_po = (
        state.po_pairs.read()
        .unionByName(
            delta.filter(F.col("p").isin(ifp_props)).select("p", "o", "s"))
        .distinct()
    )
    state.po_pairs.commit_overwrite(merged_po, bucket_col="o",
                                    n_buckets=n_buckets)


# ---------------------------------------------------------------------------
# derivations from state (all O(state), no triple scans)
# ---------------------------------------------------------------------------

def profile_from_state(state: IncrementalDQAState) -> dict[str, DataFrame]:
    """The profile aggregates (B1-B8) re-expressed over the state tables."""
    ps = state.ps_counts.read()
    flags = state.subj_flags.read()
    scalars = ps.agg(
        F.sum("n").cast("long").alias("num_triples"),
        F.countDistinct("p").alias("num_properties"),
    ).crossJoin(
        # B8 counts cover ALL subjects carrying the property (profile_graph
        # semantics), not just typed entities
        flags.agg(
            F.sum(F.col("is_entity").cast("long")).alias("num_entities"),
            F.sum(F.col("has_label").cast("long")).alias("num_entities_label"),
            F.sum(F.col("has_ilp").cast("long")).alias("num_entities_interlinking"),
            F.sum(F.col("has_desc").cast("long")).alias("num_entities_description"),
        )
    ).crossJoin(
        state.cls_pairs.read().agg(F.countDistinct("cls").alias("num_classes"))
    )
    return {
        "scalars": scalars,
        "triples_per_property": ps.groupBy("p").agg(
            F.sum("n").cast("long").alias("num_triples")),
        "subjects_per_property": ps.groupBy("p").agg(
            F.count("*").alias("num_subjects")),
        "entities_per_class": state.cls_pairs.read().groupBy("cls").agg(
            F.countDistinct("s").alias("num_instances")),
    }


def violations_from_state(
    state: IncrementalDQAState,
    vocab_terms: list[VocabTerm],
    cfg: DQAConfig,
) -> DataFrame:
    """Violations for the state-derivable families, same (metric, item,
    focus, value) shape as compile_data_constraints emits."""
    flags = state.subj_flags.read()
    EnX = flags.filter(F.col("is_entity") & ~F.col("is_exempt"))
    parts = []

    def _v(df, metric, item, focus_col):
        parts.append(df.select(
            F.lit(metric).alias("metric"),
            (F.lit(item) if isinstance(item, str) else
             (item if item is not None else F.lit(None).cast("string"))).alias("item"),
            F.col(focus_col).alias("focus"),
            F.lit(None).cast("string").alias("value")))

    _v(EnX.filter(F.col("s").contains("#") | F.col("s").startswith("_:")),
       "UsageHashURIsEntities", None, "s")
    _v(EnX.filter(~F.col("has_label")), "LabelForEntities", None, "s")
    _v(EnX.filter(~F.col("has_ilp")), "InterlinkingCompleteness", None, "s")
    _v(EnX.filter((F.length("s") > cfg.uris_max_length)
                  | F.col("s").startswith("_:")), "URIsLengthEntities", None, "s")
    _v(EnX.filter(F.col("s").rlike(r"\?.+=.*")), "URIsParametersEntities", None, "s")
    _v(EnX.filter(F.col("is_prolix")), "ProlixFeatures", None, "s")
    _v(EnX.filter(F.col("s").startswith("_:")), "SelfDescriptiveFormat", None, "s")
    _v(EnX.filter(F.col("s").startswith("_:")), "BlankNodesUsageEntities", None, "s")
    if cfg.check_languages:
        _v(flags.filter(~F.col("is_exempt") & F.col("lbl_nolang")),
           "DifferentLanguagesLabelsEntities", cfg.labeling_property, "s")
        _v(flags.filter(~F.col("is_exempt") & F.col("dsc_nolang")),
           "DifferentLanguagesDescriptionsEntities", cfg.description_property, "s")

    fp = sorted(t.term for t in vocab_terms if t.functional and not t.deprecated)
    if fp:
        multi = state.ps_counts.read().filter(
            F.col("p").isin(fp) & (F.col("n") > 1))
        parts.append(multi.select(
            F.lit("FunctionalProperty").alias("metric"),
            F.col("p").alias("item"), F.col("s").alias("focus"),
            F.lit(None).cast("string").alias("value")))

    ifp = sorted(t.term for t in vocab_terms
                 if t.inverse_functional and not t.deprecated)
    if ifp:
        shared = (
            state.po_pairs.read().filter(F.col("p").isin(ifp))
            .groupBy("p", "o").agg(F.countDistinct("s").alias("ns"))
            .filter(F.col("ns") > 1)
        )
        parts.append(shared.select(
            F.lit("InverseFunctionalPropertyUniqueness").alias("metric"),
            F.col("p").alias("item"), F.col("o").alias("focus"),
            F.lit(None).cast("string").alias("value")))

    from functools import reduce

    return reduce(DataFrame.unionByName, parts)
