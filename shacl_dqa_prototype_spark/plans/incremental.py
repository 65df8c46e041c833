"""Incremental DQA: exact maintenance of profile + delta-safe constraint
families across snapshot APPENDs, without rescanning old triples.

At 100 TB a corpus grows by appends; re-running the whole DQA per append
re-reads everything. Incremental coverage comes in THREE tiers:

1. Mergeable state (classic incremental-view-maintenance aggregates) —
   each merge is ONE co-partitioned shuffle of (delta-aggregate ∪ touched
   state buckets), never a scan of historical triples:

     subj_flags  (s, is_entity, is_exempt, has_label, has_ilp, is_prolix,
                  lbl_nolang, dsc_nolang)        merge: groupBy(s) bool-max
     ps_counts   (p, s, n)                       merge: groupBy(p,s) sum
     cls_pairs   (cls, s)                        merge: union-distinct
     po_pairs    (p, o, s)  [IFP props only]     merge: union-distinct

   Commits are BUCKET-PRUNED (SnapshotTable.commit_merge_buckets): only
   the hash buckets the delta touches are rewritten; untouched buckets
   are carried by reference. Appending 1k triples to a 10⁹-subject state
   rewrites O(1k-rows-worth of buckets), not the whole table.

2. Append-monotone filter families (delta_monotone_violations): families
   whose violations are decided per-triple against broadcast vocab dims —
   Misuse/Misplaced/Deprecated/Irreflexive/CorrectRange(datatype+nodeKind)
   /MalformedLiteral/UsageExternalURIEntities/SelfDescriptiveFormat-
   Properties. A delta's violations are FINAL (no later triple can create
   or retract them), so they are evaluated on the delta alone and
   commit_append-ed to a violations log — zero state, zero rewrite.

3. Families needing a join against the FULL triple set (domain/range-
   class, disjoint, asymmetric): anti-join semantics make them neither
   mergeable nor monotone (a later type-triple can RETRACT a violation) —
   the caller re-evaluates those over the snapshot table's current view
   (documented split; tiers 1+2 dominate volume).

Derived EXACTLY from tier-1 state (parity asserted in
tests/test_incremental.py):
  * profile: num_triples / num_properties / triples_per_property (sums
    over ps_counts), subjects_per_property (row counts), num_entities /
    label/ilp coverage (subj_flags), entities_per_class (cls_pairs);
  * entity-scoped families C2-C6/C8-C13/C15 (filters on subj_flags);
  * C24 FunctionalProperty (ps_counts n > 1 for functional props);
  * C23 IFP uniqueness (po_pairs grouped, >1 distinct subject).

State lives in SnapshotTables, so DQA state itself is atomic, resumable,
and time-travelable. apply_delta is IDEMPOTENT per delta_id: every table
commit records the delta id, and a retried apply skips tables whose log
already carries it — a crash between the four commits is healed by
re-running the same delta (same scheme as the streaming sink's
(run, epoch) key in streaming/ingest.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from shacl_dqa_prototype_spark.plans.constraints import (
    DQAConfig,
    VocabTerm,
    compile_data_constraints,
)
from shacl_dqa_prototype_spark.schemas import VIOLATIONS_SCHEMA
from shacl_dqa_prototype_spark.sources.snapshots import SnapshotTable
from shacl_dqa_prototype_spark.functions.terms import (
    EXEMPT_TYPES,
    PROLIX_CLASSES,
    RDFS,
)

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

# Families whose violations are decided per-triple against broadcast vocab
# dims only — append-monotone: a delta's violations are final and complete.
MONOTONE_METRICS = (
    "UsageExternalURIEntities",
    "SelfDescriptiveFormatProperties",
    "MisplacedProperties",
    "MisplacedClasses",
    "MisuseOwlObjectProperties",
    "MisuseOwlDatatypeProperties",
    "DeprecatedClasses",
    "DeprecatedProperties",
    "IrreflexiveProperty",
    "CorrectRange",
    "MalformedLiteral",
)

_OWL_THING = "http://www.w3.org/2002/07/owl#Thing"


@dataclass
class IncrementalDQAState:
    subj_flags: SnapshotTable
    ps_counts: SnapshotTable
    cls_pairs: SnapshotTable
    po_pairs: SnapshotTable
    mono_violations: SnapshotTable

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
            mono_violations=SnapshotTable(
                spark, os.path.join(state_dir, "mono_violations"),
                VIOLATIONS_SCHEMA),
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


def delta_monotone_violations(
    delta: DataFrame, vocab_terms: list[VocabTerm], cfg: DQAConfig,
) -> DataFrame:
    """Violations of the append-monotone families for ONE delta batch.

    Reuses the batch compiler on the delta so the per-triple predicates
    (incl. the CorrectRange datatype/lexical-form logic) cannot drift from
    batch semantics, with two adjustments that make the evaluation
    delta-safe:
      * class-kind range info is stripped from object/rdf-property terms —
        the sh:class range branch is an anti-join against the FULL typing
        table and is NOT monotone (a later type-triple retracts the
        violation), so those stay with the batch re-evaluation tier;
      * usage pruning is bypassed (used_props = all vocab props): a prop
        unused in this delta simply matches no triples, and pruning by
        delta-local usage would need a profile job per append.
    The surviving branches are pure per-triple filters against broadcast
    dims, so union-over-deltas == batch-over-union (asserted in
    tests/test_incremental.py)."""
    safe = []
    for t in vocab_terms:
        nonmono_range = t.range is not None and (
            (t.term_kind == "object_property"
             and t.range not in (_OWL_THING, f"{RDFS}Resource"))
            or (t.term_kind == "rdf_property" and t.range_kind != "literal")
        )
        safe.append(replace(t, range=None, range_kind=None)
                    if nonmono_range else t)
    plan = compile_data_constraints(
        delta, safe, [], cfg,
        used_props={t.term for t in safe if t.term_kind != "class"},
        used_classes=set(),
    )
    # constant-folding prunes every non-selected union branch to an empty
    # LocalRelation — no flag aggregation or anti-join is ever executed
    return plan.violations.filter(F.col("metric").isin(list(MONOTONE_METRICS)))


def _changed_buckets(df: DataFrame, key: str, n_buckets: int) -> list[int]:
    """Distinct hash buckets the delta aggregate touches (≤ n_buckets rows
    collected — same bucket expression SnapshotTable._write_data uses)."""
    return [
        r["b"] for r in df.select(
            F.pmod(F.xxhash64(key), F.lit(n_buckets)).alias("b")
        ).distinct().collect()
    ]


def apply_delta(
    state: IncrementalDQAState,
    delta: DataFrame,
    cfg: DQAConfig,
    vocab_terms: list[VocabTerm],
    n_buckets: int = 32,
    delta_id: str | None = None,
) -> None:
    """Fold one appended triple batch into the DQA state.

    Each mergeable state table gets ONE bucket-pruned merge snapshot =
    merge(touched state buckets, delta aggregate); untouched buckets are
    carried by reference — the parquet write is O(|touched buckets|), not
    O(|state|). The monotone-family violations of the delta are appended
    to the violations log (append-only, no merge at all). Historical
    triples are never re-read.

    Pass ``delta_id`` (any stable string — a snapshot id, an epoch) to
    make the apply IDEMPOTENT: every table commit records it, and a retry
    after a crash that landed only some of the five commits skips the
    tables already carrying the id (sum-merged ps_counts would otherwise
    double-count). Old snapshots stay readable (time travel / rollback);
    call expire_snapshots to vacuum."""
    extra = {"delta_id": delta_id} if delta_id is not None else None

    def _already(table: SnapshotTable) -> bool:
        return delta_id is not None and any(
            s.get("delta_id") == delta_id for s in table.snapshots())

    delta = delta.persist()
    try:
        # subj_flags: bool-max merge, bucketed by s so successive merges and
        # downstream per-subject work share the layout
        if not _already(state.subj_flags):
            d_flags = _delta_subj_flags(delta, cfg)
            bs = _changed_buckets(d_flags, "s", n_buckets)
            merged_flags = (
                state.subj_flags.read_buckets(bs)
                .unionByName(d_flags)
                .groupBy("s")
                .agg(*[F.max(f).alias(f) for f in _FLAGS])
            )
            state.subj_flags.commit_merge_buckets(
                merged_flags, bs, bucket_col="s", n_buckets=n_buckets,
                extra=extra)

        if not _already(state.ps_counts):
            d_ps = delta.groupBy("p", "s").agg(F.count("*").alias("n"))
            bs = _changed_buckets(d_ps, "s", n_buckets)
            merged_ps = (
                state.ps_counts.read_buckets(bs)
                .unionByName(d_ps)
                .groupBy("p", "s").agg(F.sum("n").cast("long").alias("n"))
            )
            state.ps_counts.commit_merge_buckets(
                merged_ps, bs, bucket_col="s", n_buckets=n_buckets, extra=extra)

        if not _already(state.cls_pairs):
            d_cls = (delta.filter(F.col("p") == cfg.type_property)
                     .select(F.col("o").alias("cls"), "s"))
            bs = _changed_buckets(d_cls, "s", n_buckets)
            if bs:
                merged_cls = (
                    state.cls_pairs.read_buckets(bs)
                    .unionByName(d_cls).distinct()
                )
                state.cls_pairs.commit_merge_buckets(
                    merged_cls, bs, bucket_col="s", n_buckets=n_buckets,
                    extra=extra)

        ifp = [t.term for t in vocab_terms
               if t.inverse_functional and not t.deprecated]
        if not _already(state.po_pairs):
            d_po = delta.filter(F.col("p").isin(ifp)).select("p", "o", "s")
            bs = _changed_buckets(d_po, "o", n_buckets)
            if bs:
                merged_po = (
                    state.po_pairs.read_buckets(bs)
                    .unionByName(d_po).distinct()
                )
                state.po_pairs.commit_merge_buckets(
                    merged_po, bs, bucket_col="o", n_buckets=n_buckets,
                    extra=extra)

        # monotone families: violations of THIS delta are final — plain
        # append, nothing merged, nothing rewritten
        if not _already(state.mono_violations):
            state.mono_violations.commit_append(
                delta_monotone_violations(delta, vocab_terms, cfg),
                extra=extra)
    finally:
        delta.unpersist()


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
    """Violations for the state-derivable + monotone families, same
    (metric, item, focus, value) shape as compile_data_constraints emits."""
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
    # C4/C5 are entity-scoped URI filters — derivable from subj_flags too
    if cfg.uri_regex_pattern:
        _v(EnX.filter(F.col("s").startswith("_:")
                      | ~F.col("s").rlike("^" + cfg.uri_regex_pattern)),
           "URIRegexComplianceEntities", None, "s")
    if cfg.uri_space:
        _v(EnX.filter(~F.col("s").startswith(cfg.uri_space)),
           "URISpaceComplianceEntities", None, "s")
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

    # monotone families come straight off the append-only log. Per-triple
    # rows are naturally disjoint across deltas; MisplacedProperties emits
    # one row per DISTINCT misplaced term per delta, so it alone needs a
    # distinct to match batch row semantics.
    mono = state.mono_violations.read()
    parts.append(mono.filter(F.col("metric") != "MisplacedProperties"))
    parts.append(mono.filter(F.col("metric") == "MisplacedProperties").distinct())

    from functools import reduce

    return reduce(DataFrame.unionByName, parts)
