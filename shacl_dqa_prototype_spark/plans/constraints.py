"""C1–C32 — the data-shape constraint compiler.

Replaces the reference's Jinja2-template → pySHACL-interpretation stack
(/root/reference/shacl_shape_builder.py + dq_assessment/shapes/
data_shapes.template.ttl) with a driver-side planner that compiles every
shape family to ONE fused DataFrame job (filters, semi/anti joins, hash
aggregates over the triple table T), emitting a uniform violations
DataFrame V(metric, item, focus, value).

Key semantics preserved from the reference (citations per family below):
  * the sh:or exemption wrapper — focus nodes typed rdfs:Class /
    rdf:Property / owl:NamedIndividual are exempt from entity-scoped shapes
    (data_shapes.template.ttl:16-33) → one reusable anti-join set X;
  * shape pruning by usage — per-property shapes only for vocab properties
    actually used in the data (shacl_shape_builder.py:318,345,370,…);
  * sh:datatype = datatype-IRI match AND well-formed lexical form;
  * one physical job fanned out to two metrics where the reference
    instantiates both (CorrectRange+MalformedLiteral, SelfDescriptiveFormat
    +BlankNodesUsage).

Scale notes: T is the only big input; every vocab dim is broadcast; every
family is a single scan+join/agg so the whole plan is O(#families) jobs,
not O(#shapes) — the reference's 344 pizza shapes compile to ~20 jobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shacl_dqa_prototype_spark.functions.terms import (
    EXEMPT_TYPES,
    OWL_NAMED_INDIVIDUAL,
    OWL_SAME_AS,
    PROLIX_CLASSES,
    RDF_LANGSTRING,
    RDF_TYPE,
    RDFS_LABEL,
    DCT,
    RDFS,
    XSD,
)
from shacl_dqa_prototype_spark.functions.xsd import ill_formed_literal
from shacl_dqa_prototype_spark.schemas import VIOLATIONS_SCHEMA


@dataclass
class DQAConfig:
    """Engine equivalent of the reference INI config
    (/root/reference/config/config_template.ini → dq_assessment.py:53-86)."""

    type_property: str = RDF_TYPE
    labeling_property: str = RDFS_LABEL
    description_property: str = f"{DCT}description"
    interlinking_property: str = OWL_SAME_AS
    uris_max_length: int = 80
    base_uri: str | None = None
    uri_regex_pattern: str | None = None   # from VoID metadata (C4)
    uri_space: str | None = None           # from VoID metadata (C5)
    check_languages: bool = True


@dataclass(frozen=True)
class ShapeSpec:
    """One instantiated shape = one (metric, item) scoring row.

    denom ∈ {binary, entities, subjects_per_property, entities_per_class}
    selects the score rule + denominator family (const.py:33-104)."""

    metric: str
    item: str | None
    denom: str
    denom_key: str | None = None


@dataclass
class VocabTerm:
    term: str
    term_kind: str          # class | object_property | datatype_property | rdf_property
    domain: str | None = None
    range: str | None = None
    range_kind: str | None = None
    deprecated: bool = False
    functional: bool = False
    inverse_functional: bool = False
    irreflexive: bool = False
    asymmetric: bool = False


@dataclass
class ConstraintPlan:
    violations: DataFrame
    shapes: list[ShapeSpec] = field(default_factory=list)
    # intermediate DataFrames compile cached (e.g. the exempt-entity set);
    # long-lived sessions call unpersist() once scoring results are
    # materialized — per-job drivers can ignore it
    cached: list[DataFrame] = field(default_factory=list)
    # the union's branches, for per-family plan auditing/attribution
    # (tools/plan_audit-style timing) — evaluation always goes through
    # `violations`, never through these
    parts: list[DataFrame] = field(default_factory=list)
    # metrics each branch can emit (parallel to `parts`): callers that
    # need a metric SUBSET (e.g. the incremental monotone tier) union only
    # the branches that can contribute, skipping e.g. the per-subject
    # flags aggregation entirely
    part_metrics: list[frozenset] = field(default_factory=list)

    def violations_for(self, metrics) -> DataFrame:
        """Union of only the branches that can emit `metrics`, filtered —
        branch pruning the optimizer can't do through the fused explode."""
        want = frozenset(metrics)
        keep = [part.filter(F.col("metric").isin(list(want)))
                for part, ms in zip(self.parts, self.part_metrics)
                if ms & want]
        if not keep:
            return self.violations.sparkSession.createDataFrame(
                [], VIOLATIONS_SCHEMA)
        return reduce(DataFrame.unionByName, keep)

    def unpersist(self) -> None:
        for df in [self.violations, *self.cached]:
            try:
                df.unpersist()
            except Exception:
                pass


def _v(df: DataFrame, metric: str, item: Column | str | None,
       focus: Column, value: Column | None = None) -> DataFrame:
    item_col = (
        F.lit(None).cast("string") if item is None
        else (F.lit(item) if isinstance(item, str) else item)
    )
    return df.select(
        F.lit(metric).alias("metric"),
        item_col.alias("item"),
        focus.cast("string").alias("focus"),
        (value if value is not None else F.lit(None)).cast("string").alias("value"),
    )


def compile_data_constraints(
    T: DataFrame,
    vocab_terms: list[VocabTerm],
    disjoint_pairs: list[tuple[str, str]],
    cfg: DQAConfig,
    used_props: set[str] | None = None,
    used_classes: set[str] | None = None,
    subclass_pairs: list[tuple[str, str]] | None = None,
) -> ConstraintPlan:
    """Compile + evaluate all data shapes. Returns the violations DF
    (lazy; caller caches before scoring) and the instantiated shape list.

    ``used_props``/``used_classes`` override the usage-pruning sets — the
    reference prunes by the PRE-TBox-merge data profile
    (shacl_shape_builder.py reads graph_profile) while shapes validate the
    merged graph, so callers that merge pass the raw-graph sets here.
    ``subclass_pairs`` is the transitive (descendant, ancestor) closure of
    rdfs:subClassOf — sh:class in SHACL matches instances of subclasses,
    so domain/range/disjoint checks extend the typing table through it
    (broadcast join; the closure is TBox-small)."""
    spark = T.sparkSession
    p, s, o = F.col("p"), F.col("s"), F.col("o")

    # ---- shared sub-plans (each used by several families) ----------------
    typing = T.filter(p == cfg.type_property).select("s", "o")

    # ONE per-subject flags aggregation feeds every entity-scoped family
    # (C2/C3/C6/C8-C13/C15): booleans combine map-side, so this costs a
    # single #distinct-subjects-wide shuffle instead of the separate
    # distinct + anti/semi-join shuffles each family would otherwise run —
    # at 100 TB that is 1 shuffle of the subject set vs ~8.
    subj = T.groupBy("s").agg(
        F.max(p == cfg.type_property).alias("is_entity"),
        F.max((p == cfg.type_property) & o.isin(EXEMPT_TYPES)).alias("is_exempt"),
        F.max(p == cfg.labeling_property).alias("has_label"),
        F.max(p == cfg.interlinking_property).alias("has_ilp"),
        F.max((p == cfg.type_property) & o.isin(PROLIX_CLASSES)).alias("is_prolix"),
        F.max((p == cfg.labeling_property) & F.col("o_lang").isNull()).alias("lbl_nolang"),
        F.max((p == cfg.description_property) & F.col("o_lang").isNull()).alias("dsc_nolang"),
    ).cache()
    # entity targets minus the sh:or exemption set (rdfs:Class/rdf:Property/
    # owl:NamedIndividual focus nodes are exempt — template:16-33) are
    # expressed as the fused scan's `_ent` predicate, not a separate branch

    # sh:class semantics: SHACL instance = typed as the class OR any
    # rdfs:subClassOf descendant — extend typing through the closure dim.
    if subclass_pairs:
        closure = spark.createDataFrame(subclass_pairs, ["o", "anc"])
        typing_ext = typing.unionByName(
            typing.join(F.broadcast(closure), "o").select("s", F.col("anc").alias("o"))
        ).distinct()
    else:
        typing_ext = typing

    if used_props is None or used_classes is None:
        # usage pruning inputs (tiny: O(#properties), O(#classes)) — ONE
        # fused aggregation job for both sets, shared with the raw-graph
        # pruning path so the usage semantics can never desynchronize
        from shacl_dqa_prototype_spark.plans.vocab import raw_usage_sets

        props_set, classes_set = raw_usage_sets(T, cfg.type_property)
        used_props = props_set if used_props is None else used_props
        used_classes = classes_set if used_classes is None else used_classes

    classes = [t for t in vocab_terms if t.term_kind == "class" and not t.deprecated]
    depr_classes = [t.term for t in vocab_terms if t.term_kind == "class" and t.deprecated]
    props = [t for t in vocab_terms if t.term_kind != "class"]
    depr_props = [t.term for t in props if t.deprecated]
    obj_props = [t.term for t in props if t.term_kind == "object_property" and not t.deprecated]
    dt_props = [t.term for t in props if t.term_kind == "datatype_property" and not t.deprecated]

    shapes: list[ShapeSpec] = []
    parts: list[DataFrame] = []
    part_metrics: list[frozenset] = []
    # fused single-scan families: (metric, item_col, focus_col, value_col,
    # condition). Every per-row filter family over the same base DF joins
    # one of these lists and is emitted by ONE scan + explode instead of
    # one union branch per family — at 100 TB that is 1 pass over the
    # subject flags (resp. the triple table) instead of ~10 (resp. ~8).
    flag_fams: list[tuple] = []   # over the per-subject flags aggregate
    row_fams: list[tuple] = []    # over the triple table

    def add(metric: str, item: str | None, denom: str, denom_key: str | None = None):
        shapes.append(ShapeSpec(metric, item, denom, denom_key))

    _ent = F.col("is_entity") & ~F.col("is_exempt")
    _null = F.lit(None).cast("string")

    # ---- C1 UsageExternalURIEntities (template:1-10) ----------------------
    # Violation: interlinking value inside the dataset's own base URI.
    if cfg.base_uri:
        ilp = cfg.interlinking_property
        row_fams.append(("UsageExternalURIEntities", F.lit(ilp), s, o,
                         (p == ilp) & o.startswith(cfg.base_uri)))
        add("UsageExternalURIEntities", cfg.interlinking_property,
            "subjects_per_property", cfg.interlinking_property)

    # ---- C2 UsageHashURIsEntities (template:12-34) ------------------------
    # sh:pattern applies to the string form; blank-node focus nodes always
    # violate pattern constraints (observed in the pizza golden output:
    # the 3 bnodes are in the violation list).
    flag_fams.append(("UsageHashURIsEntities", _null, F.col("s"), _null,
                      _ent & (F.col("s").contains("#")
                              | F.col("s").startswith("_:"))))
    add("UsageHashURIsEntities", None, "entities")

    # ---- C3 LabelForEntities (template:36-59): minCount 1 flag filter -----
    flag_fams.append(("LabelForEntities", _null, F.col("s"), _null,
                      _ent & ~F.col("has_label")))
    add("LabelForEntities", None, "entities")

    # ---- C4/C5 URI regex/space compliance (template:61-107, gated) --------
    if cfg.uri_regex_pattern:
        flag_fams.append(("URIRegexComplianceEntities", _null, F.col("s"), _null,
                          _ent & (F.col("s").startswith("_:")
                                  | ~F.col("s").rlike("^" + cfg.uri_regex_pattern))))
        add("URIRegexComplianceEntities", None, "entities")
    if cfg.uri_space:
        flag_fams.append(("URISpaceComplianceEntities", _null, F.col("s"), _null,
                          _ent & ~F.col("s").startswith(cfg.uri_space)))
        add("URISpaceComplianceEntities", None, "entities")

    # ---- C6 InterlinkingCompleteness (template:109-132) -------------------
    flag_fams.append(("InterlinkingCompleteness", _null, F.col("s"), _null,
                      _ent & ~F.col("has_ilp")))
    add("InterlinkingCompleteness", None, "entities")

    # ---- C7 SchemaCompletenessClassUsage (template:134-154) ---------------
    # Per vocab class: >=1 instance that is not the NamedIndividual IRI.
    # ONE job for all classes: classes-with-real-instances, anti-joined.
    if classes:
        cls_df = spark.createDataFrame([(c.term,) for c in classes], ["cls"])
        # qualifying instance = one NOT typed owl:NamedIndividual (the
        # NotNamedIndividualShape is a property shape on rdf:type —
        # template:136-140)
        ni_typed = typing.filter(o == OWL_NAMED_INDIVIDUAL).select("s").distinct()
        with_instances = (
            typing.join(ni_typed, "s", "left_anti")
            .select(F.col("o").alias("cls")).distinct()
        )
        # hint the BUILD (right) side: a left-anti join can only broadcast
        # its right input — with_instances is #distinct-classes small
        missing = cls_df.join(F.broadcast(with_instances), "cls", "left_anti")
        parts.append(_v(missing, "SchemaCompletenessClassUsage",
                        F.col("cls"), F.col("cls")))
        part_metrics.append(frozenset({"SchemaCompletenessClassUsage"}))
        for c in classes:
            add("SchemaCompletenessClassUsage", c.term, "binary")

    # ---- C8/C9 URI length / query params (template:156-202) ---------------
    # sh:maxLength also violates for blank-node focus nodes (SHACL spec:
    # maxLength fails for blank nodes; confirmed in the pizza golden).
    flag_fams.append(("URIsLengthEntities", _null, F.col("s"), _null,
                      _ent & ((F.length("s") > cfg.uris_max_length)
                              | F.col("s").startswith("_:"))))
    add("URIsLengthEntities", None, "entities")
    flag_fams.append(("URIsParametersEntities", _null, F.col("s"), _null,
                      _ent & F.col("s").rlike(r"\?.+=.*")))
    add("URIsParametersEntities", None, "entities")

    # ---- C10 ProlixFeatures (template:204-234) -----------------------------
    flag_fams.append(("ProlixFeatures", _null, F.col("s"), _null,
                      _ent & F.col("is_prolix")))
    add("ProlixFeatures", None, "entities")

    # ---- C11/C12 DifferentLanguages* (template:236-284, gated) ------------
    if cfg.check_languages:
        for metric, prop, flag in (
            ("DifferentLanguagesLabelsEntities", cfg.labeling_property, "lbl_nolang"),
            ("DifferentLanguagesDescriptionsEntities", cfg.description_property,
             "dsc_nolang"),
        ):
            # subjects with >=1 untagged value of the property, minus the
            # exemption set (the target here is NOT restricted to entities)
            flag_fams.append((metric, F.lit(prop), F.col("s"), _null,
                              ~F.col("is_exempt") & F.col(flag)))
            add(metric, prop, "subjects_per_property", prop)

    # ---- C13/C15 SelfDescriptiveFormat + BlankNodesUsage (286-340) ---------
    # Identical filter, two metrics: same fused scan, two entries.
    _bn = _ent & F.col("s").startswith("_:")
    flag_fams.append(("SelfDescriptiveFormat", _null, F.col("s"), _null, _bn))
    flag_fams.append(("BlankNodesUsageEntities", _null, F.col("s"), _null, _bn))
    add("SelfDescriptiveFormat", None, "entities")
    add("BlankNodesUsageEntities", None, "entities")

    # ---- C14 SelfDescriptiveFormatProperties (310-316): per used property --
    # targetObjectsOf <prop>: object must be IRI.
    row_fams.append(("SelfDescriptiveFormatProperties", p, o, _null,
                     F.col("o_kind") != "iri"))
    for prop in sorted(used_props):
        add("SelfDescriptiveFormatProperties", prop, "binary")

    # ---- C16 EntitiesDisjointClasses (342-350): directed pairs ------------
    dpairs = [
        (a, b) for (a, b) in
        {(a, b) for (a, b) in disjoint_pairs} | {(b, a) for (a, b) in disjoint_pairs}
        if a in used_classes
    ]
    if dpairs:
        pair_df = spark.createDataFrame(dpairs, ["class_a", "class_b"])
        # sh:targetClass / sh:class follow rdfs:subClassOf → closure typing
        ta = typing_ext.withColumnsRenamed({"o": "class_a"})
        tb = typing_ext.withColumnsRenamed({"o": "class_b"})
        both = ta.join(tb, "s").join(F.broadcast(pair_df), ["class_a", "class_b"], "semi")
        parts.append(_v(both, "EntitiesDisjointClasses",
                        F.concat_ws("|", "class_a", "class_b"), F.col("s")))
        part_metrics.append(frozenset({"EntitiesDisjointClasses"}))
        for a, b in sorted(dpairs):
            add("EntitiesDisjointClasses", f"{a}|{b}", "entities_per_class", a)

    # ---- C17 MisplacedProperties (352-361): prop IRI used as a class ------
    if props:
        prop_df = spark.createDataFrame([(t.term,) for t in props], ["term"])
        misplaced_p = (
            typing.select(F.col("o").alias("term")).distinct()
            .join(F.broadcast(prop_df), "term", "semi")
        )
        parts.append(_v(misplaced_p, "MisplacedProperties", F.col("term"), F.col("term")))
        part_metrics.append(frozenset({"MisplacedProperties"}))
        for t in props:
            add("MisplacedProperties", t.term, "binary")

    # ---- C18 MisplacedClasses (363-386): class IRI used as predicate ------
    if classes:
        row_fams.append(("MisplacedClasses", p, s, _null,
                         p.isin([c.term for c in classes])))
        for c in classes:
            add("MisplacedClasses", c.term, "binary")

    # ---- C19/C20 Misuse of object/datatype properties (388-408) -----------
    used_obj = sorted(set(obj_props) & used_props)
    if used_obj:
        row_fams.append(("MisuseOwlObjectProperties", p, s, o,
                         p.isin(used_obj) & (F.col("o_kind") == "literal")))
        for prop in used_obj:
            add("MisuseOwlObjectProperties", prop, "subjects_per_property", prop)
    used_dt = sorted(set(dt_props) & used_props)
    if used_dt:
        row_fams.append(("MisuseOwlDatatypeProperties", p, s, o,
                         p.isin(used_dt) & (F.col("o_kind") != "literal")))
        for prop in used_dt:
            add("MisuseOwlDatatypeProperties", prop, "subjects_per_property", prop)

    # ---- C21 DeprecatedClasses (410-435): single binary shape -------------
    if depr_classes:
        row_fams.append(("DeprecatedClasses", _null, s, o,
                         (p == cfg.type_property) & o.isin(depr_classes)))
        add("DeprecatedClasses", None, "binary")

    # ---- C22 DeprecatedProperties (437-460): per deprecated prop ----------
    if depr_props:
        row_fams.append(("DeprecatedProperties", p, s, _null,
                         p.isin(depr_props)))
        for prop in sorted(depr_props):
            add("DeprecatedProperties", prop, "entities")  # const.py:76-86

    # ---- C23 InverseFunctionalPropertyUniqueness (462-471) ----------------
    # deprecated terms are excluded from IFP/functional checks — reference
    # parity: utils.py:313-318 skips deprecated when harvesting both sets
    ifp = sorted({t.term for t in props
                  if t.inverse_functional and not t.deprecated} & used_props)
    if ifp:
        shared = (
            T.filter(p.isin(ifp))
            .groupBy("p", "o").agg(F.countDistinct("s").alias("n"))
            .filter(F.col("n") > 1)
        )
        parts.append(_v(shared, "InverseFunctionalPropertyUniqueness", p, o))
        part_metrics.append(frozenset({"InverseFunctionalPropertyUniqueness"}))
        for prop in ifp:
            add("InverseFunctionalPropertyUniqueness", prop, "binary")

    # ---- C24 FunctionalProperty (473-482): maxCount 1 per subject ---------
    fp = sorted({t.term for t in props
                 if t.functional and not t.deprecated} & used_props)
    if fp:
        multi = (
            T.filter(p.isin(fp))
            .groupBy("p", "s").agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
        )
        parts.append(_v(multi, "FunctionalProperty", p, s))
        part_metrics.append(frozenset({"FunctionalProperty"}))
        for prop in fp:
            add("FunctionalProperty", prop, "subjects_per_property", prop)

    # ---- C25 AsymmetricProperty (484-493): pair-swap semi self-join -------
    asym = sorted({t.term for t in props if t.asymmetric} & used_props)
    if asym:
        R = T.filter(p.isin(asym)).select("p", "s", "o")
        Rswap = R.select(F.col("p").alias("p2"), F.col("o").alias("s2"),
                         F.col("s").alias("o2"))
        mutual = R.join(
            Rswap,
            (R.p == Rswap.p2) & (R.s == Rswap.s2) & (R.o == Rswap.o2),
            "semi",
        )
        parts.append(_v(mutual, "AsymmetricProperty", p, s, o))
        part_metrics.append(frozenset({"AsymmetricProperty"}))
        for prop in asym:
            add("AsymmetricProperty", prop, "subjects_per_property", prop)

    # ---- C31 IrreflexiveProperty (573-579): s==o loops ---------------------
    irr = sorted({t.term for t in props if t.irreflexive} & used_props)
    if irr:
        row_fams.append(("IrreflexiveProperty", p, s, _null,
                         p.isin(irr) & (s == o)))
        for prop in irr:
            add("IrreflexiveProperty", prop, "subjects_per_property", prop)

    # ---- C26/C27 CorrectDomain (495-509) -----------------------------------
    dom_terms = [t for t in props if t.domain and t.term in used_props and not t.deprecated]
    dom_class = [t for t in dom_terms if t.domain != "http://www.w3.org/2002/07/owl#Thing"]
    if dom_class:
        dom_df = spark.createDataFrame(
            [(t.term, t.domain) for t in dom_class], ["p", "domain"])
        subj_prop = T.join(F.broadcast(dom_df), "p").select("p", "s", "domain").distinct()
        typed_as = typing_ext.withColumnsRenamed({"o": "domain"})
        bad_dom = subj_prop.join(typed_as, ["s", "domain"], "left_anti")
        parts.append(_v(bad_dom, "CorrectDomain", p, s))
        part_metrics.append(frozenset({"CorrectDomain"}))
    for t in dom_terms:
        # owl:Thing domain → nodeKind BlankNodeOrIRI, structurally satisfied
        # for RDF subjects (C27) — shape still instantiated, score 1.
        add("CorrectDomain", t.term, "subjects_per_property", t.term)

    # ---- C28/C29/C30/C32 CorrectRange + MalformedLiteral (511-590) --------
    # Instantiation rules differ BY TERM KIND (shacl_shape_builder.py):
    #   * datatype_property (builder:340-362): ALWAYS sh:datatype(range) +
    #     MalformedLiteral(range) — including range rdfs:Literal (which no
    #     literal satisfies, so every value violates);
    #   * object_property (builder:330-336): owl:Thing → nodeKind
    #     BlankNodeOrIRI; rdfs:Resource → both (vacuous); else sh:class;
    #   * rdf_property (builder:433-455): literal-kind range != rdfs:Literal
    #     → sh:datatype + MalformedLiteral; == rdfs:Literal → nodeKind
    #     Literal; class-kind → Thing/Resource/sh:class as above.
    OWL_THING = "http://www.w3.org/2002/07/owl#Thing"
    rng_terms = [t for t in props if t.range and t.term in used_props and not t.deprecated]
    rng_dt, rng_cls, rng_nk_literal, rng_nk_bi = [], [], [], []
    for t in rng_terms:
        if t.term_kind == "datatype_property":
            rng_dt.append(t)
        elif t.term_kind == "object_property":
            if t.range == OWL_THING:
                rng_nk_bi.append(t)
            elif t.range != f"{RDFS}Resource":
                rng_cls.append(t)
        else:  # rdf_property
            if t.range_kind == "literal":
                (rng_nk_literal if t.range == f"{RDFS}Literal" else rng_dt).append(t)
            else:
                # Reference parity (shacl_shape_builder.py:450-455): the
                # rdf_property branch compares info['range'] (a dict) to the
                # owl:Thing / rdfs:Resource strings — always false — so it
                # ALWAYS emits sh:class for class-kind ranges, including
                # owl:Thing and rdfs:Resource. nodeKind routing applies to
                # object_property terms only (builder:330-336).
                rng_cls.append(t)
    if rng_dt:
        # per-row range lookup as a chained CASE instead of a broadcast
        # join — the dt-prop list is TBox-small, and CASE keeps the branch
        # inside the fused single scan of T
        rng_expr = F.lit(None).cast("string")
        for t in rng_dt:
            rng_expr = F.when(p == t.term, F.lit(t.range)).otherwise(rng_expr)
        # plain literals carry xsd:string (RDF 1.1); lang-tagged carry
        # rdf:langString. All in-repo parsers set o_dtype for lang-tagged
        # literals, but user-supplied triple DataFrames may leave it NULL —
        # coalesce through o_lang so such literals never masquerade as
        # xsd:string (they'd escape CorrectRange/MalformedLiteral).
        eff_dtype = F.coalesce(
            F.col("o_dtype"),
            F.when(F.col("o_lang").isNotNull(), F.lit(RDF_LANGSTRING)),
            F.lit(f"{XSD}string"),
        )
        is_langstring = F.when(
            rng_expr == RDF_LANGSTRING,
            (F.col("o_kind") != "literal") | F.col("o_lang").isNull(),
        )
        bad_dt_cond = p.isin([t.term for t in rng_dt]) & F.coalesce(
            is_langstring,
            (F.col("o_kind") != "literal")
            | (eff_dtype != rng_expr)
            | ill_formed_literal(o, eff_dtype),
        )
        row_fams.append(("CorrectRange", p, s, o, bad_dt_cond))
        # Same physical violations, second metric (builder:361-362,440)
        row_fams.append(("MalformedLiteral", p, s, o, bad_dt_cond))
    if rng_nk_literal:
        nk_terms = sorted(t.term for t in rng_nk_literal)
        row_fams.append(("CorrectRange", p, s, o,
                         p.isin(nk_terms) & (F.col("o_kind") != "literal")))
    if rng_nk_bi:
        bi_terms = sorted(t.term for t in rng_nk_bi)
        row_fams.append(("CorrectRange", p, s, o,
                         p.isin(bi_terms) & (F.col("o_kind") == "literal")))
    if rng_cls:
        cls_rng_df = spark.createDataFrame(
            [(t.term, t.range) for t in rng_cls], ["p", "range"])
        vals_c = T.join(F.broadcast(cls_rng_df), "p").select("p", "s", "o", "range")
        typed_obj = typing_ext.select(F.col("s").alias("o"), F.col("o").alias("range"))
        bad_rng_cls = vals_c.join(typed_obj, ["o", "range"], "left_anti")
        parts.append(_v(bad_rng_cls, "CorrectRange", p, s, o))
        part_metrics.append(frozenset({"CorrectRange"}))
    for t in rng_terms:
        add("CorrectRange", t.term, "subjects_per_property", t.term)
    for t in rng_dt:
        add("MalformedLiteral", t.term, "subjects_per_property", t.term)

    # ---- emit the fused single-scan parts ---------------------------------
    def _fused(base: DataFrame, fams: list[tuple]) -> DataFrame:
        entries = [
            F.when(cond, F.struct(
                F.lit(metric).alias("metric"),
                item.cast("string").alias("item"),
                focus.cast("string").alias("focus"),
                value.cast("string").alias("value"),
            ))
            for metric, item, focus, value, cond in fams
        ]
        return (base.select(F.explode(F.array_compact(F.array(*entries)))
                            .alias("_f"))
                .select("_f.metric", "_f.item", "_f.focus", "_f.value"))

    if flag_fams:
        parts.append(_fused(subj, flag_fams))
        part_metrics.append(frozenset(f[0] for f in flag_fams))
    if row_fams:
        parts.append(_fused(T, row_fams))
        part_metrics.append(frozenset(f[0] for f in row_fams))

    violations = reduce(DataFrame.unionByName, parts) if parts else (
        spark.createDataFrame([], VIOLATIONS_SCHEMA)
    )
    return ConstraintPlan(violations=violations, shapes=shapes, cached=[subj],
                          parts=parts, part_metrics=part_metrics)
