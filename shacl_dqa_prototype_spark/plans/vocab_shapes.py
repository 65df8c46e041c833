"""C37–C40 — vocabulary shapes, evaluated against the TBox.

Reference: vocabulary_shapes.template.ttl + shacl_shape_builder.py:542-583;
dataset classes/properties are routed to vocabularies by namespace prefix
(dq_assessment.py:176-199).

The TBox is tiny (hundreds of terms), so these compile to broadcast-size
joins; inputs are the vocab_terms dim + the used-class/used-property sets
from the data profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shacl_dqa_prototype_spark.plans.constraints import (
    ConstraintPlan,
    ShapeSpec,
    VocabTerm,
)
from shacl_dqa_prototype_spark.schemas import VIOLATIONS_SCHEMA


def compile_vocab_constraints(
    spark: SparkSession,
    vocab: str,
    namespace: str,
    vocab_terms: list[VocabTerm],
    term_labels: dict[str, bool],
    used_classes: set[str],
    used_props: set[str],
) -> ConstraintPlan:
    """Evaluate the four vocabulary shape families for one vocabulary.

    term_labels: term → has rdfs:label in the vocab graph (drives C37/C38).
    """
    shapes: list[ShapeSpec] = []
    rows: list[tuple] = []

    classes = [t for t in vocab_terms if t.term_kind == "class"]
    props = [t for t in vocab_terms if t.term_kind != "class"]

    # C37/C38 LabelForClasses/Properties: minCount 1 label per term.
    # Ratio over the vocab's class/property count (dq_assessment.py:395-398).
    for t in classes:
        if not term_labels.get(t.term, False):
            rows.append(("LabelForClasses", None, t.term, None))
    shapes.append(ShapeSpec("LabelForClasses", None, "vocab_classes"))
    for t in props:
        if not term_labels.get(t.term, False):
            rows.append(("LabelForProperties", None, t.term, None))
    shapes.append(ShapeSpec("LabelForProperties", None, "vocab_properties"))

    # C39/C40 UndefinedClass/Property: every class/property used in the data
    # within this vocab's namespace must be defined by the vocab.
    defined_classes = {t.term for t in classes}
    defined_props = {t.term for t in props}
    # empty namespace (all-bnode or empty vocab): startswith('') is True
    # for EVERYTHING, which would flag every used term in the dataset as
    # Undefined — mirror mine_vocab's bool(ns) guard and scope nothing
    ns_used_classes = sorted(
        c for c in used_classes if namespace and c.startswith(namespace))
    ns_used_props = sorted(
        p for p in used_props if namespace and p.startswith(namespace))
    for c in ns_used_classes:
        if c not in defined_classes:
            rows.append(("UndefinedClass", c, c, None))
        shapes.append(ShapeSpec("UndefinedClass", c, "binary"))
    for p in ns_used_props:
        if p not in defined_props:
            rows.append(("UndefinedProperty", p, p, None))
        shapes.append(ShapeSpec("UndefinedProperty", p, "binary"))

    violations = (
        spark.createDataFrame(rows, VIOLATIONS_SCHEMA)
        if rows
        else spark.createDataFrame([], VIOLATIONS_SCHEMA)
    )
    return ConstraintPlan(violations=violations, shapes=shapes)


def score_vocab_plan(
    spark: SparkSession,
    vocab: str,
    plan: ConstraintPlan,
    n_classes: int,
    n_properties: int,
) -> DataFrame:
    """Vocab-shape scoring: LabelFor* are ratios over term counts; the
    Undefined* families are binary per term + meta rollups."""
    from shacl_dqa_prototype_spark.plans.scoring import DIMENSIONS

    per = plan.violations.groupBy("metric", "item").agg(
        F.countDistinct("focus").alias("num_violations"),
        F.concat_ws("; ", F.array_sort(F.collect_set("focus"))).alias("violations"),
    )
    shapes_df = spark.createDataFrame(
        [(s.metric, s.item, s.denom) for s in plan.shapes],
        "metric string, item string, denom string",
    )
    joined = (
        shapes_df.alias("sp")
        .join(
            per.alias("pv"),
            (F.col("sp.metric") == F.col("pv.metric"))
            & F.col("sp.item").eqNullSafe(F.col("pv.item")),
            "left",
        )
        .select("sp.*", "pv.num_violations", "pv.violations")
        .fillna({"num_violations": 0})
    )
    denominator = (
        F.when(F.col("denom") == "vocab_classes", F.lit(n_classes))
        .when(F.col("denom") == "vocab_properties", F.lit(n_properties))
    )
    measure = (
        F.when(F.col("denom") == "binary",
               (F.col("num_violations") == 0).cast("double"))
        # zero violations → 1.0 even with an empty denominator family
        # (greatest() would swallow the NULL ratio into 0.0 otherwise)
        .when(F.col("num_violations") == 0, F.lit(1.0))
        .otherwise(
            F.greatest(F.lit(0.0),
                       1.0 - F.col("num_violations") / F.nullif(denominator, F.lit(0)))
        )
    )
    dim_expr = F.lit(None).cast("string")
    for metric, dim in DIMENSIONS.items():
        dim_expr = F.when(F.col("metric") == metric, F.lit(dim)).otherwise(dim_expr)

    base = joined.select(
        F.lit(f"vocab:{vocab}").alias("target"),
        dim_expr.alias("dimension"),
        "metric",
        "item",
        F.when(F.col("denom") == "binary", "binary").otherwise("ratio").alias("score_kind"),
        F.coalesce(measure, F.lit(1.0)).alias("measure"),
        F.col("num_violations").cast("long").alias("num_violations"),
        "violations",
    )
    meta = (
        base.filter(F.col("item").isNotNull())
        .groupBy("target", "dimension", "metric")
        .agg(
            F.avg((F.col("measure") == 1.0).cast("double")).alias("measure"),
            F.sum("num_violations").cast("long").alias("num_violations"),
        )
        .select(
            "target", "dimension", "metric",
            F.lit(None).cast("string").alias("item"),
            F.lit("meta").alias("score_kind"),
            "measure", "num_violations",
            F.lit(None).cast("string").alias("violations"),
        )
    )
    return base.unionByName(meta)
