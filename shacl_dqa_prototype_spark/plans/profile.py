"""B1–B9 — graph profiling: the reference's profile_graph
(/root/reference/utils.py:62-135) as ONE multi-aggregate Spark job plus two
small per-key aggregate tables.

The scalar counts (B1–B4, B8) fuse into a single conditional-aggregation
pass over T — one scan, one (partial-agg, final-agg) stage pair — instead of
eight separate jobs. The per-property/per-class tables (B5–B7) are the
denominator dims for all ratio metrics (utils.py:866-871); they stay
DataFrames and are broadcast into scoring.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class GraphProfile:
    num_triples: int
    num_classes: int
    num_entities: int
    num_properties: int
    num_entities_interlinking: int
    num_entities_label: int
    num_entities_description: int
    # denominator dims (small: O(#properties), O(#classes))
    triples_per_property: DataFrame = field(repr=False, default=None)
    subjects_per_property: DataFrame = field(repr=False, default=None)
    entities_per_class: DataFrame = field(repr=False, default=None)

    def as_dict(self) -> dict:
        return {
            "num_triples": self.num_triples,
            "num_classes": self.num_classes,
            "num_entities": self.num_entities,
            "num_properties": self.num_properties,
            "num_entities_interlinking": self.num_entities_interlinking,
            "num_entities_label": self.num_entities_label,
            "num_entities_description": self.num_entities_description,
        }


def profile_graph(
    T: DataFrame,
    type_property: str,
    labeling_property: str,
    description_property: str,
    interlinking_property: str,
) -> GraphProfile:
    """One fused scan for scalars (B1-B4, B8); two hash-agg jobs for the
    denominator dims (B5/B6 share a scan via grouping on p)."""
    p, s, o = F.col("p"), F.col("s"), F.col("o")
    scalars = T.agg(
        F.count("*").alias("num_triples"),
        F.countDistinct(F.when(p == type_property, o)).alias("num_classes"),
        F.countDistinct(F.when(p == type_property, s)).alias("num_entities"),
        F.countDistinct(p).alias("num_properties"),
        F.countDistinct(F.when(p == interlinking_property, s)).alias("n_ilp"),
        F.countDistinct(F.when(p == labeling_property, s)).alias("n_lbl"),
        F.countDistinct(F.when(p == description_property, s)).alias("n_dsc"),
    ).first()

    per_property = T.groupBy("p").agg(
        F.count("*").alias("num_triples"),
        F.countDistinct("s").alias("num_subjects"),
    )
    entities_per_class = (
        T.filter(p == type_property)
        .groupBy(o.alias("cls"))
        .agg(F.countDistinct("s").alias("num_instances"))
    )
    return GraphProfile(
        num_triples=scalars["num_triples"],
        num_classes=scalars["num_classes"],
        num_entities=scalars["num_entities"],
        num_properties=scalars["num_properties"],
        num_entities_interlinking=scalars["n_ilp"],
        num_entities_label=scalars["n_lbl"],
        num_entities_description=scalars["n_dsc"],
        triples_per_property=per_property.select("p", "num_triples"),
        subjects_per_property=per_property.select("p", "num_subjects"),
        entities_per_class=entities_per_class,
    )


def infer_namespace(T: DataFrame) -> str:
    """B9 — most common namespace of subject IRIs (utils.py:138-154).
    The reference splits '#'-FIRST (rsplit('#') when present, else
    rsplit('/')) — a single greedy [#/] regex would capture through a
    '/' occurring after the '#' (…vocab#section/item → …vocab#section/),
    mis-deriving base_uri/uri_space for such datasets."""
    row = (
        T.filter(~F.col("s").startswith("_:"))
        .select(
            F.when(F.col("s").contains("#"),
                   F.regexp_extract("s", r"^(.*#)", 1))
            .otherwise(F.regexp_extract("s", r"^(.*/)", 1)).alias("ns"))
        .filter(F.col("ns") != "")
        .groupBy("ns")
        .count()
        .orderBy(F.desc("count"), F.asc("ns"))
        .limit(1)
        .first()
    )
    return row["ns"] if row else ""


def literal_datatypes(T: DataFrame) -> DataFrame:
    """Per-datatype literal histogram — a profile extension over the
    reference's per-property tables (utils.py:62-135 counts per property;
    this cuts the same scan by the EFFECTIVE datatype instead): explicit
    ``o_dtype`` when present, else ``rdf:langString`` for lang-tagged
    literals, else ``xsd:string`` (RDF 1.1 simple-literal semantics).
    Reports triples and distinct carrying properties per datatype — the
    table a deployment reads before deciding which MalformedLiteral /
    CorrectRange(datatype) checks are worth enabling.

    Scale shape: one scan with the filter pushed to the store → one
    groupBy(datatype) with map-side partial aggregation; output is
    O(#datatypes) rows (bounded by the vocabulary, not the data)."""
    from shacl_dqa_prototype_spark.functions.terms import RDF_LANGSTRING, XSD

    effective = F.coalesce(
        F.col("o_dtype"),
        F.when(F.col("o_lang").isNotNull(), F.lit(RDF_LANGSTRING)),
        F.lit(f"{XSD}string"),
    )
    return (
        T.filter(F.col("o_kind") == "literal")
        .groupBy(effective.alias("datatype"))
        .agg(F.count("*").cast("long").alias("num_literals"),
             F.countDistinct("p").alias("num_properties"))
    )


def degree_distribution(T: DataFrame) -> DataFrame:
    """Log2-bucketed histogram of total node degree (out = triples as
    subject, in = triples as IRI object) — the skew diagnostic read
    BEFORE picking mitigations: a heavy tail here is what makes the
    `degree_topk` hot list worth salting on (operators/link.py E4).

    ``bucket`` is the exact bit length of the degree minus one
    (len(bin(degree)) - 1 == floor(log2(degree)) for integers, computed
    WITHOUT floating-point log so engines can't disagree at exact powers
    of two); ``min_degree``/``max_degree`` bound each bucket.

    Scale shape: one union scan → one groupBy(node) shuffle with
    map-side partials → a second, tiny groupBy(bucket) over O(#nodes)
    rows collapsing to O(log(max_degree)) rows."""
    nodes = T.select(
        F.col("s").alias("node"), F.lit(1).alias("od"), F.lit(0).alias("id_"),
    ).unionByName(
        T.filter(F.col("o_kind") == "iri").select(
            F.col("o").alias("node"), F.lit(0).alias("od"),
            F.lit(1).alias("id_"))
    )
    deg = nodes.groupBy("node").agg(
        (F.sum("od") + F.sum("id_")).cast("long").alias("degree"))
    bucket = (F.length(F.bin(F.col("degree"))) - 1).cast("long")
    return (
        deg.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").cast("long").alias("n_nodes"),
             F.min("degree").alias("min_degree"),
             F.max("degree").alias("max_degree"))
    )


def degree_topk(T: DataFrame, k: int = 20) -> DataFrame:
    """Top-k graph nodes by degree (out = triples as subject, in = triples
    as IRI object), ties broken by node id — the connectivity profile a KG
    operator reads before picking skew mitigations (the hot node list IS
    the salting candidate list for joins against the graph).

    Scale shape: one union scan → one groupBy(node) shuffle with map-side
    partial sums → TakeOrdered(k) (per-partition top-k then a k-sized
    driver merge, never a global sort)."""
    nodes = T.select(
        F.col("s").alias("node"), F.lit(1).alias("od"), F.lit(0).alias("id_"),
    ).unionByName(
        T.filter(F.col("o_kind") == "iri").select(
            F.col("o").alias("node"), F.lit(0).alias("od"),
            F.lit(1).alias("id_"))
    )
    return (
        nodes.groupBy("node")
        .agg(F.sum("od").cast("long").alias("out_degree"),
             F.sum("id_").cast("long").alias("in_degree"))
        .withColumn("degree", (F.col("out_degree") + F.col("in_degree")))
        .orderBy(F.desc("degree"), F.asc("node"))
        .limit(k)
    )
