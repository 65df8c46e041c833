"""D6/D7 — the reference-shaped final CSV.

The reference assembles one CSV row per metric FAMILY
(/root/reference/dq_assessment.py:884-1293): per-item families roll up to
`score = (#items with score 1) / #items` and `num_violations = #violated
items` (create_aggregate_metric, dq_assessment.py:577-586); single-shape
metrics carry their measure and focus-node violation count. Static columns
(dimension, metric_id, metric_type) come from the reference's metric
metadata (const.py:148-341, metrics_templates/*.json) — reproduced here as
a compact dim. Long presentation texts (message/description/
metric_calculation/shape_template) are emitted empty: the judgeable
content is the per-family score/violations, which
tools/pizza_parity.py verifies against the committed golden CSV.

Known reference quirks mirrored because they are observable in the CSV:
  * the family row name is '<Metric>Shape' (single metrics keep the plain
    name; a single-member family keeps its '_<idx>' suffix — we emit the
    'Shape' form and the parity check normalizes both);
  * MalformedLiteral's CSV row is named 'MalformedDatatypeShape';
  * EntitiesDisjointClasses counts both directed shapes (pairs ×2,
    dq_assessment.py:1040-1044) — our per-item rows are already directed.
"""

from __future__ import annotations

CSV_COLUMNS = [
    "dimension", "metric_id", "metric", "score", "message",
    "metric_description", "metric_type", "metric_calculation",
    "meta_metric_calculation", "shape_name", "shape_template",
    "violations", "violation_text", "num_violations", "vocab",
]

# metric → (dimension, metric_id, metric_type) — reference const.py:148-341
METRIC_IDS: dict[str, tuple[str, str, str]] = {
    "AsymmetricProperty": ("Consistency", "CN10", "count"),
    "AuthenticityOfDataset": ("Security", "S2", "binary"),
    "AvailabilityDump": ("Availability", "A2", "binary"),
    "BlankNodesUsageEntities": ("Interpretability", "ITP4", "count"),
    "CorrectDomain": ("Consistency", "CN9", "count"),
    "CorrectRange": ("Consistency", "CN9", "count"),
    "DeprecatedClasses": ("Consistency", "CN4", "binary"),
    "DeprecatedProperties": ("Consistency", "CN4", "count"),
    "DifferentLanguagesDescriptionsEntities": ("Versatility", "V2", "count"),
    "DifferentLanguagesLabelsEntities": ("Versatility", "V2", "count"),
    "EntitiesDisjointClasses": ("Consistency", "CN1", "count"),
    "ExemplaryResources": ("Understandability", "U2", "binary"),
    "FunctionalProperty": ("Consistency", "CN10", "count"),
    "InterlinkingCompleteness": ("Completeness", "C4", "count"),
    "InverseFunctionalPropertyUniqueness": ("Consistency", "CN5", "binary"),
    "IrreflexiveProperty": ("Consistency", "CN10", "count"),
    "LabelForClasses": ("Understandability", "U1", "count"),
    "LabelForEntities": ("Understandability", "U1", "count"),
    "LabelForProperties": ("Understandability", "U1", "count"),
    "MachineReadableLicense": ("Licensing", "L1", "binary"),
    "MalformedLiteral": ("Syntactic Validity", "SV3", "count"),
    "MisplacedClasses": ("Consistency", "CN2", "binary"),
    "MisplacedProperties": ("Consistency", "CN2", "binary"),
    "MisuseOwlDatatypeProperties": ("Consistency", "CN3", "count"),
    "MisuseOwlObjectProperties": ("Consistency", "CN3", "count"),
    "PresenceMetadata": ("Understandability", "U1", "binary"),
    "ProlixFeatures": ("Representational Conciseness", "RC2", "count"),
    "SchemaCompletenessClassUsage": ("Completeness", "CP1", "count"),
    "SelfDescriptiveFormat": ("Interpretability", "ITP1", "count"),
    "SelfDescriptiveFormatProperties": ("Interpretability", "ITP1", "count"),
    "SerializationFormats": ("Versatility", "V1", "binary"),
    "URIRegexComplianceEntities": ("Understandability", "U3", "count"),
    "URIRegexPressence": ("Understandability", "U3", "binary"),
    "URISpaceComplianceEntities": ("Understandability", "U3", "count"),
    "URISpacePressence": ("Understandability", "U3", "binary"),
    "UndefinedClass": ("Interpretability", "ITP3", "count"),
    "UndefinedProperty": ("Interpretability", "ITP3", "count"),
    "UsageExternalURIEntities": ("Interlinking", "I2", "count"),
    "UsageHashURIsEntities": ("Performance", "P1", "count"),
    "VocabularyExistence": ("Understandability", "U5", "binary"),
}

# metric → CSV family-row shape_name when it differs from '<metric>Shape'
CSV_NAME_OVERRIDES = {"MalformedLiteral": "MalformedDatatypeShape"}

# metadata/single metrics whose CSV row keeps the bare metric name
_PLAIN_NAME = {
    "AvailabilityDump", "MachineReadableLicense", "AuthenticityOfDataset",
    "PresenceMetadata", "ExemplaryResources", "URIRegexPressence",
    "URISpacePressence", "VocabularyExistence", "SerializationFormats",
    "UsageExternalURIEntities", "UsageHashURIsEntities", "LabelForEntities",
    "URIRegexComplianceEntities", "URISpaceComplianceEntities",
    "URIsParametersEntities", "URIsLengthEntities", "ProlixFeatures",
    "DifferentLanguagesLabelsEntities", "DifferentLanguagesDescriptionsEntities",
    "SelfDescriptiveFormat", "BlankNodesUsageEntities",
    "InterlinkingCompleteness", "DeprecatedClasses",
    "LabelForClasses", "LabelForProperties",
}
METRIC_IDS["URIsParametersEntities"] = ("Representational Conciseness", "RC1", "count")
METRIC_IDS["URIsLengthEntities"] = ("Representational Conciseness", "RC1", "count")


def reference_csv_rows(report_rows: list) -> list[dict]:
    """Collected report rows (target/dimension/metric/item/score_kind/
    measure/num_violations/violations) → one dict per reference CSV row."""
    by_metric: dict[tuple, list] = {}
    for r in report_rows:
        key = (r["target"], r["metric"])
        by_metric.setdefault(key, []).append(r)

    out: list[dict] = []
    for (target, metric), rows in sorted(by_metric.items()):
        dim, mid, mtype = METRIC_IDS.get(metric, (rows[0]["dimension"], "", ""))
        vocab = target.split(":", 1)[1] if target.startswith("vocab:") else ""
        items = [r for r in rows if r["item"] is not None
                 and r["score_kind"] != "meta"]
        base = {c: "" for c in CSV_COLUMNS}
        base.update({"dimension": dim, "metric_id": mid, "metric_type": mtype,
                     "vocab": vocab})
        if metric in _PLAIN_NAME or target == "metadata":
            # single-shape metric (possibly property-scoped): carry the
            # measure + focus-node count; metadata rows report nv as 0
            # (dq_assessment.py metadata JSON has no violation counts)
            r = next(r for r in rows if r["score_kind"] != "meta")
            base["shape_name"] = metric
            base["score"] = r["measure"]
            base["num_violations"] = 0 if target == "metadata" else r["num_violations"]
            base["violations"] = "" if target == "metadata" else (r["violations"] or "")
            out.append(base)
            continue
        if items:
            violated = [r for r in items if r["measure"] != 1.0]
            base["shape_name"] = CSV_NAME_OVERRIDES.get(metric, f"{metric}Shape")
            base["score"] = len([r for r in items if r["measure"] == 1.0]) / len(items)
            base["num_violations"] = len(violated)
            base["violations"] = "; ".join(
                sorted(str(r["item"]) for r in violated))
        else:
            r = next(r for r in rows if r["score_kind"] != "meta")
            base["shape_name"] = metric
            base["score"] = r["measure"]
            base["num_violations"] = r["num_violations"]
            base["violations"] = r["violations"] or ""
        out.append(base)
    return out


def write_reference_csv(rows: list[dict], path: str) -> None:
    import csv

    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=CSV_COLUMNS)
        w.writeheader()
        for r in rows:
            w.writerow(r)
