"""C33–C36 — metadata (VoID) shapes.

Exact semantics from /root/reference/dq_assessment/shapes/
metadata_shapes.template.ttl (all binary; result demux per
dq_assessment.py:303-329):

  PresenceMetadata        dcterms:title (Literal) + dcterms:description
                          (Literal) + foaf:homepage (IRI), each minCount 1
  ExemplaryResources      void:exampleResource minCount 1
  VocabularyExistence     void:vocabulary minCount 1
  URIRegexPressence       void:uriRegexPattern minCount 1
  URISpacePressence       void:uriSpace (Literal) minCount 1
  MachineReadableLicense  dcterms:license minCount 1 AND value typed
                          dcterms:LicenseDocument
  SerializationFormats    void:feature minCount 1, maxCount 5, values ∈
                          the five W3C format IRIs
  AvailabilityDump        void:dataDump ∨ (dcat:distribution→dcat:downloadURL)
  AuthenticityOfDataset   (source ∨ provenance) ∧ (contributor ∨ creator ∨
                          publisher) — the reference folds both Authenticity
                          shapes into one metric (dq_assessment.py:300-301)

The metadata graph is tens of triples (A3): collected once on the driver;
the sequence path dcat:distribution/dcat:downloadURL is the one join hop.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from shacl_dqa_prototype_spark.functions.terms import DCAT, DCT, FOAF, RDF_TYPE, VOID

FORMAT_IRIS = {
    "http://www.w3.org/ns/formats/N3",
    "http://www.w3.org/ns/formats/N-Triples",
    "http://www.w3.org/ns/formats/RDF_XML",
    "http://www.w3.org/ns/formats/RDFa",
    "http://www.w3.org/ns/formats/Turtle",
}

INCORRECT = "The property is present but the value is incorrect."


@dataclass
class MetadataResult:
    metric: str
    measure: int          # binary
    message: str | None


def evaluate_metadata(metadata: DataFrame, metadata_class: str) -> list[MetadataResult]:
    """Evaluate all metadata shapes for focus nodes typed metadata_class.
    Input: triple DF with the engine schema; tiny → one collect."""
    triples = [(r["s"], r["p"], r["o"], r["o_kind"]) for r in
               metadata.select("s", "p", "o", "o_kind").collect()]
    datasets = {s for (s, p, o, _) in triples if p == RDF_TYPE and o == metadata_class}
    if not datasets:
        # SHACL conformance with ZERO focus nodes: every shape CONFORMS.
        # The reference defaults each binary metric to 1 and only flips
        # on a ValidationResult (dq_assessment.py:294-330), so an untyped
        # or missing dataset node scores all 1s — not all 0s
        return [MetadataResult(m, 1, None) for m in (
            "PresenceMetadata", "ExemplaryResources", "VocabularyExistence",
            "URIRegexPressence", "URISpacePressence",
            "MachineReadableLicense", "SerializationFormats",
            "AvailabilityDump", "AuthenticityOfDataset")]

    def vals(pred: str) -> list[tuple[str, str]]:
        return [(o, k) for (s, p, o, k) in triples
                if p == pred and s in datasets]

    def types_of(node: str) -> set[str]:
        return {o for (s, p, o, _) in triples if s == node and p == RDF_TYPE}

    out: list[MetadataResult] = []

    def binary(metric: str, ok: bool, message: str | None):
        out.append(MetadataResult(metric, 1 if ok else 0, None if ok else message))

    title = vals(f"{DCT}title")
    desc = vals(f"{DCT}description")
    home = vals(f"{FOAF}homepage")
    presence_ok = bool(title) and bool(desc) and bool(home)
    presence_correct = (
        all(k == "literal" for (_, k) in title)
        and all(k == "literal" for (_, k) in desc)
        and all(k == "iri" for (_, k) in home)
    )
    binary("PresenceMetadata", presence_ok and presence_correct,
           INCORRECT if presence_ok and not presence_correct
           else "The dataset should specify a title, description and web page")

    binary("ExemplaryResources", bool(vals(f"{VOID}exampleResource")),
           "The dataset should specify an example of an exemplary resource")
    binary("VocabularyExistence", bool(vals(f"{VOID}vocabulary")),
           "The dataset should specify a list of the vocabularies used")
    binary("URIRegexPressence", bool(vals(f"{VOID}uriRegexPattern")),
           "The dataset should specify a regex that matches the URIs of the entities")

    uspace = vals(f"{VOID}uriSpace")
    binary("URISpacePressence",
           bool(uspace) and all(k == "literal" for (_, k) in uspace),
           INCORRECT if uspace and not all(k == "literal" for (_, k) in uspace)
           else "The dataset should specify a URI namespace used for the entities")

    lic = vals(f"{DCT}license")
    lic_typed = all(f"{DCT}LicenseDocument" in types_of(v) for (v, _) in lic)
    binary("MachineReadableLicense", bool(lic) and lic_typed,
           INCORRECT if lic and not lic_typed
           else "The dataset must provide a machine readable indication of a license")

    feats = vals(f"{VOID}feature")
    feats_ok = 1 <= len(feats) <= 5 and all(v in FORMAT_IRIS for (v, _) in feats)
    binary("SerializationFormats", feats_ok,
           INCORRECT if feats and not feats_ok
           else "The dataset's metadata should specify the serialization "
                "formats in which the data is available")

    # AvailabilityDump: dataDump ∨ distribution→downloadURL (sequence path).
    dump = vals(f"{VOID}dataDump")
    dists = {v for (v, _) in vals(f"{DCAT}distribution")}
    dl = [(o, k) for (s, p, o, k) in triples if p == f"{DCAT}downloadURL" and s in dists]
    binary("AvailabilityDump", bool(dump) or bool(dl),
           "The dataset must provide an accessible RDF dump that can be "
           "downloaded.")

    # AuthenticityOfDataset: both OR-shapes must hold (two shapes, one
    # metric; when both are violated the reference's result iteration
    # surfaces the Source message — metadata_shapes.template.ttl:87,103).
    src_ok = bool(vals(f"{DCT}source")) or bool(vals(f"{DCT}provenance"))
    auth_ok = any(bool(vals(f"{DCT}{q}")) for q in ("contributor", "creator", "publisher"))
    binary("AuthenticityOfDataset", src_ok and auth_ok,
           "The dataset should specify the origin of the data" if not src_ok
           else "The dataset should specify a contributor, creator or publisher")

    return out
