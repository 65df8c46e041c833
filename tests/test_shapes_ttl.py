"""A7 — Turtle shapes-graph parity against the reference's committed
pizza artifacts (datasets/pizza/shapes/*.ttl).

The reference round-trips its instantiated templates through rdflib, so
formatting and shape ordering differ; shape INDICES additionally depend on
instantiation-walk order (dict iteration in the reference) and are not
reproducible. The comparison therefore normalizes: strip quoted strings
(messages/patterns), normalize the _N suffix, expand prefixed names, and
compare the multiset of (shape family, token-set) blocks — token-set =
every IRI / SHACL keyword / numeric literal in the shape. This pins the
exact set of instantiated shapes and each shape's structural parameters.

No Spark session needed — the emitters are pure text.
"""

from __future__ import annotations

import re
from collections import Counter
from pathlib import Path

import pytest

from shacl_dqa_prototype_spark.functions.terms import OWL, RDF, RDFS, VOID
from shacl_dqa_prototype_spark.plans.constraints import DQAConfig
from shacl_dqa_prototype_spark.plans.shapes_ttl import (
    data_shapes_ttl,
    metadata_shapes_ttl,
    vocabulary_shapes_ttl,
)
from shacl_dqa_prototype_spark.plans.vocab import mine_vocab, profile_to_vocab_terms
from shacl_dqa_prototype_spark.sources.rdf import parse_rdfxml, parse_turtle

PIZZA = Path("/root/reference/datasets/pizza")
RDF_TYPE = f"{RDF}type"

pytestmark = pytest.mark.skipif(
    not PIZZA.exists(), reason="reference pizza dataset not available")


def _shape_multiset(ttl: str) -> Counter:
    """Multiset of (family, frozenset(structural tokens)) per shape block."""
    prefixes = dict(re.findall(r"@prefix (\w+): <([^>]*)> \.", ttl))
    body = re.sub(r'"(?:[^"\\]|\\.)*"', '""', ttl)  # strip literals
    body = re.sub(r"@prefix[^\n]*\n", "", body)
    blocks = re.split(r"(?m)^(?=ex:)", body)
    out: Counter = Counter()
    for b in blocks:
        m = re.match(r"ex:(\S+)", b)
        if not m:
            continue
        name = m.group(1)
        family = re.sub(r"_\d+$", "", name)
        tokens: set[str] = set()
        for iri in re.findall(r"<([^>]*)>", b):
            tokens.add(iri)
        for pfx, local in re.findall(r"\b(\w+):([\w.-]+)\b", b):
            if pfx in prefixes:
                tokens.add(prefixes[pfx] + local)
        for num in re.findall(r"\s(\d+)\s*[;.\]]", b):
            tokens.add(f"#int:{num}")
        # drop the shape's own (index-bearing) name token
        tokens.discard(prefixes.get("ex", "") + name)
        out[(family, frozenset(tokens))] += 1
    return out


def _diff(a: Counter, b: Counter) -> str:
    lines = []
    for k in (a - b):
        lines.append(f"only-golden: {k[0]} ({ (a-b)[k] }x)")
    for k in (b - a):
        lines.append(f"only-ours:   {k[0]} ({ (b-a)[k] }x)")
    return "\n".join(lines)


def _pizza_inputs():
    data_rows = list(dict.fromkeys(parse_turtle((PIZZA / "data.ttl").read_text())))
    void_rows = parse_turtle((PIZZA / "void.ttl").read_text())
    vocab_rows = parse_rdfxml((PIZZA / "pizza.xml").read_text())
    prof_v = mine_vocab(vocab_rows)
    terms, disjoint = profile_to_vocab_terms(prof_v)
    used_props = {r[1] for r in data_rows}
    used_classes = {r[2] for r in data_rows if r[1] == RDF_TYPE}
    regex = next((r[2] for r in void_rows if r[1] == f"{VOID}uriRegexPattern"),
                 None)
    space = next((r[2] for r in void_rows if r[1] == f"{VOID}uriSpace"), None)
    cfg = DQAConfig(
        type_property=RDF_TYPE,
        labeling_property=f"{RDFS}label",
        description_property=f"{RDFS}comment",
        interlinking_property=f"{OWL}sameAs",
        uris_max_length=80,
        base_uri="http://example.org/pizza#",
        uri_regex_pattern=regex,
        uri_space=space,
    )
    return terms, disjoint, cfg, used_props, used_classes, prof_v


def test_data_shapes_ttl_matches_golden():
    terms, disjoint, cfg, used_props, used_classes, _ = _pizza_inputs()
    ours = data_shapes_ttl(terms, disjoint, cfg, used_props, used_classes)
    golden = (PIZZA / "shapes" / "data_shapes.ttl").read_text()
    a, b = _shape_multiset(golden), _shape_multiset(ours)
    assert a == b, _diff(a, b)


def test_metadata_shapes_ttl_matches_golden():
    ours = metadata_shapes_ttl(f"{VOID}Dataset")
    golden = (PIZZA / "shapes" / "metadata_shapes.ttl").read_text()
    a, b = _shape_multiset(golden), _shape_multiset(ours)
    assert a == b, _diff(a, b)


def test_vocabulary_shapes_ttl_matches_golden():
    _, _, cfg, used_props, used_classes, prof_v = _pizza_inputs()
    ns = prof_v.namespace
    ours = vocabulary_shapes_ttl(
        cfg.labeling_property, cfg.type_property,
        sorted(c for c in used_classes if c and c.startswith(ns)),
        sorted(p for p in used_props if p.startswith(ns)))
    golden = (PIZZA / "shapes" / "vocabulary_shapes_pizza_owl.ttl").read_text()
    a, b = _shape_multiset(golden), _shape_multiset(ours)
    assert a == b, _diff(a, b)


# ---------------------------------------------------------------------------
# Round-5: triple-level (tree-canonical) parity — strictly stronger than the
# token-multiset check above. parse_turtle now covers the full shapes
# grammar ([ … ] property lists, long strings), so both graphs parse into
# triples; bnode subtrees fold into nested tuples, string literals
# (messages/patterns, which legitimately differ in wording) strip to a
# marker while numeric/boolean parameters (sh:maxCount 1 …) are kept, and
# _N shape indices normalize. Children dedupe per node: the reference
# instantiates one structurally identical sh:property block PER CLASS on
# NotNamedIndividualShape (only the message text differs), while we emit
# it once — the same constraint set, as the byte-exact CSV parity proves.
# ---------------------------------------------------------------------------

def _tree_canon(ttl: str) -> Counter:
    from collections import defaultdict

    from shacl_dqa_prototype_spark.sources.rdf import XSD_NS

    strip_dt = {None, f"{XSD_NS}string"}
    po = defaultdict(list)
    for s, p, o, k, dt, lang in parse_turtle(ttl):
        po[s].append((p, o, k, dt, lang))

    def norm_o(o, k, dt, lang):
        if k == "literal":
            if dt in strip_dt and lang is None:
                return ("lit",)
            return ("lit", o, dt, lang)
        return re.sub(r"_\d+$", "", o) if k == "iri" else o

    def fold(node, seen):
        if node in seen:
            return ("cycle",)
        items = {
            (p, fold(o, seen | {node}) if k == "bnode" else norm_o(o, k, dt, lang))
            for p, o, k, dt, lang in po.get(node, [])
        }
        return tuple(sorted(items, key=repr))

    out: Counter = Counter()
    for s in po:
        if not s.startswith("_:"):
            out[(re.sub(r"_\d+$", "", s), fold(s, frozenset()))] += 1
    return out


def test_shapes_ttl_tree_canonical_parity():
    terms, disjoint, cfg, used_props, used_classes, prof_v = _pizza_inputs()
    ns = prof_v.namespace
    pairs = [
        ("data",
         data_shapes_ttl(terms, disjoint, cfg, used_props, used_classes),
         PIZZA / "shapes" / "data_shapes.ttl"),
        ("metadata",
         metadata_shapes_ttl(f"{VOID}Dataset"),
         PIZZA / "shapes" / "metadata_shapes.ttl"),
        ("vocabulary",
         vocabulary_shapes_ttl(
             cfg.labeling_property, cfg.type_property,
             sorted(c for c in used_classes if c and c.startswith(ns)),
             sorted(p for p in used_props if p.startswith(ns))),
         PIZZA / "shapes" / "vocabulary_shapes_pizza_owl.ttl"),
    ]
    for name, ours, golden_path in pairs:
        a = _tree_canon(golden_path.read_text())
        b = _tree_canon(ours)  # also proves OUR emitted Turtle parses
        assert a == b, f"{name}: {_diff(a, b)}"
        assert sum(a.values()) > 0
