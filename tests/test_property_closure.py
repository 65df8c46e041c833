"""Property-based cross-check of subclass_closure (the DFS that feeds the
sh:class closure typing in the domain/range/disjointness shapes) against
an independent fixpoint formulation, on random digraphs including cycles
and self-loops — shapes real TBoxes do contain (owl:equivalentClass is
often modelled as mutual subClassOf).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_cls = st.sampled_from([f"urn:c:{i}" for i in range(6)])
RDFS_SUB = "http://www.w3.org/2000/01/rdf-schema#subClassOf"


@settings(max_examples=100, deadline=None)
@given(edges=st.lists(st.tuples(_cls, _cls), min_size=0, max_size=12))
def test_subclass_closure_matches_fixpoint(edges):
    from shacl_dqa_prototype_spark.plans.vocab import subclass_closure

    rows = [(s, RDFS_SUB, o, "iri", None, None) for s, o in edges]
    got = set(subclass_closure(rows))

    # independent formulation: relational fixpoint R ∪ R∘R ∪ … — a node
    # reaches every ancestor reachable through >= 1 subClassOf edge
    # (self-pairs appear only via cycles, same as the DFS)
    rel = set(edges)
    while True:
        nxt = rel | {(a, d) for (a, b) in rel for (c, d) in rel if b == c}
        if nxt == rel:
            break
        rel = nxt
    assert got == rel, edges
