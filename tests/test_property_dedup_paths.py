"""Property-based cross-checks: SPARQL-style property-path evaluation vs a
pure-python relational chain, and the MinHash-LSH recall guarantee that
EXACT duplicates (identical signatures → identical buckets in every band)
are always emitted as candidate pairs, on random corpora where duplicates
arise naturally from a small text space.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_node = st.sampled_from([f"e{i}" for i in range(6)])
_pred = st.sampled_from(["urn:p:a", "urn:p:b"])
_kind = st.sampled_from(["iri", "iri", "iri", "literal"])


@settings(max_examples=25, deadline=None)
@given(
    triples=st.lists(st.tuples(_node, _pred, _node, _kind),
                     min_size=1, max_size=20),
    path=st.lists(
        st.tuples(st.booleans(), _pred).map(
            lambda t: ("^" if t[0] else "") + t[1]),
        min_size=1, max_size=3,
    ),
)
def test_property_path_matches_python_chain(spark, triples, path):
    from shacl_dqa_prototype_spark.operators.traversal import (
        follow_property_path,
    )

    df = spark.createDataFrame(triples, ["s", "p", "o", "o_kind"])
    got = {(r["src"], r["dst"])
           for r in follow_property_path(df, path).collect()}

    def step(p):
        inv = p.startswith("^")
        pred = p[1:] if inv else p
        return {
            (o, s) if inv else (s, o)
            for (s, pp, o, k) in triples
            if pp == pred and k in ("iri", "bnode")
        }

    exp = step(path[0])
    for p in path[1:]:
        nxt = step(p)
        exp = {(a, d) for (a, b) in exp for (c, d) in nxt if b == c}
    assert got == exp, (triples, path)


# texts drawn from a tiny space so exact duplicates are frequent; every
# duplicated text pair MUST surface as an LSH candidate (identical shingle
# sets → identical minhash signature → same bucket in every band)
_word = st.sampled_from(["alpha", "beta", "gamma", "delta"])
_text = st.lists(_word, min_size=4, max_size=6).map(" ".join)


@settings(max_examples=20, deadline=None)
@given(texts=st.lists(_text, min_size=2, max_size=12))
def test_lsh_candidates_include_all_exact_duplicates(spark, texts):
    from shacl_dqa_prototype_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    rows = [(f"d{i:02d}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"])
           for r in minhash_lsh_candidates(
               df, n=2, num_hashes=16, bands=8).collect()}

    by_text: dict[str, list[str]] = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(f"d{i:02d}")
    must = {
        (a, b)
        for ids in by_text.values()
        for x, a in enumerate(ids)
        for b in ids[x + 1:]
    }
    assert must <= got, (texts, sorted(must - got))
