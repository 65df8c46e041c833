"""Property-based cross-check of the entity-linking disambiguation policy
and token counting. The python reference replicates the documented
scoring contract — prior + 2·coherence(doc has the candidate via an
unambiguous surface) + 0.001·log1p(distinct-doc popularity), top-1 per
mention-role with min-candidate tie-break, mint-IRI fallback for
dictionary misses — so the salted/broadcast Spark plan is pinned to the
policy, not just to the construction-parity fixtures.
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

_surface = st.sampled_from(["Alpha", "Beta", "Gamma", "Delta"])
_doc = st.sampled_from(["doc0", "doc1", "doc2"])

# dictionary candidates: each surface maps to 0-2 of these with a prior
_DICT_POOL = [
    ("Alpha", "urn:e:a1", 1.0),
    ("Alpha", "urn:e:a2", 0.6),
    ("Beta", "urn:e:b1", 0.6),
    ("Beta", "urn:e:b2", 0.6),  # exact-tie pair → min-candidate break
    ("Gamma", "urn:e:g1", 1.0),
]


@settings(max_examples=20, deadline=None)
@given(
    ments=st.lists(st.tuples(_doc, _surface, st.none() | _surface),
                   min_size=1, max_size=10),
    dict_mask=st.lists(st.booleans(), min_size=5, max_size=5),
)
def test_link_mentions_matches_python_policy(spark, ments, dict_mask):
    from shacl_dqa_prototype_spark.operators.link import MINT_NS, link_mentions

    mrows = [
        (d, i, 0, s, "urn:p:rel", o, None, None, None)
        for i, (d, s, o) in enumerate(ments)
    ]
    mdf = spark.createDataFrame(
        mrows,
        "doc_id string, span_pos int, fact_idx int, subj_surface string, "
        "pred string, obj_surface string, obj_literal string, "
        "obj_dtype string, obj_lang string")
    drows = [r for r, keep in zip(_DICT_POOL, dict_mask) if keep]
    ddf = spark.createDataFrame(drows or [("__none__", "urn:e:x", 1.0)],
                                ["surface", "candidate", "prior"])
    got = {(r["doc_id"], r["span_pos"]): (r["s_iri"], r["o_iri"])
           for r in link_mentions(mdf, ddf).collect()}

    dct: dict[str, list[tuple[str, float]]] = {}
    for s, c, p in (drows or [("__none__", "urn:e:x", 1.0)]):
        dct.setdefault(s, []).append((c, p))

    def cands(surface):
        if surface in dct:
            n = len(dct[surface])
            return [(c, p, n) for c, p in dct[surface]]
        mint = MINT_NS + hashlib.sha256(surface.encode()).hexdigest()[:16]
        return [(mint, 1.0, 1)]

    # candidate rows: (doc, key, role, candidate, prior, n_cands)
    rows = []
    for i, (d, s, o) in enumerate(ments):
        for c, p, n in cands(s):
            rows.append((d, i, "s", c, p, n))
        if o is not None:
            for c, p, n in cands(o):
                rows.append((d, i, "o", c, p, n))
    pop: dict[str, set] = {}
    unamb: dict[tuple, bool] = {}
    for d, _, _, c, _, n in rows:
        pop.setdefault(c, set()).add(d)
        unamb[(d, c)] = unamb.get((d, c), False) or n == 1
    exp = {}
    for i, (d, s, o) in enumerate(ments):
        def pick(surface):
            best = min(
                (-(p + 2.0 * (1.0 if unamb[(d, c)] else 0.0)
                   + 0.001 * math.log1p(len(pop[c]))), c)
                for c, p, _ in cands(surface)
            )
            return best[1]
        exp[(d, i)] = (pick(s), pick(o) if o is not None else None)
    assert got == exp, (ments, drows)


_tok_text = st.text(
    alphabet="ab1 .,!x9", min_size=0, max_size=25)


@settings(max_examples=30, deadline=None)
@given(text=_tok_text)
def test_token_count_matches_python(spark, text):
    from shacl_dqa_prototype_spark.operators.textstats import (
        BPE_ISH_RX,
        token_count,
    )

    df = spark.createDataFrame([("d0", text)], ["doc_id", "text"])
    r = token_count(df).collect()[0]

    ws = len(re.split(r"\s+", text.strip())) if text.strip() else 0
    bpe = len(re.findall(BPE_ISH_RX, text))
    assert (r["n_tokens_ws"], r["n_tokens_bpe"]) == (ws, bpe), text
