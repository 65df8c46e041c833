"""Property-based cross-check of source_token_divergence: the per-source
unigram KL(P_source || P_corpus) — token counts, per-source and corpus
totals, and the finite-by-construction divergence sum — vs a pure-python
computation on random multi-source corpora (single-source corpora must
read exactly 0.0).
"""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["up", "down", "left", "right"])
_text = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_src = st.sampled_from(["web", "books"])


@settings(max_examples=25, deadline=None)
@given(rows=st.lists(st.tuples(_src, _text), min_size=1, max_size=8))
def test_source_token_divergence_matches_python(spark, rows):
    from shacl_dqa_prototype_spark.operators.textstats import (
        source_token_divergence,
    )

    df = spark.createDataFrame(
        [(f"d{i}", s, t) for i, (s, t) in enumerate(rows)],
        ["doc_id", "source", "text"])
    got = {r["source"]: (r["n_tokens"], r["kl_divergence"])
           for r in source_token_divergence(df).collect()}

    counts: dict[str, dict[str, int]] = {}
    for s, t in rows:
        for tok in re.split(r"\s+", t.strip().lower()):
            if tok:
                counts.setdefault(s, {}).setdefault(tok, 0)
                counts[s][tok] += 1
    tok_tot: dict[str, int] = {}
    for c in counts.values():
        for tok, n in c.items():
            tok_tot[tok] = tok_tot.get(tok, 0) + n
    c_all = sum(tok_tot.values())
    exp = {}
    for s, c in counts.items():
        c_src = sum(c.values())
        kl = sum(
            (n / c_src) * math.log((n / c_src) / (tok_tot[tok] / c_all))
            for tok, n in c.items()
        )
        exp[s] = (c_src, round(kl, 6))
    assert got.keys() == exp.keys(), rows
    for s in exp:
        assert got[s][0] == exp[s][0], (s, got[s], exp[s])
        assert abs(got[s][1] - exp[s][1]) <= 2e-6, (s, got[s], exp[s], rows)
    if len(exp) == 1:
        (only,) = exp.values()
        assert abs(got[next(iter(exp))][1]) <= 1e-9
