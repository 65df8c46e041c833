"""Property-based cross-check of the SimHash path end-to-end via the
portable (md5-derived) hash: the 64-bit fingerprint's bit votes are
re-derived in pure python per token INSTANCE (multiplicity matters), and
simhash_near_duplicates — candidate banding + xor verify — is compared
against brute-force Hamming enumeration, pinning the pigeonhole-band
exactness claim on random corpora rather than one hand example.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["ant", "bee", "cat", "dog"])
_text = st.lists(_word, min_size=0, max_size=8).map(" ".join)

_M64 = (1 << 64) - 1


def _py_simhash(text: str):
    toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
    if not toks:
        return None
    votes = [0] * 64
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for j in range(64):
            votes[j] += ((h >> j) & 1) * 2 - 1
    fp = 0
    for j in range(63):
        if votes[j] > 0:
            fp |= 1 << j
    if votes[63] > 0:
        fp -= 1 << 63
    return fp


@settings(max_examples=20, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=8))
def test_simhash_fingerprint_matches_python(spark, texts):
    from shacl_dqa_prototype_spark.operators.dedup import simhash

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"]
           for r in simhash(df, portable=True).collect()}
    exp = {d: _py_simhash(t) for d, t in rows if _py_simhash(t) is not None}
    assert got == exp, texts


@settings(max_examples=20, deadline=None)
@given(
    texts=st.lists(_text, min_size=2, max_size=8),
    max_hamming=st.integers(min_value=0, max_value=8),
)
def test_simhash_near_dups_match_brute_force(spark, texts, max_hamming):
    from shacl_dqa_prototype_spark.operators.dedup import (
        simhash_near_duplicates,
    )

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_near_duplicates(
               df, max_hamming=max_hamming, portable=True).collect()}

    fps = {d: _py_simhash(t) for d, t in rows}
    fps = {d: f for d, f in fps.items() if f is not None}
    ids = sorted(fps)
    exp = {}
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            ham = bin((fps[a] ^ fps[b]) & _M64).count("1")
            if ham <= max_hamming:
                exp[(a, b)] = ham
    assert got == exp, (texts, max_hamming)
