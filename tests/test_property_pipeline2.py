"""Property-based cross-checks for the remaining curation kernels:
duplicated-n-gram fraction (window doc-frequency, within-doc repeats),
PII redaction (chained regex), and GPT-style sequence packing (cumsum
pack geometry incl. zero-token docs), each vs a pure-python reference.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["red", "blue", "green"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(
    texts=st.lists(_text, min_size=1, max_size=6),
    n=st.integers(min_value=2, max_value=4),
)
def test_dup_ngram_fraction_matches_python(spark, texts, n):
    from shacl_dqa_prototype_spark.operators.dedup import dup_ngram_fraction

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_ngrams"], r["dup_ngrams"], r["dup_frac"])
        for r in dup_ngram_fraction(df, n=n).collect()
    }

    toks = {d: re.split(r"\s+", t.strip().lower()) for d, t in rows}
    sh = {
        d: [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
        for d, w in toks.items()
    }
    doc_freq: dict[str, int] = {}
    for d, ss in sh.items():
        for s in set(ss):
            doc_freq[s] = doc_freq.get(s, 0) + 1
    exp = {}
    for d, ss in sh.items():
        total = max(len(toks[d]) - n + 1, 0)
        dup = sum(1 for s in ss if doc_freq[s] > 1)
        exp[d] = (total, dup, round(dup / total, 6) if total else 0.0)
    assert got == exp, (texts, n)


_pii_frag = st.sampled_from([
    "hello world",
    "mail me at bob.smith+x@example.co.uk today",
    "call (555) 123 4567 now",
    "or +44 20 7946 0958 later",
    "server at 192.168.0.1 is up",
    "version 1.2.3.4 shipped",
    "no pii here at all",
])


@settings(max_examples=25, deadline=None)
@given(frags=st.lists(_pii_frag, min_size=1, max_size=4))
def test_redact_pii_matches_python_resub(spark, frags):
    from shacl_dqa_prototype_spark.operators.pipeline import (
        PII_PATTERNS,
        redact_pii,
    )

    text = ". ".join(frags)
    df = spark.createDataFrame([("d0", text)], ["doc_id", "text"])
    got = redact_pii(df).collect()[0]["redacted"]

    exp = text
    for pattern, token in PII_PATTERNS:
        exp = re.sub(pattern, token, exp)
    assert got == exp, text


@settings(max_examples=25, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=0, max_value=20),
                    min_size=1, max_size=10),
    seq_len=st.integers(min_value=2, max_value=8),
)
def test_pack_sequences_matches_python_cumsum(spark, tokens, seq_len):
    from pyspark.sql import functions as F

    from shacl_dqa_prototype_spark.operators.pipeline import pack_sequences

    rows = [(f"d{i}", t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    # pin every doc to one shard so the python reference (doc_id order,
    # running cumsum) is the exact layout
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["n_packs"])
        for r in pack_sequences(df, seq_len, shard_col=F.lit(0)).collect()
    }

    exp = {}
    cum = 0
    for d, t in sorted(rows):
        pack_id, off = cum // seq_len, cum % seq_len
        n_packs = 0 if t == 0 else (cum + t - 1) // seq_len - pack_id + 1
        exp[d] = (pack_id, off, n_packs)
        cum += t
    assert got == exp, (tokens, seq_len)
