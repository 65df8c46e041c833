"""Property-based cross-checks for the retrieval / pipeline operators:
BM25 scoring, sliding-window chunking, and quality-policy keep-best
canonical selection, each vs an independent pure-python reference on
hypothesis-generated corpora (empty docs, all-stopword queries, short
final windows, quality ties — shapes the oracle tables rarely hit).
"""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["apple", "banana", "cherry", "date"])
_text = st.lists(_word, min_size=0, max_size=10).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(
    texts=st.lists(_text, min_size=1, max_size=8),
    query=st.lists(_word, min_size=1, max_size=3, unique=True),
)
def test_bm25_matches_python_reference(spark, texts, query):
    from shacl_dqa_prototype_spark.operators.textstats import bm25_scores

    k1, b = 1.2, 0.75
    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, query, k1=k1, b=b).collect()}

    toks = {
        d: (re.split(r"\s+", t.strip().lower()) if t.strip() else [])
        for d, t in rows
    }
    n_docs = len(rows)
    avgdl = sum(len(w) for w in toks.values()) / n_docs
    dfreq = {q: sum(1 for w in toks.values() if q in w) for q in query}
    exp = {}
    for d, w in toks.items():
        s = 0.0
        for q in query:
            tf = w.count(q)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n_docs - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if any(q in w for q in query):
            exp[d] = round(s, 6)
    assert got.keys() == exp.keys(), (texts, query)
    for d in exp:
        assert abs(got[d] - exp[d]) <= 2e-6, (d, got[d], exp[d], texts, query)


@settings(max_examples=25, deadline=None)
@given(
    words=st.lists(_word, min_size=0, max_size=25),
    chunk_tokens=st.integers(min_value=2, max_value=8),
    overlap=st.integers(min_value=0, max_value=7),
)
def test_chunk_documents_matches_python_windows(spark, words, chunk_tokens,
                                                overlap):
    from shacl_dqa_prototype_spark.operators.pipeline import chunk_documents

    if overlap >= chunk_tokens:
        overlap = chunk_tokens - 1
    df = spark.createDataFrame([("d0", " ".join(words))], ["doc_id", "text"])
    got = {
        (r["chunk_id"], r["start_token"], r["n_chunk_tokens"], r["chunk"])
        for r in chunk_documents(df, chunk_tokens, overlap).collect()
    }

    stride = chunk_tokens - overlap
    exp = {
        (i, s, min(chunk_tokens, len(words) - s),
         " ".join(words[s:s + chunk_tokens]))
        for i, s in enumerate(range(0, len(words), stride))
    }
    assert got == exp, (words, chunk_tokens, overlap)


_doc = st.sampled_from([f"d{i}" for i in range(6)])


@settings(max_examples=25, deadline=None)
@given(
    pairs=st.lists(st.tuples(_doc, _doc), min_size=1, max_size=10),
    quals=st.lists(st.integers(min_value=0, max_value=3),
                   min_size=6, max_size=6),
)
def test_keep_best_per_cluster_matches_python_policy(spark, pairs, quals):
    from shacl_dqa_prototype_spark.operators.dedup import (
        dedup_clusters,
        keep_best_per_cluster,
    )

    pdf = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    qdf = spark.createDataFrame(
        [(f"d{i}", float(q)) for i, q in enumerate(quals)],
        ["doc_id", "quality"])
    got = {(r["doc_id"], r["keeper"], r["keep"])
           for r in keep_best_per_cluster(dedup_clusters(pdf), qdf).collect()}

    parent: dict[str, str] = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    clustered = set()
    for a, b in pairs:
        if a == b:
            continue
        clustered |= {a, b}
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    q_of = {f"d{i}": float(q) for i, q in enumerate(quals)}
    by_root: dict[str, list[str]] = {}
    for d in clustered:
        by_root.setdefault(find(d), []).append(d)
    exp = set()
    for members in by_root.values():
        keeper = min(members, key=lambda d: (-q_of[d], d))
        for d in members:
            exp.add((d, keeper, d == keeper))
    assert got == exp, (pairs, quals)
