"""Property-based cross-checks for the text-statistics operators and the
portable MinHash pipeline: signatures (min over per-seed md5 hashes of
distinct shingles), banded candidate pairs, the Gopher repetition signals
(sorted-array neighbor/run-length folds), corpus top-k vocabulary, and
the quality gate's named-reasons verdict — each vs pure python.
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["foo", "bar", "baz", "qux"])
_text = st.lists(_word, min_size=0, max_size=8).map(" ".join)


def _py_hash60(s: str, seed: int | None = None) -> int:
    base = s if seed is None else f"{s}\x1f{seed}"
    return int(hashlib.md5(base.encode()).hexdigest()[:15], 16)


def _py_shingles(text: str, n: int) -> set[str]:
    toks = re.split(r"\s+", text.strip().lower())
    out = {" ".join(toks[i:i + n])
           for i in range(0, max(len(toks) - n, 0) + 1)}
    return {s for s in out if s}


def _py_signature(text: str, n: int, num_hashes: int):
    sh = _py_shingles(text, n)
    if not sh:
        return None
    return [min(_py_hash60(s, i) for s in sh) for i in range(num_hashes)]


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=6))
def test_minhash_signature_matches_python(spark, texts):
    from shacl_dqa_prototype_spark.operators.dedup import minhash_signatures

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: list(r["signature"])
           for r in minhash_signatures(
               df, n=2, num_hashes=8, portable=True).collect()}
    exp = {d: _py_signature(t, 2, 8) for d, t in rows}
    exp = {d: s for d, s in exp.items() if s is not None}
    assert got == exp, texts


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_text, min_size=2, max_size=8))
def test_minhash_lsh_candidates_match_python_banding(spark, texts):
    from shacl_dqa_prototype_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    n, num_hashes, bands = 2, 8, 4
    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"])
           for r in minhash_lsh_candidates(
               df, n=n, num_hashes=num_hashes, bands=bands,
               portable=True).collect()}

    rpb = num_hashes // bands
    buckets: dict[str, list[int]] = {}
    for d, t in rows:
        sig = _py_signature(t, n, num_hashes)
        if sig is None:
            continue
        buckets[d] = [
            _py_hash60(",".join(str(sig[b * rpb + r]) for r in range(rpb)))
            for b in range(bands)
        ]
    ids = sorted(buckets)
    exp = {
        (a, b)
        for x, a in enumerate(ids)
        for b in ids[x + 1:]
        if any(ba == bb for ba, bb in zip(buckets[a], buckets[b]))
    }
    assert got == exp, texts


@settings(max_examples=20, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=5))
def test_repetition_stats_match_python(spark, texts):
    from shacl_dqa_prototype_spark.operators.textstats import repetition_stats

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_words"], r["dup_word_frac"],
                         r["top_bigram_frac"])
           for r in repetition_stats(df).collect()}

    for d, t in rows:
        w = re.split(r"\s+", t.strip()) if t.strip() else []
        n = len(w)
        singles = sum(1 for x in w if w.count(x) == 1)
        dup = (n - singles) / n if n else 0.0
        bigrams = [f"{w[i-1]} {w[i]}" for i in range(1, n)]
        top = (max(bigrams.count(b) for b in bigrams) / (n - 1)
               if n > 1 else 0.0)
        gn, gd, gt = got[d]
        assert gn == n and math.isclose(gd, dup, abs_tol=1e-12) \
            and math.isclose(gt, top, abs_tol=1e-12), (t, got[d], (n, dup, top))


@settings(max_examples=20, deadline=None)
@given(
    texts=st.lists(_text, min_size=1, max_size=6),
    top_k=st.integers(min_value=1, max_value=5),
    min_count=st.integers(min_value=1, max_value=3),
)
def test_vocab_top_tokens_match_python(spark, texts, top_k, min_count):
    from shacl_dqa_prototype_spark.operators.textstats import vocab_top_tokens

    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = [(r["token"], r["n"], r["rank"])
           for r in vocab_top_tokens(df, top_k=top_k, min_count=min_count)
           .orderBy("rank").collect()]

    counts: dict[str, int] = {}
    for t in texts:
        for tok in re.split(r"\s+", t.strip().lower()):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
    ranked = sorted(
        ((tok, c) for tok, c in counts.items() if c >= min_count),
        key=lambda x: (-x[1], x[0]))[:top_k]
    exp = [(tok, c, i + 1) for i, (tok, c) in enumerate(ranked)]
    assert got == exp, (texts, top_k, min_count)


@settings(max_examples=20, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=5))
def test_quality_gate_reasons_match_python(spark, texts):
    from shacl_dqa_prototype_spark.operators.textstats import quality_gate

    kw = dict(min_words=2, max_words=6, min_mean_word_len=2.0,
              max_mean_word_len=3.4, max_dup_word_frac=0.5)
    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_words"], r["keep"], r["reasons"])
           for r in quality_gate(df, **kw).collect()}

    for d, t in rows:
        w = re.split(r"\s+", t.strip()) if t.strip() else []
        n = len(w)
        mean_wl = (len(re.sub(r"\s+", "", t.strip())) / n) if n else None
        singles = sum(1 for x in w if w.count(x) == 1)
        dup = (n - singles) / n if n else 0.0
        padded = f" {t.lower()} "
        stops = sum(1 for s in (" the ", " and ", " of ", " to ", " a ")
                    if s in padded)
        fails = []
        if n < kw["min_words"]:
            fails.append("too_few_words")
        if n > kw["max_words"]:
            fails.append("too_many_words")
        if n > 0 and (mean_wl < kw["min_mean_word_len"]
                      or mean_wl > kw["max_mean_word_len"]):
            fails.append("word_len_out_of_band")
        if dup > kw["max_dup_word_frac"]:
            fails.append("dup_word_frac_high")
        if stops == 0:
            fails.append("no_stopwords")
        reasons = ",".join(fails)
        assert got[d] == (n, reasons == "", reasons), (t, got[d], reasons)


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=8), n=st.integers(2, 3))
def test_ngram_novelty_matches_python(spark, texts, n):
    """First-occurrence attribution vs a python scan in ascending doc_id
    order: per doc, distinct n-grams and how many it is the min-id
    carrier of."""
    from shacl_dqa_prototype_spark.operators.dedup import ngram_novelty

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_distinct"], r["novel"], r["novel_frac"])
           for r in ngram_novelty(df, n=n).collect()}
    def _full_windows(text: str) -> set[str]:
        # dup_ngram_fraction/ngram_novelty semantics: FULL windows only —
        # a doc shorter than n tokens has zero n-grams (unlike the
        # MinHash _py_shingles helper, which keeps the partial shingle)
        toks = re.split(r"\s+", text.strip().lower())
        if len(toks) < n:
            return set()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    seen: set[str] = set()
    exp = {}
    for d, t in sorted(rows):             # ascending doc_id = string order
        sh = _full_windows(t)
        novel = {s for s in sh if s not in seen}
        seen |= novel
        frac = round(len(novel) / len(sh), 6) if sh else 0.0
        exp[d] = (len(sh), len(novel), frac)
    assert got == exp, texts


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=8))
def test_unigram_logprob_matches_python(spark, texts):
    """tf-weighted mean log2 corpus-unigram probability vs a python
    counter over the same corpus; empty docs stay NULL."""
    from collections import Counter

    from shacl_dqa_prototype_spark.operators.textstats import (
        unigram_logprob,
    )

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
           for r in unigram_logprob(df).collect()}
    corpus = Counter()
    toks = {}
    for d, t in rows:
        toks[d] = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        corpus.update(toks[d])
    total = sum(corpus.values())
    for d, ws in toks.items():
        if not ws:
            assert got[d] == (0, None), (d, got[d])
            continue
        lp = round(
            sum(math.log2(corpus[w] / total) for w in ws) / len(ws), 6)
        n, g = got[d]
        assert n == len(ws)
        assert g is not None and abs(g - lp) <= 1e-6, (d, g, lp, texts)


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=8),
       top_k=st.integers(1, 4))
def test_tfidf_top_terms_matches_python(spark, texts, top_k):
    """Per-doc top-k by tf * (ln((1+N)/(1+df)) + 1) vs a python counter;
    ties break on the token string; empty docs emit nothing."""
    from collections import Counter

    from shacl_dqa_prototype_spark.operators.textstats import (
        tfidf_top_terms,
    )

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["doc_id"], r["rank"]): (r["token"], r["tfidf"])
           for r in tfidf_top_terms(df, top_k=top_k).collect()}
    toks = {d: [w for w in re.split(r"\s+", t.strip().lower()) if w]
            for d, t in rows}
    dfc = Counter()
    for ws in toks.values():
        dfc.update(set(ws))
    n_docs = len(rows)
    exp = {}
    for d, ws in toks.items():
        tf = Counter(ws)
        scored = sorted(
            ((w, tf[w] * (math.log((1.0 + n_docs) / (1.0 + dfc[w])) + 1.0))
             for w in tf),
            key=lambda p: (-p[1], p[0]))
        for rank, (w, s) in enumerate(scored[:top_k], start=1):
            exp[(d, rank)] = (w, round(s, 6))
    assert set(got) == set(exp), (texts, got, exp)
    for k in exp:
        assert got[k][0] == exp[k][0], (k, got[k], exp[k])
        assert abs(got[k][1] - exp[k][1]) <= 1e-6, (k, got[k], exp[k])


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=8),
       window=st.integers(1, 3))
def test_token_cooccurrence_matches_python(spark, texts, window):
    """Unordered within-window pair counts + PMI vs a python scan over
    the same token arrays; ranked by (count DESC, tok_a, tok_b)."""
    from collections import Counter

    from shacl_dqa_prototype_spark.operators.textstats import (
        token_cooccurrence,
    )

    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [(r["tok_a"], r["tok_b"], r["n_pairs"], r["pmi"], r["rank"])
           for r in sorted(token_cooccurrence(df, window=window, top_k=50)
                           .collect(), key=lambda r: r["rank"])]
    pc: Counter = Counter()
    uni: Counter = Counter()
    for _, t in rows:
        if not t.strip():
            continue
        ws = re.split(r"\s+", t.strip().lower())
        uni.update(ws)
        for i, x in enumerate(ws):
            for y in ws[i + 1:i + 1 + window]:
                pc[(min(x, y), max(x, y))] += 1
    total_pairs = sum(pc.values())
    total_toks = sum(uni.values())
    top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    exp = []
    for rank, ((a, b), n_ab) in enumerate(top, start=1):
        pmi = math.log((n_ab / total_pairs)
                       / ((uni[a] / total_toks) * (uni[b] / total_toks)))
        exp.append((a, b, n_ab, round(pmi, 6), rank))
    assert len(got) == len(exp), (texts, got, exp)
    for g, e in zip(got, exp):
        assert g[:3] == e[:3] and g[4] == e[4], (g, e, texts)
        assert abs(g[3] - e[3]) <= 1e-6, (g, e, texts)
