"""Property-based cross-checks for the determinism-critical operators:
global_shuffle (md5-derived shard + in-shard order must be re-derivable
on any engine/cluster — that IS the operator's contract), stratified
sampling (hash-threshold membership), and benchmark decontamination
(shared-shingle pair counts, incl. the short-doc single-shingle case).
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


_key = st.sampled_from([f"k{i:02d}" for i in range(12)])


@settings(max_examples=25, deadline=None)
@given(
    keys=st.lists(_key, min_size=1, max_size=12, unique=True),
    n_shards=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=3),
)
def test_global_shuffle_matches_python_md5_order(spark, keys, n_shards, seed):
    from shacl_dqa_prototype_spark.operators.pipeline import global_shuffle

    df = spark.createDataFrame([(k,) for k in keys], ["doc_id"])
    got = {r["doc_id"]: (r["shard"], r["pos"])
           for r in global_shuffle(df, n_shards=n_shards, seed=seed).collect()}

    placed = []
    for k in keys:
        h = _md5(f"{seed}|{k}")
        placed.append((int(h[:8], 16) % n_shards, h, k))
    exp = {}
    by_shard: dict[int, list] = {}
    for shard, h, k in placed:
        by_shard.setdefault(shard, []).append((h, k))
    for shard, rows in by_shard.items():
        for pos, (_, k) in enumerate(sorted(rows), start=1):
            exp[k] = (shard, pos)
    assert got == exp, (keys, n_shards, seed)


@settings(max_examples=25, deadline=None)
@given(
    rows=st.lists(st.tuples(st.sampled_from(["a", "b", "c"]), _key),
                  min_size=1, max_size=15),
    frac_a=st.sampled_from([0.0, 0.25, 0.5, 1.0]),
    frac_b=st.sampled_from([0.1, 0.9]),
)
def test_stratified_sample_matches_python_hash_rule(spark, rows, frac_a,
                                                    frac_b):
    from shacl_dqa_prototype_spark.operators.pipeline import stratified_sample

    rows = list(dict.fromkeys(rows))
    df = spark.createDataFrame(rows, ["stratum", "doc_id"])
    fractions = {"a": frac_a, "b": frac_b}  # stratum 'c' absent → dropped
    got = {(r["stratum"], r["doc_id"])
           for r in stratified_sample(df, "stratum", fractions).collect()}

    exp = set()
    for s, k in rows:
        if s not in fractions:
            continue
        u = int(_md5(f"{s}|{k}")[:4], 16) / 65536.0
        if u < fractions[s]:
            exp.add((s, k))
    assert got == exp, (rows, fractions)


_word = st.sampled_from(["ping", "pong", "zap"])
_text = st.lists(_word, min_size=0, max_size=8).map(" ".join)


def _py_shingles(text: str, n: int) -> set[str]:
    toks = re.split(r"\s+", text.strip().lower())
    out = {
        " ".join(toks[i:i + n])
        for i in range(0, max(len(toks) - n, 0) + 1)
    }
    return {s for s in out if s}


@settings(max_examples=25, deadline=None)
@given(
    corpus=st.lists(_text, min_size=1, max_size=5),
    evals=st.lists(_text, min_size=1, max_size=3),
    n=st.integers(min_value=2, max_value=3),
)
def test_ngram_contamination_matches_python_overlap(spark, corpus, evals, n):
    from shacl_dqa_prototype_spark.operators.dedup import ngram_contamination

    cdf = spark.createDataFrame(
        [(f"c{i}", t) for i, t in enumerate(corpus)], ["doc_id", "text"])
    edf = spark.createDataFrame(
        [(f"e{i}", t) for i, t in enumerate(evals)], ["doc_id", "text"])
    got = {(r["doc_id"], r["eval_id"]): r["shared_ngrams"]
           for r in ngram_contamination(cdf, edf, n=n).collect()}

    exp = {}
    for i, ct in enumerate(corpus):
        cs = _py_shingles(ct, n)
        for j, et in enumerate(evals):
            shared = len(cs & _py_shingles(et, n))
            if shared:
                exp[(f"c{i}", f"e{j}")] = shared
    assert got == exp, (corpus, evals, n)
