"""Property-based cross-checks for the analytics operators that previously
had only example-based tests: each Spark operator is compared against an
independent pure-Python reference implementation on hypothesis-generated
inputs, so the JVM-side expression trees (aggregate folds, range frames,
clamped binning, banded LSH) are pinned to their documented semantics —
not just to the few rows the oracle tables happen to contain.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

_key = st.sampled_from(["u1", "u2", "u3"])
_t = st.integers(min_value=0, max_value=40)
_etype = st.sampled_from(["view", "click", "cart", "purchase"])


# ---------------------------------------------------------------------------
# funnel_conversion vs a python subsequence-depth scan. Ties on ts are
# totalized by the operator's (ts, id, type) struct sort; the reference
# sorts the same triple so both sides agree on every input.
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    events=st.lists(st.tuples(_key, _t, _etype), min_size=1, max_size=20),
    steps=st.lists(_etype, min_size=1, max_size=4, unique=True),
)
def test_funnel_conversion_matches_python_scan(spark, events, steps):
    from shacl_dqa_prototype_spark.operators.features import funnel_conversion

    rows = [(i, k, float(t), e) for i, (k, t, e) in enumerate(events)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    got = {
        r["user_id"]: (r["n_events"], r["depth"], r["reached"])
        for r in funnel_conversion(df, steps).collect()
    }

    exp: dict[str, tuple[int, int, bool]] = {}
    by_key: dict[str, list[tuple[float, int, str]]] = {}
    for i, (k, t, e) in enumerate(events):
        by_key.setdefault(k, []).append((float(t), i, e))
    for k, evs in by_key.items():
        depth = 0
        for _, _, e in sorted(evs):
            if depth < len(steps) and e == steps[depth]:
                depth += 1
        exp[k] = (len(evs), depth, depth == len(steps))
    assert got == exp, (events, steps)


# ---------------------------------------------------------------------------
# value_histogram vs python clamped binning: counts must total the input
# and every value lands in the clamp-consistent bin, including values
# exactly on bin edges and outside [lo, hi).
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.floats(min_value=-50, max_value=150, allow_nan=False,
                      width=32),
        ),
        min_size=1, max_size=30,
    ),
    n_bins=st.integers(min_value=1, max_value=8),
)
def test_value_histogram_matches_python_binning(spark, vals, n_bins):
    from shacl_dqa_prototype_spark.operators.features import value_histogram

    lo, hi = 0.0, 100.0
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in vals], ["event_type", "value"])
    out = value_histogram(df, lo, hi, n_bins).collect()
    got = {(r["event_type"], r["bin"]): r["n"] for r in out}
    assert sum(got.values()) == len(vals)

    width = (hi - lo) / n_bins
    exp: dict[tuple[str, int], int] = {}
    for g, v in vals:
        b = min(max(math.floor((float(v) - lo) / width), 0), n_bins - 1)
        exp[(g, b)] = exp.get((g, b), 0) + 1
    assert got == exp, (vals, n_bins)
    # bin edges reported by the operator must match the formula
    for r in out:
        assert r["bin_lo"] == round(lo + r["bin"] * width, 6)
        assert r["bin_hi"] == round(lo + (r["bin"] + 1) * width, 6)


# ---------------------------------------------------------------------------
# rolling_window_features vs an O(n²) python scan: the RANGE frame on
# integer microseconds must include exactly the same-key events in
# [ts - window_s, ts], ties included, across arbitrary duplicates.
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    events=st.lists(st.tuples(_key, _t, st.integers(0, 9)),
                    min_size=1, max_size=20),
    window_s=st.integers(min_value=1, max_value=15),
)
def test_rolling_window_matches_python_scan(spark, events, window_s):
    import datetime as dt

    from shacl_dqa_prototype_spark.operators.features import (
        rolling_window_features,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, k, t0 + dt.timedelta(seconds=t), float(v))
        for i, (k, t, v) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    got = {
        r["event_id"]: (r[f"cnt_{window_s}s"], r[f"sum_value_{window_s}s"])
        for r in rolling_window_features(df, window_s).collect()
    }

    for i, (k, t, _) in enumerate(events):
        in_win = [
            (kk, tt, vv) for kk, tt, vv in events
            if kk == k and t - window_s <= tt <= t
        ]
        exp_cnt = len(in_win)
        exp_sum = round(float(sum(v for _, _, v in in_win)), 6)
        assert got[i] == (exp_cnt, exp_sum), (i, events, window_s)


# ---------------------------------------------------------------------------
# embedding_near_duplicates: precision is exact by construction (every
# candidate is cosine-verified) — assert emitted ⊆ brute-force pairs at
# the threshold; and identical vectors share every band signature, so an
# exact duplicate is ALWAYS recalled regardless of banding luck.
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    data=st.data(),
    n_vecs=st.integers(min_value=2, max_value=10),
    dup_pairs=st.integers(min_value=0, max_value=3),
)
def test_embedding_near_dup_precision_and_exact_recall(
        spark, data, n_vecs, dup_pairs):
    from shacl_dqa_prototype_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    dim = 8
    vecs = [
        [
            data.draw(st.floats(min_value=-1, max_value=1, allow_nan=False,
                                width=32), label=f"v{i}[{j}]")
            for j in range(dim)
        ]
        for i in range(n_vecs)
    ]
    # reject all-zero vectors: cosine is undefined for them and the
    # operator's nullif makes the comparison NULL (never emitted)
    vecs = [v if any(v) else [1.0] + v[1:] for v in vecs]
    # append exact duplicates of the first `dup_pairs` vectors
    for i in range(min(dup_pairs, n_vecs)):
        vecs.append(list(vecs[i]))

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )
    thr = 0.95
    got = {(r["id_a"], r["id_b"])
           for r in embedding_near_duplicates(
               df, threshold=thr, dim=dim).collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return num / (na * nb) if na and nb else None

    exact = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if (c := cos(vecs[i], vecs[j])) is not None and c >= thr - 1e-9
    }
    # precision: nothing below threshold survives the verify stage
    # (1e-9 slack: float32 ingestion vs python double reference)
    assert got <= exact, (got - exact, vecs)
    # exact-duplicate recall: identical vectors share every band
    for i in range(min(dup_pairs, n_vecs)):
        assert (i, n_vecs + i) in got, (i, vecs)


@settings(max_examples=15, deadline=None)
@given(
    data=st.data(),
    n_vecs=st.integers(min_value=2, max_value=10),
    n_groups=st.integers(min_value=1, max_value=3),
)
def test_centroid_cosine_matches_python(spark, data, n_vecs, n_groups):
    """Per-group mean vector + each member's cosine to it, vs a python
    reference over the same float32-ingested vectors."""
    from shacl_dqa_prototype_spark.operators.similarity import (
        centroid_cosine,
    )

    dim = 6
    vecs = [
        [
            data.draw(st.floats(min_value=-1, max_value=1, allow_nan=False,
                                width=32), label=f"v{i}[{j}]")
            for j in range(dim)
        ]
        for i in range(n_vecs)
    ]
    # all-zero vectors make the member cosine NULL (nullif) — keep them
    # out so the reference stays total; a zero-sum CENTROID is still
    # exercised (opposed vectors cancel)
    vecs = [v if any(v) else [1.0] + v[1:] for v in vecs]
    labels = [data.draw(st.integers(0, n_groups - 1), label=f"g{i}")
              for i in range(n_vecs)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], g)
         for i, (v, g) in enumerate(zip(vecs, labels))],
        ["vec_id", "embedding", "label"],
    )
    got = {r["vec_id"]: (r["label"], r["cos_centroid"])
           for r in centroid_cosine(df, group_col="label").collect()}
    import numpy as np

    f32 = [np.array(v, dtype=np.float32).astype(np.float64) for v in vecs]
    for g in set(labels):
        members = [i for i, lg in enumerate(labels) if lg == g]
        cent = np.mean([f32[i] for i in members], axis=0)
        cn = float(np.sqrt((cent * cent).sum()))
        for i in members:
            vn = float(np.sqrt((f32[i] * f32[i]).sum()))
            exp = (round(float(f32[i] @ cent) / (vn * cn), 3)
                   if cn else None)
            lab, got_cos = got[i]
            assert lab == g
            if exp is None:
                assert got_cos is None, (i, got_cos)
            else:
                assert got_cos is not None and abs(got_cos - exp) <= 2e-3, (
                    i, got_cos, exp, vecs, labels)
