"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All JVM-native expressions except the rolling-hash
fingerprint (vectorized pandas UDF over Arrow batches).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tiny language marker lists (n-gram/stopword heuristic). Deterministic,
# engine-portable (pure CASE/instr logic). Declared heuristic, not a
# production langid: 12 languages, 3 high-frequency function words each,
# ASCII-only so no engine disagrees on normalization. Shared markers
# (" de ", " la ") are fine — scores compete and argmax decides.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " de "],
    "de": [" der ", " und ", " das "],
    "fr": [" le ", " et ", " la "],
    "it": [" il ", " che ", " di "],
    "pt": [" uma ", " com ", " para "],
    "nl": [" het ", " een ", " van "],
    "sv": [" och ", " att ", " det "],
    "pl": [" jest ", " nie ", " czy "],
    "tr": [" bir ", " ve ", " bu "],
    "id": [" yang ", " dan ", " itu "],
    "ro": [" este ", " din ", " pentru "],
}

BPE_ISH_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish regex piece count."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    pieces = F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_RX), 0))
    return docs.select(
        F.col("doc_id"),
        F.when(F.length(F.trim(t)) == 0, 0).otherwise(ws).alias("n_tokens_ws"),
        pieces.alias("n_tokens_bpe"),
    )


def quality_score(
    docs: DataFrame, text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]:
    length band, punctuation ratio, stopword presence ratio.

    ``passthrough`` columns ride along unchanged so downstream group-bys
    (e.g. per-source curation) stay on this single scan instead of
    re-joining on doc_id."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    # same empty-doc guard as token_count: split('') yields [''] (size 1),
    # phantom tokens for every empty/whitespace-only doc
    n_tokens = F.when(F.length(F.trim(t)) == 0, 0).otherwise(
        F.size(F.split(F.trim(t), r"\s+")))
    stop_hits = F.lit(0)
    for w in (" the ", " and ", " of ", " to ", " a "):
        stop_hits = stop_hits + F.when(
            F.contains(F.concat(F.lit(" "), F.lower(t), F.lit(" ")), F.lit(w)), 1
        ).otherwise(0)
    punct_ratio = n_punct / F.nullif(n_chars.cast("double"), F.lit(0.0))
    length_ok = (n_chars >= 50) & (n_chars <= 10000)
    score = (
        F.when(length_ok, 0.4).otherwise(0.0)
        + F.when(punct_ratio <= 0.1, 0.3).otherwise(0.0)
        + (stop_hits.cast("double") / 5.0) * 0.3
    )
    return docs.select(
        F.col("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        stop_hits.alias("stopword_hits"),
        F.round(score, 6).alias("quality"),
        *[F.col(c) for c in passthrough],
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word scoring heuristic: per language, count marker hits;
    argmax with a deterministic tie-break — the alphabetically LAST
    language among the tied ones wins ('und' if no hits). The SQL oracle
    mirrors this exact order, so it is part of the pinned contract."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    entries = []
    for lang in sorted(LANG_MARKERS):
        s = F.lit(0)
        for m in LANG_MARKERS[lang]:
            # occurrence count of marker m
            occ = (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit("")))) / len(m)
            s = s + occ
        entries.append(F.struct(s.cast("double").alias("s"), F.lit(lang).alias("lang")))
    # argmax via struct ordering: array_max compares score first, then the
    # language string — so ties go to the alphabetically LAST language,
    # exactly the order the SQL oracle pins. A single array_max keeps the
    # generated code small; the previous 12-deep nested-WHEN chain had
    # Catalyst inlining every score expression per nesting level, blowing
    # whole-stage codegen past the JVM's 64 KB method limit (interpreted
    # fallback, ~10x slower).
    out = docs.select(F.col("doc_id"), F.array_max(F.array(*entries)).alias("best"))
    return out.select(
        "doc_id",
        F.when(F.col("best.s") > 0.0, F.col("best.lang"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
    )


_FP_MOD = (1 << 61) - 1  # Mersenne prime: x mod M = (x & M) + (x >> 61)
_FP_BASE = 257


def _np_mulmod(a, b):
    """Vectorized (a * b) mod 2^61-1 for uint64 arrays a, b < M.

    Splits both operands into 31/30-bit limbs so every partial product
    fits uint64, then folds with the Mersenne identities 2^61 ≡ 1,
    2^62 ≡ 2 (mod M)."""
    import numpy as np

    # NB: scalar operands are plain Python ints on purpose — a np.uint64
    # scalar forces numpy onto a ~100x slower ufunc path for >>/& on
    # uint64 arrays, while int scalars keep the dtype and the fast loop.
    M = _FP_MOD
    MASK31 = (1 << 31) - 1
    MASK30 = (1 << 30) - 1
    a1, a0 = a >> 31, a & MASK31
    b1, b0 = b >> 31, b & MASK31
    # a*b = a1*b1*2^62 + (a1*b0 + a0*b1)*2^31 + a0*b0
    m = a1 * b0 + a0 * b1                      # < 2^62
    m = (m & M) + (m >> 61)
    m = np.where(m >= M, m - M, m)             # < M
    mid = ((m & MASK30) << 31) + (m >> 30)     # m*2^31 mod M
    hi2 = (a1 * b1) << 1                       # a1*b1*2^62 ≡ 2*a1*b1, < 2^61
    lo = a0 * b0                               # < 2^62
    lo = (lo & M) + (lo >> 61)
    r = hi2 + mid + lo                         # < 2^63
    r = (r & M) + (r >> 61)
    return np.where(r >= M, r - M, r)


def _np_powmod_table(base: int, k: int):
    """[base^0, …, base^k] mod 2^61-1 as uint64, via O(log k) blocked
    doubling (each block is one vectorized mulmod)."""
    import numpy as np

    P = np.empty(k + 1, dtype=np.uint64)
    P[0] = 1
    filled = 1
    b = np.array([base % _FP_MOD], dtype=np.uint64)
    while filled <= k:
        anchor = _np_mulmod(P[filled - 1 : filled], b)  # base^filled
        take = min(filled, k + 1 - filled)
        P[filled : filled + take] = _np_mulmod(P[:take], anchor)
        filled += take
    return P


def fingerprint(docs: DataFrame, text_col: str = "text", window: int = 16) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling (Karp–Rabin) hash
    over `window`-byte character windows (full-string hash for shorter
    docs, 0 for empty). Fully numpy-vectorized over the flat concatenated
    batch bytes — no per-character (or even per-document) Python loop in
    the hash path: window hash(i) = (C[i+w-1] - C[i-1]) · BASE^-(end-i-w)
    from one split-limb prefix-sum over positional digits
    s[j]·BASE^(end-1-j), then a per-document `minimum.reduceat`."""

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fingerprint_batch(pdf, text_col, window)

    # carry the input's doc_id type through — a hard-coded 'long' crashed
    # the Arrow conversion for string-keyed corpora (every other textstats
    # operator is id-type-generic)
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType([
        docs.schema["doc_id"],
        StructField("fingerprint", LongType(), True),
    ])
    return docs.select("doc_id", text_col).mapInPandas(fp, schema=out_schema)


# Docs are processed in small groups so the dozen flat uint64
# intermediates stay cache-resident — the kernel is memory-bandwidth-
# bound, and DRAM-sized temporaries cost ~5x over cache-sized ones.
# 16 KiB of input ⇒ 128 KiB per scratch array, ~1.5 MiB live: L2-sized.
# (Measured sweep on the longdoc micro-bench with the doubling kernel:
# 2^14 ≈ 52 MB/s, 2^16 ≈ 46, 2^18 ≈ 37.)
_FP_CHUNK = 1 << 14


# Retention bound for the table cache: tables above this capacity are
# built for the batch and released with it, NOT cached — a single 100 MB
# outlier document must not pin outlier-sized buffers (~150 B per input
# byte) in every reused Python worker for the rest of its life. 2^20
# chars ≈ 160 MB of live tables+scratch is the cap on what is retained;
# the common chunk-sized capacity (2^14 → ~2.5 MB) always stays cached.
_FP_CACHE_MAX_CAP = 1 << 20


class _FpTables:
    """Per-process cache of the power/inverse-power tables and kernel
    scratch. Profiling showed the per-batch _np_powmod_table rebuilds plus
    the reversed/split table copies cost ~20% of the batch — they depend
    only on (base, capacity), so they are computed once at the high-water
    capacity (bounded by _FP_CACHE_MAX_CAP) and sliced per batch."""

    _cache: dict[int, "_FpTables"] = {}

    def __init__(self, cap: int):
        import numpy as np

        base_inv = pow(_FP_BASE, _FP_MOD - 2, _FP_MOD)
        self.cap = cap
        self.P = _np_powmod_table(_FP_BASE, cap)
        PI = _np_powmod_table(base_inv, cap)
        self.PI1, self.PI0 = PI >> 31, PI & ((1 << 31) - 1)
        PR = self.P[::-1].copy()
        self.PR1 = PR >> 31
        self.PR0 = PR & ((1 << 31) - 1)
        self.PIR1 = self.PI1[::-1].copy()
        self.PIR0 = self.PI0[::-1].copy()
        self.scratch = _FpScratch(cap)

    @classmethod
    def for_cap(cls, cap: int) -> "_FpTables":
        got = cls._cache.get(_FP_BASE)
        if got is not None and got.cap >= cap:
            return got
        # grow in powers of two above the floor so repeated slightly-
        # longer documents don't rebuild every batch
        new = cls(max(_FP_CHUNK, 1 << (cap - 1).bit_length()))
        if new.cap <= _FP_CACHE_MAX_CAP:
            cls._cache[_FP_BASE] = new
        return new


class _FpScratch:
    """Reusable chunk-sized buffers for _fp_kernel. Without these, every
    numpy temporary is a fresh ≥256 KB allocation that glibc serves via
    mmap/munmap — the page-fault churn costs ~4x more than the arithmetic."""

    def __init__(self, cap: int):
        import numpy as np

        self.cap = cap
        self.idx = np.arange(cap, dtype=np.int64)
        self.i64 = [np.empty(cap, dtype=np.int64) for _ in range(2)]
        self.u64 = [np.empty(cap, dtype=np.uint64) for _ in range(9)]


def _fp_kernel_uniform(S8, ne_lens, window: int, PR1, PR0, PIR1, PIR0,
                       cap, sc):
    """Fast path of _fp_kernel for chunks where every doc is ≥ window
    bytes: digits use a CHUNK-global exponent BASE^(Lc-1-j), so the
    pre-reversed power and inverse-power tables (pre-split into 31-bit
    limbs at cache-build time) are read as forward contiguous views — no
    gathers, no np.repeat, no per-position index arrays, no per-batch
    limb splits. Window sums come from shifted-add DOUBLING — log2(w)
    SIMD add passes with bound-tracked Mersenne folds — instead of the
    split-limb prefix-sum pair: np.cumsum's sequential scalar loop
    measured ~8x the cost of a vector add pass, and the doubling needs
    no limb split at all. Doc boundaries only surface in the final
    paired-reduceat ranges (windows that straddle a boundary produce
    garbage and are excluded there)."""
    import numpy as np

    M = _FP_MOD
    MASK30 = (1 << 30) - 1
    MASK31 = (1 << 31) - 1
    L = S8.shape[0]
    w = window
    ends = np.cumsum(ne_lens)
    starts = ends - ne_lens
    S, lo, hi, A, T, U, W, t0, t1 = (b[:L] for b in sc.u64)
    np.copyto(S, S8, casting="unsafe")
    # digit A[j] = s[j] * BASE^(L-1-j): PR[cap-k] = BASE^k, so the needed
    # powers are the forward slice PR[cap-L+1 : cap+1]
    np.multiply(PR1[cap - L + 1 : cap + 1], S, out=hi)  # < 2^38
    np.multiply(PR0[cap - L + 1 : cap + 1], S, out=lo)  # < 2^39
    np.right_shift(hi, 30, out=A)
    hi &= MASK30
    hi <<= 31
    A += hi
    A += lo                                   # < 2^62

    def _fold(x):
        """x ← x mod-equivalent < 2^61 + small (2^61 ≡ 1)."""
        tv = t0[: x.shape[0]]
        np.right_shift(x, 61, out=tv)
        np.bitwise_and(x, M, out=x)
        x += tv

    _fold(A)                                  # < 2^61 + 2

    # ---- window sums by shifted-add doubling ------------------------------
    # P_{2k}[i] = P_k[i] + P_k[i+k]; per set bit of w, acc[i] += P_k[i+off].
    # Exact upper bounds are tracked in Python ints; a fold is inserted
    # only when the next uint64 add could wrap. Entries past each array's
    # valid range hold garbage — excluded by nv and the reduceat ranges.
    nv = L - w + 1
    free = [T, U]
    cur, cb, k = A, (1 << 61) + 2, 1
    acc = None
    ab = off = 0
    rem = w
    while True:
        if rem & 1:
            if acc is None:
                if rem == 1:
                    acc, ab = cur, cb         # cur IS the window sum
                else:
                    acc = free.pop(0)
                    np.copyto(acc[:L], cur)
                    ab = cb
            else:
                if ab + cb >= 1 << 64:
                    _fold(acc[:L])
                    ab = (1 << 61) + (ab >> 61) + 1
                if ab + cb >= 1 << 64:
                    _fold(cur[:L])
                    cb = (1 << 61) + (cb >> 61) + 1
                n = L - off - k + 1
                np.add(acc[:n], cur[off : off + n], out=acc[:n])
                ab += cb
            off += k
        rem >>= 1
        if not rem:
            break
        if cb + cb >= 1 << 64:
            _fold(cur[:L])
            cb = (1 << 61) + (cb >> 61) + 1
        dst = free.pop(0)
        np.add(cur[: L - k], cur[k:L], out=dst[: L - k])
        if cur is not acc:
            free.append(cur)
        cur, cb, k = dst, cb + cb, k * 2
    if ab >= 1 << 62:
        _fold(acc[:nv])                       # the 31-bit split needs < 2^62
        ab = (1 << 61) + (ab >> 61) + 1
    win = acc[:nv]

    # window hash = window sum · BASE^-(L-i-w): PIR[cap-L+w+i] = PI[L-w-i]
    others = [b for b in (A, T, U) if b is not acc]
    a1, a0 = others[0][:nv], others[1][:nv]
    t0, t1 = t0[:nv], t1[:nv]
    np.right_shift(win, 31, out=a1)           # < 2^31
    np.bitwise_and(win, MASK31, out=a0)
    b1 = PIR1[cap - L + w : cap - L + w + nv]
    b0 = PIR0[cap - L + w : cap - L + w + nv]
    # Karatsuba: cross = (a1+a0)(b1+b0) − a1b1 − a0b0 — three 64-bit
    # products instead of four (the mul is the scalar-loop bottleneck;
    # the two extra adds/subs are SIMD-cheap)
    m, r = S[:nv], W[:nv]
    ab11, ab00 = hi[:nv], lo[:nv]             # digit limb buffers are free
    np.multiply(a1, b1, out=ab11)             # < 2^60
    np.multiply(a0, b0, out=ab00)             # < 2^62
    a1 += a0                                  # < 2^32
    np.add(b1, b0, out=t1)                    # < 2^32
    np.multiply(a1, t1, out=m)                # < 2^64
    m -= ab11
    m -= ab00                                 # cross < 2^62; fold-free rot
    np.right_shift(m, 30, out=r)
    m &= MASK30
    m <<= 31
    r += m                                    # mid: < 2^61+2^33
    ab11 <<= 1                                # ·2^62 ≡ 2·a1b1; < 2^61
    r += ab11
    r += ab00                                 # + a0·b0 < 2^62; total < 2^63.6
    np.right_shift(r, 61, out=t0)
    r &= M
    r += t0
    np.subtract(r, M, out=t0)
    np.minimum(r, t0, out=r)                  # branch-free canonicalize
    inds = np.empty(2 * len(ends), dtype=np.int64)
    inds[0::2] = starts
    inds[1::2] = ends - w + 1
    if inds[-1] >= nv:
        inds = inds[:-1]
    return np.minimum.reduceat(r, inds)[0::2]


def _fp_kernel(S8, ne_lens, window: int, P, PI1, PI0, sc: _FpScratch):
    """Min rolling-KR hash per doc over the flat uint8 byte array S8 of
    concatenated docs with lengths ne_lens (all ≥ 1). Exact mod-2^61-1
    arithmetic; returns one uint64 per doc.

    Bandwidth-tuned: positional digits via a small-multiplier split
    (s ≤ 255), window sums as differences of raw limb prefix-sums (no mod
    on the prefix itself), the inverse-power table pre-split into 31-bit
    limbs, folds skipped wherever the Mersenne identity tolerates
    non-canonical operands, per-doc mins via paired `reduceat` offsets
    over the valid window range, and every chunk-sized temporary written
    into preallocated scratch (`out=`)."""
    import numpy as np

    M = _FP_MOD  # int scalars: see _np_mulmod note on the uint64 slow path
    MASK30 = (1 << 30) - 1
    MASK31 = (1 << 31) - 1
    MASK29 = (1 << 29) - 1
    MASK32 = (1 << 32) - 1
    L = S8.shape[0]
    ends = np.cumsum(ne_lens)
    starts = ends - ne_lens
    idx = sc.idx[:L]
    end_rep = np.repeat(ends, ne_lens)
    e2, e_idx = sc.i64[0][:L], sc.i64[1][:L]
    S, Pg, hi, A, C_hi, C_lo, win, t0, t1 = (b[:L] for b in sc.u64)
    np.copyto(S, S8, casting="unsafe")
    # positional digit A[j] = s[j] * BASE^(end-1-j)
    np.subtract(end_rep, idx, out=e2)
    e2 -= 1
    np.take(P, e2, out=Pg)
    np.right_shift(Pg, 31, out=hi)
    hi *= S                                   # < 2^38
    Pg &= MASK31
    Pg *= S                                   # lo: < 2^39
    np.right_shift(hi, 30, out=A)
    hi &= MASK30
    hi <<= 31
    A += hi                                   # hi·2^31 folded (2^61 ≡ 1)
    A += Pg                                   # < 2^62 — limbs sized below
    # raw split-limb prefix sums; window sums are limb differences, so the
    # prefix itself never needs mod reduction (limb partials < 2^63 for
    # any chunk < 2^32 bytes)
    np.right_shift(A, 32, out=t0)
    np.cumsum(t0, out=C_hi)                   # step < 2^30
    A &= MASK32
    np.cumsum(A, out=C_lo)
    w_d = np.minimum(ne_lens, window)
    w_rep = np.repeat(w_d, ne_lens)
    np.add(idx, w_rep, out=e_idx)
    e_idx -= 1
    np.minimum(e_idx, L - 1, out=e_idx)
    win_hi, win_lo = hi, Pg                   # digit buffers are free now
    np.take(C_hi, e_idx, out=win_hi)
    win_hi[1:] -= C_hi[:-1]                   # ≤ w·2^30: exact
    np.take(C_lo, e_idx, out=win_lo)
    win_lo[1:] -= C_lo[:-1]                   # ≤ w·2^32: exact
    # window sum mod M = win_hi·2^32 + win_lo, folded via 2^61 ≡ 1
    np.right_shift(win_hi, 29, out=win)
    win_hi &= MASK29
    win_hi <<= 32
    win += win_hi
    win += win_lo                             # < 2^62
    np.right_shift(win, 61, out=t0)
    win &= M
    win += t0                                 # < 2^61+2
    # true window hash = window sum · BASE^-(end-i-w); positions past the
    # last valid window start produce garbage (possibly via a negative,
    # i.e. wrapped, table index) but are excluded by the reduceat ranges
    np.subtract(end_rep, idx, out=e2)
    e2 -= w_rep
    a1, a0 = C_hi, C_lo                       # prefix buffers are free now
    np.right_shift(win, 31, out=a1)
    np.bitwise_and(win, MASK31, out=a0)
    b1, b0 = win_hi, win_lo                   # and the win limb buffers
    np.take(PI1, e2, out=b1, mode="wrap")
    np.take(PI0, e2, out=b0, mode="wrap")
    m, r = S, A                               # and the byte/digit buffers
    np.multiply(a1, b0, out=m)
    b0 *= a0
    np.multiply(a0, b1, out=t1)
    m += t1                                   # < 2^62; fold-free: the rot
    np.right_shift(m, 30, out=r)              # identity holds ∀ m
    m &= MASK30
    m <<= 31
    r += m                                    # mid: < 2^61+2^32
    a1 *= b1
    a1 <<= 1                                  # ·2^62 ≡ ·2; < 2^61+2^31
    r += a1
    r += b0                                   # + a0·b0 < 2^62; total < 2^63.5
    np.right_shift(r, 61, out=t0)
    r &= M
    r += t0
    # branch-free canonicalize: for r < M, r-M wraps above 2^63 > r
    np.subtract(r, M, out=t0)
    np.minimum(r, t0, out=r)
    # paired offsets: even entries are doc starts, odd entries the end of
    # each doc's valid-window range; even-position results are the answers
    inds = np.empty(2 * len(ends), dtype=np.int64)
    inds[0::2] = starts
    inds[1::2] = ends - w_d + 1
    if inds[-1] >= L:
        inds = inds[:-1]                      # last doc valid through L-1
    return np.minimum.reduceat(r, inds)[0::2]


def _fingerprint_batch(pdf: pd.DataFrame, text_col: str, window: int) -> pd.DataFrame:
    """One Arrow batch of the fingerprint kernel (module-level so tests can
    exercise it without a Spark session)."""
    import numpy as np

    doc_ids = pdf["doc_id"].to_numpy()
    bs = [t.encode("utf-8") if isinstance(t, str) else b"" for t in pdf[text_col]]
    lens = np.array([len(b) for b in bs], dtype=np.int64)
    out = np.zeros(len(bs), dtype=np.int64)  # empty docs → 0
    nonempty = lens > 0
    if nonempty.any():
        ne_lens = lens[nonempty]
        S_all = np.frombuffer(b"".join(bs), dtype=np.uint8)
        ne_ends = np.cumsum(ne_lens)
        ne_starts = ne_ends - ne_lens
        # group docs into ~_FP_CHUNK-byte runs by start offset
        group_of = ne_starts // _FP_CHUNK
        _, first_doc = np.unique(group_of, return_index=True)
        doc_bounds = np.append(first_doc, len(ne_lens))
        group_len = (
            ne_ends[doc_bounds[1:] - 1] - ne_starts[doc_bounds[:-1]]
        )
        # uniform kernel indexes powers by chunk-global exponent → tables
        # sized to the largest chunk, not the largest doc; cached across
        # batches at the high-water capacity
        tb = _FpTables.for_cap(int(group_len.max()))
        cap, sc = tb.cap, tb.scratch
        has_short = ne_lens < window
        fps = np.empty(len(ne_lens), dtype=np.uint64)
        for g in range(len(first_doc)):
            d0, d1 = int(doc_bounds[g]), int(doc_bounds[g + 1])
            b0, b1 = int(ne_starts[d0]), int(ne_ends[d1 - 1])
            if has_short[d0:d1].any():
                fps[d0:d1] = _fp_kernel(
                    S_all[b0:b1], ne_lens[d0:d1], window,
                    tb.P, tb.PI1, tb.PI0, sc
                )
            else:
                fps[d0:d1] = _fp_kernel_uniform(
                    S_all[b0:b1], ne_lens[d0:d1], window,
                    tb.PR1, tb.PR0, tb.PIR1, tb.PIR0, cap, sc,
                )
        out[nonempty] = fps.astype(np.int64)
    return pd.DataFrame({"doc_id": doc_ids, "fingerprint": out})


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    adapted to single-line docs): per document,

    - ``dup_word_frac``   — fraction of word occurrences whose word appears
      more than once in the document,
    - ``top_bigram_frac`` — occurrences of the most frequent word bigram as
      a fraction of all bigram positions.

    Scale shape: ZERO shuffles — both signals only need the row's own
    words, so they are computed with higher-order array expressions
    (array_sort + run-length fold), O(n log n) per row, map-side only,
    fully JVM-side (higher-order functions evaluate outside whole-stage
    codegen but never touch Python). The distributed-groupBy formulation (explode →
    groupBy(doc, word)) would shuffle every token; this never leaves the
    row. Reference scope: quality filtering is part of the training-data
    pipeline suite, not the rdflib reference."""
    t = F.col(text_col)
    d = docs.select(
        "doc_id",
        F.when(F.length(F.trim(t)) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(F.trim(t), r"\s+")).alias("w"))
    d = d.withColumn("n", F.size("w")).withColumn("sw", F.array_sort("w"))
    # words appearing exactly once = positions in the sorted array that
    # differ from both neighbours; dup occurrences = n - singles.
    # Iterate the ARRAY with an index-aware lambda, never sequence(0, n-1):
    # Spark's sequence is DESCENDING when start > stop, so n = 0 yields
    # [0, -1] and the lambda indexes an empty array — and the guard
    # `when(n > 0, …)` does NOT protect it, because codegen subexpression
    # elimination hoists a SHARED subexpression out of its CASE branch
    # (quality_gate crashed exactly this way on empty docs). filter over
    # sw is total: empty array ⇒ lambda never runs; the ORs keep the
    # neighbour accesses in bounds.
    d = d.withColumn("n_single", F.expr(
        "size(filter(sw, (x, i) -> "
        "(i = 0 OR x != sw[i-1]) AND (i = n - 1 OR x != sw[i+1])))"))
    # longest run in the sorted bigram list = max bigram multiplicity;
    # same total-function discipline: iterate the tail slice (empty for
    # n <= 1) instead of sequence(1, n - 1) (= [1, 0] for n = 1)
    d = d.withColumn("bg", F.expr(
        "array_sort(transform(slice(w, 2, greatest(n - 1, 0)), "
        "(x, i) -> concat(w[i], ' ', x)))"))
    d = d.withColumn("top_bg", F.expr(
        "aggregate(bg, struct(cast(null as string) as prev, "
        "0L as run, 0L as best), "
        "(acc, x) -> struct(x as prev, "
        "IF(x = acc.prev, acc.run + 1, 1L) as run, "
        "greatest(acc.best, IF(x = acc.prev, acc.run + 1, 1L)) as best), "
        "acc -> acc.best)"))
    n = F.col("n").cast("double")
    n_bg = F.greatest(F.col("n") - 1, F.lit(0)).cast("double")
    return d.select(
        "doc_id",
        F.col("n").alias("n_words"),
        F.when(F.col("n") > 0, (n - F.col("n_single")) / n)
        .otherwise(0.0).alias("dup_word_frac"),
        F.when(F.col("n") > 1, F.col("top_bg") / n_bg)
        .otherwise(0.0).alias("top_bigram_frac"),
    )


def length_profile(
    docs: DataFrame,
    group_col: str = "source",
    length_col: str = "n_chars",
    exact: bool = True,
) -> DataFrame:
    """Per-group document-length profile: count, min/max, mean, and the
    p50/p90/p99 length percentiles — the numbers a packing / truncation
    config is derived from.

    ``exact=True`` uses the exact `percentile` aggregate (sort-buffered per
    group — fine when groups are few and bounded, and value-identical to
    the SQL oracle's quantile_cont). At 100 TB with high-cardinality
    groups, pass ``exact=False``: `approx_percentile` (t-digest style
    sketch, bounded memory, mergeable map-side) — the standard
    exactness/scale trade, chosen by the caller."""
    ln = F.col(length_col).cast("long")
    pct = (F.percentile(ln, F.lit([0.5, 0.9, 0.99])) if exact
           else F.approx_percentile(ln, F.lit([0.5, 0.9, 0.99]), F.lit(10000)))
    return (
        docs.groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.min(ln).alias("min_len"),
            F.max(ln).alias("max_len"),
            (F.sum(ln) / F.count("*")).alias("mean_len"),
            pct.alias("_p"),
        )
        .select(
            group_col, "n_docs", "min_len", "max_len", "mean_len",
            F.col("_p")[0].cast("double").alias("p50_len"),
            F.col("_p")[1].cast("double").alias("p90_len"),
            F.col("_p")[2].cast("double").alias("p99_len"),
        )
    )


def vocab_top_tokens(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
    min_count: int = 2,
) -> DataFrame:
    """Corpus token-frequency table: the top-``top_k`` whitespace tokens
    (lowercased) with corpus count ≥ ``min_count`` — the statistic a
    tokenizer-training run (BPE/unigram seed vocab) starts from.

    Scale shape: explode stays map-side in codegen; the groupBy benefits
    from partial (map-side combine) aggregation, so the shuffle carries
    one row per distinct token per task, not per occurrence. The global
    top-k is orderBy+limit, which Spark executes as TakeOrdered (per-
    partition heap + driver merge of k rows), never a full sort. The rank
    window runs on ≤ top_k rows — a single bounded partition by design.
    Tie-break is (count DESC, token ASC), fully deterministic."""
    t = F.lower(F.trim(F.col(text_col)))
    toks = (
        docs.filter(F.length(t) > 0)
        .select(F.explode(F.split(t, r"\s+")).alias("token"))
        .filter(F.length("token") > 0)
    )
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(top_k)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top.select("token", "n", F.row_number().over(w).cast("int").alias("rank"))


# Gopher-style rule bundle (Rae et al. 2021 table A1, adapted to the
# single-line synthetic corpus). Rule names are emitted in this order so
# the reasons string is deterministic. Thresholds are constructor args so
# a real pipeline tunes them per corpus.
QUALITY_GATE_RULES = (
    "too_few_words", "too_many_words", "word_len_out_of_band",
    "dup_word_frac_high", "no_stopwords",
)


def quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 5000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_dup_word_frac: float = 0.5,
) -> DataFrame:
    """Keep/drop verdict per document with named reasons — the filter
    stage a Gopher/RefinedWeb-style curation pipeline applies before
    dedup. Emits ``(doc_id, n_words, keep, reasons)`` where ``reasons``
    is the comma-joined failed rule names in QUALITY_GATE_RULES order
    ('' when the document passes).

    Scale shape: ZERO shuffles — every rule needs only the row's own
    words. The dup-word fraction reuses the sorted-array run-length trick
    from repetition_stats (O(n log n) per row, JVM-side — higher-order
    functions sit outside whole-stage codegen but never touch Python); the
    whole operator is one narrow map over the corpus, so at 100 TB it
    pipelines with the scan and writes its verdicts without a single
    exchange. Verdicts are emitted for EVERY doc (not just keepers) so
    downstream can audit drop rates per rule."""
    t = F.col(text_col)
    d = docs.select(
        "doc_id", t.alias("_t"),
        F.when(F.length(F.trim(t)) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(F.trim(t), r"\s+")).alias("w"))
    d = d.withColumn("n", F.size("w")).withColumn("sw", F.array_sort("w"))
    # index-aware filter over the array itself, NOT sequence(0, n - 1):
    # sequence is descending for n = 0 ([0, -1]) and this subexpression is
    # SHARED (keep + reasons), so codegen subexpression elimination
    # evaluated it outside its when(n > 0) guard — empty docs crashed with
    # INVALID_ARRAY_INDEX (caught by the quality-gate property test)
    d = d.withColumn("n_single", F.expr(
        "size(filter(sw, (x, i) -> "
        "(i = 0 OR x != sw[i-1]) AND (i = n - 1 OR x != sw[i+1])))"))
    n = F.col("n")
    nd = n.cast("double")
    # mean word length over the document's non-whitespace characters
    mean_wl = (F.length(F.regexp_replace(F.trim(F.col("_t")), r"\s+", ""))
               / F.nullif(nd, F.lit(0.0)))
    dup_frac = F.when(n > 0, (nd - F.col("n_single")) / nd).otherwise(0.0)
    padded = F.concat(F.lit(" "), F.lower(F.col("_t")), F.lit(" "))
    stop_hits = F.lit(0)
    for wd in (" the ", " and ", " of ", " to ", " a "):
        stop_hits = stop_hits + F.when(
            F.contains(padded, F.lit(wd)), 1).otherwise(0)
    fails = {
        "too_few_words": n < min_words,
        "too_many_words": n > max_words,
        "word_len_out_of_band": (n > 0) & (
            (mean_wl < min_mean_word_len) | (mean_wl > max_mean_word_len)),
        "dup_word_frac_high": dup_frac > max_dup_word_frac,
        "no_stopwords": stop_hits == 0,
    }
    # concat_ws skips NULLs (identically in DuckDB), so failed-rule names
    # join without sentinel gymnastics
    reasons = F.concat_ws(
        ",", *[F.when(fails[r], F.lit(r)) for r in QUALITY_GATE_RULES])
    return d.select(
        "doc_id",
        n.alias("n_words"),
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-side BM25 (Robertson/Sparck Jones, the Lucene-default
    flavor: idf = ln(1 + (N − df + 0.5)/(df + 0.5))) of a bag-of-terms
    query against every document — the lexical-retrieval scorer a RAG /
    eval-harness pipeline runs next to the embedding ANN path. Emits
    (doc_id, score) for every doc matching ≥ 1 query term, score rounded
    to 6 places.

    Scale shape: the token explode is filtered to the QUERY TERMS before
    it ever shuffles (per-doc tf for ≤ |query| terms — corpus-size
    independent width); df comes from a |query|-row aggregate of that
    same table; N and avgdl ride one scalar aggregate. Both tiny tables
    broadcast back, so the corpus is scanned exactly twice (once for
    lengths, once for matching tokens) with no corpus-sized shuffle —
    the per-doc groupBy carries only matching-term rows."""
    if not query_terms:
        raise ValueError("empty query")
    t = F.lower(F.trim(F.col(text_col)))
    lens = docs.select(
        "doc_id",
        F.when(F.length(t) == 0, 0)
        .otherwise(F.size(F.split(t, r"\s+"))).cast("long").alias("dl"))
    # N and avgdl: one scalar aggregate, broadcast
    stats = lens.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"))
    tf = (
        docs.filter(F.length(t) > 0)
        .select("doc_id", F.explode(F.split(t, r"\s+")).alias("token"))
        .filter(F.col("token").isin(list(query_terms)))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (F.log(F.lit(1.0)
                   + (F.col("n_docs") - F.col("df") + 0.5)
                   / (F.col("df") + 0.5))
             * (F.col("tf") * (k1 + 1))
             / (F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
            .alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
    )


def source_token_divergence(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distribution-drift signal per source: KL(P_source || P_corpus) over
    unigram token distributions — the statistic that flags a crawl domain
    whose language suddenly diverges from the corpus (spam injection,
    template takeover, wrong-language feed) without reading any document
    twice. Emits (source, n_tokens, kl_divergence).

    KL is finite by construction: every source token is part of the
    corpus distribution, so q > 0 wherever p > 0.

    Scale shape: one partial-aggregated groupBy(source, token) over the
    exploded tokens; the corpus count per token is a window sum
    partitioned BY TOKEN over that (much smaller) aggregate, and the
    per-source / corpus totals live in a #sources-sized table that
    broadcasts back — no global (single-partition) window anywhere, no
    second pass over the corpus text. Token counts are exact integers,
    so only the last division/log is floating point."""
    t = F.lower(F.trim(F.col(text_col)))
    toks = (
        docs.filter(F.length(t) > 0)
        .select(F.col(group_col).alias("src"),
                F.explode(F.split(t, r"\s+")).alias("token"))
        .filter(F.length("token") > 0)
    )
    st = toks.groupBy("src", "token").agg(F.count("*").alias("c"))
    # per-source totals: one row per SOURCE — the global sum over this
    # tiny table is safe to window without a partition key
    src_tot = st.groupBy("src").agg(F.sum("c").alias("c_src"))
    src_tot = src_tot.withColumn(
        "c_all", F.sum("c_src").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing)))
    st = (
        st.withColumn("c_tok", F.sum("c").over(Window.partitionBy("token")))
        .join(F.broadcast(src_tot), "src")
    )
    p = F.col("c") / F.col("c_src")
    q = F.col("c_tok") / F.col("c_all")
    return (
        st.groupBy("src")
        .agg(F.first("c_src").alias("n_tokens"),
             F.round(F.sum(p * F.log(p / q)), 6).alias("kl_divergence"))
        .select(F.col("src").alias(group_col), "n_tokens", "kl_divergence")
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-trained unigram language-model score per document: the mean
    log2-probability of the document's token stream under the corpus's
    own unigram MLE — the SQL-expressible analog of CCNet's KenLM
    perplexity filter. Documents far below the corpus mean are
    vocabulary-atypical (boilerplate, wrong language, encoding damage);
    far above means repetitive high-frequency filler. No smoothing is
    needed: the model is trained on the same corpus it scores, so every
    scored token has count >= 1.

    Emits ``(doc_id, n_tokens, avg_logprob)`` for every doc;
    ``avg_logprob`` is sum(tf * log2(c_token / c_total)) / n_tokens
    rounded to 6 decimals, NULL for empty docs.

    Scale shape: three bounded shuffles, no second pass over the text —
      1. groupBy(doc_id, token) collapses the exploded stream to per-doc
         term frequencies with map-side partials,
      2. the corpus count per token is a window sum partitioned BY TOKEN
         over that (much smaller) aggregate — the frequency-join
         expressed as one exchange (same discipline as
         source_token_divergence); the corpus TOTAL is a 1-row aggregate
         broadcast back, never a global window over data-sized rows,
      3. groupBy(doc_id) folds the weighted log-probs.
    Counts stay exact integers until the final division/log."""
    t = F.lower(F.trim(F.col(text_col)))
    toks = (
        docs.filter(F.length(t) > 0)
        .select(F.col("doc_id"), F.explode(F.split(t, r"\s+")).alias("token"))
        .filter(F.length("token") > 0)
    )
    dt = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dt = dt.withColumn(
        "c_tok", F.sum("tf").over(Window.partitionBy("token")))
    total = dt.groupBy().agg(F.sum("tf").alias("c_all"))
    per_doc = (
        dt.crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf")
                      * F.log2(F.col("c_tok") / F.col("c_all")))
                / F.sum("tf"), 6).alias("avg_logprob"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "avg_logprob",
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword extraction: the ``top_k`` tokens of each doc
    by TF-IDF (smooth idf = ln((1 + N)/(1 + df)) + 1, the sklearn default
    — never zero, so a corpus-universal token still ranks by tf). The
    per-doc keyword list is what a curation dashboard shows next to a
    cluster, and the join key a topic-mixture planner buckets on.

    Emits ``(doc_id, token, tfidf, rank)`` — at most ``top_k`` rows per
    doc, tfidf rounded to 6 decimals, rank 1-based by
    (tfidf DESC, token ASC). Exact-score ties (equal tf AND equal df)
    break on the token string, so the cut is deterministic and
    engine-portable.

    Scale shape: three bounded exchanges, none corpus-text-sized —
      1. groupBy(doc_id, token) collapses the exploded stream with
         map-side partials (one row per distinct term per doc),
      2. df is a window sum partitioned BY TOKEN over that aggregate
         (the join-back expressed as one exchange, same discipline as
         unigram_logprob's corpus counts); N rides a 1-row broadcast,
      3. the rank window repartitions by doc_id and keeps ≤ top_k rows.
    Token strings should be ``_hash60``-ed at 100 TB if the keyword text
    itself is not needed downstream; the contract entry keeps raw strings
    so the SQL oracle re-derives them verbatim."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    t = F.lower(F.trim(F.col(text_col)))
    toks = (
        docs.filter(F.length(t) > 0)
        .select(F.col("doc_id"), F.explode(F.split(t, r"\s+")).alias("token"))
        .filter(F.length("token") > 0)
    )
    dt = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("double").alias("tf"))
    dt = dt.withColumn(
        "df", F.count("*").over(Window.partitionBy("token")))
    n_docs = docs.groupBy().agg(F.count("*").cast("long").alias("n_docs"))
    scored = (
        dt.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_s",
            F.col("tf")
            * (F.log((1.0 + F.col("n_docs"))
                     / (1.0 + F.col("df"))) + 1.0))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("_s").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "token", F.round("_s", 6).alias("tfidf"), "rank")
    )


def token_cooccurrence(
    docs: DataFrame,
    window: int = 3,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Windowed token co-occurrence with PMI: the ``top_k`` unordered
    token pairs by co-occurrence count within ``window`` positions,
    scored by pointwise mutual information — the collocation statistic
    behind phrase mining ("new york"), template detection (boilerplate
    pairs with PMI ≈ 0 but huge counts), and word-association drift
    checks on a crawl.

    Emits ``(tok_a, tok_b, n_pairs, pmi, rank)`` with tok_a <= tok_b,
    pmi = ln((n_ab/total_pairs) / ((n_a/total_toks) * (n_b/total_toks)))
    rounded to 6 decimals, rank 1-based by (n_pairs DESC, tok_a, tok_b)
    — an integer-keyed order, so the cut is deterministic.

    Scale shape: pair generation is entirely MAP-SIDE — an index-aware
    transform over each doc's token array pairs toks[i] with
    toks[i+1..i+window] (slice past the end truncates safely), so the
    only corpus-sized exchange is the partial-aggregated
    groupBy(tok_a, tok_b). Unigram counts reuse the same exploded scan
    (one more partial-aggregated groupBy); the top-k cut happens BEFORE
    the PMI joins, so the unigram table joins against ≤ top_k broadcast
    rows, never pair-table-sized. Totals are 1-row broadcast aggregates.
    The pair-key space is vocab², but counts ≥ 2 concentrate it — at
    100 TB, pre-filter the token arrays to a broadcast vocabulary (the
    vocab_top_tokens output) to bound the shuffle key space."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    t = F.lower(F.trim(F.col(text_col)))
    arr = docs.filter(F.length(t) > 0).select(
        F.split(t, r"\s+").alias("toks"))
    # map-side pair expansion: slice(toks, i+2, window) is 1-based —
    # the tokens strictly after position i, at most `window` of them
    pairs = arr.select(F.explode(F.expr(
        f"flatten(transform(toks, (x, i) -> "
        f"transform(slice(toks, i + 2, {int(window)}), y -> "
        f"struct(least(x, y) AS a, greatest(x, y) AS b))))"
    )).alias("p")).select(F.col("p.a").alias("tok_a"),
                          F.col("p.b").alias("tok_b"))
    pc = pairs.groupBy("tok_a", "tok_b").agg(
        F.count("*").cast("long").alias("n_pairs"))
    top = (
        pc.orderBy(F.col("n_pairs").desc(), "tok_a", "tok_b")
        .limit(top_k)
    )
    uni = (
        arr.select(F.explode("toks").alias("token"))
        .groupBy("token").agg(F.count("*").cast("long").alias("n_tok"))
    )
    totals = pc.groupBy().agg(
        F.sum("n_pairs").cast("long").alias("total_pairs"))
    tok_tot = uni.groupBy().agg(
        F.sum("n_tok").cast("long").alias("total_toks"))
    ua = uni.withColumnsRenamed({"token": "tok_a", "n_tok": "n_a"})
    ub = uni.withColumnsRenamed({"token": "tok_b", "n_tok": "n_b"})
    # the ≤ top_k side broadcasts in BOTH joins; the vocab-sized unigram
    # table is always the streamed probe side
    j1 = ua.join(F.broadcast(top), "tok_a")
    j = (
        ub.join(F.broadcast(j1), "tok_b")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(tok_tot))
    )
    # expression shape mirrors the SQL oracle operation-for-operation so
    # both engines execute the identical IEEE division/multiply sequence
    pmi = F.log(
        (F.col("n_pairs") / F.col("total_pairs"))
        / ((F.col("n_a") / F.col("total_toks"))
           * (F.col("n_b") / F.col("total_toks"))))
    w = Window.orderBy(F.col("n_pairs").desc(), "tok_a", "tok_b")
    return (
        j.select("tok_a", "tok_b", "n_pairs",
                 F.round(pmi, 6).alias("pmi"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )
