"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All JVM-native expressions except the rolling-hash
fingerprint (vectorized pandas UDF over Arrow batches).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny language marker lists (n-gram/stopword heuristic). Deterministic,
# engine-portable (pure CASE/instr logic).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " de "],
    "de": [" der ", " und ", " das "],
    "fr": [" le ", " et ", " la "],
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


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]:
    length band, punctuation ratio, stopword presence ratio."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
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
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word scoring heuristic: per language, count marker hits;
    argmax with deterministic tie-break (alphabetical), 'und' if no hits."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = []
    for lang in sorted(LANG_MARKERS):
        s = F.lit(0)
        for m in LANG_MARKERS[lang]:
            # occurrence count of marker m
            occ = (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit("")))) / len(m)
            s = s + occ
        scores.append((lang, s.alias(f"score_{lang}")))
    out = docs.select(F.col("doc_id"), *[c for (_, c) in scores])
    best = F.lit("und")
    best_score = F.lit(0.0)
    for lang in sorted(LANG_MARKERS, reverse=True):  # reverse → earlier lang wins ties
        c = F.col(f"score_{lang}")
        cond = c > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, c.cast("double")).otherwise(best_score)
    return out.select("doc_id", best.alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text", window: int = 16) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling (Karp–Rabin) hash
    over character windows. Vectorized pandas UDF (polynomial rolling hash
    has a sequential dependency the SQL layer can't express)."""

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        MOD = (1 << 61) - 1
        BASE = 257
        for pdf in batches:
            outs = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                s = (text or "").encode("utf-8")
                if len(s) < window:
                    outs.append((doc_id, hash_bytes(s, MOD, BASE)))
                    continue
                h = hash_bytes(s[:window], MOD, BASE)
                best = h
                top = pow(BASE, window - 1, MOD)
                for i in range(window, len(s)):
                    h = ((h - s[i - window] * top) * BASE + s[i]) % MOD
                    if h < best:
                        best = h
                outs.append((doc_id, best))
            yield pd.DataFrame(outs, columns=["doc_id", "fingerprint"])

    def hash_bytes(b: bytes, MOD: int, BASE: int) -> int:
        h = 0
        for ch in b:
            h = (h * BASE + ch) % MOD
        return h

    return docs.select("doc_id", text_col).mapInPandas(
        fp, schema="doc_id long, fingerprint long"
    )
