"""Training-pipeline composition operators: sequence packing, deterministic
stratified sampling, PII redaction.

All three are pure JVM expressions (window cumsum / hash threshold / regex
replace) — no Python in the hot path, one shuffle at most, and each is
independently re-derivable in ANSI SQL so the driver's DuckDB oracle can
value-check them (see entry_ext.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    shard_col: Column | None = None,
    n_shards: int = 256,
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in shard order and
    cut fixed-length windows of ``seq_len`` tokens. Each doc is assigned
    its starting pack, its offset inside that pack, and the number of packs
    it spans (a doc may straddle pack boundaries — standard pretraining
    chunking, no padding waste).

    Scale shape: ONE shuffle (window over shard), shards are independent so
    parallelism = n_shards regardless of corpus size; cumsum is a
    running-window aggregate, not a global sort. Pass ``shard_col`` to
    control placement (default: hash of doc_id)."""
    t = F.col(token_col).cast("long")
    shard = (shard_col if shard_col is not None
             else F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        docs.withColumn("shard", shard.cast("int"))
        .withColumn("cum_before", F.sum(t).over(w) - t)
        .select(
            "doc_id", "shard", t.alias("n_tokens"),
            F.floor(F.col("cum_before") / seq_len).alias("pack_id"),
            (F.col("cum_before") % seq_len).alias("pack_offset"),
            # an empty doc spans 0 packs — without the guard the formula
            # returns 0 only when cum_before lands exactly on a pack
            # boundary and 1 otherwise, contradictory metadata for
            # identical inputs
            F.when(t == 0, F.lit(0).cast("long")).otherwise(
                F.floor((F.col("cum_before") + t - 1) / seq_len)
                - F.floor(F.col("cum_before") / seq_len) + 1
            ).alias("n_packs"),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float] | float,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff a uniform hash of
    (stratum, key) falls under the stratum's fraction. Same input ⇒ same
    sample on any cluster size (no RNG state, no collect) — resumable jobs
    re-derive identical samples. The hash is the first 4 hex chars of
    md5(stratum||'|'||key) (16 bits ≈ 1/65536 granularity), chosen for
    exact portability to the SQL oracle."""
    u = (F.conv(F.substring(F.md5(F.concat_ws(
        "|", F.col(strata_col), F.col(key_col).cast("string"))), 1, 4),
        16, 10).cast("long") / F.lit(65536.0))
    if isinstance(fractions, dict):
        frac: Column = F.lit(None).cast("double")
        for stratum, p in fractions.items():
            frac = F.when(F.col(strata_col) == stratum, F.lit(p)).otherwise(frac)
    else:
        frac = F.lit(float(fractions))
    return df.filter(u < frac)


# Public-pattern PII surface forms; ordered so emails are rewritten before
# the phone pattern can eat their digit runs.
#
# Phone = international form with an explicit '+' prefix, OR separator-
# structured 3-3-4 groups (NANP style). Both shapes carry ≥7 DIGITS by
# construction — the '+' branch counts digit groups (at most two separator
# chars between consecutive digits), not raw length, so ISO dates (4-2-2),
# signed numeric ranges (+1.5 - 2.5), versions, and bare ID runs in
# training text are NOT rewritten — precision over recall for
# corpus-corruption reasons (an undecorated 10-digit run is left alone). Patterns stay in the Java/RE2-common subset (no lookaround)
# and were verified char-identical between java.util.regex and DuckDB RE2.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+[0-9]([()\-. ]{0,2}[0-9]){6,14}"
     r"|\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    (r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Chained JVM regexp_replace over the PII surface forms — stays inside
    whole-stage codegen; patterns restricted to the regex subset Java and
    RE2-style engines interpret identically."""
    t = F.col(text_col)
    for pattern, token in PII_PATTERNS:
        t = F.regexp_replace(t, pattern, token)
    return docs.select("doc_id", t.alias("redacted"))


def global_shuffle(
    df: DataFrame,
    n_shards: int = 1024,
    key_col: str = "doc_id",
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic, reproducible global shuffle for training-batch order:
    every row gets a (shard, pos) placement drawn from md5(seed|key), the
    same on ANY cluster size and on re-runs — preemptions and resumed jobs
    see identical batch order, and changing ``seed`` reshuffles the whole
    corpus without touching the data.

    Scale shape: ONE shuffle (the per-shard row_number window); shards are
    mutually independent, so parallelism = n_shards and no global sort /
    single-partition bottleneck exists. The hash is md5-derived (not
    xxhash64) for exact portability to the SQL oracle; the shard comes
    from the first 32 bits (supports n_shards up to ~4B without empty
    shards and keeps mod-bias under 1 in 2^32/n_shards), and ties in the
    full-digest ordering fall back to the key."""
    h = F.md5(F.concat_ws(
        "|", F.lit(str(seed)), F.col(key_col).cast("string")))
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    w = Window.partitionBy("shard").orderBy("h", key_col)
    return (
        df.withColumn("h", h)
        .withColumn("shard", shard.cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .drop("h")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — the context-window prep step for
    RAG indexing and long-document pretraining: each doc becomes
    ceil-strided windows of ``chunk_tokens`` whitespace tokens overlapping
    by ``overlap`` (stride = chunk_tokens − overlap; the final window may
    be short; empty docs produce no chunks).

    Emits (doc_id, chunk_id, start_token, n_chunk_tokens, chunk) — enough
    to reconstruct provenance (which doc, which offset) for every chunk.

    Scale shape: ZERO shuffles — split → sequence of window starts →
    posexplode, all JVM array expressions pipelined with the corpus scan;
    chunk count per doc is data-derived, so no doc is padded or dropped."""
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    t = F.trim(F.col(text_col))
    d = docs.select(
        "doc_id",
        F.when(F.length(t) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(t, r"\s+")).alias("w"))
    d = d.withColumn("n", F.size("w"))
    # window starts: 0, stride, 2*stride, ... while start < n
    starts = F.when(
        F.col("n") > 0,
        F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        d.select("doc_id", "w", "n",
                 F.posexplode(starts).alias("chunk_id", "start_token"))
        .select(
            "doc_id",
            "chunk_id",
            "start_token",
            F.least(F.lit(chunk_tokens),
                    F.col("n") - F.col("start_token")).alias("n_chunk_tokens"),
            F.array_join(
                F.slice("w", F.col("start_token") + 1, chunk_tokens),
                " ").alias("chunk"),
        )
    )


def source_quality_filter(
    docs: DataFrame,
    source_col: str = "source",
    min_docs: int = 5,
    min_mean_quality: float = 0.5,
) -> DataFrame:
    """Domain-level curation verdicts: aggregate the per-document heuristic
    quality score per source (domain / crawl host / feed) and keep only
    sources with enough volume AND a high-enough mean — the corpus-level
    analogue of URL-blocklist filtering in web-pipeline curation (whole
    domains are dropped, not individual pages, so one decision removes
    millions of docs cheaply).

    Emits one verdict row per source: ``(source, n_docs, mean_quality,
    keep)``. Join the keepers back to the corpus (broadcast — the verdict
    table has one row per DOMAIN, tiny at any corpus size) to materialize
    the filtered set.

    Scale shape: quality rides the corpus scan via ``passthrough`` (no
    doc_id re-join), then ONE partial-aggregated groupBy on source.
    ``mean_quality`` averages over an exact integer (quality×100 — the
    heuristic score is a multiple of 0.02 by construction), so the mean is
    sum(int)/count: deterministic under any partial-aggregation order,
    unlike a float sum."""
    from shacl_dqa_prototype_spark.operators.textstats import quality_score

    q = quality_score(docs, passthrough=(source_col,))
    q100 = F.round(F.col("quality") * 100).cast("long")
    per_src = (
        q.select(F.col(source_col).alias("source"), q100.alias("q100"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("q100").alias("sq"))
    )
    mean_q = F.round(F.col("sq") / F.col("n_docs") / 100.0, 6)
    return per_src.select(
        "source",
        "n_docs",
        mean_q.alias("mean_quality"),
        ((F.col("n_docs") >= min_docs)
         & (mean_q >= min_mean_quality)).alias("keep"),
    )


def mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Training-mixture planner: given target mixture ``weights`` per
    group (language / domain / source), compute the largest total token
    budget the corpus can serve at exactly those proportions and each
    group's sampling rate toward it — the data-mixing arithmetic an LLM
    pretraining run starts from.

    The binding constraint is the group with the least headroom:
    T = min_g tokens_g / w_g, rate_g = w_g * T / tokens_g (the binding
    group gets rate 1.0, everything else is downsampled). Groups missing
    from ``weights`` get weight 0 → rate 0 (excluded from the mixture).

    Emits (group, n_docs, n_tokens, target_weight, rate).

    Scale shape: one partial-aggregated groupBy over the corpus (token
    counts are whitespace splits, map-side), then the min and the rates
    are computed over the #groups-sized aggregate — broadcast-scale
    arithmetic, deterministic (integer token sums, one double division
    per group)."""
    t = F.col(text_col)
    n_toks = F.when(F.length(F.trim(t)) == 0, 0).otherwise(
        F.size(F.split(F.trim(t), r"\s+")))
    per = (
        docs.select(F.col(group_col).alias("grp"), n_toks.alias("nt"))
        .groupBy("grp")
        .agg(F.count("*").alias("n_docs"),
             F.sum("nt").cast("long").alias("n_tokens"))
    )
    wmap = F.create_map(
        *[F.lit(x) for kv in sorted(weights.items()) for x in kv])
    per = per.withColumn(
        "target_weight", F.coalesce(wmap[F.col("grp")], F.lit(0.0)))
    # T = min over weighted groups of tokens_g / w_g; the aggregate is
    # #groups rows, so the cross-join broadcast is a scalar
    n_weighted = sum(1 for w in weights.values() if w > 0)
    budget = per.filter(F.col("target_weight") > 0).agg(
        F.min(F.col("n_tokens") / F.col("target_weight")).alias("_T"),
        F.count("*").alias("_ng"))
    return (
        per.crossJoin(F.broadcast(budget))
        # a weighted group ABSENT from the corpus can never constrain T
        # (the min runs only over groups present), so the plan would
        # report a confidently wrong positive budget for an unservable
        # mixture — fail loudly inside the plan instead (assert_true is
        # NULL when it passes, so the filter keeps every row; no extra
        # job, no extra exchange)
        .where(F.assert_true(
            F.col("_ng") == F.lit(n_weighted),
            F.lit("mixture_plan: a weighted group has no corpus rows — "
                  "the requested mixture is unservable")).isNull())
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_tokens",
            F.round("target_weight", 6).alias("target_weight"),
            F.when(
                (F.col("target_weight") > 0) & (F.col("n_tokens") > 0),
                F.round(F.col("target_weight") * F.col("_T")
                        / F.col("n_tokens"), 6),
            ).otherwise(0.0).alias("rate"),
        )
    )
