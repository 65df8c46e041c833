"""E3/E4 — entity linking: broadcast candidate generation + disambiguation.

north_star: "link mentions via broadcast candidate dictionary + salted
hash-join disambiguation scoring".

Plan shape (all native DataFrame ops, zero Python):

  mentions ─┬─ subj surfaces ─┐
            └─ obj  surfaces ─┴─> long format (doc_id, mention_key, surface)
        ⋈ F.broadcast(dictionary) on surface          -- E3, no shuffle
        → candidates (doc_id, mention_key, candidate, prior)

  context  = unambiguous surfaces (exactly 1 candidate) per doc
             → doc_entities(doc_id, entity)            -- semi evidence set
  popularity = docs-per-entity computed with an explicit TWO-PHASE SALTED
             distinct aggregate (hot entities appear in a large doc
             fraction; a naive countDistinct(doc_id) groupBy(entity) puts
             the whole hot key in one reducer) -- E4 skew mitigation
  score    = prior + 2·coherence + 0.001·log1p(popularity)
  top-1    = row_number() over (mention_key) ordered by score desc,
             candidate asc (deterministic tie-break)

Surfaces missing from the dictionary pass through as mint-IRI fallbacks so
recall never silently drops rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from shacl_dqa_prototype_spark.datagen import EX, P_DEPICTED_IN

MINT_NS = f"{EX}mint/"


def _surface_long(mentions: DataFrame) -> DataFrame:
    """Both mention roles in one long DF keyed by (doc_id, span_pos,
    fact_idx, role)."""
    subj = mentions.select(
        "doc_id", "span_pos", "fact_idx",
        F.lit("s").alias("role"),
        F.col("subj_surface").alias("surface"),
    )
    obj = (
        mentions.filter(F.col("obj_surface").isNotNull())
        .select(
            "doc_id", "span_pos", "fact_idx",
            F.lit("o").alias("role"),
            F.col("obj_surface").alias("surface"),
        )
    )
    return subj.unionByName(obj)


def salted_docs_per_entity(candidates: DataFrame, n_salts: int = 16) -> DataFrame:
    """Distinct-doc count per candidate entity, skew-safe.

    Phase 1 shuffles on (candidate, salt) — the hot entity's rows spread
    over ``n_salts`` reducers; dropDuplicates on (candidate, salt, doc_id)
    does the distinct locally. Phase 2 merges the per-salt partials (tiny).
    Equivalent to countDistinct(doc_id) groupBy(candidate), but bounded
    per-reducer fan-in at any skew."""
    salted = candidates.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts))
    )
    partial = (
        salted.dropDuplicates(["candidate", "salt", "doc_id"])
        .groupBy("candidate", "salt")
        .agg(F.count("*").alias("part_cnt"))
    )
    return partial.groupBy("candidate").agg(
        F.sum("part_cnt").alias("popularity")
    )


def link_mentions(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Resolve every mention surface to one entity IRI.

    Returns mentions + columns (s_iri, o_iri): linked subject IRI always,
    linked object IRI when the object was an entity mention."""
    long = _surface_long(mentions)

    # E3 — candidate generation: broadcast hash join, no shuffle.
    cands = long.join(F.broadcast(dictionary), "surface", "left").select(
        "doc_id", "span_pos", "fact_idx", "role", "surface",
        F.coalesce(
            "candidate",
            F.concat(F.lit(MINT_NS), F.sha2(F.col("surface"), 256).substr(1, 16)),
        ).alias("candidate"),
        F.coalesce("prior", F.lit(1.0)).alias("prior"),
    )

    # Context evidence: unambiguous surfaces anchor the doc's entity set.
    # Both context signals are WINDOW functions sharing one shuffle each:
    #   n_cands    over (mention key)          — ambiguity of this mention
    #   coherence  over (doc_id, candidate)    — does this candidate appear
    #              unambiguously elsewhere in the doc? (replaces a
    #              distinct+self-join — one shuffle instead of two)
    n_cands_w = Window.partitionBy("doc_id", "span_pos", "fact_idx", "role")
    cands = cands.withColumn("n_cands", F.count("*").over(n_cands_w))
    coh_w = Window.partitionBy("doc_id", "candidate")
    cands = cands.withColumn(
        "coherence",
        F.max((F.col("n_cands") == 1).cast("double")).over(coh_w),
    )

    # E4 — skew-safe popularity feature (two-phase salted distinct agg).
    popularity = salted_docs_per_entity(cands)

    scored = cands.join(F.broadcast(popularity), "candidate", "left").withColumn(
        "score",
        F.col("prior")
        + 2.0 * F.col("coherence")
        + 0.001 * F.log1p(F.coalesce("popularity", F.lit(0))),
    )

    # top-1 per mention; same partition key as n_cands_w → Catalyst reuses
    # the exchange instead of reshuffling.
    w = Window.partitionBy("doc_id", "span_pos", "fact_idx", "role").orderBy(
        F.desc("score"), F.asc("candidate")
    )
    linked = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "span_pos", "fact_idx", "role", "candidate")
    )

    # role → columns via conditional agg (one hash agg, no pivot 2nd pass)
    wide = linked.groupBy("doc_id", "span_pos", "fact_idx").agg(
        F.max(F.when(F.col("role") == "s", F.col("candidate"))).alias("s_iri"),
        F.max(F.when(F.col("role") == "o", F.col("candidate"))).alias("o_iri"),
    )
    return mentions.join(wide, ["doc_id", "span_pos", "fact_idx"])


def mentions_to_triples(linked: DataFrame) -> DataFrame:
    """Project linked mentions into the canonical triple schema T."""
    is_media = F.col("pred") == P_DEPICTED_IN
    return linked.select(
        F.col("s_iri").alias("s"),
        F.col("pred").alias("p"),
        F.coalesce("o_iri", "obj_literal").alias("o"),
        F.when(F.col("o_iri").isNotNull() | is_media, "iri")
        .otherwise("literal")
        .alias("o_kind"),
        F.when(F.col("o_iri").isNull() & ~is_media, F.col("obj_dtype"))
        .alias("o_dtype"),
        F.when(F.col("o_iri").isNull() & ~is_media, F.col("obj_lang"))
        .alias("o_lang"),
    ).dropDuplicates(["s", "p", "o", "o_kind", "o_dtype", "o_lang"])
