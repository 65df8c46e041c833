"""Deterministic synthetic interleaved-document corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    documents(doc_id string, spans array<struct<kind,text,media_ref,offset:int>>)

Text spans embed ground-truth facts with fixed surface patterns drawn from a
closed entity vocabulary; a controlled fraction of mentions use alias surface
forms (exercises linking/disambiguation), a controlled fraction of docs
reference a hot-entity set (exercises skew mitigation), and `sameAs`
sentences create equivalence edges (exercises connected-components
canonicalization). Media spans interleave with text spans.

Everything is keyed off (seed, doc_idx) so the SAME function generates the
corpus distributed (``mapInPandas`` over ``spark.range`` — scales to any doc
count with zero driver memory) and the expected-triples oracle. No
Date.now-style nondeterminism anywhere.
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from shacl_dqa_prototype_spark.schemas import DOCUMENTS_SCHEMA

EX = "http://example.org/"
P_TOPPING = f"{EX}prop/topping"
P_LOCATED_IN = f"{EX}prop/locatedIn"
P_CREATED_ON = f"{EX}prop/createdOn"
P_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
P_SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"
P_DEPICTED_IN = f"{EX}prop/depictedIn"
XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


@dataclass(frozen=True)
class GenConfig:
    n_docs: int = 1000
    n_entities: int = 200
    seed: int = 42
    hot_frac: float = 0.05      # fraction of docs whose main entity is entity 0
    alias_frac: float = 0.30    # fraction of subject mentions via ambiguous alias
    dup_frac: float = 0.15      # fraction of docs using a duplicate IRI + sameAs
    media_frac: float = 0.5     # fraction of docs with >= 1 media span
    malformed_frac: float = 0.0 # fraction of date literals deliberately malformed


def entity_iri(i: int) -> str:
    return f"{EX}entity/{i:06d}"


def dup_iri(i: int) -> str:
    return f"{EX}dup/{i:06d}"


def canonical_surface(i: int) -> str:
    return f"Entity {i}"


def alias_surface(i: int) -> str:
    return f"E{i}"


def dup_surface(i: int) -> str:
    return f"Duplicate {i}"


def place_surface(i: int) -> str:
    return f"Place {i}"


def place_iri(i: int) -> str:
    return f"{EX}place/{i:06d}"


def _gen_doc(idx: int, cfg: GenConfig):
    """One document: returns (spans, truth) where
    spans  = list of (kind, text, media_ref, offset)
    truth  = list of (s, p, o, o_kind, o_dtype, o_lang) with *linked* subject
             IRIs (alias surfaces resolved, dup IRIs NOT yet merged — the CC
             stage owns that; see ``canonical_map``)."""
    rng = random.Random(cfg.seed * 1_000_003 + idx)
    n = cfg.n_entities
    main = 0 if rng.random() < cfg.hot_frac else rng.randrange(1, n)
    use_dup = rng.random() < cfg.dup_frac
    main_iri = dup_iri(main) if use_dup else entity_iri(main)

    sentences: list[str] = []
    truth: list[tuple] = []

    def main_mention(first: bool) -> str:
        if use_dup:
            return dup_surface(main)
        if not first and rng.random() < cfg.alias_frac:
            return alias_surface(main)
        return canonical_surface(main)

    # fact 1: topping (object property, entity→entity)
    other = rng.randrange(0, n)
    sentences.append(f"{main_mention(True)} is topped with {canonical_surface(other)}.")
    truth.append((main_iri, P_TOPPING, entity_iri(other), "iri", None, None))

    # fact 2: location (entity→place)
    pl = rng.randrange(0, n)
    sentences.append(f"{main_mention(False)} is located in {place_surface(pl)}.")
    truth.append((main_iri, P_LOCATED_IN, place_iri(pl), "iri", None, None))

    # fact 3: creation date (typed literal)
    y, m, d = 1990 + rng.randrange(40), 1 + rng.randrange(12), 1 + rng.randrange(28)
    date = f"{y:04d}-{m:02d}-{d:02d}"
    if cfg.malformed_frac and rng.random() < cfg.malformed_frac:
        date = f"{y:04d}-{m + 12:02d}-{d:02d}"  # invalid month → ill-formed xsd:date
    sentences.append(f"{main_mention(False)} was created on {date}.")
    truth.append((main_iri, P_CREATED_ON, date, "literal", XSD_DATE, None))

    # fact 4 (sometimes): lang-tagged label
    if rng.random() < 0.5:
        label = f"the {main}th entity"
        sentences.append(f'{main_mention(False)} is labeled "{label}"@en.')
        truth.append((main_iri, P_LABEL, label, "literal", RDF_LANGSTRING, "en"))

    # dedup/equivalence sentence → CC edge
    if use_dup:
        sentences.append(f"{dup_surface(main)} is the same as {canonical_surface(main)}.")
        truth.append((main_iri, P_SAME_AS, entity_iri(main), "iri", None, None))

    # Assemble interleaved spans with monotone offsets.
    spans: list[tuple] = []
    offset = 0
    n_media = 0
    with_media = rng.random() < cfg.media_frac
    for si, sent in enumerate(sentences):
        spans.append(("text", sent, None, offset))
        offset += len(sent) + 1
        if with_media and si == 0:
            for mk in ("image", "audio"):
                if rng.random() < 0.7:
                    ref = f"media://{mk}/{idx}_{n_media}"
                    spans.append((mk, None, ref, offset))
                    offset += 1
                    truth.append((main_iri, P_DEPICTED_IN, ref, "iri", None, None))
                    n_media += 1
    return spans, truth


def doc_id_str(idx: int) -> str:
    return f"doc_{idx:09d}"


def generate_documents(spark: SparkSession, cfg: GenConfig, partitions: int | None = None) -> DataFrame:
    """Distributed corpus generation: spark.range → mapInPandas. Each task
    regenerates its own id range deterministically — the corpus never exists
    on the driver, so this scales to 10^12 docs on a real cluster."""
    cfg_d = cfg  # closure capture (dataclass is picklable)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                spans, _ = _gen_doc(int(idx), cfg_d)
                rows.append(
                    {
                        "doc_id": doc_id_str(int(idx)),
                        "spans": [
                            {"kind": k, "text": t, "media_ref": m, "offset": o}
                            for (k, t, m, o) in spans
                        ],
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    rng_df = spark.range(0, cfg.n_docs, numPartitions=partitions or max(4, cfg.n_docs // 2000))
    return rng_df.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def expected_triples(spark: SparkSession, cfg: GenConfig, partitions: int | None = None) -> DataFrame:
    """Ground-truth (pre-canonicalization) triples for P/R measurement."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                _, truth = _gen_doc(int(idx), cfg)
                for (s, p, o, ok, dt, lang) in truth:
                    rows.append(
                        {"doc_id": doc_id_str(int(idx)), "s": s, "p": p, "o": o,
                         "o_kind": ok, "o_dtype": dt, "o_lang": lang}
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "s", "p", "o", "o_kind", "o_dtype", "o_lang"]
            )

    rng_df = spark.range(0, cfg.n_docs, numPartitions=partitions or max(4, cfg.n_docs // 2000))
    return rng_df.mapInPandas(
        gen,
        schema=("doc_id string, s string, p string, o string, "
                "o_kind string, o_dtype string, o_lang string"),
    )


def entity_dictionary(spark: SparkSession, cfg: GenConfig) -> DataFrame:
    """Linking candidate dictionary (FIXTURES.md §5) — broadcast side.

    Canonical surfaces are unambiguous (prior 1.0). Alias surfaces ``E{i}``
    are deliberately ambiguous between entity i (prior 0.6) and a decoy
    entity (prior 0.4) so the disambiguation join has real work to do.

    Generated DISTRIBUTED (spark.range + JVM expressions, 5 rows per
    entity id): a driver-side row list was the old path, and at 8M-doc
    bench scale (400k entities → 2M rows) it serialized ~57 MB into every
    task binary — the classic local-relation-in-task-closure smell the
    DAGScheduler warns about. Same rows, same values, zero driver memory."""
    from pyspark.sql import functions as F

    n = cfg.n_entities
    i = F.col("id").cast("string")
    # %06d == entity_iri's f"{i:06d}": pads short ids, NEVER truncates long
    # ones (lpad would silently truncate at n_entities >= 10^6)
    pad = F.format_string("%06d", F.col("id"))
    decoy_pad = F.format_string("%06d", (F.col("id") + 7) % n)
    ent = F.concat(F.lit(f"{EX}entity/"), pad)

    def _row(surface, candidate, prior):
        return F.struct(surface.alias("surface"),
                        candidate.alias("candidate"),
                        F.lit(prior).cast("double").alias("prior"))

    rows = F.array(
        _row(F.concat(F.lit("Entity "), i), ent, 1.0),
        _row(F.concat(F.lit("Duplicate "), i),
             F.concat(F.lit(f"{EX}dup/"), pad), 1.0),
        _row(F.concat(F.lit("Place "), i),
             F.concat(F.lit(f"{EX}place/"), pad), 1.0),
        _row(F.concat(F.lit("E"), i), ent, 0.6),
        _row(F.concat(F.lit("E"), i),
             F.concat(F.lit(f"{EX}entity/"), decoy_pad), 0.4),
    )
    return (
        spark.range(0, n, numPartitions=max(1, n // 200_000))
        .select(F.explode(rows).alias("r"))
        .select("r.surface", "r.candidate", "r.prior")
    )


