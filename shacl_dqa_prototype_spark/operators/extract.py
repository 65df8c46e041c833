"""E1/E2 — span explode + batched mention/triple extraction.

Reference counterpart: none (the reference ingests pre-built RDF,
/root/reference/utils.py:66-67); this stage is mandated by BASELINE.json
north_star: "batched mention detection + triple extraction with vectorized
pandas/Arrow UDFs (no per-row Python)".

Spark shape:
  documents --posexplode(spans)--> (doc_id, pos, span)
    ├─ text spans  --mapInPandas (vectorized pandas .str.extract per
    │               pattern; one Arrow batch in, one out)--> fact mentions
    └─ media spans --native join to the doc's first subject--> media mentions

The extractor is pattern-table-driven: each pattern row is
(pred, regex, obj_role) where obj_role ∈ {entity, literal}. Patterns use
vectorized ``Series.str.extract`` — there is no per-row Python anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shacl_dqa_prototype_spark.datagen import (
    P_CREATED_ON,
    P_DEPICTED_IN,
    P_LABEL,
    P_LOCATED_IN,
    P_SAME_AS,
    P_TOPPING,
    RDF_LANGSTRING,
    XSD_DATE,
)
from shacl_dqa_prototype_spark.schemas import MENTIONS_SCHEMA

# (pred, regex with named groups, obj kind, obj dtype)
# obj kinds: 'entity' → goes through linking; 'literal' → direct literal.
EXTRACTION_PATTERNS: list[tuple[str, str, str, str | None]] = [
    (P_TOPPING, r"^(?P<subj>.+?) is topped with (?P<obj>.+?)\.$", "entity", None),
    (P_LOCATED_IN, r"^(?P<subj>.+?) is located in (?P<obj>.+?)\.$", "entity", None),
    (P_SAME_AS, r"^(?P<subj>.+?) is the same as (?P<obj>.+?)\.$", "entity", None),
    (P_CREATED_ON, r"^(?P<subj>.+?) was created on (?P<obj>\d{4}-\d{2}-\d{2})\.$", "literal", XSD_DATE),
    (P_LABEL, r'^(?P<subj>.+?) is labeled "(?P<obj>.+)"@(?P<lang>\w+)\.$', "langstring", None),
]


def explode_spans(documents: DataFrame) -> DataFrame:
    """E1: positional explode — position index is load-bearing for the
    span-sequence invariant (E8) and for media→subject attachment."""
    return documents.select(
        "doc_id", F.posexplode("spans").alias("span_pos", "span")
    ).select("doc_id", "span_pos", "span.kind", "span.text", "span.media_ref")


def extract_fact_mentions(documents: DataFrame) -> DataFrame:
    """E2 (stateless half): fact extraction over text spans only.
    Pure explode + mapInPandas — safe under Structured Streaming append
    mode (no aggregation, no join)."""
    exploded = explode_spans(documents)
    text_spans = exploded.filter(F.col("kind") == "text").select(
        "doc_id", "span_pos", "text"
    )

    patterns = EXTRACTION_PATTERNS  # closure capture

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            text = pdf["text"]
            for fact_idx, (pred, rx, obj_role, obj_dtype) in enumerate(patterns):
                hit = text.str.extract(rx)  # vectorized; NaN rows = no match
                mask = hit["subj"].notna()
                if not mask.any():
                    continue
                sub = pd.DataFrame(
                    {
                        "doc_id": pdf.loc[mask, "doc_id"].values,
                        "span_pos": pdf.loc[mask, "span_pos"].values,
                        "fact_idx": fact_idx,
                        "subj_surface": hit.loc[mask, "subj"].values,
                        "pred": pred,
                        "obj_surface": None,
                        "obj_literal": None,
                        "obj_dtype": None,
                        "obj_lang": None,
                    }
                )
                if obj_role == "entity":
                    sub["obj_surface"] = hit.loc[mask, "obj"].values
                elif obj_role == "literal":
                    sub["obj_literal"] = hit.loc[mask, "obj"].values
                    sub["obj_dtype"] = obj_dtype
                else:  # langstring
                    sub["obj_literal"] = hit.loc[mask, "obj"].values
                    sub["obj_dtype"] = RDF_LANGSTRING
                    sub["obj_lang"] = hit.loc[mask, "lang"].values
                outs.append(sub)
            if outs:
                out = pd.concat(outs, ignore_index=True)
                out["span_pos"] = out["span_pos"].astype("int32")
                out["fact_idx"] = out["fact_idx"].astype("int32")
                yield out
            else:
                yield pd.DataFrame(
                    {f.name: pd.Series(dtype="object") for f in MENTIONS_SCHEMA}
                )

    return text_spans.mapInPandas(extract, schema=MENTIONS_SCHEMA)


def extract_mentions(documents: DataFrame) -> DataFrame:
    """E2: fact extraction over text spans + media attachment.

    Returns MENTIONS_SCHEMA rows. Media spans become
    (first-subject-of-doc, depictedIn, media_ref) mentions via a native
    min_by aggregation + equi-join — no Python touches media rows."""
    exploded = explode_spans(documents)
    fact_mentions = extract_fact_mentions(documents)
    if not documents.isStreaming:
        # fact_mentions feeds BOTH the first-subject aggregate and the
        # final union; without materialization the pandas-UDF extraction
        # — the only Python-side cost in the pipeline — runs twice per
        # action (no exchange reuse bridges the two consumers)
        fact_mentions = fact_mentions.localCheckpoint(eager=True)

    # Media spans → attach to the doc's first extracted subject (min span
    # position, then min fact ordinal). min_by keeps this one hash-agg job.
    first_subject = fact_mentions.groupBy("doc_id").agg(
        F.min_by(
            "subj_surface", F.struct("span_pos", "fact_idx")
        ).alias("subj_surface")
    )
    media_mentions = (
        exploded.filter(F.col("kind") != "text")
        .join(first_subject, "doc_id")  # AQE broadcasts/coalesces as sized
        .select(
            "doc_id",
            "span_pos",
            F.lit(0).cast("int").alias("fact_idx"),
            "subj_surface",
            F.lit(P_DEPICTED_IN).alias("pred"),
            F.lit(None).cast("string").alias("obj_surface"),
            F.col("media_ref").alias("obj_literal"),
            F.lit(None).cast("string").alias("obj_dtype"),
            F.lit(None).cast("string").alias("obj_lang"),
        )
    )
    return fact_mentions.unionByName(media_mentions)
