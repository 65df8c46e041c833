"""E8 — span-sequence invariant (BASELINE.json input_hint).

After explode/process, each row's (kind, text, media_ref, order) sequence
must be byte-equal to the input. Reconstruction: ordered collect_list over
the positional index from posexplode — sort happens inside the array
(array_sort over (pos, span) structs), NOT a global orderBy, so the check
is one hash-aggregate job regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconstruct_documents(exploded: DataFrame) -> DataFrame:
    """(doc_id, span_pos, kind, text, media_ref) → (doc_id, spans) with the
    original order restored from span_pos."""
    return (
        exploded.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("span_pos").alias("pos"),
                        F.struct("kind", "text", "media_ref").alias("span"),
                    )
                )
            ).alias("ordered")
        )
        .select(
            "doc_id",
            F.transform(
                "ordered",
                lambda t: F.struct(
                    t["span"]["kind"].alias("kind"),
                    t["span"]["text"].alias("text"),
                    t["span"]["media_ref"].alias("media_ref"),
                    t["pos"].alias("order"),
                ),
            ).alias("spans_seq"),
        )
    )


def invariant_violations(documents: DataFrame, exploded: DataFrame) -> DataFrame:
    """Docs whose reconstructed (kind, text, media_ref, order) sequence is
    not byte-equal to the input. Comparison via canonical JSON of both
    sequences (to_json is deterministic for equal structs)."""
    original = documents.select(
        "doc_id",
        F.to_json(
            F.transform(
                "spans",
                lambda s, i: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    i.alias("order"),
                ),
            )
        ).alias("expected"),
    )
    rebuilt = reconstruct_documents(exploded).select(
        "doc_id", F.to_json("spans_seq").alias("actual")
    )
    return (
        original.join(rebuilt, "doc_id", "full")
        # a doc with spans=[] is absent from the exploded side (posexplode
        # emits nothing), so actual is NULL while expected is "[]" — the
        # coalesce makes that a PASS, not a spurious violation; a doc
        # genuinely missing from either side still compares unequal
        .filter(F.coalesce("expected", F.lit("[]"))
                != F.coalesce("actual", F.lit("[]")))
        .select("doc_id", "expected", "actual")
    )
