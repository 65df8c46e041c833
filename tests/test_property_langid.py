"""Property-based cross-check of language_id: the marker-occurrence
scores and the (score, lang) struct argmax — including the documented
tie-break (alphabetically LAST language wins) and the zero-hit 'und'
fallback — vs a pure-python scan on texts mixing markers from several
languages (overlapping-occurrence cases like 'the the' included).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# fragments chosen to collide across languages (la: es+fr; de occurs in
# es-marker ' de '; bare words force padding-edge handling) and to create
# exact score ties between languages
_frag = st.sampled_from([
    "the cat and the dog of note",
    "el gato la casa de nada",
    "der hund und das haus",
    "le chien et la maison",
    "the the the",
    "de de",
    "la la la",
    "xyzzy plugh",
    "",
])


@settings(max_examples=30, deadline=None)
@given(frags=st.lists(_frag, min_size=1, max_size=3))
def test_language_id_matches_python_argmax(spark, frags):
    from shacl_dqa_prototype_spark.operators.textstats import (
        LANG_MARKERS,
        language_id,
    )

    text = " ".join(frags)
    df = spark.createDataFrame([("d0", text)], ["doc_id", "text"])
    got = language_id(df).collect()[0]["lang_pred"]

    padded = f" {text.lower()} "
    best = max(
        (float(sum(padded.count(m) for m in LANG_MARKERS[lang])), lang)
        for lang in sorted(LANG_MARKERS)
    )
    exp = best[1] if best[0] > 0.0 else "und"
    assert got == exp, (text, best)
