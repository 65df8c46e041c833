"""Property-based hardening of the two pure-grammar surfaces:

* the N-Triples line grammar (sources/rdf.py: _NT_LINE + _unescape) —
  hypothesis-generated terms, serialized with ECHAR and UCHAR escaping,
  must roundtrip exactly (reference ingests via rdflib, utils.py:66-67;
  our distributed parser must accept the same lines);
* the XSD lexical checks (functions/xsd.py) — curated valid/invalid
  lexical forms from the public XSD 1.1 spec evaluated through the real
  Spark expression, plus a Java-vs-Python regex dialect agreement sweep
  (the pipeline evaluates the patterns in java.util.regex via rlike; a
  pattern that silently means something else in Java would pass every
  Python-side unit test and still misvalidate in production).
"""

from __future__ import annotations

import random
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from shacl_dqa_prototype_spark.sources.rdf import _NT_LINE, _unescape

# ---------------------------------------------------------------------------
# N-Triples line grammar
# ---------------------------------------------------------------------------

_ECHAR = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t",
          "\b": "\\b", "\f": "\\f"}


def nt_escape(s: str) -> str:
    return "".join(_ECHAR.get(c, c) for c in s)


def nt_escape_numeric(s: str) -> str:
    """Escape EVERY char as \\uXXXX / \\UXXXXXXXX (legal per UCHAR)."""
    return "".join(
        f"\\u{ord(c):04x}" if ord(c) < 0x10000 else f"\\U{ord(c):08x}"
        for c in s
    )


# IRIREF content: anything except control chars and <>"{}|^`\ and space
_iri_text = st.text(
    alphabet=st.characters(
        blacklist_characters='<>"{}|^`\\ \x7f',
        blacklist_categories=("Cs", "Cc"),
    ),
    min_size=1,
    max_size=40,
)
_lit_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    max_size=60,
)
_lang = st.from_regex(r"[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8}){0,2}", fullmatch=True)
_bnode = st.from_regex(r"_:[A-Za-z][A-Za-z0-9]{0,10}", fullmatch=True)


def _parse_line(line: str):
    """Scalar emulation of the mapInPandas batch parser: one row dict or
    None, with the same unescaping rules."""
    m = _NT_LINE.match(line)
    if not m or m.group("p") is None:
        return None
    g = m.groupdict()
    s = _unescape(g["s_iri"]) if g["s_iri"] is not None else g["s_bn"]
    if g["o_iri"] is not None:
        o, kind = _unescape(g["o_iri"]), "iri"
    elif g["o_bn"] is not None:
        o, kind = g["o_bn"], "bnode"
    else:
        o, kind = _unescape(g["o_lit"]), "literal"
    return {"s": s, "p": _unescape(g["p"]), "o": o, "o_kind": kind,
            "o_lang": g["lang"], "o_dt": g["dt"]}


@settings(max_examples=300, deadline=None)
@given(s=_iri_text, p=_iri_text, lit=_lit_text, lang=_lang, dt=_iri_text,
       obj_form=st.integers(0, 3), numeric=st.booleans())
def test_nt_line_roundtrip(s, p, lit, lang, dt, obj_form, numeric):
    esc = nt_escape_numeric if numeric else nt_escape
    if obj_form == 0:  # plain literal
        obj, want = f'"{esc(lit)}"', (lit, "literal", None, None)
    elif obj_form == 1:  # lang-tagged
        obj, want = f'"{esc(lit)}"@{lang}', (lit, "literal", lang, None)
    elif obj_form == 2:  # typed
        obj, want = f'"{esc(lit)}"^^<{dt}>', (lit, "literal", None, dt)
    else:  # IRI object
        obj, want = f"<{esc(s)}>", (s, "iri", None, None)

    line = f"<{esc(s)}> <{esc(p)}> {obj} ."
    row = _parse_line(line)
    assert row is not None, line
    assert row["s"] == s and row["p"] == p
    assert (row["o"], row["o_kind"], row["o_lang"], row["o_dt"]) == want


@settings(max_examples=100, deadline=None)
@given(s=_bnode, p=_iri_text, o=_bnode)
def test_nt_line_bnodes(s, p, o):
    row = _parse_line(f"{s} <{nt_escape(p)}> {o} .")
    assert row == {"s": s, "p": p, "o": o, "o_kind": "bnode",
                   "o_lang": None, "o_dt": None}


@pytest.mark.parametrize("junk", [
    "", "# a comment", "<a> <b> .", "<a> <b> <c>",          # no final dot
    '<a> <b> "unterminated .', "<a> literal-predicate <c> .",
])
def test_nt_line_rejects_junk(junk):
    assert _parse_line(junk) is None


# ---------------------------------------------------------------------------
# XSD lexical checks — curated spec examples, evaluated through Spark
# ---------------------------------------------------------------------------

_XSD = "http://www.w3.org/2001/XMLSchema#"

# (datatype localname, valid forms, invalid forms) — public XSD 1.1 spec
XSD_CASES = [
    ("integer", ["0", "-5", "+42", "00012"], ["", "1.0", "1e2", "five", "-"]),
    ("decimal", ["3.14", "-.5", "+2.", "7"], ["", "1e2", "INF", "1,5"]),
    ("double", ["1.5E2", "-INF", "NaN", ".5", "3"], ["", "INF3", "e2", "1.5ee"]),
    ("float", ["+INF", "1e-9", "0.0"], ["nan", "inf", "1 2"]),
    ("boolean", ["true", "false", "0", "1"], ["", "True", "yes", "2"]),
    ("date", ["2024-02-29", "0001-01-01Z", "2024-12-31+05:30"],
             ["2024-13-01", "2024-2-9", "24-01-01", "2024-00-10"]),
    ("time", ["13:20:00", "24:00:00", "09:00:00.5Z", "23:59:59-14:00"],
             ["25:00:00", "13:60:00", "1:00:00", "13:20"]),
    ("dateTime", ["2024-01-02T03:04:05", "2024-01-02T03:04:05.6Z"],
                 ["2024-01-02", "03:04:05", "2024-01-02 03:04:05"]),
    ("gYear", ["2024", "-0044", "0999Z"], ["24", "25", "2024-01"]),
    ("gYearMonth", ["2024-05"], ["2024", "2024-13"]),
    ("duration", ["P1Y2M3DT4H5M6S", "PT0.5S", "-P7D"],
                 ["1Y", "P-1Y"]),
    ("yearMonthDuration", ["P1Y", "-P2M"], ["P1D", "PT1H"]),
    ("dayTimeDuration", ["P1DT2H", "PT3M"], ["P1Y"]),
    ("byte", ["-128", "+127"], ["a", "1.0"]),
    ("unsignedInt", ["0", "42"], ["-1", "+1"]),
    ("positiveInteger", ["1", "999"], ["0", "-1", "+1"]),
    ("nonNegativeInteger", ["0", "7"], ["-1"]),
    ("negativeInteger", ["-1"], ["0", "1", "-0"]),
    ("nonPositiveInteger", ["-5", "0"], ["1", "-"]),
    ("hexBinary", ["", "0FB7", "abcd"], ["0FB", "0x17", "GG"]),
    ("base64Binary", ["", "TWFu", "TWE=", "TQ=="], ["T", "TWFu=", "T!Q="]),
    ("language", ["en", "en-US", "x-klingon1"], ["", "a b", "toolonglang1"]),
    ("string", ["anything at all\neven newlines"], []),
]


def test_xsd_curated_cases(spark):
    """Every curated lexical form judged by the REAL Spark expression."""
    from pyspark.sql import functions as F

    from shacl_dqa_prototype_spark.functions.xsd import well_formed_expr

    rows = [(f"{_XSD}{dt}", lex, True) for dt, ok, bad in XSD_CASES for lex in ok]
    rows += [(f"{_XSD}{dt}", lex, False) for dt, ok, bad in XSD_CASES for lex in bad]
    df = spark.createDataFrame(rows, "o_dtype string, o string, want boolean")
    got = df.withColumn(
        "ok", well_formed_expr(F.col("o"), F.col("o_dtype"))).collect()
    wrong = [(r["o_dtype"].split("#")[1], r["o"], r["ok"], r["want"])
             for r in got if bool(r["ok"]) != r["want"]]
    assert not wrong, wrong


def test_xsd_java_python_regex_agreement(spark):
    """rlike (java.util.regex) and Python re must agree on every pattern
    over an adversarial ASCII corpus — catches dialect drift (\\w, inline
    flags, alternation) that Python-only tests would miss."""
    from pyspark.sql import functions as F

    from shacl_dqa_prototype_spark.functions.xsd import (
        XSD_REGEX_PATTERNS,
        well_formed_expr,
    )

    rng = random.Random(20260817)
    alphabet = "0123456789+-.eEINFaNTZP:YMDHS truefalse_ABCxyz/="
    corpus = list({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        for _ in range(400)
    })
    rows = [(dt, s) for dt in XSD_REGEX_PATTERNS for s in corpus]
    df = spark.createDataFrame(rows, "o_dtype string, o string")
    got = df.withColumn(
        "ok", well_formed_expr(F.col("o"), F.col("o_dtype"))).collect()
    compiled = {dt: re.compile(p) for dt, p in XSD_REGEX_PATTERNS.items()}
    wrong = [
        (r["o_dtype"].split("#")[1], r["o"], bool(r["ok"]))
        for r in got
        if bool(r["ok"]) != bool(compiled[r["o_dtype"]].search(r["o"]))
    ]
    assert not wrong, wrong[:10]


# ---------------------------------------------------------------------------
# Turtle subset grammar (driver-side parser for reference fixtures)
# ---------------------------------------------------------------------------

_pname_local = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True)
_XSD_NS = "http://www.w3.org/2001/XMLSchema#"


@settings(max_examples=120, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            _pname_local,                               # subject local name
            st.lists(                                   # predicate-object list
                st.tuples(
                    _pname_local,                       # predicate local name
                    st.lists(st.tuples(                 # object list
                        st.sampled_from(
                            ["iri", "pname", "lit", "lang", "typed",
                             "int", "dec", "bool", "bnode"]),
                        _pname_local,
                        _lit_text,
                    ), min_size=1, max_size=3),
                ),
                min_size=1, max_size=3,
            ),
        ),
        min_size=1, max_size=4,
    ),
    tight_dot=st.booleans(),
)
def test_turtle_roundtrip(data, tight_dot):
    """Serialize generated triples through the Turtle subset the parser
    documents (@prefix, pnames, ';' and ',' lists, typed/lang literals,
    bare numerics) and require exact roundtrip. tight_dot glues the final
    '.' to the last object (legal Turtle that a greedy tokenizer breaks)."""
    from shacl_dqa_prototype_spark.sources.rdf import RDF_NS, parse_turtle

    NS = "http://example.org/ns#"
    expected, stmts = [], []
    for s_local, po in data:
        s = NS + s_local
        po_strs = []
        for p_local, objs in po:
            p = NS + p_local
            o_strs = []
            for form, local, lit in objs:
                esc = nt_escape(lit)
                if form == "iri":
                    o_strs.append(f"<{NS}{local}>")
                    expected.append((s, p, NS + local, "iri", None, None))
                elif form == "pname":
                    o_strs.append(f"ex:{local}")
                    expected.append((s, p, NS + local, "iri", None, None))
                elif form == "bnode":
                    o_strs.append(f"_:{local}")
                    expected.append((s, p, f"_:{local}", "bnode", None, None))
                elif form == "lit":
                    o_strs.append(f'"{esc}"')
                    expected.append((s, p, lit, "literal", None, None))
                elif form == "lang":
                    o_strs.append(f'"{esc}"@en-GB')
                    expected.append(
                        (s, p, lit, "literal", f"{RDF_NS}langString", "en-GB"))
                elif form == "typed":
                    o_strs.append(f'"{esc}"^^xsd:anyURI')
                    expected.append(
                        (s, p, lit, "literal", f"{_XSD_NS}anyURI", None))
                elif form == "int":
                    o_strs.append("42")
                    expected.append(
                        (s, p, "42", "literal", f"{_XSD_NS}integer", None))
                elif form == "dec":
                    o_strs.append("3.5")
                    expected.append(
                        (s, p, "3.5", "literal", f"{_XSD_NS}decimal", None))
                elif form == "bool":
                    o_strs.append("true")
                    expected.append(
                        (s, p, "true", "literal", f"{_XSD_NS}boolean", None))
            po_strs.append(f"ex:{p_local} " + " , ".join(o_strs))
        dot = "." if tight_dot else " ."
        stmts.append(f"ex:{s_local} " + " ;\n    ".join(po_strs) + dot)

    ttl = (f"@prefix ex: <{NS}> .\n"
           f"@prefix xsd: <{_XSD_NS}> .\n"
           "# a comment\n" + "\n".join(stmts) + "\n")
    assert parse_turtle(ttl) == expected


# ---------------------------------------------------------------------------
# asof_join vs pandas.merge_asof: the UNION+window formulation must agree
# with the reference single-node implementation on arbitrary keyed series.
# Right-side timestamps are made unique per key (the operator's documented
# precondition); Spark rounds differently from pandas nowhere here because
# values are carried verbatim, never computed.
# ---------------------------------------------------------------------------

_key = st.sampled_from(["k1", "k2", "k3"])
_t = st.integers(min_value=0, max_value=50)


@settings(max_examples=25, deadline=None)
@given(
    left=st.lists(st.tuples(_key, _t), min_size=1, max_size=12),
    right=st.lists(st.tuples(_key, _t), min_size=1, max_size=12),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction):
    import pandas as pd

    from shacl_dqa_prototype_spark.operators.asof import asof_join
    # unique right rows per (key, t); value identifies the matched row
    rd = {}
    for k, t in right:
        rd[(k, t)] = len(rd)
    rpdf = pd.DataFrame(
        [(k, float(t), v) for (k, t), v in rd.items()],
        columns=["k", "t", "v"])
    lpdf = pd.DataFrame(
        [(i, k, float(t)) for i, (k, t) in enumerate(left)],
        columns=["i", "k", "t"])
    got = asof_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
        on="t", by=("k",), right_cols=("v",), direction=direction,
    ).toPandas().set_index("i")["v_r"].to_dict()
    exp_df = pd.merge_asof(
        lpdf.sort_values("t", kind="stable"), rpdf.sort_values("t"),
        on="t", by="k", direction=direction, suffixes=("", "_r"),
    ).set_index("i")
    exp = exp_df["v"].to_dict()
    assert set(got) == set(exp)
    for i in got:
        g, e = got[i], exp[i]
        assert (pd.isna(g) and pd.isna(e)) or g == e, (i, g, e, left, right)


# ---------------------------------------------------------------------------
# interval_join vs the naive quadratic pair enumeration: the binned
# equi-join must produce EXACTLY the pairs with r.t in [l.t+lo, l.t+hi],
# for arbitrary keyed integer series and arbitrary window placement
# (including negative lower bounds and bin-edge alignments).
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    left=st.lists(st.tuples(_key, _t), min_size=1, max_size=10),
    right=st.lists(st.tuples(_key, _t), min_size=1, max_size=10),
    lo=st.integers(min_value=-20, max_value=20),
    width=st.integers(min_value=1, max_value=25),
)
def test_interval_join_matches_naive(spark, left, right, lo, width):
    import datetime as dt

    from shacl_dqa_prototype_spark.operators.asof import interval_join

    hi = lo + width
    t0 = dt.datetime(2024, 1, 1)

    def ts(t):
        return t0 + dt.timedelta(seconds=t)

    lpdf = [(i, k, ts(t)) for i, (k, t) in enumerate(left)]
    rpdf = [(j, k, ts(t)) for j, (k, t) in enumerate(right)]
    got = {(r["li"], r["rj"]) for r in interval_join(
        spark.createDataFrame(lpdf, ["li", "k", "lt"]),
        spark.createDataFrame(rpdf, ["rj", "k", "rt"]),
        lower_s=lo, upper_s=hi, by=("k",), left_ts="lt", right_ts="rt",
    ).collect()}
    exp = {(i, j)
           for i, (lk, lt) in enumerate(left)
           for j, (rk, rt) in enumerate(right)
           if lk == rk and lt + lo <= rt <= lt + hi}
    assert got == exp, (left, right, lo, hi)


def _q_escape(s: str, quote: str, raw_newlines: bool) -> str:
    """Serialize a literal body for the given quote style: escape the
    backslash and the active quote char always; newlines stay raw inside
    long strings and escape inside short ones."""
    out = []
    for c in s:
        if c == "\\":
            out.append("\\\\")
        elif c == quote:
            out.append("\\" + quote)
        elif c == "\n" and not raw_newlines:
            out.append("\\n")
        elif c == "\r":
            out.append("\\r")
        else:
            out.append(c)
    return "".join(out)


@settings(max_examples=80, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            _pname_local,
            st.lists(
                st.tuples(
                    _pname_local,
                    st.sampled_from(
                        ["longlit_d", "longlit_s", "sqlit", "double",
                         "bnlist", "coll", "iri"]),
                    _lit_text,
                ),
                min_size=1, max_size=3,
            ),
        ),
        min_size=1, max_size=4,
    ),
)
def test_turtle_roundtrip_extended_grammar(data):
    """Round-5 grammar constructs round-trip: long strings in both quote
    styles with RAW newlines and embedded quotes, single-quoted short
    literals, exponent doubles, anonymous bnode property lists, and
    collections. Generated anon labels are seed-order-dependent, so each
    [ … ] carries a unique ex:tag and each collection cell is identified
    by its rdf:first value; rows compare after canonicalizing labels."""
    from shacl_dqa_prototype_spark.sources.rdf import RDF_NS, parse_turtle

    NS = "http://example.org/ns#"
    expected, stmts = [], []
    uniq = 0
    for s_local, po in data:
        s = NS + s_local
        po_strs = []
        for p_local, form, lit in po:
            p = NS + p_local
            uniq += 1
            if form == "longlit_d":
                body = lit + '\nextra "q" line'
                po_strs.append(
                    f'ex:{p_local} """{_q_escape(body, chr(34), True)}"""')
                expected.append((s, p, body, "literal", None, None))
            elif form == "longlit_s":
                body = lit + "\nit's line two"
                po_strs.append(
                    f"ex:{p_local} '''{_q_escape(body, chr(39), True)}'''")
                expected.append((s, p, body, "literal", None, None))
            elif form == "sqlit":
                po_strs.append(
                    f"ex:{p_local} '{_q_escape(lit, chr(39), False)}'")
                expected.append((s, p, lit, "literal", None, None))
            elif form == "double":
                po_strs.append(f"ex:{p_local} 2.5e{uniq % 7}")
                expected.append((s, p, f"2.5e{uniq % 7}", "literal",
                                 f"{_XSD_NS}double", None))
            elif form == "bnlist":
                tag = f"tag{uniq}"
                po_strs.append(
                    f'ex:{p_local} [ ex:tag "{tag}" ; '
                    f'ex:val "{nt_escape(lit)}" ]')
                node = f"BN:{tag}"
                expected.append((node, f"{NS}tag", tag, "literal", None, None))
                expected.append((node, f"{NS}val", lit, "literal", None, None))
                expected.append((s, p, node, "bnode", None, None))
            elif form == "coll":
                a, b = f"ca{uniq}", f"cb{uniq}"
                po_strs.append(f'ex:{p_local} ("{a}" "{b}")')
                n1, n2 = f"CELL:{a}", f"CELL:{b}"
                expected.append((n1, f"{RDF_NS}first", a, "literal", None, None))
                expected.append((n1, f"{RDF_NS}rest", n2, "bnode", None, None))
                expected.append((n2, f"{RDF_NS}first", b, "literal", None, None))
                expected.append((n2, f"{RDF_NS}rest", f"{RDF_NS}nil",
                                 "iri", None, None))
                expected.append((s, p, n1, "bnode", None, None))
            else:  # iri
                po_strs.append(f"ex:{p_local} <{NS}o{uniq}>")
                expected.append((s, p, f"{NS}o{uniq}", "iri", None, None))
        stmts.append(f"ex:{s_local} " + " ;\n    ".join(po_strs) + " .")

    ttl = f"@prefix ex: <{NS}> .\n" + "\n".join(stmts) + "\n"
    got = parse_turtle(ttl)

    # canonicalize generated labels: bnlist nodes by their ex:tag value,
    # collection cells by their rdf:first value
    label = {}
    for r in got:
        if r[0].startswith("_:g"):
            if r[1] == f"{NS}tag":
                label[r[0]] = f"BN:{r[2]}"
            elif r[1] == f"{RDF_NS}first":
                label[r[0]] = f"CELL:{r[2]}"
    canon = sorted(
        (label.get(r[0], r[0]), r[1], label.get(r[2], r[2]), *r[3:])
        for r in got)
    assert canon == sorted(expected)
