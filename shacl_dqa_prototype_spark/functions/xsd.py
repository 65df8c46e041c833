"""XSD datatype lexical-form validation as native Spark expressions.

The reference validates typed literals by regex per datatype
(/root/reference/const.py:107-145, ``REGEX_PATTERNS_DICT`` — used by the
MalformedLiteral / CorrectRange shapes, SURVEY.md §2C C28/C32). SHACL's
``sh:datatype`` semantics = datatype IRI matches AND the lexical form is
well-formed; ill-typed literals violate.

Spark-first design: the ~36 patterns compile to ONE generated ``CASE WHEN
o_dtype = <dt> THEN o RLIKE <pattern> ...`` chain — stays inside whole-stage
codegen, no UDF, no join. (A broadcast-map join would add a shuffle-free but
still materialized build side; a literal CASE chain is cheaper and constant-
folded by Catalyst.)

Patterns are the public XSD 1.1 lexical grammars; both Python ``re`` and Java
``java.util.regex`` accept this subset identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_XSD = "http://www.w3.org/2001/XMLSchema#"

# XSD 1.1 lexical-space regexes (same table the reference uses; public spec).
XSD_REGEX_PATTERNS: dict[str, str] = {
    f"{_XSD}integer": r"^[\-+]?[0-9]+$",
    f"{_XSD}double": r"^((\+|-)?([0-9]+(\.[0-9]*)?|\.[0-9]+)([Ee](\+|-)?[0-9]+)?|(\+|-)?INF|NaN)$",
    f"{_XSD}float": r"^((\+|-)?([0-9]+(\.[0-9]*)?|\.[0-9]+)([Ee](\+|-)?[0-9]+)?|(\+|-)?INF|NaN)$",
    f"{_XSD}decimal": r"^(\+|-)?([0-9]+(\.[0-9]*)?|\.[0-9]+)$",
    f"{_XSD}time": r"^(([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?|(24:00:00(\.0+)?))(Z|(\+|-)((0[0-9]|1[0-3]):[0-5][0-9]|14:00))?$",
    f"{_XSD}date": r"^-?([1-9][0-9]{3,}|0[0-9]{3})-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])(Z|(\+|-)((0[0-9]|1[0-3]):[0-5][0-9]|14:00))?$",
    f"{_XSD}dateTime": r"^-?([1-9][0-9]{3,}|0[0-9]{3})-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])T(([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?|(24:00:00(\.0+)?))(Z|(\+|-)((0[0-9]|1[0-3]):[0-5][0-9]|14:00))?$",
    f"{_XSD}dateTimeStamp": r"^-?([1-9][0-9]{3,}|0[0-9]{3})-(0[1-9]|1[0-2])-(0[1-9]|[12][0-9]|3[01])T(([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?|(24:00:00(\.0+)?))(Z|(\+|-)((0[0-9]|1[0-3]):[0-5][0-9]|14:00))?$",
    # (?s) leads the pattern: Java allows inline flags anywhere, Python 3.11+
    # requires global flags at the start — this form is valid in both
    f"{_XSD}string": r"(?s)^.*$",
    f"{_XSD}gYear": r"^-?([1-9][0-9]{3,}|0[0-9]{3})(Z|(\+|-)((0[0-9]|1[0-3]):[0-5][0-9]|14:00))?$",
    f"{_XSD}gYearMonth": r"^-?([1-9][0-9]{3,}|0[0-9]{3})-(0[1-9]|1[0-2])(Z|(\+|-)((0[0-9]|1[0-3]):[0-5][0-9]|14:00))?$",
    # gMonth / gDay / gMonthDay are intentionally ABSENT: rdflib has no
    # Python binding for them, so the reference (pySHACL via
    # Literal.ill_typed) never reports them ill-formed — the pizza golden
    # output leaves the invalid "---45"^^xsd:gDay unflagged while flagging
    # the invalid "25"^^xsd:gYear. Unknown datatype ⇒ well-formed.
    # Known deviation from strict XSD 1.1, kept for reference parity: the
    # three duration patterns accept component-less forms ('P', 'PT',
    # '-P') that the grammar rejects (it requires >=1 component) — the
    # reference's regex table has the same acceptance, and the oracle
    # pins it.
    f"{_XSD}duration": r"^-?P([0-9]+Y)?([0-9]+M)?([0-9]+D)?(T([0-9]+H)?([0-9]+M)?([0-9]+(\.[0-9]+)?S)?)?$",
    f"{_XSD}yearMonthDuration": r"^-?P([0-9]+Y)?([0-9]+M)?$",
    f"{_XSD}dayTimeDuration": r"^-?P([0-9]+D)?(T([0-9]+H)?([0-9]+M)?([0-9]+(\.[0-9]+)?S)?)?$",
    f"{_XSD}byte": r"^[\-+]?[0-9]+$",
    f"{_XSD}short": r"^[\-+]?[0-9]+$",
    f"{_XSD}long": r"^[\-+]?[0-9]+$",
    f"{_XSD}int": r"^[\-+]?[0-9]+$",
    f"{_XSD}unsignedByte": r"^[0-9]+$",
    f"{_XSD}unsignedShort": r"^[0-9]+$",
    f"{_XSD}unsignedInt": r"^[0-9]+$",
    f"{_XSD}unsignedLong": r"^[0-9]+$",
    f"{_XSD}positiveInteger": r"^[1-9][0-9]*$",
    f"{_XSD}nonNegativeInteger": r"^[0-9]+$",
    f"{_XSD}negativeInteger": r"^-[1-9][0-9]*$",
    f"{_XSD}nonPositiveInteger": r"^(-[0-9]+|0)$",
    f"{_XSD}hexBinary": r"^([0-9a-fA-F]{2})*$",
    f"{_XSD}base64Binary": r"^([A-Za-z0-9+/]{4})*([A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{2}==)?$",
    f"{_XSD}language": r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$",
    f"{_XSD}normalizedString": r"^[^\s]+$",
    f"{_XSD}NMTOKEN": r"^\w+$",
    f"{_XSD}Name": r"^[A-Za-z_][A-Za-z0-9._-]*$",
    f"{_XSD}NCName": r"^[A-Za-z_][A-Za-z0-9._-]*$",
    f"{_XSD}boolean": r"^(true|false|0|1)$",
}


def well_formed_expr(o: Column, o_dtype: Column) -> Column:
    """Codegen-friendly CASE chain: is the lexical form ``o`` valid for
    datatype ``o_dtype``? Unknown datatypes are treated as well-formed
    (the reference only checks datatypes in its table)."""
    expr: Column = F.lit(True)
    for dt, pattern in XSD_REGEX_PATTERNS.items():
        expr = F.when(o_dtype == F.lit(dt), o.rlike(pattern)).otherwise(expr)
    return expr


def ill_formed_literal(o: Column, o_dtype: Column) -> Column:
    """True for typed literals whose lexical form violates their datatype."""
    return o_dtype.isNotNull() & ~well_formed_expr(o, o_dtype)
