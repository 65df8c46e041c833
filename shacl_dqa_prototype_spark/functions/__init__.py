"""Scalar expression helpers (JVM-side, whole-stage-codegen friendly)."""

from shacl_dqa_prototype_spark.functions.xsd import (  # noqa: F401
    XSD_REGEX_PATTERNS,
    ill_formed_literal,
    well_formed_expr,
)
from shacl_dqa_prototype_spark.functions.terms import (  # noqa: F401
    RDF_TYPE,
    is_bnode,
    namespace_of,
)
