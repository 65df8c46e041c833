"""RDF term helpers: well-known IRIs + scalar IRI expressions.

Semantics sourced from the reference's term handling
(/root/reference/utils.py:138-154 namespace split on '#'/'/';
blank nodes carried as '_:'-prefixed strings, SURVEY.md §1.2).
All helpers are native Column expressions (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SH = "http://www.w3.org/ns/shacl#"
VOID = "http://rdfs.org/ns/void#"
DCT = "http://purl.org/dc/terms/"
FOAF = "http://xmlns.com/foaf/0.1/"
DCAT = "http://www.w3.org/ns/dcat#"

RDF_TYPE = f"{RDF}type"
RDF_LANGSTRING = f"{RDF}langString"
RDFS_LABEL = f"{RDFS}label"
RDFS_CLASS = f"{RDFS}Class"
RDF_PROPERTY = f"{RDF}Property"
OWL_NAMED_INDIVIDUAL = f"{OWL}NamedIndividual"
OWL_SAME_AS = f"{OWL}sameAs"

# Reification/container classes flagged by the ProlixFeatures shape
# (data_shapes.template.ttl:204-234 in the reference).
PROLIX_CLASSES = [
    f"{RDF}Statement",
    f"{RDF}List",
    f"{RDF}Seq",
    f"{RDF}Bag",
    f"{RDF}Alt",
]

# Focus nodes typed with any of these are exempt from entity-scoped shapes
# (the pervasive sh:or escape wrapper, data_shapes.template.ttl:16-33).
EXEMPT_TYPES = [RDFS_CLASS, RDF_PROPERTY, OWL_NAMED_INDIVIDUAL]


def is_bnode(term: Column) -> Column:
    return term.startswith("_:")


def namespace_of(term: Column) -> Column:
    """Namespace prefix of an IRI: everything up to and including the last
    '#' or '/' (mirrors the reference's get_ns split, utils.py:138-154)."""
    return F.regexp_extract(term, r"^(.*[#/])", 1)
