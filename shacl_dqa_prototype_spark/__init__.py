"""shacl_dqa_prototype_spark — a from-scratch PySpark-native KG-construction +
SHACL data-quality-assessment engine.

Re-expresses the query/data-processing capabilities of
caroocortes/SHACL-DQA-prototype (reference at /root/reference, a single-process
rdflib + pySHACL pipeline) as an idiomatic Spark DataFrame pipeline:

* ``sources``       — document / RDF / vocab scans, triple + report sinks, manifest
* ``operators``     — KG construction (extract, link, canonicalize) and
                      training-data ops (dedup, similarity, text stats, multimodal)
* ``plans``         — the DQA constraint planner: profiling aggregates,
                      compiled constraint families, score aggregation
* ``functions``     — scalar expression helpers (XSD datatype lattice, IRI utils)
* ``streaming``     — incremental (Structured Streaming) document ingestion

Design rules (BASELINE.json north_rule):
  - DataFrame/SQL only; no RDDs; no per-row Python UDFs — pandas/Arrow UDFs
    (`mapInPandas`, `applyInPandas`, scalar `pandas_udf`) where Python is needed.
  - Small dims (vocab terms, entity dictionary, metric metadata) broadcast.
  - Triple table partitioned by subject hash; skew handled via salting + AQE.
  - Every stage writes a manifest row so a killed job resumes.
"""

__version__ = "0.1.0"
