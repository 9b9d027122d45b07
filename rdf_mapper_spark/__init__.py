"""rdf_mapper_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of epimorphics/rdf-mapper
(reference at /root/reference) on Apache Spark:

* the declarative YAML mapping-template language (resources, properties,
  value-transformer pipelines, IRI minting, named graphs) compiles ONCE on
  the driver into Catalyst ``Column`` expression trees — there is no per-row
  interpreter anywhere in the execution path;
* the universal intermediate representation is a flat **quad DataFrame**
  (``g, sk, s, p, ok, o, odt, olg``) with RDF set semantics enforced by
  (salted) ``dropDuplicates``;
* everything Python in the hot path is vectorized (Arrow / pandas UDFs);
* a web-scale pipeline (pages → extract → link → canonicalize → materialize)
  generalizes the same machinery to Common-Crawl-style KG construction.

Reference parity citations are given per module as ``/root/reference/<path>:<line>``.
"""

from rdf_mapper_spark.quads import QUAD_FIELDS, quad_schema
from rdf_mapper_spark.spec import MappingSpec, load_spec, load_spec_text
from rdf_mapper_spark.engine import MapperEngine

__all__ = [
    "MappingSpec",
    "load_spec",
    "load_spec_text",
    "MapperEngine",
    "QUAD_FIELDS",
    "quad_schema",
]

__version__ = "0.1.0"
