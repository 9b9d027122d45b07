"""RDF term model used on the driver (constants, one-offs, golden tests).

Executor-side values never use these classes — they live in the flat quad
DataFrame columns (see rdf_mapper_spark.quads). This tiny model exists so the
driver can constant-fold row-independent templates (one_offs, auto-declared
vocabulary, namespaces) without a Spark job, and so tests can compare quad
sets parsed from reference golden Turtle files.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

XSD = "http://www.w3.org/2001/XMLSchema#"


@dataclass(frozen=True)
class Term:
    kind: str  # 'iri' | 'bnode' | 'literal'
    value: str
    datatype: Optional[str] = None
    lang: Optional[str] = None

    def __post_init__(self) -> None:
        assert self.kind in ("iri", "bnode", "literal"), self.kind


def iri(value: str) -> Term:
    return Term("iri", value)


def bnode(label: str) -> Term:
    return Term("bnode", label)


def literal(value: Any, datatype: str | None = None, lang: str | None = None) -> Term:
    """Build a literal with the canonical lexical forms the engine emits.

    Canonical forms match what rdflib's Literal produces for the same Python
    value (reference emits rdflib Literals, pattern.py:49-65):
      bool  -> "true"/"false", xsd:boolean
      int   -> str(int),       xsd:integer
      float -> repr(float),    xsd:double (xsd:decimal set explicitly upstream)
    """
    if isinstance(value, Term):
        return value
    if isinstance(value, bool):
        return Term("literal", "true" if value else "false",
                    datatype or XSD + "boolean")
    if isinstance(value, int):
        return Term("literal", str(value), datatype or XSD + "integer")
    if isinstance(value, float):
        return Term("literal", repr(value), datatype or XSD + "double")
    return Term("literal", str(value), datatype, lang)


@dataclass(frozen=True)
class Quad:
    g: Optional[str]  # None = default graph
    s: Term
    p: str
    o: Term

    def as_row(self) -> tuple:
        return (self.g, self.s.kind, self.s.value, self.p,
                self.o.kind, self.o.value, self.o.datatype, self.o.lang)
