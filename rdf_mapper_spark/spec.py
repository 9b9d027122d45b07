"""Mapping-spec layer: YAML document -> validated driver-side models.

Semantics-parity notes (reference: epimorphics/rdf-mapper):
* stanza set {globals, namespaces, one_offs, resources, mappings, embedded,
  properties, imports} — src/rdf_mapper/lib/mapper_spec.py:61-69
* resource validators "exactly one of pattern/properties", "not both
  @graph/@graphAdd" — mapper_spec.py:29-41
* property-pair normalization (dict or list-of-dicts, repeated keys allowed)
  — mapper_spec.py:242-262
* typed prop spec rewrites value template to append "| asType"; reconciled
  prop appends "| reconcile(...)" — mapper_spec.py:207-214
* import merge with importing-spec precedence — mapper_spec.py:152-166
* builtin namespace table — mapper_spec.py:75-87

This layer is pure driver code: it never touches Spark. The compiler
(`rdf_mapper_spark.compiler`) turns these models into DataFrame plans.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from typing import Any

import yaml
from pydantic import BaseModel, Field, model_validator

DEFAULT_GRAPH = "urn:x-rdflib:default"

#: Default base for dataset URIs (reference: mapper_spec.py:73)
BASE_URI_DEFAULT = "https://epimorphics.com/datasets/"

#: Built-in namespace prefixes (reference: mapper_spec.py:75-87)
BUILTIN_NAMESPACES: dict[str, str] = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "skosxl": "http://www.w3.org/2008/05/skos-xl#",
    "dct": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "geo": "http://www.w3.org/2003/01/geo/wgs84_pos#",
    "qb": "http://purl.org/linked-data/cube#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "org": "http://www.w3.org/ns/org#",
}

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = BUILTIN_NAMESPACES["rdf"] + "type"
RDF_PROPERTY = BUILTIN_NAMESPACES["rdf"] + "Property"
RDFS_LABEL = BUILTIN_NAMESPACES["rdfs"] + "label"
RDFS_COMMENT = BUILTIN_NAMESPACES["rdfs"] + "comment"
OWL_CLASS = BUILTIN_NAMESPACES["owl"] + "Class"
SKOS = BUILTIN_NAMESPACES["skos"]

_PROP_TYPES = ("Int", "Decimal", "Date", "Datetime", "DateOrDatetime")


class ResourceDef(BaseModel):
    """One resource template (reference ResourceModel, mapper_spec.py:17-41)."""

    name: str
    comment: str | None = None
    requires: dict[str, Any] | None = None
    unless: dict[str, Any] | None = None
    guard: str | None = None
    graph: str | None = Field(default=None, alias="@graph")
    graphAdd: str | None = Field(default=None, alias="@graphAdd")
    properties: list[dict[str, Any]] | dict[str, Any] = []
    pattern: str | None = None

    model_config = {"populate_by_name": True}

    @model_validator(mode="after")
    def _validate(self) -> "ResourceDef":
        if self.pattern and self.properties:
            raise ValueError("resource cannot define both pattern and properties")
        if not self.pattern and not self.properties:
            raise ValueError("resource must define pattern or properties")
        if self.graph and self.graphAdd:
            raise ValueError("resource cannot define both @graph and @graphAdd")
        return self


class PropertyDef(BaseModel):
    """Reusable property definition (reference PropModel, mapper_spec.py:50-59)."""

    name: str
    comment: str | None = None
    prop: str
    type: str | None = None
    cls: str = Field(alias="class")
    required: bool = False
    reconciliationAPI: str | None = None
    reconciliationType: str | None = None
    reconciliationFilters: dict[str, str] = Field(default_factory=dict)

    model_config = {"populate_by_name": True}

    @model_validator(mode="after")
    def _validate(self) -> "PropertyDef":
        if self.type is not None and self.type not in _PROP_TYPES:
            raise ValueError(f"unknown property type {self.type}")
        return self


class MappingDoc(BaseModel):
    """Top-level YAML document (reference MapperModel, mapper_spec.py:61-69)."""

    globals: dict[str, Any] = {}
    namespaces: dict[str, str] = {}
    one_offs: list[ResourceDef] = []
    resources: list[ResourceDef] = []
    mappings: dict[str, dict[str, str]] = {}
    embedded: list[ResourceDef] = []
    properties: list[PropertyDef] = []
    imports: list[str] = []


def listify_properties(props: Any) -> list[tuple[str, Any]]:
    """Normalize resource properties to an ordered (key, template) pair list.

    Accepts a dict or a list of dicts (list form permits repeated keys).
    Reference: mapper_spec.py:242-262.
    """
    pairs: list[tuple[str, Any]] = []
    blocks = props if isinstance(props, list) else [props]
    for block in blocks:
        if not isinstance(block, dict):
            raise ValueError(f"expected property dict, got {block!r}")
        pairs.extend(block.items())
    return pairs


class ResourceSpec:
    """Normalized resource template ready for compilation."""

    def __init__(self, model: ResourceDef) -> None:
        self.model = model
        self.name = model.name
        self.comment = model.comment
        self.graph = model.graph or model.graphAdd
        # @graphAdd marks the graph as preserved for update/delete sinks
        # (reference: mapper_spec.py:230-231)
        self.preserved_graph = model.graphAdd is not None
        self.pattern = model.pattern
        self.properties: list[tuple[str, Any]] = (
            [] if model.pattern is not None else listify_properties(model.properties)
        )
        self.requires = model.requires
        self.unless = model.unless
        self.guard = model.guard

    def prop_template(self, key: str) -> Any | None:
        return next((tpl for k, tpl in self.properties if k == key), None)


class PropertySpec:
    """Normalized reusable property definition."""

    def __init__(self, model: PropertyDef) -> None:
        self.model = model
        self.name = model.name
        self.comment = model.comment
        self.prop = model.prop
        self.type = model.type
        self.cls = model.cls
        self.required = model.required
        self.reconciliation_api = model.reconciliationAPI
        self.reconciliation_type = model.reconciliationType
        self.reconciliation_filters = list((model.reconciliationFilters or {}).items())

    def rewrite_template(self, template: str) -> tuple[str, str]:
        """Rewrite the value template per the prop definition.

        A typed prop appends ``| as<Type>``; a reconciled prop appends
        ``| reconcile(...)``.  Reference: mapper_spec.py:207-214.
        """
        if self.type and template.startswith("{") and template.endswith("}"):
            template = "{" + template[1:-1] + f" | as{self.type}}}"
        elif (self.reconciliation_type or self.reconciliation_filters
              or self.reconciliation_api):
            # filters are NOT serialized into the template (a pair list
            # cannot round-trip the arg grammar — the reference has the same
            # wart, mapper_spec.py:217-222 str(list)); the compiler looks
            # them up on this prop-def via the name argument instead
            args = [self.name, self.reconciliation_type, self.reconciliation_api]
            argstr = ",".join(_quote_arg(a) for a in args)
            template = "{" + template[1:-1] + f" | reconcile({argstr})}}"
        return (self.prop, template)


def _quote_arg(value: Any) -> str:
    return f"'{value}'" if isinstance(value, str) else str(value)


class MappingSpec:
    """Fully resolved mapping spec: models + merged imports + context.

    The driver-side context layering mirrors the reference ChainMap
    (builtins -> globals); per-row layers become DataFrame columns instead.
    Reference: mapper_spec.py:89-115.
    """

    def __init__(self, doc: MappingDoc | dict | None = None,
                 auto_declare: bool = True,
                 search_root: str | None = None) -> None:
        if doc is None:
            doc = MappingDoc()
        if isinstance(doc, dict):
            doc = MappingDoc(**doc)
        self.doc = doc
        self.auto_declare = auto_declare
        self._search_root = search_root or os.getcwd()

        self.globals: dict[str, Any] = dict(doc.globals)
        self.context: dict[str, Any] = {"$baseURI": BASE_URI_DEFAULT}
        self.context.update(self.globals)
        if not self.context.get("$datasetBase"):
            # NB: f-string of a missing $datasetID yields the literal "None",
            # matching the reference default (mapper_spec.py:113-115).
            self.context["$datasetBase"] = (
                f"{self.context.get('$baseURI')}{self.context.get('$datasetID')}"
            )

        self.namespaces: dict[str, str] = dict(BUILTIN_NAMESPACES)
        self.namespaces.update(doc.namespaces)

        self.one_offs = [ResourceSpec(m) for m in doc.one_offs]
        self.resources = [ResourceSpec(m) for m in doc.resources]
        self.mappings: dict[str, dict[str, str]] = dict(doc.mappings)
        self.embedded: dict[str, ResourceSpec] = {}
        for m in doc.embedded:
            rs = ResourceSpec(m)
            self.embedded[rs.name] = rs
        self.prop_defs: dict[str, PropertySpec] = {}
        for p in doc.properties:
            ps = PropertySpec(p)
            self.prop_defs[ps.name] = ps
        self._resolve_imports()

    # -- imports -----------------------------------------------------------
    def _resolve_imports(self) -> None:
        """Merge YAML imports / exec python plugin modules, in order.

        Importing spec takes precedence over imported values.
        Reference: mapper_spec.py:117-150.
        """
        if not self.doc.imports:
            return
        acc = MappingSpec(MappingDoc())
        for module_name in self.doc.imports:
            fpath = self._find_file(module_name)
            if not fpath:
                raise FileNotFoundError(f"import not found: {module_name}")
            if module_name.endswith(".yaml"):
                with open(fpath, encoding="utf-8") as fh:
                    imported = MappingSpec(MappingDoc.model_validate(yaml.safe_load(fh)))
                acc = acc.merged_under(imported)
            elif module_name.endswith(".py"):
                name = module_name[:-3]
                pyspec = importlib.util.spec_from_file_location(name, fpath)
                if pyspec and pyspec.loader:
                    module = importlib.util.module_from_spec(pyspec)
                    # deliberately NOT registered in sys.modules: plugin
                    # functions must cloudpickle BY VALUE so executors (and
                    # python UDF workers) need no copy of the plugin file;
                    # spark-submit --py-files remains the production path
                    pyspec.loader.exec_module(module)
                else:
                    raise ImportError(f"failed to load plugin {module_name}")
            else:
                raise ValueError(f"unrecognized import type: {module_name}")
        merged = acc.merged_under(self)
        self.globals = merged.globals
        self.context = merged.context
        self.namespaces = merged.namespaces
        self.prop_defs = merged.prop_defs
        self.embedded = merged.embedded
        self.one_offs = merged.one_offs
        self.mappings = merged.mappings

    def merged_under(self, winner: "MappingSpec") -> "MappingSpec":
        """Return a spec combining self and ``winner``; winner takes precedence."""
        out = MappingSpec(MappingDoc(), auto_declare=winner.auto_declare)
        out.globals = {**self.globals, **winner.globals}
        out.context = {**self.context, **winner.context}
        # recompute datasetBase with merged globals if not explicitly set
        if not out.globals.get("$datasetBase"):
            out.context["$datasetBase"] = (
                f"{out.context.get('$baseURI')}{out.context.get('$datasetID')}"
            )
        out.namespaces = {**self.namespaces, **winner.namespaces}
        out.prop_defs = {**self.prop_defs, **winner.prop_defs}
        out.embedded = {**self.embedded, **winner.embedded}
        out.one_offs = winner.one_offs + self.one_offs
        out.mappings = {**self.mappings, **winner.mappings}
        return out

    def _find_file(self, fname: str) -> str | None:
        for root, _dirs, files in os.walk(self._search_root):
            if fname in files:
                return os.path.join(root, fname)
        return None

    # -- helpers -----------------------------------------------------------
    def expand_curie(self, ref: str) -> str:
        """Expand prefix:local against known namespaces (pattern.py:13-19)."""
        return expand_curie(ref, self.namespaces)


import re as _re

_CURIE_RX = _re.compile(r"([_A-Za-z][\w\-\.]*):([\w\-\.]+)")


def expand_curie(ref: str, namespaces: dict[str, str]) -> str:
    m = _CURIE_RX.fullmatch(ref)
    if m:
        base = namespaces.get(m.group(1))
        if base:
            return base + m.group(2)
    return ref


def load_spec_text(text: str, auto_declare: bool = True) -> MappingSpec:
    return MappingSpec(MappingDoc.model_validate(yaml.safe_load(text)),
                       auto_declare=auto_declare)


def load_spec(path: str, auto_declare: bool = True) -> MappingSpec:
    with open(path, encoding="utf-8") as fh:
        return MappingSpec(MappingDoc.model_validate(yaml.safe_load(fh)),
                           auto_declare=auto_declare,
                           search_root=os.path.dirname(os.path.abspath(path)) or None)
