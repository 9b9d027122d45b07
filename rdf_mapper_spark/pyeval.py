"""Driver-side template evaluator over plain Python dicts.

Two jobs, both driver-only and row-count-independent:

1. **Constant folding**: one_offs, auto-declared vocabulary and backref
   targets are row-independent, so the engine folds them to constant quads
   here instead of shipping them through a Spark job
   (reference behavior: template_processor.py:29-33 processes one_offs once).

2. **Differential oracle for tests**: pytest runs the same mapping spec over
   the same rows through this evaluator and through the Spark compiler and
   compares quad sets. This evaluator is deliberately the "obvious"
   implementation of the reference semantics (template_support.py:205-396,
   pattern.py:43-120) — it is NEVER used in the distributed execution path.
"""

from __future__ import annotations

import uuid as _uuid
from typing import Any, Callable
from urllib.parse import urljoin

from rdf_mapper_spark import pyfuncs
from rdf_mapper_spark.spec import (
    DEFAULT_GRAPH,
    OWL_CLASS,
    RDF_PROPERTY,
    RDF_TYPE,
    RDFS_COMMENT,
    RDFS_LABEL,
    SKOS,
    MappingSpec,
    ResourceSpec,
    ResourceDef,
    expand_curie,
)
from rdf_mapper_spark.template import (
    DATATYPE_RX,
    LANGSTRING_RX,
    FnCall,
    ParsedTemplate,
    Static,
    VarExpansion,
    parse_template,
)
from rdf_mapper_spark.terms import Quad, Term, iri, literal


class MissingValue(Exception):
    """A referenced variable is absent -> skip the property (pattern.py:129-135)."""


class EvalState:
    """Mutable run state: quad sink, backlinks, auto-emit dedup, bnode counter."""

    def __init__(self, spec: MappingSpec) -> None:
        self.spec = spec
        self.quads: list[Quad] = []
        self.backlinks: dict[str, Term] = {}
        self.preserved_graphs: set[str] = set()
        self._bnode_n = 0

    def new_bnode(self) -> Term:
        self._bnode_n += 1
        return Term("bnode", f"b{self._bnode_n}")

    def add(self, g: str | None, s: Term, p: str, o: Term) -> None:
        q = Quad(None if g in (None, DEFAULT_GRAPH) else g, s, p, o)
        if q not in self.quads:  # set semantics (rdflib Graph.add parity)
            self.quads.append(q)

    def seen_auto(self, kind: str, label: str) -> bool:
        key = f"{kind}#{label}"
        if key in self.backlinks:
            return True
        self.backlinks[key] = Term("literal", "marker")
        return False


# ---------------------------------------------------------------------------
# Value pipeline: plain python values / Term / (lexical, datatype) tuples
# ---------------------------------------------------------------------------
def _resolve_args(fn: FnCall, ctx: dict) -> list[Any]:
    out = []
    for kind, val in fn.args:
        if kind == "lit":
            out.append(val)
        else:  # bare token: context lookup, falling back to its own text
            out.append(ctx.get(val, val))
    return out


def _apply_fn(fn: FnCall, value: Any, ctx: dict, state: EvalState) -> Any:
    args = _resolve_args(fn, ctx)
    name = fn.name
    simple: dict[str, Callable] = {
        "asInt": pyfuncs.as_int,
        "asDecimal": pyfuncs.as_decimal,
        "asDate": pyfuncs.as_date,
        "asDatetime": pyfuncs.as_datetime,
        "asDateTime": pyfuncs.as_datetime,
        "asDateOrDatetime": pyfuncs.as_date_or_datetime,
        "trim": pyfuncs.trim,
        "toLower": pyfuncs.to_lower,
        "toUpper": pyfuncs.to_upper,
        "slug": pyfuncs.slug,
        "splitComma": pyfuncs.split_comma,
    }
    if name in simple:
        return simple[name](_unterm(value))
    if name == "asBoolean":
        return pyfuncs.as_boolean(_unterm(value), *args)
    if name == "split":
        return pyfuncs.split_re(_unterm(value), args[0])
    if name == "expr":
        return pyfuncs.py_expr(_unterm(value), args[0])
    if name == "hash":
        return pyfuncs.hash_fn(_unterm(value), *args)
    if name == "now":
        import datetime

        return (datetime.datetime.now().isoformat(), pyfuncs.XSD + "dateTime")
    if name == "to_entries":
        return pyfuncs.to_entries(value)
    if name == "map_by":
        return _map_by(value, ctx, state, args[0])
    if name == "map_to":
        return _map_to(value, ctx, state, args[0], shielded=False)
    if name == "smap_to":
        return _map_to(value, ctx, state, args[0], shielded=True)
    if name == "autoCV":
        return _auto_cv(value, ctx, state, *args)
    raise ValueError(f"unknown transformer function: {name}")


def _unterm(v: Any) -> Any:
    if isinstance(v, Term):
        return v.value
    return v


def _expand_var(seg: VarExpansion, ctx: dict, state: EvalState) -> list[Any]:
    if seg.var:
        if seg.var not in ctx:
            raise MissingValue(seg.var)
        values: list[Any] = [ctx[seg.var]]
    else:
        values = [None]
    for fn in seg.fns:
        nxt: list[Any] = []
        for v in values:
            r = _apply_fn(fn, v, ctx, state)
            if isinstance(r, list):
                nxt.extend(r)  # list results flatten; later fns per element
            else:
                nxt.append(r)
        values = nxt
    return [v for v in values if v is not None]


def _lexical(v: Any) -> str:
    if isinstance(v, tuple):
        return v[0]
    if isinstance(v, Term):
        return v.value
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _wrap_value(v: Any, pt: ParsedTemplate, namespaces: dict) -> Term | None:
    """Runtime lang/datatype re-parse of string results (pattern.py:49-65)."""
    if v is None:
        return None
    if isinstance(v, Term):
        return v
    if isinstance(v, tuple):  # typed literal passthrough
        return Term("literal", v[0], v[1])
    if isinstance(v, str):
        m = LANGSTRING_RX.match(v)
        if m:
            return Term("literal", m.group(1), None, m.group(2))
        m = DATATYPE_RX.match(v)
        if m:
            return Term("literal", m.group(1), expand_curie(m.group(2), namespaces))
        if pt.pattern_type in ("langstring", "datatype"):
            return None  # suffix-shaped template whose result lost the suffix
        return Term("literal", v)
    return literal(v)


def eval_pattern(template: str, ctx: dict, state: EvalState) -> list[Term]:
    """Expand a literal/value template to RDF terms (pattern.py:43-47)."""
    pt = parse_template(template)
    values: list[Any] = [None]
    for seg in pt.segments:
        if isinstance(seg, Static):
            seg_vals: list[Any] = [seg.text]
        else:
            seg_vals = _expand_var(seg, ctx, state)
        # cross-product concatenation of multi-valued segments (pattern.py:43-47)
        out: list[Any] = []
        for a in values:
            for b in seg_vals:
                if a is None:
                    out.append(b)
                else:
                    out.append(_lexical(a) + _lexical(b))
        values = out
    terms = [_wrap_value(v, pt, state.spec.namespaces) for v in values]
    return [t for t in terms if t is not None]


# ---------------------------------------------------------------------------
# IRI minting (template_support.py:113-178)
# ---------------------------------------------------------------------------
import re as _re

_ABS_URI_RX = _re.compile(r"(https?|file|urn)://.*")
_HASH_FORM_RX = _re.compile(r"hash\s?\(([^)]*)\)$")
_COMMA_RX = _re.compile(r"\s*,\s*")


def _full_iri(ref: str, ctx: dict) -> str:
    if _ABS_URI_RX.fullmatch(ref):
        return ref
    base = f"{ctx.get('$datasetBase')}/data/{ctx.get('$resourceID')}/"
    return urljoin(base, ref)


def uri_expand(pattern: str, ctx: dict, state: EvalState) -> list[str]:
    spec = state.spec
    if pattern.startswith("<") and pattern.endswith(">"):
        ref = pattern[1:-1]
        refs: list[str]
        if ref == "uuid":
            refs = [str(_uuid.uuid4())]
        elif ref == "row":
            row = ctx.get("$row")
            if row:
                r = pyfuncs.normalize(str(ctx.get("$file"))) + "-" + str(row)
                if ctx.get("$listIndex") is not None:
                    r = f"{ctx.get('$listIndex')}/{r}"
                refs = [r]
            else:
                refs = []
        elif ref == "parent":
            parent = ctx.get("$parentID")
            if parent:
                r = f"{parent}/{ctx.get('$resourceID')}"
                if ctx.get("$listIndex") is not None:
                    r = f"{r}/{ctx.get('$listIndex')}"
                refs = [r]
            else:
                refs = []
        elif _HASH_FORM_RX.fullmatch(ref):
            params = _COMMA_RX.split(_HASH_FORM_RX.fullmatch(ref).group(1))
            parts = []
            for p in params:
                if p.startswith("'") and p.endswith("'"):
                    parts.append(p[1:-1])
                else:
                    parts.append(str(ctx.get(p)))
            refs = [pyfuncs.sha1_b32hex(*parts)]
        else:
            refs = [
                expand_curie(t.value, spec.namespaces)
                for t in eval_pattern(ref, ctx, state)
            ]
        if not refs:
            refs = [f"{ctx.get('$datasetBase')}/data/{ctx.get('$resourceID')}"]
        return [_full_iri(r, ctx) for r in refs]
    # bare name -> def-namespace IRI, auto-declaring a property
    _id = f"{ctx.get('$datasetBase')}/def/{pyfuncs.normalize(pattern)}"
    if spec.auto_declare:
        _declare_vocab(pattern, _id, None, RDF_PROPERTY, "prop", ctx, state)
    return [_id]


def value_expand(template: str, ctx: dict, state: EvalState) -> list[Term]:
    if (
        template.startswith("<")
        and template.endswith(">")
        and not DATATYPE_RX.fullmatch(template)
    ):
        if template.startswith("<::"):
            t = state.backlinks.get(template[3:-1])
            return [t] if t is not None else []
        return [iri(u) for u in uri_expand(template, ctx, state)]
    return eval_pattern(template, ctx, state)


# ---------------------------------------------------------------------------
# Resource processing (template_support.py:205-396)
# ---------------------------------------------------------------------------
def _passes_filters(rs: ResourceSpec, ctx: dict) -> bool:
    if rs.guard:
        try:
            ok = eval(rs.guard, {}, dict(ctx))  # noqa: S307 - reference parity
            if ok is None or ok is False:
                return False
        except Exception:
            return False
    if rs.requires:
        for key, expected in rs.requires.items():
            value = ctx.get(key)
            if expected is not None:
                if isinstance(expected, list):
                    if value not in expected:
                        return False
                elif value != expected:
                    return False
            elif value is None or value == "":
                return False
    if rs.unless:
        for key, blocked in rs.unless.items():
            value = ctx.get(key)
            if isinstance(value, str) and value.strip() == "":
                value = None
            if blocked is None:
                if value is not None:
                    return False
            elif isinstance(blocked, list):
                if value in blocked:
                    return False
            elif value == blocked:
                return False
    return True


def process_resource(rs: ResourceSpec, ctx: dict, state: EvalState) -> Term | None:
    spec = state.spec
    ctx = {**ctx, "$resourceID": rs.name}
    if not _passes_filters(rs, ctx):
        return None

    if rs.pattern:
        vals = value_expand(rs.pattern, ctx, state)
        return vals[0] if vals else None

    if rs.graph:
        graph = uri_expand(rs.graph, ctx, state)[0]
        if rs.preserved_graph:
            state.preserved_graphs.add(graph)
        ctx = {**ctx, "$graph": graph}

    id_template = rs.prop_template("@id") or "<row>"
    if id_template == "<_>":
        subject = state.new_bnode()
    else:
        subject = iri(uri_expand(id_template, ctx, state)[0])
    state.backlinks[rs.name] = subject
    ctx = {**ctx, "$parentID": subject.value}
    g = ctx.get("$graph")

    type_template = rs.prop_template("@type")
    if not type_template and spec.auto_declare:
        cls_id = uri_expand("<{$datasetBase}/def/{$resourceID}>", ctx, state)[0]
        _declare_vocab(rs.name, cls_id, rs.comment, OWL_CLASS, "class", ctx, state)
        state.add(g, subject, RDF_TYPE, iri(cls_id))
    elif type_template:
        state.add(g, subject, RDF_TYPE, iri(uri_expand(type_template, ctx, state)[0]))

    for prop, template in rs.properties:
        templates = template if isinstance(template, list) else [template]
        for tpl in templates:
            try:
                _emit_property(subject, prop, tpl, ctx, state, g)
            except MissingValue:
                continue
            except ValueError:
                continue
    return subject


def _emit_property(
    subject: Term, prop: str, template: Any, ctx: dict, state: EvalState, g: str | None
) -> None:
    if prop in ("@id", "@type", "@graph"):
        return
    spec = state.spec
    inverse = prop.startswith("^")
    if inverse:
        prop = prop[1:]

    prop_def = None
    if prop.startswith(":"):
        prop_def = spec.prop_defs.get(prop[1:])
        if not prop_def:
            raise ValueError(f"unknown property definition {prop}")
        prop, template = prop_def.rewrite_template(template)
        if prop_def.cls:
            cls_iri = uri_expand(prop_def.cls, ctx, state)[0]
            state.add(g, subject, RDF_TYPE, iri(cls_iri))

    propref = uri_expand(prop, ctx, state)[0]
    propname = prop
    if prop_def:
        propname = prop_def.name
        if spec.auto_declare:
            _declare_vocab(prop_def.name, propref, prop_def.comment,
                           RDF_PROPERTY, "prop", ctx, state)

    if isinstance(template, str):
        if template == "":
            template = "{" + prop + "}"
        values = value_expand(template, {**ctx, "$prop": propname}, state)
    elif isinstance(template, dict):
        child = ResourceSpec(ResourceDef(**template))
        v = process_resource(child, ctx, state)
        values = [v] if v is not None else []
        if not values and prop_def and prop_def.required:
            raise ValueError(f"missing required {prop_def.name}")
        for v in values:
            state.add(g, *((v, propref, subject) if inverse else (subject, propref, v)))
        return
    else:
        raise ValueError(f"unsupported property template {template!r}")

    if not values and prop_def and prop_def.required:
        raise ValueError(f"missing required {prop_def.name}")
    for v in values:
        state.add(g, *((v, propref, subject) if inverse else (subject, propref, v)))


def _declare_vocab(
    name: str, _id: str, comment: str | None, type_iri: str, kind: str,
    ctx: dict, state: EvalState,
) -> None:
    """Emit `<id> a owl:Class/rdf:Property; rdfs:label; rdfs:comment` once.

    Reference: template_support.py:398-424 routes this through the generic
    resource machinery; the output is these three statically-known triples.
    """
    if state.seen_auto(kind, name):
        return
    g = ctx.get("$graph")
    state.add(g, iri(_id), RDF_TYPE, iri(type_iri))
    state.add(g, iri(_id), RDFS_LABEL, literal(name))
    if comment is not None:
        state.add(g, iri(_id), RDFS_COMMENT, literal(comment))


# -- transformer-level constructs needing state -----------------------------
def _map_by(value: Any, ctx: dict, state: EvalState, mapping_name: str) -> Any:
    mapping = state.spec.mappings.get(mapping_name)
    if not mapping:
        raise ValueError(f"unknown mapping {mapping_name}")
    if not isinstance(value, str):
        raise ValueError("map_by expects a string value")
    mapped = mapping.get(value)
    if mapped is None:
        raise ValueError(f"no mapping for {value!r} in {mapping_name}")
    out = value_expand(mapped, ctx, state)
    if not out:
        raise ValueError(f"mapping for {value!r} expanded to nothing")
    return out if len(out) > 1 else out[0]


def _map_to(value: Any, ctx: dict, state: EvalState, rsname: str,
            shielded: bool) -> list[Any]:
    if not value:
        return [None]
    rs = state.spec.embedded.get(rsname)
    if not rs:
        raise ValueError(f"unknown embedded template {rsname}")
    if isinstance(value, list):
        out = []
        for ix, el in enumerate(value):
            if shielded:
                out.extend(_map_to(el, ctx, state, rsname, True))
            else:
                sub = {**ctx, "$listIndex": ix, "$this": el}
                out.extend(_map_to(el, sub, state, rsname, False))
        return out
    if not isinstance(value, dict):
        raise ValueError(f"map_to expects dict elements, got {value!r}")
    if shielded:
        # smap_to: child sees ONLY the element fields (template_state.py:64-69)
        child_ctx = {"$this": value, **value}
    else:
        child_ctx = {**ctx, "$this": value, **value}
    r = process_resource(rs, child_ctx, state)
    return [r]


def _auto_cv(value: Any, ctx: dict, state: EvalState, cv_name: str = "",
             cv_type: str | None = None) -> Term | None:
    """SKOS concept + scheme minting with cross-run dedup
    (template_support.py:575-604)."""
    label = _unterm(value)
    if not label:
        return None
    existing = state.backlinks.get(f"{cv_name}/{label}")
    if existing is not None:
        return existing
    if not cv_name:
        cv_name = ctx.get("$prop")
    base = f"{ctx.get('$datasetBase')}/def/{cv_name}"
    scheme = state.backlinks.get(f"{cv_name}_/scheme")
    g = ctx.get("$graph")
    if scheme is None:
        scheme = iri(base + "_scheme")
        state.add(g, scheme, RDF_TYPE, iri(SKOS + "ConceptScheme"))
        state.add(g, scheme, "http://purl.org/dc/terms/title", literal(cv_name))
        state.add(g, scheme, "http://purl.org/dc/terms/description",
                  literal(f"Automatically generated concept scheme {cv_name}"))
        state.backlinks[f"{cv_name}_/scheme"] = scheme
    cid = base + "/" + (
        pyfuncs.sha1_b32hex(str(label)) if cv_type == "hash"
        else pyfuncs.normalize(str(label))
    )
    concept = iri(cid)
    state.add(g, concept, RDF_TYPE, iri(SKOS + "Concept"))
    state.add(g, concept, SKOS + "prefLabel", literal(label))
    state.add(g, concept, SKOS + "inScheme", scheme)
    state.add(g, concept, SKOS + "topConceptOf", scheme)
    state.add(g, scheme, SKOS + "hasTopConcept", concept)
    state.backlinks[f"{cv_name}/{label}"] = concept
    return concept


# ---------------------------------------------------------------------------
# Whole-run evaluation (the differential oracle entry point)
# ---------------------------------------------------------------------------
def run_mapping(
    spec: MappingSpec, rows: list[dict], filename: str = "test"
) -> EvalState:
    """Evaluate the whole mapping over in-memory rows (test scale only)."""
    state = EvalState(spec)
    base_ctx = {**spec.context, "$file": filename, "$graph": DEFAULT_GRAPH}
    for one_off in spec.one_offs:
        process_resource(one_off, {**base_ctx, "$row": None}, state)
    for n, row in enumerate(rows, start=1):
        ctx = {**base_ctx, "$row": n, **row}
        for rs in spec.resources:
            try:
                process_resource(rs, ctx, state)
            except Exception:
                # per-resource error tolerance (template_processor.py:52-55)
                continue
    return state
