"""Test-scale SPARQL Update interpreter for an in-memory quad store.

Covers exactly the statement forms the sinks generate
(sinks.sparql_update_script / sparql_delete_script — reference
template_processor.py:72-97): PREFIX declarations, ``DROP SILENT GRAPH``,
``INSERT DATA`` and ``DELETE DATA`` with optional ``GRAPH <g> { ... }``
wrappers whose bodies are Turtle.  This lets the update/delete golden tests
execute the generated scripts against a seeded dataset and compare quad
sets, the way the reference does with rdflib (test_graphs.py:80-99) — rdflib
is not available in this environment, so the repo's own Turtle parser
applies the blocks.

NOT a general SPARQL engine: no WHERE patterns, no variables.  That is all
the mapper's output format requires.
"""

from __future__ import annotations

import re

from rdf_mapper_spark.terms import Quad
from rdf_mapper_spark.turtle import _norm_term, parse_turtle

_PREFIX_RX = re.compile(r"\bPREFIX\s+([\w\-]*):\s*<([^>]*)>")
_DROP_RX = re.compile(r"\bDROP\s+SILENT\s+GRAPH\s*<([^>]*)>\s*;?")
_DATA_RX = re.compile(r"\b(INSERT|DELETE)\s+DATA\s*\{")
_GRAPH_RX = re.compile(r"^\s*GRAPH\s*<([^>]*)>\s*\{", re.DOTALL)


def quad_key(q: Quad) -> tuple:
    """Equality key with numeric-literal normalization ("42" == "42.0"
    under the same numeric datatype), matching turtle.canonical_quadset."""
    return (q.g, _norm_term(q.s), q.p, _norm_term(q.o))


def _match_brace(text: str, open_idx: int) -> int:
    """Index just past the '}' matching text[open_idx] == '{'
    (string-literal aware)."""
    depth = 0
    i = open_idx
    n = len(text)
    while i < n:
        c = text[i]
        if c == '"':
            i += 1
            while i < n and text[i] != '"':
                i += 2 if text[i] == "\\" else 1
            i += 1
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced braces in update script")


def apply_update_script(script: str, store: list[Quad]) -> list[Quad]:
    """Apply the script to `store` (list of Quad), returning the new store."""
    prefixes = dict(_PREFIX_RX.findall(script))
    quads = list(store)
    i = 0
    n = len(script)
    while i < n:
        m_drop = _DROP_RX.search(script, i)
        m_data = _DATA_RX.search(script, i)
        if m_drop is None and m_data is None:
            break
        if m_data is None or (m_drop is not None
                              and m_drop.start() < m_data.start()):
            g = m_drop.group(1)
            quads = [q for q in quads if q.g != g]
            i = m_drop.end()
            continue
        verb = m_data.group(1)
        body_end = _match_brace(script, m_data.end() - 1)
        body = script[m_data.end():body_end - 1]
        i = body_end
        new_quads = _parse_data_block(body, prefixes)
        if verb == "INSERT":
            have = {quad_key(q) for q in quads}
            quads.extend(q for q in new_quads if quad_key(q) not in have)
        else:
            gone = {quad_key(q) for q in new_quads}
            quads = [q for q in quads if quad_key(q) not in gone]
    return quads


def _parse_data_block(body: str, prefixes: dict[str, str]) -> list[Quad]:
    graph = None
    m = _GRAPH_RX.match(body)
    if m:
        graph = m.group(1)
        end = _match_brace(body, m.end() - 1)
        body = body[m.end():end - 1]
    turtle = "".join(
        f"@prefix {p}: <{u}> .\n" for p, u in prefixes.items()
    ) + body
    triples = parse_turtle(turtle)
    if graph is None:
        return triples
    return [Quad(graph, q.s, q.p, q.o) for q in triples]
