"""Minimal Turtle / TriG / N-Quads reader and a Turtle writer.

rdflib is not available in this environment, so the golden-fixture tests
(reference test/expected/*.ttl|.trig|.nq) are parsed with this reader and
compared as order-insensitive quad sets with blank-node isomorphism
(SURVEY.md §5.2). The subset implemented covers everything rdflib's
serializers emit for those fixtures: @prefix, prefixed names, IRIs, the 'a'
keyword, object lists (','), predicate lists (';'), anonymous bnode property
lists ('[...]'), numeric/boolean shorthand literals, long strings, language
tags, datatypes, and TriG graph blocks.
"""

from __future__ import annotations

import re
from typing import Iterator

from rdf_mapper_spark.terms import Quad, Term, iri, literal

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN_RX = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<longstr>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<string>"(?:[^"\\\n]|\\.)*")
    | (?P<iri><[^>\s]*>)
    | (?P<prefix_decl>@prefix)
    | (?P<base_decl>@base)
    | (?P<langtag>@[A-Za-z][A-Za-z0-9\-]*)
    | (?P<dtmark>\^\^)
    | (?P<bnode>_:[A-Za-z0-9_]+)
    | (?P<num>[+-]?(?:\d+\.\d*(?:[eE][+-]?\d+)?|\.?\d+(?:[eE][+-]?\d+)?))
    | (?P<pname>(?:[A-Za-z_][\w\-]*)?:(?:[\w\-%](?:[\w\-%.]*[\w\-%])?)?)
    | (?P<kw>\b(?:a|true|false|GRAPH)\b)
    | (?P<punct>[.;,\[\]{}()])
    """,
    re.VERBOSE,
)

_ESCAPES = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t",
            "b": "\b", "f": "\f", "'": "'"}


def _unescape(body: str) -> str:
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "u":
                out.append(chr(int(body[i + 2:i + 6], 16)))
                i += 6
                continue
            if nxt == "U":
                out.append(chr(int(body[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


class _Tokens:
    def __init__(self, text: str) -> None:
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RX.match(text, pos)
            if not m:
                raise ValueError(f"turtle tokenizer stuck at: {text[pos:pos+40]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind == "ws":
                continue
            self.toks.append((kind, m.group()))
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, value: str) -> None:
        kind, tok = self.next()
        if tok != value:
            raise ValueError(f"expected {value!r}, got {tok!r}")


class TurtleReader:
    def __init__(self, text: str) -> None:
        self.t = _Tokens(text)
        self.prefixes: dict[str, str] = {}
        self.quads: list[Quad] = []
        self._bn = 0

    # -- terms --------------------------------------------------------------
    def _new_bnode(self) -> Term:
        self._bn += 1
        return Term("bnode", f"anon{self._bn}")

    def _resolve_pname(self, pname: str) -> str:
        prefix, local = pname.split(":", 1)
        if prefix not in self.prefixes:
            raise ValueError(f"unknown prefix {prefix!r}")
        return self.prefixes[prefix] + local

    def _read_term(self, as_subject: bool = False) -> Term:
        kind, tok = self.t.next()
        if kind == "iri":
            return iri(tok[1:-1])
        if kind == "pname":
            return iri(self._resolve_pname(tok))
        if kind == "bnode":
            return Term("bnode", tok[2:])
        if kind == "kw" and tok in ("true", "false"):
            return Term("literal", tok, XSD + "boolean")
        if kind == "num":
            if re.fullmatch(r"[+-]?\d+", tok):
                return Term("literal", tok, XSD + "integer")
            if "e" in tok.lower():
                return Term("literal", tok, XSD + "double")
            return Term("literal", tok, XSD + "decimal")
        if kind in ("string", "longstr"):
            body = tok[3:-3] if kind == "longstr" else tok[1:-1]
            value = _unescape(body)
            nxt = self.t.peek()
            if nxt and nxt[0] == "langtag":
                self.t.next()
                return Term("literal", value, None, nxt[1][1:])
            if nxt and nxt[0] == "dtmark":
                self.t.next()
                dt = self._read_term()
                return Term("literal", value, dt.value)
            return Term("literal", value)
        if kind == "punct" and tok == "[":
            node = self._new_bnode()
            nxt = self.t.peek()
            if not (nxt and nxt[1] == "]"):
                self._read_predicate_object_list(node, self._graph)
            self.t.expect("]")
            return node
        raise ValueError(f"unexpected token for term: {tok!r}")

    # -- statements ----------------------------------------------------------
    def _read_predicate_object_list(self, subject: Term, graph: str | None) -> None:
        while True:
            kind, tok = self.t.next()
            if kind == "kw" and tok == "a":
                pred = RDF_TYPE
            elif kind == "iri":
                pred = tok[1:-1]
            elif kind == "pname":
                pred = self._resolve_pname(tok)
            else:
                raise ValueError(f"unexpected predicate token {tok!r}")
            while True:
                obj = self._read_term()
                self.quads.append(Quad(graph, subject, pred, obj))
                nxt = self.t.peek()
                if nxt and nxt[1] == ",":
                    self.t.next()
                    continue
                break
            nxt = self.t.peek()
            if nxt and nxt[1] == ";":
                self.t.next()
                nxt = self.t.peek()
                # dangling ';' before '.' or ']'
                if nxt and nxt[1] in (".", "]", "}"):
                    return
                continue
            return

    def parse(self) -> list[Quad]:
        self._graph: str | None = None
        while self.t.peek():
            kind, tok = self.t.peek()
            if kind == "prefix_decl":
                self.t.next()
                _, pname = self.t.next()
                _, uri_tok = self.t.next()
                self.prefixes[pname[:-1] if pname.endswith(":") else
                              pname.split(":")[0]] = uri_tok[1:-1]
                self.t.expect(".")
                continue
            if kind == "kw" and tok == "GRAPH":
                self.t.next()
                g = self._read_term()
                self.t.expect("{")
                self._parse_block(g.value)
                continue
            # maybe a TriG graph block: term '{'
            save = self.t.i
            term = self._read_term(as_subject=True)
            nxt = self.t.peek()
            if nxt and nxt[1] == "{":
                self.t.next()
                self._parse_block(term.value)
                continue
            self.t.i = save
            self._parse_triples(None)
        return self.quads

    def _parse_block(self, graph: str) -> None:
        while True:
            nxt = self.t.peek()
            if nxt and nxt[1] == "}":
                self.t.next()
                return
            self._parse_triples(graph)

    def _parse_triples(self, graph: str | None) -> None:
        self._graph = graph
        subject = self._read_term(as_subject=True)
        self._read_predicate_object_list(subject, graph)
        nxt = self.t.peek()
        if nxt and nxt[1] == ".":
            self.t.next()


def parse_turtle(text: str) -> list[Quad]:
    return TurtleReader(text).parse()


def parse_nquads(text: str) -> list[Quad]:
    reader = TurtleReader("")
    quads = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        toks = _Tokens(line)
        reader.t = toks
        reader._graph = None
        s = reader._read_term()
        kind, tok = toks.next()
        p = tok[1:-1] if kind == "iri" else RDF_TYPE
        o = reader._read_term()
        g = None
        nxt = toks.peek()
        if nxt and nxt[1] != ".":
            g = reader._read_term().value
        quads.append(Quad(g, s, p, o))
    return quads


# ---------------------------------------------------------------------------
# Quad-set comparison with value normalization + bnode isomorphism
# ---------------------------------------------------------------------------
_NUMERIC_DTS = {XSD + "integer", XSD + "decimal", XSD + "double", XSD + "float"}


def _norm_term(t: Term) -> tuple:
    if t.kind == "literal" and t.datatype in _NUMERIC_DTS:
        return ("literal", float(t.value), t.datatype, None)
    if t.kind == "bnode":
        return ("bnode", "*", None, None)  # identity handled by isomorphism pass
    return (t.kind, t.value, t.datatype, t.lang)


def canonical_quadset(quads: list[Quad]) -> frozenset:
    """Quad set with bnodes canonicalized by iterative signature refinement."""
    labels: dict[str, str] = {}
    bnodes = {t.value for q in quads for t in (q.s, q.o) if t.kind == "bnode"}
    sig = {b: "" for b in bnodes}
    for _ in range(3):
        nxt = {}
        for b in bnodes:
            parts = []
            for q in quads:
                if q.s.kind == "bnode" and q.s.value == b:
                    o = sig.get(q.o.value, "") if q.o.kind == "bnode" \
                        else str(_norm_term(q.o))
                    parts.append(f"out|{q.g}|{q.p}|{o}")
                if q.o.kind == "bnode" and q.o.value == b:
                    s = sig.get(q.s.value, "") if q.s.kind == "bnode" \
                        else str(_norm_term(q.s))
                    parts.append(f"in|{q.g}|{q.p}|{s}")
            nxt[b] = "&".join(sorted(parts))
        sig = nxt
    # disambiguate identical signatures deterministically
    ordered = sorted(bnodes, key=lambda b: (sig[b], b))
    seen: dict[str, int] = {}
    for b in ordered:
        n = seen.get(sig[b], 0)
        seen[sig[b]] = n + 1
        labels[b] = f"{sig[b]}#{n}"

    def final(t: Term) -> tuple:
        if t.kind == "bnode":
            return ("bnode", labels[t.value], None, None)
        return _norm_term(t)

    return frozenset((q.g, final(q.s), q.p, final(q.o)) for q in quads)


# ---------------------------------------------------------------------------
# Turtle writer (driver-side; for user-facing output at test scale)
# ---------------------------------------------------------------------------
def _fmt_iri(u: str, prefixes: dict[str, str]) -> str:
    for p, base in prefixes.items():
        if u.startswith(base):
            local = u[len(base):]
            if re.fullmatch(r"[\w\-%](?:[\w\-%.]*[\w\-%])?|", local):
                return f"{p}:{local}"
    return f"<{u}>"


def _fmt_term(t: Term, prefixes: dict[str, str]) -> str:
    if t.kind == "iri":
        return _fmt_iri(t.value, prefixes)
    if t.kind == "bnode":
        return f"_:{t.value}"
    if t.datatype == XSD + "integer" and re.fullmatch(r"[+-]?\d+", t.value):
        return t.value
    if t.datatype == XSD + "boolean" and t.value in ("true", "false"):
        return t.value
    body = t.value.replace("\\", "\\\\").replace('"', '\\"') \
        .replace("\n", "\\n").replace("\r", "\\r")
    s = f'"{body}"'
    if t.lang:
        return f"{s}@{t.lang}"
    if t.datatype:
        return f"{s}^^{_fmt_iri(t.datatype, prefixes)}"
    return s


def serialize_turtle(quads: list[Quad], prefixes: dict[str, str] | None = None) -> str:
    """Readable (not byte-canonical) Turtle of the default graph."""
    prefixes = prefixes or {}
    used = [f"@prefix {p}: <{u}> ." for p, u in sorted(prefixes.items())]
    by_subject: dict[tuple, list[Quad]] = {}
    for q in quads:
        if q.g is not None:
            continue
        by_subject.setdefault((q.s.kind, q.s.value), []).append(q)
    blocks = []
    for (_, _), qs in sorted(by_subject.items(), key=lambda kv: kv[0]):
        subj = _fmt_term(qs[0].s, prefixes)
        lines = [
            f"    {_fmt_iri(q.p, prefixes) if q.p != RDF_TYPE else 'a'} "
            f"{_fmt_term(q.o, prefixes)}"
            for q in sorted(qs, key=lambda q: (q.p, q.o.value))
        ]
        blocks.append(subj + "\n" + " ;\n".join(lines) + " .")
    return "\n".join(used) + ("\n\n" if used else "") + "\n\n".join(blocks) + "\n"


def quads_iter_from_df_rows(rows: list[tuple]) -> Iterator[Quad]:
    for g, sk, s, p, ok, o, odt, olg in rows:
        yield Quad(g, Term(sk, s), p, Term(ok, o, odt, olg))
