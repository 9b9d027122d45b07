"""SPARQL text front-end: parse query strings onto the BGP compiler.

The query layer (rdf_mapper_spark/query.py) exposes every SPARQL verb
programmatically — bgp_query / ask / construct / describe / update_where
/ graph management — as declarative DataFrame plans.  This module adds
the missing usability half: a hand-rolled tokenizer + recursive-descent
parser for the SPARQL 1.1 surface those functions implement, so a user
can run the textual queries they already have against the quad store.

    sparql(quads, '''
        PREFIX dct: <http://purl.org/dc/terms/>
        SELECT ?d ?src WHERE {
            ?d dct:language "en" ; <http://kg/def/source> ?src .
            FILTER(?src != "spam")
        } ORDER BY ?d LIMIT 10
    ''')

Parsing is driver-side string work on a query-sized input; EVERYTHING
data-shaped still compiles to the same Catalyst plans as the
programmatic API (this module builds pattern tuples and option dicts,
then calls bgp_query and friends — zero new execution machinery, so all
the scale properties of the query layer carry over unchanged).

Supported surface (the subset the programmatic layer implements):
* SELECT [DISTINCT] vars|* / aggregates with GROUP BY + HAVING,
  ORDER BY [ASC()/DESC()], LIMIT, OFFSET
* ASK, CONSTRUCT {...} WHERE {...}, DESCRIBE <iri>... / DESCRIBE ?v
  WHERE {...}
* WHERE-group elements: triple blocks with ';' / ',' continuations and
  the `a` keyword, OPTIONAL {...}, FILTER(expr), FILTER [NOT] EXISTS
  {...}, BIND(expr AS ?v), VALUES (inline data with UNDEF),
  MINUS {...}, { A } UNION { B }, nested sub-SELECT, GRAPH <g>/{?g}
  wrapping the group
* property paths in predicate position: `^p` inverse, `p1/p2`
  sequence, `p1|p2` alternation, `p+`/`p*` closure, parenthesized
  composition — compiled onto the query layer's composable path
  operators (path_edges/inv/alt/seq/closure)
* Updates (sparql_update): INSERT DATA, DELETE DATA, DELETE/INSERT
  WHERE, DELETE WHERE, CLEAR/ADD/COPY/MOVE GRAPH

Documented deviations (lexical-value model, same as the query layer):
literal matching compares the lexical form (datatype/lang tags are not
match keys), SUM/AVG cast their argument to DOUBLE, and FILTER
expressions translate to Spark SQL (REGEX -> RLIKE, STRSTARTS ->
startswith, numeric comparison follows Spark's string->numeric
coercion).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_mapper_spark.query import (ask, bgp_minus, bgp_query, bgp_union,
                                    add_graph, clear_graph, copy_graph,
                                    describe, instantiate, move_graph,
                                    path_alt, path_closure, path_edges,
                                    path_inv, path_seq, update_where)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# --- tokenizer ----------------------------------------------------------

_TOKEN = re.compile(r"""
    (?P<iri>      <[^<>\s]*> )
  | (?P<string>   "(?:[^"\\]|\\.)*" | '(?:[^'\\]|\\.)*' )
  | (?P<langtag>  @[A-Za-z][A-Za-z0-9-]* )
  | (?P<var>      \?\w+ )
  | (?P<number>   [+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)? )
  | (?P<pname>    \w[\w.-]*:[\w.%-]* | \w[\w-]*: | :[\w.%-]* )
  | (?P<name>     [A-Za-z_][\w-]* )
  | (?P<op>       \^\^ | && | \|\| | != | <= | >= | [{}().,;*/+\-=<>!|^] )
  | (?P<ws>       \s+ | \#[^\n]* )
""", re.VERBOSE)


def _tokenize(text: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"SPARQL lex error at {text[pos:pos + 30]!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            toks.append(m.group())
    return toks


def _unquote(tok: str) -> str:
    body = tok[1:-1]
    return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t", "r": "\r"}
                  .get(m.group(1), m.group(1)), body)


# --- FILTER / BIND / HAVING expression translation ----------------------

_FUNC_MAP = {
    "STRSTARTS": "startswith", "STRENDS": "endswith",
    "CONTAINS": "contains", "STRLEN": "length", "UCASE": "upper",
    "LCASE": "lower", "SUBSTR": "substring", "CONCAT": "concat",
    "COALESCE": "coalesce", "ABS": "abs", "CEIL": "ceiling",
    "FLOOR": "floor", "ROUND": "round", "IF": "if",
    "REPLACE": "regexp_replace",
}
_XSD_CAST = {
    "integer": "BIGINT", "int": "INT", "long": "BIGINT",
    "decimal": "DOUBLE", "double": "DOUBLE", "float": "FLOAT",
    "boolean": "BOOLEAN", "string": "STRING",
}


class _ExprTranslator:
    """SPARQL expression tokens -> a Spark SQL string.  Linear walk with
    function-aware rewrites for the few builtins whose shape differs
    (REGEX -> RLIKE, BOUND -> IS NOT NULL, xsd casts -> CAST)."""

    def __init__(self, toks: list[str], expand):
        self.t, self.i, self.expand = toks, 0, expand

    def _peek(self):
        return self.t[self.i] if self.i < len(self.t) else None

    def _args(self) -> list[str]:
        """Translate a parenthesized arg list; returns per-arg SQL."""
        assert self.t[self.i] == "("
        self.i += 1
        args, buf, depth = [], [], 0
        while True:
            tok = self.t[self.i]
            if tok == "(":
                depth += 1
            elif tok == ")":
                if depth == 0:
                    if buf:
                        args.append(" ".join(buf))
                    self.i += 1
                    return args
                depth -= 1
            elif tok == "," and depth == 0:
                args.append(" ".join(buf))
                buf = []
                self.i += 1
                continue
            buf.append(self._one())

    def _one(self) -> str:
        tok = self.t[self.i]
        up = tok.upper()
        self.i += 1
        if tok.startswith("?"):
            return f"`{tok[1:]}`"
        if tok.startswith('"') or tok.startswith("'"):
            return "'" + _unquote(tok).replace("'", "''") + "'"
        if tok.startswith("<") and tok.endswith(">"):
            return "'" + tok[1:-1] + "'"
        if up == "&&":
            return "AND"
        if up == "||":
            return "OR"
        if up == "!" and self._peek() != "=":
            return "NOT"
        if up == "REGEX" and self._peek() == "(":
            a = self._args()
            pat = a[1]
            if len(a) > 2 and "i" in a[2].lower():
                pat = "'(?i)" + pat.strip("'") + "'"
            return f"({a[0]} RLIKE {pat})"
        if up == "BOUND" and self._peek() == "(":
            a = self._args()
            return f"({a[0]} IS NOT NULL)"
        if up == "STR" and self._peek() == "(":
            a = self._args()
            return f"CAST({a[0]} AS STRING)"
        if up in ("ISIRI", "ISURI", "ISLITERAL", "ISBLANK"):
            raise ValueError(f"{tok}: term-kind tests need the ok column; "
                             "filter the quad DataFrame directly")
        if up in _FUNC_MAP and self._peek() == "(":
            a = self._args()
            return f"{_FUNC_MAP[up]}({', '.join(a)})"
        if ":" in tok and not tok.startswith("?"):
            full = self.expand(tok)
            local = tok.rsplit(":", 1)[-1]
            if local in _XSD_CAST and self._peek() == "(":
                a = self._args()
                return f"CAST({a[0]} AS {_XSD_CAST[local]})"
            return "'" + full + "'"
        return tok

    def run(self) -> str:
        out = []
        while self.i < len(self.t):
            out.append(self._one())
        return " ".join(out)


# --- parsed query structure ---------------------------------------------

class _Group:
    """One group graph pattern: the bgp_query argument bundle."""

    def __init__(self):
        self.patterns: list[tuple[str, str, str]] = []
        # (subj, path-AST, obj) triples whose predicate is a property
        # path expression — evaluated via the path_* machinery
        self.path_triples: list[tuple[str, tuple, str]] = []
        self.optionals: list[list[tuple[str, str, str]]] = []
        self.filters: list[str] = []
        self.exists: list[list[tuple[str, str, str]]] = []
        self.not_exists: list[list[tuple[str, str, str]]] = []
        self.values: dict[str, list[str | None]] | None = None
        self.binds: dict[str, str] = {}
        self.union_branches: list["_Group"] = []
        self.minus: list["_Group"] = []
        self.subselects: list["_Query"] = []
        self.graph: str | None = None


class _Query:
    def __init__(self):
        self.verb = "SELECT"
        self.select: list[str] = []          # plain projected vars
        self.aggs: dict[str, str] = {}       # alias -> SQL agg expr
        self.distinct = False
        self.group: _Group = _Group()
        self.group_by: list[str] = []
        self.having: list[str] = []
        self.order_by: list[str] = []
        self.limit: int | None = None
        self.offset: int | None = None
        self.templates: list[tuple[str, str, str]] = []   # CONSTRUCT
        self.describe_terms: list[str] = []               # DESCRIBE


class _Parser:
    def __init__(self, text: str):
        self.t = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}

    # -- token helpers --
    def peek(self, k: int = 0) -> str | None:
        return self.t[self.i + k] if self.i + k < len(self.t) else None

    def next(self) -> str:
        tok = self.t[self.i]
        self.i += 1
        return tok

    def eat(self, want: str) -> str:
        tok = self.next()
        if tok.upper() != want.upper():
            raise ValueError(f"expected {want}, got {tok}")
        return tok

    def at_kw(self, *kws: str) -> bool:
        p = self.peek()
        return p is not None and p.upper() in kws

    # -- terms --
    def expand(self, pname: str) -> str:
        pfx, local = pname.split(":", 1)
        if pfx not in self.prefixes:
            raise ValueError(f"undeclared prefix {pfx!r}: in {pname!r}")
        return self.prefixes[pfx] + local

    def term(self) -> str:
        tok = self.next()
        if tok.startswith("?"):
            return tok
        if tok == "a":
            return RDF_TYPE
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok.startswith('"') or tok.startswith("'"):
            lex = _unquote(tok)
            # lexical model: consume (and drop) lang tag / datatype
            if self.peek() and self.peek().startswith("@"):
                self.next()
            elif self.peek() == "^^":
                self.next()
                self.term()
            return lex
        if re.fullmatch(r"[+-]?\d[\d.eE+-]*", tok):
            return tok
        if tok.upper() in ("TRUE", "FALSE"):
            return tok.lower()
        if ":" in tok:
            return self.expand(tok)
        raise ValueError(f"unexpected term {tok!r}")

    # -- prologue --
    def prologue(self):
        while self.at_kw("PREFIX", "BASE"):
            kw = self.next().upper()
            if kw == "BASE":
                self.next()
                continue
            pname = self.next()
            iri = self.next()
            self.prefixes[pname[:-1].split(":")[0]] = iri[1:-1]

    # -- property paths (predicate position) --
    def path(self):
        """Parse a predicate: a plain term (IRI / ?var / `a`) or a
        property-path expression.  Returns the term string for plain
        predicates, or a path-AST tuple for real paths:
        ('iri', p) | ('inv', sub) | ('plus'|'star', sub) |
        ('seq'|'alt', [subs]).  Grammar: alt > seq > elt(^ _ +|*)."""
        def primary():
            if self.peek() == "(":
                self.next()
                p = alt()
                self.eat(")")
                return p
            if self.peek().startswith("?"):
                return ("var", self.next())
            return ("iri", self.term())

        def elt():
            inv = False
            if self.peek() == "^":
                self.next()
                inv = True
            p = primary()
            if self.peek() == "+":
                self.next()
                p = ("plus", p)
            elif self.peek() == "*":
                self.next()
                p = ("star", p)
            if inv:
                p = ("inv", p)
            return p

        def seq():
            parts = [elt()]
            while self.peek() == "/":
                self.next()
                parts.append(elt())
            return parts[0] if len(parts) == 1 else ("seq", parts)

        def alt():
            parts = [seq()]
            while self.peek() == "|":
                self.next()
                parts.append(seq())
            return parts[0] if len(parts) == 1 else ("alt", parts)

        p = alt()
        if p[0] in ("iri", "var"):
            return p[1]                       # plain predicate term
        return p

    # -- triple blocks --
    def triples(self, out: list[tuple[str, str, str]],
                paths: list[tuple[str, tuple, str]] | None = None):
        subj = self.term()
        while True:
            pred = self.path()
            if isinstance(pred, tuple) and paths is None:
                raise ValueError("property paths are not allowed in "
                                 "templates / data blocks")
            while True:
                obj = self.term()
                if isinstance(pred, tuple):
                    paths.append((subj, pred, obj))
                else:
                    out.append((subj, pred, obj))
                if self.peek() == ",":
                    self.next()
                    continue
                break
            if self.peek() == ";":
                self.next()
                if self.peek() in (".", "}", None):  # trailing ';'
                    break
                continue
            break
        if self.peek() == ".":
            self.next()

    def _expr_until_close(self) -> str:
        """Consume a parenthesized expression, return Spark SQL."""
        self.eat("(")
        depth, toks = 0, []
        while True:
            tok = self.next()
            if tok == "(":
                depth += 1
            elif tok == ")":
                if depth == 0:
                    break
                depth -= 1
            toks.append(tok)
        return _ExprTranslator(toks, self.expand).run()

    # -- group graph pattern --
    def group(self) -> _Group:
        g = _Group()
        self.eat("{")
        if self.at_kw("SELECT"):                      # sub-SELECT
            g.subselects.append(self.select_query())
            self.eat("}")
            return g
        while self.peek() != "}":
            if self.at_kw("OPTIONAL"):
                self.next()
                sub = self.group()
                if (sub.optionals or sub.filters or sub.union_branches
                        or sub.minus or sub.subselects
                        or sub.path_triples or sub.binds or sub.values
                        or sub.exists or sub.not_exists
                        or sub.graph is not None):
                    raise ValueError("OPTIONAL supports plain pattern "
                                     "groups")
                g.optionals.append(sub.patterns)
            elif self.at_kw("FILTER"):
                self.next()
                if self.at_kw("EXISTS"):
                    self.next()
                    g.exists.append(self._plain_patterns("EXISTS"))
                elif self.at_kw("NOT"):
                    self.next()
                    self.eat("EXISTS")
                    g.not_exists.append(self._plain_patterns(
                        "NOT EXISTS"))
                else:
                    g.filters.append(self._expr_until_close())
            elif self.at_kw("BIND"):
                self.next()
                self.eat("(")
                depth, toks = 0, []
                while True:
                    tok = self.peek()
                    if tok == "(":
                        depth += 1
                    elif tok == ")" and depth == 0:
                        break
                    elif tok == ")":
                        depth -= 1
                    elif tok.upper() == "AS" and depth == 0:
                        break
                    toks.append(self.next())
                self.eat("AS")
                var = self.next()
                self.eat(")")
                g.binds[var] = _ExprTranslator(toks, self.expand).run()
            elif self.at_kw("VALUES"):
                self.next()
                g.values = self._values_block()
            elif self.at_kw("MINUS"):
                self.next()
                g.minus.append(self.group())
            elif self.at_kw("GRAPH"):
                self.next()
                # the graph scope is GROUP-wide in this evaluator, so a
                # GRAPH clause must be the only element of its group
                # (otherwise sibling triples would silently evaluate
                # against the named graph too) and a group can hold at
                # most one
                if g.graph is not None:
                    raise ValueError(
                        "multiple GRAPH clauses in one group are not "
                        "supported — wrap each in its own group")
                if (g.patterns or g.path_triples or g.optionals
                        or g.filters or g.binds or g.values or g.exists
                        or g.not_exists or g.minus or g.union_branches
                        or g.subselects):
                    raise ValueError(
                        "GRAPH must be the only element of its group — "
                        "wrap sibling patterns in their own group")
                g.graph = self.term()   # '?var' passes through verbatim
                inner = self.group()
                if (inner.union_branches or inner.subselects
                        or inner.binds or inner.values or inner.exists
                        or inner.not_exists or inner.minus
                        or inner.graph is not None):
                    raise ValueError("GRAPH wraps plain pattern groups "
                                     "(with OPTIONAL/FILTER)")
                g.patterns += inner.patterns
                g.path_triples += inner.path_triples
                g.optionals += inner.optionals
                g.filters += inner.filters
                while self.peek() == ".":
                    self.next()
                if self.peek() != "}":
                    raise ValueError(
                        "GRAPH must be the only element of its group — "
                        "wrap trailing patterns in their own group")
            elif self.peek() == "{":                  # group -> UNION
                branch = self.group()
                branches = [branch]
                while self.at_kw("UNION"):
                    self.next()
                    branches.append(self.group())
                if len(branches) == 1:
                    # plain nested group: merge.  Fields the merge does
                    # not propagate would silently change the query's
                    # meaning — fail loudly instead.
                    if (branch.binds or branch.values or branch.exists
                            or branch.not_exists or branch.minus
                            or branch.graph is not None):
                        raise ValueError(
                            "nested group uses BIND/VALUES/EXISTS/MINUS/"
                            "GRAPH, which do not merge into the "
                            "enclosing group — restructure the query")
                    g.patterns += branch.patterns
                    g.path_triples += branch.path_triples
                    g.optionals += branch.optionals
                    g.filters += branch.filters
                    g.subselects += branch.subselects
                else:
                    g.union_branches += branches
            elif self.peek() == ".":
                self.next()
            else:
                self.triples(g.patterns, g.path_triples)
        self.eat("}")
        return g

    def _plain_patterns(self, ctx: str) -> list[tuple[str, str, str]]:
        sub = self.group()
        if (sub.path_triples or sub.union_branches or sub.subselects
                or sub.filters or sub.optionals or sub.binds
                or sub.values or sub.exists or sub.not_exists
                or sub.minus or sub.graph is not None):
            raise ValueError(f"{ctx} supports plain pattern groups")
        return sub.patterns

    def _values_block(self) -> dict[str, list[str | None]]:
        def cell():
            if self.at_kw("UNDEF"):
                self.next()
                return None
            return self.term()

        if self.peek() == "(":                        # multi-var form
            self.next()
            names = []
            while self.peek() != ")":
                names.append(self.next())
            self.next()
            cols: dict[str, list[str | None]] = {n: [] for n in names}
            self.eat("{")
            while self.peek() == "(":
                self.next()
                for n in names:
                    cols[n].append(cell())
                self.eat(")")
            self.eat("}")
            return cols
        name = self.next()                            # single-var form
        self.eat("{")
        vals = []
        while self.peek() != "}":
            vals.append(cell())
        self.eat("}")
        return {name: vals}

    # -- SELECT head + solution modifiers --
    _AGG_KW = ("COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE",
               "GROUP_CONCAT")

    def select_query(self) -> _Query:
        q = _Query()
        self.eat("SELECT")
        if self.at_kw("DISTINCT"):
            self.next()
            q.distinct = True
        if self.at_kw("REDUCED"):
            self.next()
        if self.peek() == "*":
            self.next()
        else:
            while not self.at_kw("WHERE") and self.peek() != "{":
                if self.peek().startswith("?"):
                    q.select.append(self.next())
                elif self.peek() == "(":              # (AGG(...) AS ?x)
                    self.next()
                    alias, expr = self._agg_or_expr()
                    q.aggs[alias] = expr
                else:
                    raise ValueError(f"bad SELECT item {self.peek()!r}")
        if self.at_kw("WHERE"):
            self.next()
        q.group = self.group()
        while True:
            if self.at_kw("GROUP"):
                self.next()
                self.eat("BY")
                while self.peek() and self.peek().startswith("?"):
                    q.group_by.append(self.next())
            elif self.at_kw("HAVING"):
                self.next()
                q.having.append(self._expr_until_close())
            elif self.at_kw("ORDER"):
                self.next()
                self.eat("BY")
                while True:
                    p = self.peek()
                    if p is None:
                        break
                    if p.upper() in ("ASC", "DESC"):
                        d = self.next().upper()
                        sql = self._expr_until_close()
                        q.order_by.append(f"{sql} {d}")
                    elif p.startswith("?"):
                        q.order_by.append(f"`{self.next()[1:]}`")
                    else:
                        break
            elif self.at_kw("LIMIT"):
                self.next()
                q.limit = int(self.next())
            elif self.at_kw("OFFSET"):
                self.next()
                q.offset = int(self.next())
            else:
                break
        return q

    def _agg_or_expr(self) -> tuple[str, str]:
        """Inside '(': AGG(...) AS ?alias ')' -> (alias, SQL expr)."""
        fn = self.next().upper()
        if fn not in self._AGG_KW:
            raise ValueError(f"unsupported SELECT expression {fn!r} "
                             "(aggregates only)")
        self.eat("(")
        distinct = ""
        if self.at_kw("DISTINCT"):
            self.next()
            distinct = "DISTINCT "
        if self.peek() == "*":
            self.next()
            arg = "*"
        else:
            depth, toks = 0, []
            while not (self.peek() in (")", ";") and depth == 0):
                tok = self.next()
                depth += tok == "("
                depth -= tok == ")"
                toks.append(tok)
            arg = _ExprTranslator(toks, self.expand).run()
        sep = " "
        if self.peek() == ";":                # GROUP_CONCAT separator
            self.next()
            if self.peek().upper() == "SEPARATOR":
                self.next()
                self.eat("=")
                sep = _unquote(self.next())
        self.eat(")")
        self.eat("AS")
        alias = self.next()[1:]
        self.eat(")")
        if fn in ("SUM", "AVG"):
            arg = f"CAST({arg} AS DOUBLE)"
        if fn == "SAMPLE":
            return alias, f"first({arg})"
        if fn == "GROUP_CONCAT":
            # sort_array makes the concatenation DETERMINISTIC (SPARQL
            # leaves the order undefined; sorted is a legal refinement
            # and the only one that survives distributed execution)
            inner = f"collect_set({arg})" if distinct \
                else f"collect_list({arg})"
            sq = sep.replace("'", "''")
            return alias, f"array_join(sort_array({inner}), '{sq}')"
        return alias, f"{fn.lower()}({distinct}{arg})"

    # -- other verbs --
    def query(self) -> _Query:
        self.prologue()
        if self.at_kw("SELECT"):
            return self.select_query()
        if self.at_kw("ASK"):
            self.next()
            q = _Query()
            q.verb = "ASK"
            if self.at_kw("WHERE"):
                self.next()
            q.group = self.group()
            return q
        if self.at_kw("CONSTRUCT"):
            self.next()
            q = _Query()
            q.verb = "CONSTRUCT"
            self.eat("{")
            while self.peek() != "}":
                if self.peek() == ".":
                    self.next()
                    continue
                self.triples(q.templates)
            self.eat("}")
            self.eat("WHERE")
            q.group = self.group()
            while self.at_kw("LIMIT"):
                self.next()
                q.limit = int(self.next())
            return q
        if self.at_kw("DESCRIBE"):
            self.next()
            q = _Query()
            q.verb = "DESCRIBE"
            while self.peek() is not None and not self.at_kw("WHERE"):
                q.describe_terms.append(self.term())
            if self.at_kw("WHERE"):
                self.next()
                q.group = self.group()
            return q
        raise ValueError(f"unsupported query verb {self.peek()!r}")


# --- evaluation ----------------------------------------------------------

def _path_edge_set(quads: DataFrame, ast: tuple,
                   graph: str | None) -> DataFrame:
    """Compile a path AST to its (src, dst) edge set via the query
    layer's composable path operators.  `+`/`*` close over the COMPOSED
    edge set (iterative frontier expansion, one bounded shuffle join
    per hop — see query.path_closure for the scale rationale)."""
    kind = ast[0]
    if kind == "iri":
        return path_edges(quads, ast[1], graph=graph)
    if kind == "inv":
        return path_inv(_path_edge_set(quads, ast[1], graph))
    if kind == "alt":
        return path_alt(*[_path_edge_set(quads, x, graph)
                          for x in ast[1]])
    if kind == "seq":
        return path_seq(*[_path_edge_set(quads, x, graph)
                          for x in ast[1]])
    if kind in ("plus", "star"):
        return path_closure(
            _path_edge_set(quads, ast[1], graph), None,
            include_zero=(kind == "star")).select("src", "dst")
    raise AssertionError(ast)


def _path_solutions(quads: DataFrame,
                    trip: tuple[str, tuple, str],
                    graph: str | None, idx: int) -> DataFrame:
    """One path triple -> a solutions DataFrame (columns = its
    variables), joined into the group like a sub-SELECT result."""
    s, ast, o = trip
    if graph is not None and graph.startswith("?"):
        raise ValueError("property paths inside GRAPH ?var are not "
                         "supported")
    e = _path_edge_set(quads, ast, graph)
    s_var, o_var = s.startswith("?"), o.startswith("?")
    if s_var and o_var:
        if s == o:
            return (e.where(F.col("src") == F.col("dst"))
                    .select(F.col("src").alias(s[1:])).distinct())
        return e.select(F.col("src").alias(s[1:]),
                        F.col("dst").alias(o[1:]))
    if s_var:
        return (e.where(F.col("dst") == o)
                .select(F.col("src").alias(s[1:])).distinct())
    if o_var:
        return (e.where(F.col("src") == s)
                .select(F.col("dst").alias(o[1:])).distinct())
    # both constants: existence marker (0 or 1 rows; cross-joins in)
    return (e.where((F.col("src") == s) & (F.col("dst") == o))
            .select(F.lit(1).alias(f"__path{idx}")).limit(1))


def _eval_group(quads: DataFrame, g: _Group,
                stats=None, distinct=True,
                select=None, order_by=None, limit=None,
                offset=None) -> DataFrame:
    """Evaluate one group graph pattern to a solutions DataFrame."""
    initials: list[DataFrame] = []
    if g.union_branches:
        # propagate the caller's multiset/set reading: aggregates must
        # see duplicate bindings from { A } UNION { B } (SPARQL multiset
        # union); under distinct=True the final DISTINCT absorbs either
        initials.append(bgp_union(
            *[_eval_group(quads, b, stats, distinct=False)
              for b in g.union_branches], distinct=distinct))
    for sq in g.subselects:
        initials.append(_eval_select(quads, sq, stats))
    for i, pt in enumerate(g.path_triples):
        initials.append(_path_solutions(quads, pt, g.graph, i))
    initial = None
    for df in initials:   # fold: SPARQL join-of-multisets semantics
        if initial is None:
            initial = df
            continue
        shared = [c for c in df.columns if c in initial.columns]
        initial = (initial.join(df, shared) if shared
                   else initial.crossJoin(df))
    if not g.patterns:
        if initial is None:
            raise ValueError("empty group graph pattern")
        if g.optionals or g.values or g.exists or g.not_exists:
            raise ValueError(
                "OPTIONAL/VALUES/EXISTS alongside a bare UNION or "
                "sub-SELECT need at least one required triple pattern")
        out = initial
        for name, expr in g.binds.items():
            out = out.withColumn(name.lstrip("?"), F.expr(expr))
        for cond in g.filters:
            out = out.where(F.expr(cond))
        out = out.drop(*[c for c in out.columns
                         if c.startswith("__path")])
        for m in g.minus:
            out = bgp_minus(out, _eval_group(quads, m, stats))
        if select:
            out = out.select(*[v.lstrip("?") for v in select])
        if distinct:
            out = out.distinct()
        if order_by:
            out = out.orderBy(*[F.expr(e) for e in order_by])
        if offset:
            out = out.offset(offset)
        if limit is not None:
            out = out.limit(limit)
        return out
    out = bgp_query(
        quads, g.patterns, graph=g.graph, distinct=distinct,
        optional_patterns=g.optionals or None,
        filters=g.filters or None, values=g.values,
        binds=g.binds or None, exists_groups=g.exists or None,
        not_exists_groups=g.not_exists or None,
        initial_solutions=initial, stats=stats,
        select=select if not g.minus else None,
        order_by=order_by if not g.minus else None,
        limit=limit if not g.minus else None,
        offset=offset if not g.minus else None)
    markers = [c for c in out.columns if c.startswith("__path")]
    if markers:
        out = out.drop(*markers)
    if g.minus:
        for m in g.minus:
            out = bgp_minus(out, _eval_group(quads, m, stats))
        # modifiers were withheld from bgp_query so MINUS sees full
        # solutions; apply them once here, in the same order
        if select:
            out = out.select(*[v.lstrip("?") for v in select])
        if distinct:
            out = out.distinct()
        if order_by:
            out = out.orderBy(*[F.expr(e) for e in order_by])
        if offset:
            out = out.offset(offset)
        if limit is not None:
            out = out.limit(limit)
    return out


def _eval_select(quads: DataFrame, q: _Query, stats=None) -> DataFrame:
    if q.aggs:
        sols = _eval_group(quads, q.group, stats, distinct=False)
        keys = [v.lstrip("?") for v in q.group_by]
        out = sols.groupBy(*keys).agg(
            *[F.expr(expr).alias(name) for name, expr in q.aggs.items()])
        for cond in q.having:
            out = out.where(F.expr(cond))
        if q.select:  # projected plain vars must be grouping keys
            out = out.select(*[v.lstrip("?") for v in q.select],
                             *q.aggs.keys())
        if q.order_by:
            out = out.orderBy(*[F.expr(e) for e in q.order_by])
        if q.offset:
            out = out.offset(q.offset)
        if q.limit is not None:
            out = out.limit(q.limit)
        return out
    return _eval_group(
        quads, q.group, stats, distinct=q.distinct,
        select=q.select or None, order_by=q.order_by or None,
        limit=q.limit, offset=q.offset)


def sparql(quads: DataFrame, text: str, stats=None):
    """Run a SPARQL query string against a quad DataFrame.

    SELECT -> solutions DataFrame (one column per projected variable),
    ASK -> bool, CONSTRUCT / DESCRIBE -> quad DataFrame.  `stats` is the
    optional VoID catalog for cost-based join ordering (see
    query.stats_catalog)."""
    p = _Parser(text)
    q = p.query()
    if q.verb == "SELECT":
        return _eval_select(quads, q, stats)
    if q.verb == "ASK":
        g = q.group
        if g.union_branches or g.minus or g.subselects or g.optionals \
                or g.binds or g.values or g.exists or g.not_exists \
                or g.path_triples:
            return len(_eval_group(quads, g, stats,
                                   distinct=False).take(1)) > 0
        return ask(quads, g.patterns, graph=g.graph,
                   filters=g.filters or None, stats=stats)
    if q.verb == "CONSTRUCT":
        sols = _eval_group(quads, q.group, stats)
        if q.limit is not None:
            sols = sols.limit(q.limit)
        return instantiate(sols, q.templates)
    if q.verb == "DESCRIBE":
        consts = [t for t in q.describe_terms if not t.startswith("?")]
        vars_ = [t for t in q.describe_terms if t.startswith("?")]
        if vars_:
            sols = _eval_group(quads, q.group, stats,
                               select=[vars_[0]])
            return describe(quads, sols, graph=q.group.graph)
        return describe(quads, consts, graph=q.group.graph)
    raise AssertionError(q.verb)


def sparql_update(quads: DataFrame, text: str) -> DataFrame:
    """Run a SPARQL Update string; returns the post-update quad store
    (functional — write it back with store.write_quad_store / a sink).

    INSERT DATA / DELETE DATA / DELETE-INSERT-WHERE / DELETE WHERE map
    onto query.update_where's distributed join plan; CLEAR / ADD / COPY
    / MOVE GRAPH onto the graph-management verbs."""
    p = _Parser(text)
    p.prologue()

    def quad_block() -> list[tuple[str, str, str]]:
        out: list[tuple[str, str, str]] = []
        p.eat("{")
        while p.peek() != "}":
            if p.peek() == ".":
                p.next()
                continue
            p.triples(out)
        p.eat("}")
        return out

    kw = p.next().upper()
    if kw == "CLEAR":
        p.eat("GRAPH")
        return clear_graph(quads, p.term())
    if kw in ("ADD", "COPY", "MOVE"):
        if p.at_kw("GRAPH"):
            p.next()
        src = None if p.at_kw("DEFAULT") and p.next() else p.term()
        p.eat("TO")
        if p.at_kw("GRAPH"):
            p.next()
        dst = p.term()
        fn = {"ADD": add_graph, "COPY": copy_graph, "MOVE": move_graph}[kw]
        return fn(quads, src, dst)
    if kw == "INSERT" and p.at_kw("DATA"):
        p.next()
        triples = quad_block()
        # constant triples: emit through instantiate on a 1-row frame
        one = quads.sparkSession.range(1).select(
            F.lit("1").alias("__one"))
        ins = instantiate(one, triples)
        return quads.unionByName(ins).distinct()
    if kw == "DELETE" and p.at_kw("DATA"):
        p.next()
        triples = quad_block()
        one = quads.sparkSession.range(1).select(
            F.lit("1").alias("__one"))
        dels = instantiate(one, triples).select("s", "p", "o") \
            .withColumnRenamed("s", "__ds") \
            .withColumnRenamed("p", "__dp") \
            .withColumnRenamed("o", "__do")
        # un-GRAPHed DELETE DATA targets the DEFAULT graph only (the
        # same scope update_where's null-safe g key applies) — without
        # the g filter the anti-join would delete matching triples from
        # every named graph too
        cond = (quads["g"].isNull()
                & (quads["s"] == dels["__ds"])
                & (quads["p"] == dels["__dp"])
                & (quads["o"] == dels["__do"]))
        return quads.join(dels, cond, "left_anti")
    if kw == "DELETE":
        if p.at_kw("WHERE"):                     # DELETE WHERE {...}
            p.next()
            pats = quad_block()
            return update_where(quads, pats, delete_templates=pats)
        dels = quad_block()
        inserts = None
        if p.at_kw("INSERT"):
            p.next()
            inserts = quad_block()
        p.eat("WHERE")
        pats = quad_block()
        return update_where(quads, pats, delete_templates=dels,
                            insert_templates=inserts)
    if kw == "INSERT":
        inserts = quad_block()
        p.eat("WHERE")
        pats = quad_block()
        return update_where(quads, pats, insert_templates=inserts)
    raise ValueError(f"unsupported update verb {kw!r}")
