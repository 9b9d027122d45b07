"""Template-string parsing shared by the driver evaluator and the compiler.

Grammar (reference: pattern.py:26-41, 75-93):
  template   := (static | '{' expansion '}')*
  expansion  := varname? ('|' fncall)*
  fncall     := name | name '(' args ')'
and whole-template suffix forms detected at parse time:
  '...@lang'       -> langstring pattern  (pattern.py:28)
  '...^^<dt>'      -> datatype pattern    (pattern.py:29)

The suffix regexes are ALSO re-applied to each *result value* at runtime
(pattern.py:49-64): a result string "foo@en" becomes a lang-tagged literal
regardless of the template shape, and a langstring/datatype-shaped template
whose result does not re-match yields no value at all (bug-fix #61/#62
semantics, CHANGELOG.md:13-14).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

LANGSTRING_RX = re.compile(r"^(.+)@([\w\-]+)$", re.DOTALL)
DATATYPE_RX = re.compile(r"^(.+)\^\^<([^>]+)>$", re.DOTALL)
_VAR_RX = re.compile(r"{([^}]*)}")
_PIPE_RX = re.compile(r"\s*\|\s*")
_CALL_RX = re.compile(r"([\w]+)\s*\((.*)\s*\)")
_ARG_RX = re.compile(r"""\s*(?P<arg>('([^']*)')|("([^"]*)")|([^\s,]+))\s*""")

# Java-regex equivalents for executor-side (Catalyst regexp_*) use.  (?s) =
# DOTALL, (?U) = unicode character classes to match Python's \w semantics.
LANGSTRING_RX_JAVA = r"(?sU)^(.+)@([\w\-]+)$"
DATATYPE_RX_JAVA = r"(?sU)^(.+)\^\^<([^>]+)>$"


@dataclass(frozen=True)
class FnCall:
    """One pipeline step: a transformer name plus parsed arguments.

    Each arg is ('lit', text) for quoted literals or ('ref', name) for bare
    tokens, which resolve against the row context at runtime and fall back to
    their own literal text when absent (reference: function.py:39-44).
    """

    name: str
    args: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class VarExpansion:
    """A ``{var | fn | fn}`` segment. ``var`` may be '' (value starts None)."""

    var: str
    fns: tuple[FnCall, ...] = ()


@dataclass(frozen=True)
class Static:
    text: str


@dataclass
class ParsedTemplate:
    raw: str
    segments: list = field(default_factory=list)
    # whole-template suffix classification (pattern.py:33-39)
    pattern_type: str | None = None  # None | 'langstring' | 'datatype'

    @property
    def is_single_expansion(self) -> bool:
        return len(self.segments) == 1 and isinstance(self.segments[0], VarExpansion)

    def referenced_vars(self) -> set[str]:
        out = set()
        for seg in self.segments:
            if isinstance(seg, VarExpansion):
                if seg.var:
                    out.add(seg.var)
                for fn in seg.fns:
                    for kind, val in fn.args:
                        if kind == "ref":
                            out.add(val)
        return out


def parse_fncall(call_string: str) -> FnCall:
    call_string = call_string.strip()
    m = _CALL_RX.match(call_string)
    if not m:
        return FnCall(call_string)
    name = m.group(1).strip()
    argstr = m.group(2).strip()
    args: list[tuple[str, str]] = []
    if argstr:
        for am in _ARG_RX.finditer(argstr):
            a = am.group("arg")
            if (a.startswith("'") and a.endswith("'")) or (
                a.startswith('"') and a.endswith('"')
            ):
                args.append(("lit", a[1:-1]))
            else:
                args.append(("ref", a))
    return FnCall(name, tuple(args))


def parse_template(template: str) -> ParsedTemplate:
    pt = ParsedTemplate(raw=template)
    if LANGSTRING_RX.match(template):
        pt.pattern_type = "langstring"
    elif DATATYPE_RX.match(template):
        pt.pattern_type = "datatype"
    last = 0
    for m in _VAR_RX.finditer(template):
        if m.start() > last:
            pt.segments.append(Static(template[last:m.start()]))
        parts = _PIPE_RX.split(m.group(1))
        var = parts[0].strip()
        fns = tuple(parse_fncall(p) for p in parts[1:])
        pt.segments.append(VarExpansion(var, fns))
        last = m.end()
    if last < len(template):
        pt.segments.append(Static(template[last:]))
    return pt
