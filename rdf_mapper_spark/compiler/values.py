"""Value expressions: template strings -> Catalyst Column trees.

The runtime value model mirrors the reference's pattern engine
(pattern.py:43-120) columnar-ly:

* a segment expands to a scalar Column or an ARRAY Column (multi-valued
  results from split/parser transformers);
* segment concatenation is a cross-product (pattern.py:43-47), compiled to
  `concat` / `transform` / `flatten(transform(transform))` chains — all
  whole-stage-codegen-able JVM expressions;
* a missing value is a NULL that propagates through `concat` and is dropped
  at emission, matching "MissingValueWarning -> skip property";
* the final wrap step re-parses lang/datatype suffixes from the *result
  value* (pattern.py:49-65) with JVM regexes and produces the flat term
  struct `(k, v, dt, lg)`.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from rdf_mapper_spark.template import (
    DATATYPE_RX_JAVA,
    LANGSTRING_RX_JAVA,
    ParsedTemplate,
    Static,
    VarExpansion,
)

XSD = "http://www.w3.org/2001/XMLSchema#"

TERM_FIELDS = ("k", "v", "dt", "lg")

#: Spark simple dtypes -> implied xsd datatype for bare column references
#: (JSON-typed inputs produce typed literals, e.g. graphs fixture int 42).
_DTYPE_XSD = {
    "bigint": XSD + "integer",
    "int": XSD + "integer",
    "smallint": XSD + "integer",
    "tinyint": XSD + "integer",
    "double": XSD + "double",
    "float": XSD + "double",
    "boolean": XSD + "boolean",
    "date": XSD + "date",
    "timestamp": XSD + "dateTime",
    "timestamp_ntz": XSD + "dateTime",
    "decimal": XSD + "decimal",
}


def term_struct(k: Any, v: Any, dt: Any = None, lg: Any = None) -> Column:
    as_col = lambda x, alias: (  # noqa: E731
        (x if isinstance(x, Column) else F.lit(x)).cast("string").alias(alias)
    )
    return F.struct(as_col(k, "k"), as_col(v, "v"), as_col(dt, "dt"), as_col(lg, "lg"))


def iri_term(v: Any) -> Column:
    return term_struct("iri", v)


def bnode_term(v: Any) -> Column:
    return term_struct("bnode", v)


@dataclass
class ValueExpr:
    """A compiled template value.

    col       the Column; if is_array, an array of the element type
    is_array  multi-valued (explodes to several triples)
    form      'native' (raw value) | 'term' (term struct, final)
    dtype     Spark simple dtype of the native element, when known
    datatype  statically-assigned xsd datatype (typed transformer output)
    """

    col: Column
    is_array: bool = False
    form: str = "native"
    dtype: Optional[str] = None
    datatype: Optional[str] = None

    def map_elements(self, fn) -> "ValueExpr":
        if self.is_array:
            return replace(self, col=F.transform(self.col, fn))
        return replace(self, col=fn(self.col))


def lexical_column(col: Column, dtype: str | None) -> Column:
    """Canonical lexical form of a native value (rdflib Literal parity)."""
    if dtype in ("timestamp", "timestamp_ntz"):
        return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")
    if dtype == "boolean":
        return F.when(col, "true").otherwise("false")
    return col.cast("string")


def to_string(ve: ValueExpr) -> ValueExpr:
    """Coerce a value expr to string(s) for concatenation (pattern.py:67-73)."""
    if ve.form == "term":
        out = ve.map_elements(lambda c: c["v"])
    else:
        out = ve.map_elements(lambda c: lexical_column(c, ve.dtype))
    return replace(out, form="native", dtype="string", datatype=ve.datatype)


def concat_cross_product(parts: list[ValueExpr]) -> ValueExpr:
    """Cross-product concatenation of scalar/array string segments."""
    acc: ValueExpr | None = None
    for part in parts:
        p = to_string(part)
        if acc is None:
            acc = p
            continue
        # NB single-parameter lambdas only: pyspark's higher-order-function
        # bridge binds one lambda variable per python parameter, so default
        # arguments would capture spurious lambda vars.
        if not acc.is_array and not p.is_array:
            acc = ValueExpr(F.concat(acc.col, p.col), False, "native", "string")
        elif acc.is_array and not p.is_array:
            append_scalar = _suffix_fn(p.col)
            acc = ValueExpr(F.transform(acc.col, append_scalar),
                            True, "native", "string")
        elif not acc.is_array and p.is_array:
            prepend_scalar = _prefix_fn(acc.col)
            acc = ValueExpr(F.transform(p.col, prepend_scalar),
                            True, "native", "string")
        else:
            pc = p.col
            acc = ValueExpr(
                F.flatten(F.transform(acc.col, _cross_fn(pc))),
                True, "native", "string",
            )
    assert acc is not None
    return acc


def _suffix_fn(suffix: Column):
    return lambda a: F.concat(a, suffix)


def _prefix_fn(prefix: Column):
    return lambda b: F.concat(prefix, b)


def _cross_fn(arr: Column):
    def outer(a: Column) -> Column:
        return F.transform(arr, _prefix_fn(a))

    return outer


def runtime_curie_expand(col: Column, namespaces: dict[str, str]) -> Column:
    """Expand a (possibly) CURIE string against the spec namespaces, JVM-side.

    Compile-time constant folding handles the common case; this covers
    datatype suffixes carrying a templated/non-constant CURIE
    (pattern.py:13-19, 58-60).
    """
    curie_rx = r"(?U)^([_A-Za-z][\w\-\.]*):([\w\-\.]+)$"
    prefix = F.regexp_extract(col, curie_rx, 1)
    local = F.regexp_extract(col, curie_rx, 2)
    if namespaces:
        pairs: list[Column] = []
        for p, base in namespaces.items():
            pairs.extend([F.lit(p), F.lit(base)])
        ns_map = F.create_map(*pairs)
        expanded = F.concat(ns_map[prefix], local)
    else:
        expanded = F.lit(None).cast("string")
    return F.when(
        col.rlike(curie_rx) & expanded.isNotNull(), expanded
    ).otherwise(col)


def wrap_native_string(col: Column, pattern_type: str | None,
                       namespaces: dict[str, str]) -> Column:
    """Runtime lang/datatype re-parse of a result string (pattern.py:49-65).

    Returns a term struct, or NULL when a langstring/datatype-shaped template
    produced a value that no longer matches (bug-fix #61/#62 semantics).
    """
    lang_body = F.regexp_extract(col, LANGSTRING_RX_JAVA, 1)
    lang_tag = F.regexp_extract(col, LANGSTRING_RX_JAVA, 2)
    dt_body = F.regexp_extract(col, DATATYPE_RX_JAVA, 1)
    dt_raw = F.regexp_extract(col, DATATYPE_RX_JAVA, 2)
    dt_iri = runtime_curie_expand(dt_raw, namespaces)
    null_term = F.lit(None).cast(
        "struct<k:string,v:string,dt:string,lg:string>"
    )
    return (
        F.when(col.isNull(), null_term)
        .when(col.rlike(LANGSTRING_RX_JAVA),
              term_struct("literal", lang_body, None, lang_tag))
        .when(col.rlike(DATATYPE_RX_JAVA),
              term_struct("literal", dt_body, dt_iri, None))
        .otherwise(
            null_term if pattern_type in ("langstring", "datatype")
            else term_struct("literal", col, None, None)
        )
    )


def to_terms(ve: ValueExpr, pattern_type: str | None,
             namespaces: dict[str, str],
             suffix_free: bool = False) -> ValueExpr:
    """Finalize a value expr to term struct(s).

    ``suffix_free=True`` asserts (statically proven by the caller via
    _template_safety) that no producible value can match the lang-tag or
    datatype suffix regexes — the wrap_native_string re-parse is then the
    identity plain-literal branch and its 6 regex evaluations per value
    are skipped."""
    if ve.form == "term":
        return ve

    static_dt = ve.datatype or _DTYPE_XSD.get((ve.dtype or "").split("(")[0])
    if static_dt:
        dtype = ve.dtype

        def typed(c: Column) -> Column:  # single param: pyspark HOF bridge
            return F.when(
                c.isNotNull(),
                term_struct("literal", lexical_column(c, dtype), static_dt,
                            None),
            )

        out = ve.map_elements(typed)
        return replace(out, form="term")

    if suffix_free and pattern_type is None:
        # neither suffix regex can match -> wrap_native_string always takes
        # the plain-literal branch; NULL maps to a NULL struct exactly as
        # the when(col.isNull(), null_term) head branch does
        out = ve.map_elements(
            lambda c: F.when(
                c.isNotNull(),
                term_struct("literal", c.cast("string"), None, None))
        )
        return replace(out, form="term")

    out = ve.map_elements(
        lambda c: wrap_native_string(c.cast("string"), pattern_type, namespaces)
    )
    return replace(out, form="term")


def drop_null_terms(ve: ValueExpr) -> ValueExpr:
    """Remove null / null-valued elements from an array-valued term expr."""
    assert ve.form == "term"
    if ve.is_array:
        return replace(
            ve, col=F.filter(ve.col, lambda t: t.isNotNull() & t["v"].isNotNull())
        )
    return ve


def simple_dtype(df_dtype: str) -> str:
    return df_dtype.lower()
