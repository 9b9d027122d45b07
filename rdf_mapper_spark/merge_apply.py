"""Test-scale executor for the statements `IcebergMergeSink` generates.

The sandbox has no Iceberg runtime, so the MERGE semantics would
otherwise be text-asserted only.  This module EXECUTES them against an
in-memory quad-table stand-in (the update_apply.py technique used for
the SPARQL update/delete sinks): it parses exactly the statement shapes
the sink emits —

  * ``DELETE FROM t WHERE t.g <=> <lit>``           (DROP GRAPH)
  * full-run MERGE: ``WHEN NOT MATCHED THEN INSERT *``  (set-union append)
  * delta MERGE:   ``WHEN MATCHED AND s.op = 'delete' THEN DELETE``
                   ``WHEN NOT MATCHED AND s.op = 'add' THEN INSERT (...)``

— and applies each atomically to a quad DataFrame with the same
engine-visible semantics Iceberg gives them: the ON clause is null-safe
equality over (g, full quad identity), matching is evaluated against the
target as of statement start, and each statement commits as a unit.
NOT a general MERGE engine: only the sink's grammar, which is the point
— the tests prove old store + generated script == expected snapshot.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QUAD_ID = ("sk", "s", "p", "ok", "o", "odt", "olg")

_DELETE_RX = re.compile(
    r"^DELETE FROM \S+ WHERE t\.g <=> (NULL|'(?:[^']|'')*')\s*$")
_USING_RX = re.compile(r"WHERE g <=> (NULL|'(?:[^']|'')*')")


def _parse_graph(lit: str) -> str | None:
    if lit == "NULL":
        return None
    return lit[1:-1].replace("''", "'")


def _g_match(col, g: str | None):
    return col.eqNullSafe(F.lit(g).cast("string"))


def _identity_cond(t: DataFrame, s: DataFrame):
    cond = t["g"].eqNullSafe(s["g"])
    for c in _QUAD_ID:
        cond = cond & t[c].eqNullSafe(s[c])
    return cond


def apply_merge_statements(stmts: list[str], store: DataFrame,
                           staging: DataFrame) -> DataFrame:
    """Run the generated statement list against `store`, with `staging`
    standing in for the sink's staging view.  Returns the new store.

    `staging` carries the quad columns (plus ``op`` for delta scripts).
    """
    for stmt in stmts:
        m = _DELETE_RX.match(stmt)
        if m:
            g = _parse_graph(m.group(1))
            store = store.where(~_g_match(F.col("g"), g))
            continue
        if not stmt.startswith("MERGE INTO"):
            raise ValueError(f"unrecognized statement: {stmt!r}")
        mu = _USING_RX.search(stmt)
        if mu is None:
            raise ValueError(f"MERGE without graph-pinned USING: {stmt!r}")
        g = _parse_graph(mu.group(1))
        src = staging.where(_g_match(F.col("g"), g))
        cols = [c for c in store.columns]
        if "WHEN MATCHED AND s.op = 'delete' THEN DELETE" in stmt:
            # delta MERGE: both arms act on the target AS OF statement
            # start, then commit together
            dels = src.where(F.col("op") == "delete").select(*cols)
            adds = src.where(F.col("op") == "add").select(*cols)
            not_matched_adds = adds.join(
                store, on=_identity_cond(adds, store), how="left_anti")
            store = store.join(
                dels, on=_identity_cond(store, dels), how="left_anti"
            ).unionByName(not_matched_adds)
        elif "WHEN NOT MATCHED THEN INSERT *" in stmt:
            src = src.select(*cols)
            new_rows = src.join(
                store, on=_identity_cond(src, store), how="left_anti")
            store = store.unionByName(new_rows)
        else:
            raise ValueError(f"unrecognized MERGE arms: {stmt!r}")
        # each statement is one Iceberg snapshot: materialize so the next
        # statement sees this one's result, not a lazy composite
        store = store.localCheckpoint(eager=True)
    return store
