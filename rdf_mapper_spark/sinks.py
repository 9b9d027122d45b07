"""Output sinks (reference K1-K6, template_processor.py:72-134).

Production path at 100 TB: `write_nquads` (one text line per quad,
embarrassingly parallel) or partitioned parquet graph tables
(`write_graph_tables`, partitioned by graph -> per-graph overwrite maps to
the reference's DROP GRAPH + INSERT semantics). Turtle/TriG and the SPARQL
update/delete scripts are driver-side serializations for test/interop scale,
exactly like the reference's rdflib serializer usage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from rdf_mapper_spark.quads import DEFAULT_GRAPH, nquads_lines
from rdf_mapper_spark.terms import Quad, Term
from rdf_mapper_spark.turtle import serialize_turtle, _fmt_term, _fmt_iri


def write_nquads(quads: DataFrame, path: str, mode: str = "overwrite") -> None:
    nquads_lines(quads).write.mode(mode).text(path)


def write_graph_tables(quads: DataFrame, path: str,
                       mode: str = "overwrite") -> None:
    """Quad table partitioned by graph — the Iceberg-style materialization.

    Partition-by-graph makes per-graph replace (= reference DROP+INSERT,
    template_processor.py:72-82) a metadata-only dynamic-partition
    overwrite; no rewrite of untouched graphs.
    """
    (
        # cast keeps the partition column STRING even when every graph is
        # NULL — an all-default-graph store read back from a partitioned
        # layout otherwise infers g as VOID, which cannot partition again
        quads.withColumn("g", quads["g"].cast("string"))
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("g")
        .parquet(path)
    )


def _collect(quads: DataFrame) -> list[Quad]:
    return [
        Quad(g, Term(sk, s), p, Term(ok, o, odt, olg))
        for g, sk, s, p, ok, o, odt, olg in (
            tuple(r) for r in quads.select(
                "g", "sk", "s", "p", "ok", "o", "odt", "olg"
            ).collect()
        )
    ]


def turtle_string(quads: DataFrame, namespaces: dict[str, str] | None = None) -> str:
    """Driver-side Turtle of the default graph — TEST SCALE ONLY."""
    return serialize_turtle(_collect(quads), namespaces or {})


def _graph_block(qs: list[Quad], prefixes: dict[str, str]) -> str:
    lines = []
    for q in sorted(qs, key=lambda q: (q.s.value, q.p, q.o.value)):
        lines.append(
            f"    {_fmt_term(q.s, prefixes)} {_fmt_iri(q.p, prefixes)} "
            f"{_fmt_term(q.o, prefixes)} ."
        )
    return "\n".join(lines)


def sparql_update_script(quads: DataFrame, preserved_graphs: set[str],
                         namespaces: dict[str, str] | None = None) -> str:
    """DROP SILENT GRAPH for non-preserved graphs + INSERT DATA per graph
    (reference write_as_update, template_processor.py:72-82)."""
    prefixes = namespaces or {}
    by_graph: dict[str | None, list[Quad]] = {}
    for q in _collect(quads):
        by_graph.setdefault(q.g, []).append(q)
    out = []
    for p, u in sorted(prefixes.items()):
        out.append(f"PREFIX {p}: <{u}>")
    for g, qs in sorted(by_graph.items(), key=lambda kv: str(kv[0])):
        gname = g if g is not None else DEFAULT_GRAPH
        if gname not in preserved_graphs and g is not None:
            out.append(f"DROP SILENT GRAPH <{gname}> ;")
        out.append("INSERT DATA {")
        if g is not None:
            out.append(f"GRAPH <{g}> {{")
        out.append(_graph_block(qs, prefixes))
        if g is not None:
            out.append("}")
        out.append("};")
    return "\n".join(out) + "\n"


def sparql_delete_script(quads: DataFrame, preserved_graphs: set[str],
                         namespaces: dict[str, str] | None = None) -> str:
    """DROP non-preserved graphs; DELETE DATA for preserved (@graphAdd)
    graphs (reference write_as_delete, template_processor.py:84-97)."""
    prefixes = namespaces or {}
    by_graph: dict[str | None, list[Quad]] = {}
    for q in _collect(quads):
        by_graph.setdefault(q.g, []).append(q)
    out = []
    if preserved_graphs:
        for p, u in sorted(prefixes.items()):
            out.append(f"PREFIX {p}: <{u}>")
    for g, qs in sorted(by_graph.items(), key=lambda kv: str(kv[0])):
        gname = g if g is not None else DEFAULT_GRAPH
        if gname not in preserved_graphs and g is not None:
            out.append(f"DROP SILENT GRAPH <{gname}> ;")
        elif gname in preserved_graphs:
            out.append("DELETE DATA {")
            if g is not None:
                out.append(f"GRAPH <{g}> {{")
            out.append(_graph_block(qs, prefixes))
            if g is not None:
                out.append("}")
            out.append("};")
    return "\n".join(out) + "\n"


def sparql_delta_script(delta: DataFrame,
                        namespaces: dict[str, str] | None = None) -> str:
    """Incremental update script from a `pipeline.incremental.quad_delta`
    result: DELETE DATA for op='delete', INSERT DATA for op='add', grouped
    per graph — ships only changed quads, unlike the reference's
    whole-graph DROP + re-INSERT (template_processor.py:72-82), which is
    the only viable shape at 10^12 documents where a crawl snapshot
    touches a small fraction of pages.

    Deletes are emitted BEFORE inserts so a changed quad (same s/p, new o)
    never transiently removes its replacement. Driver-side serialization —
    deltas are small by construction; for bulk backfills use the
    partitioned-parquet / Iceberg MERGE sinks instead.
    """
    from pyspark.sql import functions as F

    prefixes = namespaces or {}
    out = []
    for p, u in sorted(prefixes.items()):
        out.append(f"PREFIX {p}: <{u}>")
    for op, keyword in (("delete", "DELETE DATA"), ("add", "INSERT DATA")):
        by_graph: dict[str | None, list[Quad]] = {}
        for q in _collect(delta.where(F.col("op") == op)):
            by_graph.setdefault(q.g, []).append(q)
        for g, qs in sorted(by_graph.items(), key=lambda kv: str(kv[0])):
            out.append(keyword + " {")
            if g is not None:
                out.append(f"GRAPH <{g}> {{")
            out.append(_graph_block(qs, prefixes))
            if g is not None:
                out.append("}")
            out.append("};")
    return "\n".join(out) + "\n"


def read_graph_tables(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def trig_string(quads: DataFrame, namespaces: dict[str, str] | None = None) -> str:
    """Driver-side TriG (all graphs) — TEST SCALE ONLY (reference K2)."""
    prefixes = namespaces or {}
    by_graph: dict[str | None, list[Quad]] = {}
    for q in _collect(quads):
        by_graph.setdefault(q.g, []).append(q)
    out = [f"@prefix {p}: <{u}> ." for p, u in sorted(prefixes.items())]
    for g, qs in sorted(by_graph.items(), key=lambda kv: str(kv[0])):
        if g is None:
            out.append(serialize_turtle(qs, {}))
            continue
        out.append(f"{_fmt_iri(g, prefixes)} {{")
        out.append(_graph_block(qs, prefixes))
        out.append("}")
    return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# Writer interface: parquet today, Iceberg MERGE-per-graph at scale
# ---------------------------------------------------------------------------
class QuadSink:
    """Sink interface for the quad table (reference K1-K4 write modes).

    Implementations own the graph-replacement semantics: a run REPLACES
    every non-preserved graph it outputs (reference DROP GRAPH + INSERT,
    template_processor.py:72-82) and APPENDS-as-a-set to preserved
    (@graphAdd) graphs."""

    def write(self, quads: DataFrame) -> None:  # pragma: no cover
        raise NotImplementedError


class ParquetGraphSink(QuadSink):
    """Partitioned-parquet materialization (the sandbox/production-default
    path): dynamic partition overwrite == per-graph replace."""

    def __init__(self, path: str, mode: str = "overwrite") -> None:
        self.path = path
        self.mode = mode

    def write(self, quads: DataFrame) -> None:
        write_graph_tables(quads, self.path, self.mode)


class IcebergMergeSink(QuadSink):
    """Iceberg catalog-table sink: one MERGE per output graph.

    BASELINE.md mandates Iceberg checkpoints at cluster scale; this sink
    generates the per-graph statements —

      * non-preserved output graph: ``DELETE FROM t WHERE g <=> '<g>'``
        (DROP GRAPH) followed by a MERGE that inserts all of the graph's
        quads;
      * preserved (@graphAdd) graph: MERGE only — ``WHEN NOT MATCHED THEN
        INSERT`` on the full quad identity gives RDF *set-union* append,
        idempotent under replay/resume (same guarantee the parquet path
        gets from dedup + overwrite).

    The sandbox has no Iceberg runtime, so ``statements()`` exposes the
    generated SQL; ``write()`` executes them via ``spark.sql`` when a
    catalog provides the table.  The statements' SEMANTICS are executed
    in tests against an in-memory quad store (merge_apply.py: null-safe
    ON matching, per-statement atomicity) — old store + script ==
    expected snapshot, not just text assertions.  Untouched graphs are
    never scanned or rewritten: each statement is pinned to one graph
    value, which Iceberg prunes to that partition's files.
    """

    _QUAD_ID = ("sk", "s", "p", "ok", "o", "odt", "olg")

    def __init__(self, table: str,
                 preserved_graphs: set[str] | None = None,
                 staging_view: str = "__quads_staging") -> None:
        self.table = table
        self.preserved_graphs = set(preserved_graphs or ())
        self.staging_view = staging_view

    def _graph_literal(self, g: str | None) -> str:
        if g is None:
            return "NULL"
        return "'" + g.replace("'", "''") + "'"

    def statements(self, quads: DataFrame) -> list[str]:
        """Per-graph DELETE/MERGE statements for this run's output.

        The distinct-graph set is dictionary-sized by construction (one
        row per graph IRI), so the driver collect is bounded."""
        graphs = sorted(
            (r.g for r in quads.select("g").distinct().collect()),
            key=lambda g: (g is not None, g),
        )
        out: list[str] = []
        for g in graphs:
            lit = self._graph_literal(g)
            g_match = f"t.g <=> {lit}"
            # default graph (g IS NULL) included: a run REPLACES every
            # non-preserved graph it outputs, per the QuadSink contract —
            # pass None in preserved_graphs to preserve the default graph
            if g not in self.preserved_graphs:
                out.append(f"DELETE FROM {self.table} WHERE {g_match}")
            on = " AND ".join(
                [g_match] + [f"t.{c} <=> s.{c}" for c in self._QUAD_ID]
            )
            out.append(
                f"MERGE INTO {self.table} t\n"
                f"USING (SELECT * FROM {self.staging_view} "
                f"WHERE g <=> {lit}) s\n"
                f"ON {on}\n"
                f"WHEN NOT MATCHED THEN INSERT *"
            )
        return out

    def statements_for_delta(self, delta: DataFrame) -> list[str]:
        """Incremental maintenance from a `pipeline.incremental.quad_delta`
        result: ONE MERGE per graph handles both ops — matched delete rows
        are removed, unmatched add rows inserted — so a changed quad (same
        s/p, new o: a delete of the old + an add of the new) commits
        atomically in one Iceberg snapshot per graph instead of a
        delete-then-insert pair. Graph pinning keeps partition pruning."""
        graphs = sorted(
            (r.g for r in delta.select("g").distinct().collect()),
            key=lambda g: (g is not None, g),
        )
        out: list[str] = []
        for g in graphs:
            lit = self._graph_literal(g)
            on = " AND ".join(
                [f"t.g <=> {lit}"] +
                [f"t.{c} <=> s.{c}" for c in self._QUAD_ID]
            )
            out.append(
                f"MERGE INTO {self.table} t\n"
                f"USING (SELECT * FROM {self.staging_view} "
                f"WHERE g <=> {lit}) s\n"
                f"ON {on}\n"
                f"WHEN MATCHED AND s.op = 'delete' THEN DELETE\n"
                f"WHEN NOT MATCHED AND s.op = 'add' THEN "
                f"INSERT ({', '.join(('g',) + self._QUAD_ID)}) "
                f"VALUES ({', '.join('s.' + c for c in ('g',) + self._QUAD_ID)})"
            )
        return out

    def write(self, quads: DataFrame) -> None:  # pragma: no cover
        # requires an Iceberg catalog in the session; not available in the
        # sandbox — statements() is the tested surface
        quads.createOrReplaceTempView(self.staging_view)
        for stmt in self.statements(quads):
            quads.sparkSession.sql(stmt)
