"""Basic-graph-pattern (BGP) queries over the engine's quad output — the
read side of the knowledge graph.

A BGP is a conjunction of triple patterns whose terms are either
constants or `?var` variables (the SPARQL core).  Each pattern compiles
to a filtered projection of the quad table; shared variables between
patterns become equi-join keys, so Catalyst/AQE choose the physical
join (broadcast for selective patterns, shuffle otherwise) and the
whole query stays declarative DataFrame algebra — no interpreter loop,
no Python on the executors.

Scale notes:
* Patterns are evaluated most-constrained-first (fewest variables), the
  classic selectivity heuristic, so early joins shrink the stream before
  wide patterns like (?s, ?p, ?o) touch it.
* A star join (many patterns sharing one subject variable) shuffles on
  the same key each time; AQE's exchange reuse collapses the repeated
  scans at runtime.
* Patterns with NO shared variable multiply bindings (legal BGP
  cartesian semantics) — the compiler uses an explicit crossJoin there
  so the plan shows the cost honestly.

Variables bind: subject IRI (s), predicate IRI (p), and the LEXICAL
object value (o column; datatype/lang tags ride in odt/olg and are not
matched — extend the pattern tuple if a query needs typed matching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS = ("s", "p", "o")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _sort_expr(e: str):
    s = e.strip()
    low = s.lower()
    if low.endswith(" desc"):
        return F.expr(s[:-5]).desc()
    if low.endswith(" asc"):
        return F.expr(s[:-4]).asc()
    return F.expr(s)


def stats_catalog(quads: DataFrame, graph: str | None = None) \
        -> dict[str, tuple[int, int, int]]:
    """Collect predicate_stats into the planner's catalog shape:
    predicate -> (n_triples, n_subjects, n_objects).  Predicate counts
    are bounded by the schema (a web KG has thousands of predicates, not
    billions), so the collect is dictionary-sized; compute it once per
    stored snapshot and reuse across queries, exactly like a database
    ANALYZE."""
    return {r.p: (r.n_triples, r.n_subjects, r.n_objects)
            for r in predicate_stats(quads, graph=graph).collect()}


def estimate_pattern(pat: tuple[str, str, str],
                     stats: dict[str, tuple[int, int, int]],
                     bound: frozenset[str] | set[str] = frozenset()) -> float:
    """Estimated result cardinality of one triple pattern under the
    VoID catalog, treating variables in `bound` as constants (they are
    join keys against already-produced solutions, so per-key fan-out is
    the right proxy).  The classic independence model: start from the
    predicate's triple count, divide by distinct subjects / objects for
    each bound position."""
    s, p, o = pat
    tot_t = sum(t for t, _, _ in stats.values()) or 1
    if _is_var(p) and p[1:] not in bound:
        t, ns, no = tot_t, 0, 0
        # per-position distincts unknown for the union of predicates;
        # use the max across predicates as the conservative divisor
        if stats:
            ns = max(sj for _, sj, _ in stats.values())
            no = max(ob for _, _, ob in stats.values())
    elif _is_var(p):  # predicate var already bound: average predicate
        t = tot_t / max(len(stats), 1)
        ns = no = t
    else:
        t, ns, no = stats.get(p, (0, 0, 0))
    card = float(t)
    if not _is_var(s) or s[1:] in bound:
        card /= max(ns, 1)
    if not _is_var(o) or o[1:] in bound:
        card /= max(no, 1)
    return card


def order_patterns(patterns: list[tuple[str, str, str]],
                   stats: dict[str, tuple[int, int, int]] | None = None) \
        -> list[tuple[str, str, str]]:
    """Join-order a BGP greedily: pick the cheapest starting pattern,
    then repeatedly the cheapest pattern CONNECTED to the bound
    variables (falling back to the global cheapest only when the BGP is
    genuinely disconnected — the unavoidable cross product).

    Cost is the VoID-catalog cardinality estimate when `stats` is given
    (see estimate_pattern); without stats it degrades to the
    constants-first heuristic (fewer variables = more selective).
    Connectivity-first matters independently of the cost model: a
    var-count sort alone can interleave two disjoint selective patterns
    and force a cross join that a connected order never pays."""
    remaining = list(patterns)
    ordered: list[tuple[str, str, str]] = []
    bound: set[str] = set()

    def cost(pat):
        if stats is not None:
            return estimate_pattern(pat, stats, bound)
        return sum(1 for t in pat if _is_var(t) and t[1:] not in bound)

    while remaining:
        pool = remaining
        if bound:
            connected = [p for p in remaining
                         if any(_is_var(t) and t[1:] in bound for t in p)]
            pool = connected or remaining
        best = min(pool, key=lambda p: (cost(p), remaining.index(p)))
        ordered.append(best)
        remaining.remove(best)
        bound |= {t[1:] for t in best if _is_var(t)}
    return ordered


def bgp_query(quads: DataFrame, patterns: list[tuple[str, str, str]],
              select: list[str] | None = None,
              graph: str | None = None,
              distinct: bool = True,
              materialize: bool = False,
              optional_patterns: list[list[tuple[str, str, str]]]
              | None = None,
              filters: list[str] | None = None,
              values: dict[str, list[str | None]] | None = None,
              binds: dict[str, str] | None = None,
              exists_groups: list[list[tuple[str, str, str]]]
              | None = None,
              not_exists_groups: list[list[tuple[str, str, str]]]
              | None = None,
              order_by: list[str] | None = None,
              limit: int | None = None,
              offset: int | None = None,
              initial_solutions: DataFrame | None = None,
              stats: dict[str, tuple[int, int, int]] | None = None) \
        -> DataFrame:
    """Evaluate a conjunction of (s, p, o) triple patterns.

    -> one column per variable (name without the '?'), restricted to
    `select` if given.  `graph` filters to one named graph (None = the
    default graph, matching quads with NULL g); a `"?var"` value is
    SPARQL's `GRAPH ?var` — every pattern matches NAMED graphs only
    (never the default graph) and the graph IRI binds to the variable,
    joining across patterns like any other shared variable.  `distinct`
    applies set semantics over the projected bindings (SPARQL SELECT
    DISTINCT); pass False to keep duplicate solutions.

    `optional_patterns` is a list of OPTIONAL groups (SPARQL
    left-join semantics): each group is itself a pattern list, compiled
    like a BGP and LEFT-joined onto the required solutions on the
    shared variables — unmatched solutions keep NULL bindings for the
    group's variables.  A group must share at least one variable with
    the required patterns (a var-disjoint OPTIONAL is a cross product
    of little practical meaning; rejected).  The left join broadcasts
    whichever side Catalyst sizes smaller; set semantics still apply
    at the end.

    `filters` are SPARQL FILTER expressions as Spark SQL boolean
    strings over the bound variable columns (e.g. ``"src <> 'a'"`` or
    ``"CAST(n AS INT) > 10"``), applied after required AND optional
    joins (group scope), before projection.  Pure Column predicates —
    they ride inside whole-stage codegen and push down into the scans
    where Catalyst can prove it.

    `values` is SPARQL's VALUES inline-data block in columnar form:
    var -> parallel list of bindings, rows read positionally across the
    lists (``{"?src": ["a", "b"], "?tier": ["gold", "silver"]}`` is the
    two rows (a, gold), (b, silver)).  A ``None`` entry is SPARQL's
    UNDEF — that variable is unconstrained in that row.  The block is
    query-sized by definition, so it joins as an explicitly broadcast
    table; vars shared with the group become join keys (null-skipping
    per UNDEF), fresh vars just extend the solutions.

    `binds` is SPARQL BIND(expr AS ?var): output column -> Spark SQL
    expression over already-bound variables, applied in dict order
    after the joins (so later binds may reference earlier ones) and
    before `filters`.  Plain projections — no shuffle.

    `exists_groups` / `not_exists_groups` are SPARQL's FILTER EXISTS
    {...} / FILTER NOT EXISTS {...}: each group is a pattern list
    compiled like a BGP and applied as a LEFT SEMI (resp. LEFT ANTI)
    join on the shared variables — existence restricts the solutions
    without ever widening them, so no dedup is needed afterwards.  A
    group must share at least one variable with the solutions.

    `order_by` / `limit` / `offset` are the solution modifiers, applied
    last (over the projected, distinct solutions — order expressions
    must reference projected vars).  Entries are Spark SQL expressions
    with an optional trailing ``ASC``/``DESC``.  ORDER BY + LIMIT
    compiles to TakeOrderedAndProject (per-partition bounded heaps
    merged once), so a top-k over billions of solutions never runs a
    global sort; a bare LIMIT without ORDER BY is nondeterministic
    under parallel execution, exactly as in SPARQL.

    `initial_solutions` is SPARQL's sub-SELECT: a pre-computed solution
    table (any bgp_query / bgp_aggregate result — one column per
    variable) joined into the group on the shared variable columns
    before OPTIONAL/VALUES/BIND apply, so outer clauses can reference
    the subquery's bindings.  Var-disjoint subqueries cross-product,
    the legal SPARQL join-of-multisets semantics; Catalyst broadcasts
    the subquery side when it is small (aggregates usually are).

    `stats` is a VoID predicate catalog (stats_catalog output) enabling
    COST-BASED join ordering: patterns are ordered by estimated
    cardinality under the catalog, connected-first (see order_patterns).
    Without it the constants-first heuristic applies.  Results are
    identical either way — only the join tree shape changes.

    `materialize` localCheckpoints the quad input first.  Use it when
    `quads` is an EXPENSIVE computed plan that pattern filters cannot
    prune (e.g. downstream of a shuffle or UDF).  Engine output usually
    does NOT need it: the mapping emits a union of per-property
    projections with literal p, so each pattern's p=const filter folds
    non-matching branches to empty relations and only the matching
    branch's scan survives.  Stored quad tables never need it — the
    pattern constants push down into the parquet scan (and prune, if
    the store partitions by predicate).
    """
    if not patterns:
        raise ValueError("empty BGP")
    if materialize:
        quads = quads.localCheckpoint(eager=True)
    graph_var = graph[1:] if graph is not None and _is_var(graph) else None
    if graph_var:
        g_match = F.col("g").isNotNull()  # GRAPH ?g: named graphs only
    else:
        g_match = (F.col("g").isNull() if graph is None
                   else (F.col("g") == graph))

    def compile_pattern(pat: tuple[str, str, str]) -> DataFrame:
        df = quads.where(g_match)
        # pre-seeding `seen` makes a pattern term reusing the graph
        # variable an equality constraint against g, like any repeat
        cols = [F.col("g").alias(graph_var)] if graph_var else []
        seen = {graph_var: "g"} if graph_var else {}
        for pos, term in zip(_POS, pat):
            if _is_var(term):
                name = term[1:]
                if name in seen:  # repeated var inside one pattern
                    df = df.where(F.col(pos) == F.col(seen[name]))
                else:
                    seen[name] = pos
                    cols.append(F.col(pos).alias(name))
            else:
                df = df.where(F.col(pos) == term)
        return df.select(*cols)

    def join_group(pats: list[tuple[str, str, str]]) -> DataFrame:
        # greedy connected-first ordering; cost-based under `stats`,
        # else most-constrained-first (fewer vars = more selective)
        ordered = order_patterns(pats, stats)
        grp = compile_pattern(ordered[0])
        for pat in ordered[1:]:
            nxt = compile_pattern(pat)
            shared = [c for c in nxt.columns if c in grp.columns]
            grp = grp.join(nxt, shared) if shared else grp.crossJoin(nxt)
        return grp

    out = join_group(patterns)
    if initial_solutions is not None:
        shared = [c for c in initial_solutions.columns
                  if c in out.columns]
        out = (out.join(initial_solutions, shared) if shared
               else out.crossJoin(initial_solutions))
    for group in (optional_patterns or []):
        sub = join_group(group)
        shared = [c for c in sub.columns if c in out.columns]
        if not shared:
            raise ValueError(
                "OPTIONAL group shares no variable with the required "
                f"patterns: {group}")
        out = out.join(sub, shared, "left")
    if values:
        names = [v.lstrip("?") for v in values]
        rows = list(zip(*values.values()))
        from .localrel import local_df

        vdf = local_df(quads.sparkSession, rows,
                       ", ".join(f"`__v_{n}` string" for n in names))
        shared = [n for n in names if n in out.columns]
        fresh = [n for n in names if n not in out.columns]
        if shared:
            cond = None
            for n in shared:  # NULL = UNDEF: unconstrained in that row
                c = (F.col(f"__v_{n}").isNull()
                     | (F.col(f"__v_{n}") == F.col(n)))
                cond = c if cond is None else cond & c
            out = out.join(F.broadcast(vdf), cond)
        else:
            out = out.crossJoin(F.broadcast(vdf))
        keep = [c for c in out.columns if not c.startswith("__v_")]
        out = out.select(
            *keep, *[F.col(f"__v_{n}").alias(n) for n in fresh])
    for name, expr in (binds or {}).items():
        out = out.withColumn(name.lstrip("?"), F.expr(expr))
    for cond in (filters or []):
        out = out.where(F.expr(cond))
    for how, groups in (("left_semi", exists_groups),
                        ("left_anti", not_exists_groups)):
        for group in (groups or []):
            sub = join_group(group)
            shared = [c for c in sub.columns if c in out.columns]
            if not shared:
                raise ValueError(
                    "EXISTS/NOT EXISTS group shares no variable with "
                    f"the solutions: {group}")
            out = out.join(sub.select(*shared), shared, how)
    if select:
        out = out.select(*[v.lstrip("?") for v in select])
    if distinct:
        out = out.distinct()
    if order_by:
        out = out.orderBy(*[_sort_expr(e) for e in order_by])
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def ask(quads: DataFrame, patterns: list[tuple[str, str, str]],
        graph: str | None = None,
        filters: list[str] | None = None,
        stats: dict[str, tuple[int, int, int]] | None = None) -> bool:
    """SPARQL ASK: does at least one solution exist?  Evaluates the BGP
    with `distinct=False` (dedup is wasted work for existence) under a
    LIMIT-1 collect, so Spark stops at the first produced row instead
    of materializing the solution set."""
    sols = bgp_query(quads, patterns, graph=graph, filters=filters,
                     distinct=False, stats=stats)
    return len(sols.take(1)) > 0


def describe(quads: DataFrame, subjects: DataFrame | list[str],
             graph: str | None = None,
             collect_threshold: int = 10_000) -> DataFrame:
    """SPARQL DESCRIBE (concise-bounded-ish): every quad whose subject
    OR object is one of the requested IRIs.

    Graph convention (documented deviation from bgp_query): DESCRIBE is
    a resource-lookup, so ``graph=None`` means DATASET-WIDE — the
    description of a resource includes its quads in every graph — while
    ``bgp_query(graph=None)`` matches the default graph only (the
    SPARQL dataset reading for patterns).  Pass an explicit graph IRI
    to restrict the description.

    DESCRIBE subject sets are query-sized by nature, so a DataFrame
    input (one `iri` column — e.g. a `bgp_query(...).select('d')`
    result) is COLLECTED when it fits `collect_threshold` and pushed as
    an IN filter — ONE pass over the quad stream with a scan-prunable
    predicate (measured 35 s -> ~9 s over the computed engine plan at
    sf0.1, because the semi-join formulation scans the quad lineage
    twice).  Oversized sets fall back to two EQUI semi-joins unioned —
    never one OR-condition join, which can't hash-partition and
    degrades to a nested loop."""
    if not isinstance(subjects, list):
        iris = subjects.select(
            F.col(subjects.columns[0]).alias("__iri")).distinct()
        sample = iris.limit(collect_threshold + 1).collect()
        if len(sample) <= collect_threshold:
            subjects = [r[0] for r in sample]
        else:
            on_s = quads.join(iris, quads["s"] == iris["__iri"],
                              "left_semi")
            on_o = quads.where(F.col("ok") == "iri").join(
                iris, quads["o"] == iris["__iri"], "left_semi")
            out = on_s.unionByName(on_o).distinct()
            if graph is not None:
                out = out.where(F.col("g") == graph)
            return out
    m = F.col("s").isin(subjects) | \
        (F.col("o").isin(subjects) & (F.col("ok") == "iri"))
    out = quads.where(m)
    if graph is not None:
        out = out.where(F.col("g") == graph)
    return out


def bgp_minus(solutions: DataFrame, removed: DataFrame) -> DataFrame:
    """SPARQL MINUS: drop solutions that are COMPATIBLE with some
    solution in `removed` on their shared variables.  One left-anti
    join on the shared columns; with no shared variables nothing is
    removed (the SPARQL definition — disjoint domains never conflict).
    NULL-safe equality mirrors solution compatibility for bindings both
    sides left unbound."""
    shared = [c for c in removed.columns if c in solutions.columns]
    if not shared:
        return solutions
    cond = None
    for c in shared:
        eq = solutions[c].eqNullSafe(removed[c])
        cond = eq if cond is None else (cond & eq)
    return solutions.join(removed.select(*shared).distinct(), cond,
                          "left_anti")


def construct(quads: DataFrame, patterns: list[tuple[str, str, str]],
              templates: list[tuple[str, str, str]],
              graph: str | None = None,
              optional_patterns: list[list[tuple[str, str, str]]]
              | None = None,
              filters: list[str] | None = None) -> DataFrame:
    """SPARQL CONSTRUCT: evaluate a BGP, instantiate template triples
    from each solution — graph-to-graph transformation as ONE
    declarative plan (match joins + a union of per-template
    projections, exactly the shape the mapping engine emits, so sinks
    and the quad store consume the result unchanged).

    Template terms are `?var` references or constants.  BGP solutions
    carry lexical values only (term kinds don't survive the projection),
    so the object kind is re-derived: constants containing ':' and
    variable bindings shaped like absolute http(s)/urn IRIs emit as
    `iri`, everything else as plain `literal` (datatype/lang tags of
    matched objects are not carried through — CONSTRUCT here is a
    restructuring tool, not a round-tripper; route through the engine
    for typed emission).  Solutions with an UNBOUND template variable
    (OPTIONAL) skip that template triple, matching the spec.  Output
    lands in the default graph.
    """
    if not templates:
        raise ValueError("empty CONSTRUCT template")
    sols = bgp_query(quads, patterns, graph=graph,
                     optional_patterns=optional_patterns,
                     filters=filters, distinct=True)
    return instantiate(sols, templates)


def instantiate(solutions: DataFrame,
                templates: list[tuple[str, str, str]]) -> DataFrame:
    """Instantiate template triples from a solution set (the emission
    half of CONSTRUCT, reusable by update_where so DELETE and INSERT
    share one match join).

    ONE pass over the solutions: each solution row emits an array of
    template quads, exploded — NOT a union of per-template projections,
    which would re-run the producing join once per template (measured
    28 s -> 6 s for a 3-template CONSTRUCT over the 1.8M-quad engine
    output at sf0.1)."""
    null = F.lit(None).cast("string")

    def term(t: str):
        return F.col(t[1:]) if _is_var(t) else F.lit(t)

    structs = []
    for s_t, p_t, o_t in templates:
        o_col = term(o_t)
        if _is_var(o_t):
            ok = F.when(o_col.rlike("^(https?|urn):"), "iri") \
                .otherwise("literal")
        else:
            ok = F.lit("iri" if ":" in o_t else "literal")
        structs.append(F.struct(
            null.alias("g"), F.lit("iri").alias("sk"),
            term(s_t).alias("s"), term(p_t).alias("p"), ok.alias("ok"),
            o_col.alias("o"), null.alias("odt"), null.alias("olg"),
        ))
    return (
        solutions.select(F.explode(F.array(*structs)).alias("q"))
        .select("q.*")
        # unbound OPTIONAL vars: skip that template triple per spec
        .where(F.col("s").isNotNull() & F.col("p").isNotNull()
               & F.col("o").isNotNull())
        .distinct()
    )


def update_where(quads: DataFrame, patterns: list[tuple[str, str, str]],
                 delete_templates: list[tuple[str, str, str]] | None = None,
                 insert_templates: list[tuple[str, str, str]] | None = None,
                 graph: str | None = None,
                 optional_patterns: list[list[tuple[str, str, str]]]
                 | None = None,
                 filters: list[str] | None = None,
                 materialize_solutions: bool = True) -> DataFrame:
    """SPARQL `DELETE ... INSERT ... WHERE ...` over the quad DataFrame
    — returns the post-update store (functional, like every stage here;
    write it back with store.write_quad_store or a sink).

    The WHERE match runs ONCE (localCheckpointed by default — both
    branches and the anti-join consume it); DELETE is a left-anti join
    on the null-safe (g, s, p, o) key, INSERT a union.  Matching is
    LEXICAL: datatype/lang tags are not part of the delete key (the
    instantiated templates are plain terms), so a delete template hits
    typed literals with the same lexical form — the practical reading
    for generated stores, documented over SPARQL's term-exact match.
    Set semantics (`distinct`) apply only when an INSERT can introduce
    duplicates; deletes can't.

    This is the DISTRIBUTED counterpart of update_apply.py's test-scale
    interpreter: same statement semantics, expressed as joins so it
    runs over a partitioned store.
    """
    if not delete_templates and not insert_templates:
        raise ValueError("update_where needs delete or insert templates")
    sols = bgp_query(quads, patterns, graph=graph,
                     optional_patterns=optional_patterns,
                     filters=filters, distinct=True)
    if materialize_solutions:
        sols = sols.localCheckpoint(eager=True)
    out = quads
    if delete_templates:
        dels = instantiate(sols, delete_templates) \
            .select("g", "s", "p", "o") \
            .withColumnRenamed("g", "__dg").withColumnRenamed("s", "__ds") \
            .withColumnRenamed("p", "__dp").withColumnRenamed("o", "__do")
        cond = (out["g"].eqNullSafe(dels["__dg"])
                & (out["s"] == dels["__ds"])
                & (out["p"] == dels["__dp"])
                & (out["o"] == dels["__do"]))
        out = out.join(dels, cond, "left_anti")
    if insert_templates:
        out = out.unionByName(instantiate(sols, insert_templates)) \
            .distinct()
    return out


def bgp_aggregate(quads: DataFrame, patterns: list[tuple[str, str, str]],
                  group_vars: list[str], aggs: dict[str, str],
                  having: list[str] | None = None,
                  graph: str | None = None,
                  filters: list[str] | None = None,
                  stats: dict[str, tuple[int, int, int]] | None = None) \
        -> DataFrame:
    """SPARQL SELECT + GROUP BY + HAVING: aggregate the BGP solution
    set.  `aggs` maps output column -> SQL aggregate expression over
    variable columns (e.g. ``{"n": "count(*)", "mx": "max(CAST(c AS
    INT))"}``); `having` filters the grouped rows.  Solutions keep
    duplicate-row semantics before grouping (SPARQL aggregates bind
    over the multiset — pass DISTINCT inside the aggregate expression
    itself for distinct counting).  One keyed shuffle with map-side
    partials; HAVING stays a Column predicate after the aggregation."""
    sols = bgp_query(quads, patterns, graph=graph, filters=filters,
                     distinct=False, stats=stats)
    out = sols.groupBy(*[v.lstrip("?") for v in group_vars]).agg(
        *[F.expr(expr).alias(name) for name, expr in aggs.items()])
    for cond in (having or []):
        out = out.where(F.expr(cond))
    return out


def add_graph(quads: DataFrame, src: str | None, dst: str) -> DataFrame:
    """SPARQL Update `ADD GRAPH src TO dst`: union src's quads into dst
    (src=None = the default graph).  Set semantics on the touched graph
    only — the dedup join is bounded by the two graphs, not the store."""
    src_m = F.col("g").isNull() if src is None else (F.col("g") == src)
    moved = quads.where(src_m).withColumn("g", F.lit(dst))
    existing = quads.where(F.col("g") == dst)
    # set-difference against dst only — the dedup shuffle is bounded by
    # the two graphs involved, never a store-wide distinct
    return quads.unionByName(moved.subtract(existing))


def copy_graph(quads: DataFrame, src: str | None, dst: str) -> DataFrame:
    """SPARQL Update `COPY GRAPH src TO dst`: dst is REPLACED by src's
    quads (drop dst, then insert)."""
    src_m = F.col("g").isNull() if src is None else (F.col("g") == src)
    kept = quads.where(F.col("g").isNull() | (F.col("g") != dst))
    return kept.unionByName(
        quads.where(src_m).withColumn("g", F.lit(dst)))


def move_graph(quads: DataFrame, src: str | None, dst: str) -> DataFrame:
    """SPARQL Update `MOVE GRAPH src TO dst`: COPY then drop src
    (src=None moves the default graph — the drop must then be null-safe:
    a plain ``g != NULL`` evaluates NULL for every named graph and would
    silently drop them all)."""
    out = copy_graph(quads, src, dst)
    if src is None:
        return out.where(F.col("g").isNotNull())
    return out.where(F.col("g").isNull() | (F.col("g") != src))


def clear_graph(quads: DataFrame, graph: str | None) -> DataFrame:
    """SPARQL Update `CLEAR/DROP GRAPH g` (same thing in the quad IR;
    None clears the default graph)."""
    m = F.col("g").isNull() if graph is None else (F.col("g") == graph)
    return quads.where(~F.coalesce(m, F.lit(False)))


def bgp_union(*solutions: DataFrame, distinct: bool = True) -> DataFrame:
    """SPARQL UNION over solution sets: columns align by variable name,
    variables absent from one branch bind NULL (allowMissingColumns).
    ``distinct=True`` applies set semantics (SELECT DISTINCT reading);
    pass False on the aggregate/multiset path — SPARQL UNION is a
    multiset union, and aggregates over ``{ A } UNION { B }`` must see
    duplicate bindings."""
    if not solutions:
        raise ValueError("empty UNION")
    out = solutions[0]
    for nxt in solutions[1:]:
        out = out.unionByName(nxt, allowMissingColumns=True)
    return out.distinct() if distinct else out


def path_query(quads: DataFrame, pred: str, max_hops: int | None,
               graph: str | None = None,
               materialize: bool = True,
               include_zero: bool = False) -> DataFrame:
    """Property-path reachability: all (src, dst, hops) pairs connected
    by 1..max_hops applications of `pred` (SPARQL `pred{1,k}`), `hops`
    = the MINIMUM path length.  ``max_hops=None`` iterates to the
    fixpoint (SPARQL `pred+`); with ``include_zero=True`` that is
    `pred*` over the nodes incident to the predicate — see
    path_closure.

    Iterative frontier expansion — hop k+1 joins the hop-k frontier with
    the edge set, anti-joined against everything already reached so each
    pair is emitted at its first (minimal) hop and cycles terminate.
    Every iteration is one shuffle join bounded by the reachable-pair
    count; max_hops bounds the loop, and the unbounded mode converges
    in O(graph diameter) iterations with a per-hop emptiness probe over
    the checkpointed frontier (directional, hop-labelled reachability —
    distinct from the undirected connected-components machinery in
    pipeline/canonicalize).

    `materialize` localCheckpoints the edge set and each frontier
    (eager, lineage-truncating) — without it a lazy k-step chain
    re-derives hop 1 inside every later branch, the classic iterative-
    plan blowup (measured 19.5 s -> ~5 s on the 600k-quad citation
    bench at k=3).  Pass False only for tiny inputs where plan-compile
    cost dominates.
    """
    return path_closure(path_edges(quads, pred, graph=graph),
                        max_hops, materialize=materialize,
                        include_zero=include_zero)


def path_edges(quads: DataFrame, pred: str,
               graph: str | None = None) -> DataFrame:
    """(src, dst) edge set of one predicate — the atom of a SPARQL
    property-path expression.  Compose with path_inv / path_alt /
    path_seq, close with path_closure."""
    g_match = (F.col("g").isNull() if graph is None
               else (F.col("g") == graph))
    return (quads.where(g_match & (F.col("p") == pred))
            .select(F.col("s").alias("src"), F.col("o").alias("dst"))
            .distinct())


def path_inv(edges: DataFrame) -> DataFrame:
    """SPARQL `^path`: swap direction."""
    return edges.select(F.col("dst").alias("src"),
                        F.col("src").alias("dst"))


def path_alt(*edges: DataFrame) -> DataFrame:
    """SPARQL `a|b`: union of edge sets, set semantics."""
    if not edges:
        raise ValueError("empty alternation")
    out = edges[0].select("src", "dst")
    for e in edges[1:]:
        out = out.unionByName(e.select("src", "dst"))
    return out.distinct()


def path_seq(*edges: DataFrame) -> DataFrame:
    """SPARQL `a/b/...`: relational composition — one equi-join per
    step on the midpoint, left-to-right (Catalyst reorders/broadcasts
    as sizes allow)."""
    if not edges:
        raise ValueError("empty sequence")
    out = edges[0].select("src", "dst")
    for e in edges[1:]:
        out = (out.select("src", F.col("dst").alias("__mid"))
               .join(e.select(F.col("src").alias("__mid"), "dst"),
                     "__mid")
               .select("src", "dst").distinct())
    return out


def path_closure(edges: DataFrame, max_hops: int | None,
                 materialize: bool = True,
                 include_zero: bool = False,
                 max_iter: int = 64) -> DataFrame:
    """Closure of ANY composed edge set: (src, dst, hops) for 1..k
    applications, hops = minimum.  The iterative engine behind
    path_query; see its docstring for the shuffle/anti-join/checkpoint
    rationale.

    ``max_hops=None`` is SPARQL's unbounded `pred+`: iterate to the
    FIXPOINT — each hop's new-pair frontier is localCheckpointed, so
    the emptiness probe that detects convergence is a cheap count over
    materialized partitions, and the loop runs O(graph diameter) times
    (each iteration one shuffle join bounded by the reachable-pair
    count — never pairs^2).  `max_iter` is the runaway guard for
    pathological diameters (a 10^12-page web graph's reachability
    diameter is far below 64); hitting it raises rather than silently
    truncating the closure.

    ``include_zero=True`` adds the zero-length paths (n, n, 0) for
    every node incident to the edge set — `pred*` restricted to the
    edge node set (SPARQL's `p*` over all terms in scope).  Minimum-hop
    labels still hold: a cycle's (n, n) pair reports 0, not the cycle
    length."""
    if max_hops is not None and max_hops < 1:
        raise ValueError("max_hops must be >= 1")

    def mat(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True) if materialize else df

    edges = mat(edges.select("src", "dst").distinct())
    frontier = edges.select("src", "dst", F.lit(1).alias("hops"))
    reached = frontier
    if include_zero:
        nodes = (edges.select(F.col("src").alias("n"))
                 .unionByName(edges.select(F.col("dst").alias("n")))
                 .distinct())
        zero = nodes.select(F.col("n").alias("src"),
                            F.col("n").alias("dst"),
                            F.lit(0).alias("hops"))
        # a self-loop edge (n, n, 1) is subsumed by (n, n, 0)
        reached = zero.unionByName(
            frontier.join(zero.select("src", "dst"), ["src", "dst"],
                          "left_anti"))
    k = 2
    while max_hops is None or k <= max_hops:
        if max_hops is None and k - 2 >= max_iter:
            raise RuntimeError(
                f"path closure did not converge within {max_iter} hops")
        step = mat(
            frontier.select("src", F.col("dst").alias("mid"))
            .join(edges.select(F.col("src").alias("mid"), "dst"), "mid")
            .select("src", "dst").distinct()
            .join(reached.select("src", "dst"), ["src", "dst"],
                  "left_anti")
            .select("src", "dst", F.lit(k).alias("hops"))
        )
        if max_hops is None and step.isEmpty():
            break
        reached = reached.unionByName(step)
        frontier = step
        k += 1
    return reached


def entity_table(quads: DataFrame, predicates: dict[str, str],
                 graph: str | None = None) -> DataFrame:
    """Materialize a WIDE entity table from the quad store: one row per
    subject, one column per requested predicate (alias -> predicate
    IRI) — the 'graph tables' shape downstream SQL consumers join
    against instead of self-joining quads per attribute.

    Multi-valued predicates collapse deterministically to the MINIMUM
    lexical object (document the contract, don't sample).  One
    subject-keyed aggregation with map-side partials; conditional
    aggregates avoid the N-way self-join a naive star query would do.
    """
    g_match = (F.col("g").isNull() if graph is None
               else (F.col("g") == graph))
    preds = list(predicates.items())
    base = quads.where(
        g_match & F.col("p").isin([p for _, p in preds]))
    return base.groupBy(F.col("s")).agg(*[
        F.min(F.when(F.col("p") == pred, F.col("o"))).alias(alias)
        for alias, pred in preds
    ])


def predicate_stats(quads: DataFrame,
                    graph: str | None = None) -> DataFrame:
    """VoID-style per-predicate dataset statistics: triple count,
    distinct subjects, distinct objects for every predicate — the
    dataset-description rollup RDF publishers ship next to a graph
    (and the profile a query planner wants before ordering BGP joins).
    One predicate-keyed aggregation; distinct counts are exact
    (count_distinct's internal expand), which is right for a stats job
    that runs once per snapshot — swap in approx_count_distinct when
    5% error is acceptable for a continuous monitor."""
    g_match = (F.col("g").isNull() if graph is None
               else (F.col("g") == graph))
    return (
        quads.where(g_match)
        .groupBy(F.col("p"))
        .agg(F.count("*").alias("n_triples"),
             F.countDistinct("s").alias("n_subjects"),
             F.countDistinct("o").alias("n_objects"))
    )
