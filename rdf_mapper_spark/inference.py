"""RDFS materialization + owl:sameAs smushing over the quad output.

The reference maps rows to triples but performs no entailment
(/root/reference/src/rdf_mapper/lib/mapper_spec.py declares vocabulary,
nothing consumes it); a KG-construction pipeline at web scale needs the
two classic enrichment passes downstream of triple emission:

* `rdfs_materialize` — forward-chains the rho-df fragment of RDFS
  (subClassOf, subPropertyOf, domain, range) into explicit triples.
* `sameas_resolve` — collapses owl:sameAs identity groups to a single
  canonical IRI per entity ("smushing"), rewriting subjects and IRI
  objects.

Scale shape, which is the whole point of doing these on Spark:

* The TBox (schema triples) of a real ontology is dictionary-sized —
  thousands of classes, not billions — while the ABox tracks the
  corpus.  So closures are computed ON THE DRIVER over the collected
  TBox (guarded by `tbox_threshold`, with a distributed doubling loop
  as the escape hatch) and applied to the ABox as BROADCAST joins:
  every inference rule is one map-side join pass over the big table,
  no ABox shuffle until the final `distinct` that set-dedups the
  entailed graph.
* Stratification makes one pass per rule sufficient: the precomputed
  subPropertyOf closure feeds domain/range, whose rdf:type output feeds
  the precomputed subClassOf closure.  No fixpoint loop over the ABox.
  (Meta-level entailment — e.g. rdf:type itself declared a
  subProperty — is out of fragment and documented as such.)
* sameAs components come from pipeline.canonicalize.connected_components
  (hybrid driver union-find / distributed min-label), and the node ->
  canonical mapping tracks the ALIAS EVIDENCE (dictionary-sized), so the
  two rewrite joins broadcast it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SUBCLASS = RDFS + "subClassOf"
SUBPROP = RDFS + "subPropertyOf"
DOMAIN = RDFS + "domain"
RANGE = RDFS + "range"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

_TBOX_PREDS = (SUBCLASS, SUBPROP, DOMAIN, RANGE)


def _driver_closure(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Transitive closure of (sub, sup) pairs, reflexive pairs excluded.

    Plain BFS per distinct subject over the driver-held TBox — the
    ontology is dictionary-sized by precondition (`tbox_threshold`).
    """
    adj: dict[str, set[str]] = {}
    for sub, sup in pairs:
        adj.setdefault(sub, set()).add(sup)
    out: list[tuple[str, str]] = []
    for start in adj:
        seen: set[str] = set()
        stack = list(adj[start])
        while stack:
            nxt = stack.pop()
            if nxt in seen:
                continue
            seen.add(nxt)
            stack.extend(adj.get(nxt, ()))
        out.extend((start, sup) for sup in seen if sup != start)
    return sorted(out)


def _distributed_closure(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(sub, sup) closure via path doubling — O(log d) self-join rounds,
    localCheckpoint per round to cut lineage.  The escape hatch for a
    TBox too large to collect; never the common case."""
    closure = edges.select("sub", "sup").distinct().localCheckpoint()
    for _ in range(max_iter):
        hop = (
            closure.alias("a")
            .join(closure.alias("b"), F.col("a.sup") == F.col("b.sub"))
            .select(F.col("a.sub").alias("sub"), F.col("b.sup").alias("sup"))
        )
        nxt = closure.unionByName(hop).where(F.col("sub") != F.col("sup")) \
            .distinct().localCheckpoint()
        if nxt.count() == closure.count():
            return nxt
        closure = nxt
    # matching path_closure's contract: an incomplete closure must raise,
    # not silently return (path doubling converges in O(log diameter)
    # rounds, so hitting this means a pathological 2^max_iter-step chain)
    raise RuntimeError(
        f"TBox closure did not converge within {max_iter} doubling rounds")


def extract_tbox(quads: DataFrame, tbox_threshold: int = 100_000
                 ) -> dict[str, list[tuple[str, str]]]:
    """Collect the schema triples {pred -> [(s, o), ...]} off the quad
    stream.  Raises if the TBox exceeds `tbox_threshold` rows — at that
    point the caller should pass an explicit `tbox=` built with
    `_distributed_closure`, because 'ontology' no longer fits the
    broadcast design assumption."""
    rows = (
        quads.where(F.col("p").isin(*_TBOX_PREDS))
        .select("p", "s", "o").distinct()
        .limit(tbox_threshold + 1).collect()
    )
    if len(rows) > tbox_threshold:
        raise ValueError(
            f"TBox exceeds {tbox_threshold} triples; broadcast closure "
            "assumption does not hold — use the distributed path")
    tbox: dict[str, list[tuple[str, str]]] = {p: [] for p in _TBOX_PREDS}
    for r in rows:
        tbox[r["p"]].append((r["s"], r["o"]))
    return tbox


def _pairs_df(spark, pairs: list[tuple[str, str]], a: str, b: str):
    # pure-JVM literal relation: these frames are built once per rule
    # and scanned by a broadcast-exchange job each — the classic
    # createDataFrame path paid a Python worker round-trip per partition
    # per scan (localrel module docstring)
    from .localrel import local_df

    return local_df(spark, pairs, f"{a} string, {b} string")


#: Per-rule pair-count cap for compiling a rule as a literal-map lookup
#: instead of a broadcast join.  `element_at` on a literal map is a
#: LINEAR scan of the keys per row, so this stays small — real
#: ontologies past it take the broadcast-join path, whose per-row probe
#: is O(1).
_INLINE_RULE_MAX = 64


def _rule_lookup(pairs: list[tuple[str, str]]):
    """(key, value) pairs -> a literal ``map<string, array<string>>``
    Column: constant-folded by Catalyst, so a rule join against a
    dictionary-sized driver-held pair list becomes a map-side
    ``explode(element_at(map, key))`` — zero joins, zero broadcast
    builds, rows appear exactly once per matching pair (explode of a
    NULL lookup emits nothing, same as the inner join's miss).

    Built as ``from_json`` of ONE string literal instead of
    ``create_map`` over per-element ``F.lit`` calls: the same
    folded-literal trick as the ANN matrices (similarity._mat_lit) —
    one py4j call and a 3-node analyzer tree instead of ~2 per pair,
    folded to an identical Literal map before execution."""
    import json as _json

    m: dict[str, list[str]] = {}
    for k, v in pairs:
        m.setdefault(k, []).append(v)
    payload = _json.dumps({k: sorted(m[k]) for k in sorted(m)})
    return F.from_json(F.lit(payload), "map<string, array<string>>")


def rdfs_materialize(quads: DataFrame, include_asserted: bool = True,
                     tbox_threshold: int = 100_000,
                     materialize: bool = False,
                     tbox: dict[str, list[tuple[str, str]]] | None = None,
                     ) -> DataFrame:
    """Forward-chain rho-df RDFS entailment into explicit quads.

    Rules (each ONE broadcast join over the ABox, no fixpoint loop —
    the driver-side closures make one pass complete):
      rdfs5  (p subPropertyOf q), (q subPropertyOf r) -> (p subPropertyOf r)
      rdfs11 (C subClassOf D), (D subClassOf E)       -> (C subClassOf E)
      rdfs7  (x p y), (p subPropertyOf* q)  ->  (x q y)
      rdfs2  (x p y), (p domain C)          ->  (x rdf:type C)
      rdfs3  (x p y), (p range C)           ->  (y rdf:type C), y an IRI
      rdfs9  (x rdf:type C), (C subClassOf* D) -> (x rdf:type D)
    rdfs5/rdfs11 are the driver-computed closures themselves, emitted
    back as triples (dictionary-sized createDataFrame, no executor
    work).
    domain/range consume subPropertyOf-inferred triples; subClassOf
    consumes domain/range-inferred types.  Inferred quads land in the
    DEFAULT graph (g null) — entailment is graph-global here, matching
    the union-default-graph reading.

    Returns asserted + inferred (or inferred only), set semantics.

    `materialize` localCheckpoints the quad input first: every rule
    branch re-scans the input lineage, so a COMPUTED quad plan (engine
    output, unions) pays ~6x its cost without it.  Stored quad tables
    don't need it — re-scanning parquet is cheap and prunable.

    `tbox` (optional): the schema triples {pred -> [(s, o), ...]} when
    the caller already holds them on the driver (e.g. the ontology was
    createDataFrame'd from driver rows in the first place) — skips the
    extract_tbox collect job.  Must cover exactly the TBox triples
    present in `quads`; extract_tbox dedups, so pass distinct pairs.
    """
    spark = quads.sparkSession
    if materialize:
        quads = quads.localCheckpoint(eager=True)
        # The rule branches re-scan this checkpoint ~12x (each branch of
        # the union consumes it), so every stored partition costs ~12
        # task launches in the final set-dedup job.  A computed-union
        # checkpoint inherits the SUM of its branches' partition counts
        # regardless of size — right for a corpus-scale graph, pure task
        # overhead for a dictionary-sized one.  Derive the width from
        # the now-known materialized row count (same rows-per-task rule
        # the entry's input spread uses); big graphs keep their width.
        n = quads.count()  # cache-scan job, cheap post-checkpoint
        width = max(2, min(n // 50_000 + 1,
                           spark.sparkContext.defaultParallelism))
        if width < quads.rdd.getNumPartitions():
            quads = quads.coalesce(width)
    if tbox is None:
        tbox = extract_tbox(quads, tbox_threshold)
    else:
        # normalize to extract_tbox's contract: all four keys present,
        # pairs distinct (extract_tbox collects .distinct())
        tbox = {p: sorted(set(tbox.get(p, []))) for p in _TBOX_PREDS}
    sp_pairs = _driver_closure(tbox[SUBPROP])
    sc_pairs = _driver_closure(tbox[SUBCLASS])

    null = F.lit(None).cast("string")

    def typed(s_col, sk_col, cls_col) -> DataFrame:
        return (
            F.struct(
                null.alias("g"), sk_col.alias("sk"), s_col.alias("s"),
                F.lit(RDF_TYPE).alias("p"), F.lit("iri").alias("ok"),
                cls_col.alias("o"), null.alias("odt"), null.alias("olg"),
            )
        )

    cols = ["g", "sk", "s", "p", "ok", "o", "odt", "olg"]
    abox = quads.select(*cols)

    def _matches(pairs: list[tuple[str, str]], key_col):
        """Array of rule consequents for ``key_col`` (empty/NULL = no
        match) — the literal-map fast path.  Only called for rules under
        `_INLINE_RULE_MAX` pairs."""
        if not pairs:
            return F.lit(None).cast("array<string>")
        return F.element_at(_rule_lookup(pairs), key_col)

    # rdfs7: subPropertyOf — keep object term intact (literal or IRI).
    # Dictionary-sized rule tables compile to literal-map explodes (no
    # broadcast build job, no join — guide §2.4 "remove shuffles
    # outright"); past _INLINE_RULE_MAX the broadcast join returns.
    if len(sp_pairs) <= _INLINE_RULE_MAX:
        prop_inf = abox.select(
            null.alias("g"), "sk", "s",
            F.explode(_matches(sp_pairs, F.col("p"))).alias("p"),
            "ok", "o", "odt", "olg").select(*cols)
    else:
        sp = _pairs_df(spark, sp_pairs, "sub_p", "sup_p")
        prop_inf = (
            abox.join(F.broadcast(sp), abox["p"] == sp["sub_p"])
            .select("g", "sk", "s", F.col("sup_p").alias("p"),
                    "ok", "o", "odt", "olg")
            .withColumn("g", null)
        )
    p1 = abox.unionByName(prop_inf)

    # rdfs2/rdfs3: domain & range -> rdf:type triples
    dom_pairs = sorted(set(tbox[DOMAIN]))
    rng_pairs = sorted(set(tbox[RANGE]))
    if len(dom_pairs) <= _INLINE_RULE_MAX:
        dom_inf = (
            p1.select("s", "sk",
                      F.explode(_matches(dom_pairs, F.col("p"))).alias("c"))
            .select(typed(F.col("s"), F.col("sk"), F.col("c")).alias("q"))
            .select("q.*")
        )
    else:
        dom = _pairs_df(spark, dom_pairs, "dom_p", "dom_c")
        dom_inf = (
            p1.join(F.broadcast(dom), p1["p"] == dom["dom_p"])
            .select(typed(F.col("s"), F.col("sk"), F.col("dom_c")).alias("q"))
            .select("q.*")
        )
    if len(rng_pairs) <= _INLINE_RULE_MAX:
        rng_inf = (
            p1.where(F.col("ok") == "iri")
            .select("o",
                    F.explode(_matches(rng_pairs, F.col("p"))).alias("c"))
            .select(typed(F.col("o"), F.lit("iri"), F.col("c")).alias("q"))
            .select("q.*")
        )
    else:
        rng = _pairs_df(spark, rng_pairs, "rng_p", "rng_c")
        rng_inf = (
            p1.where(F.col("ok") == "iri")
            .join(F.broadcast(rng), p1["p"] == rng["rng_p"])
            .select(typed(F.col("o"), F.lit("iri"), F.col("rng_c")).alias("q"))
            .select("q.*")
        )

    # rdfs9: subClassOf over every type triple (asserted + rdfs2/3)
    types = (
        p1.where(F.col("p") == RDF_TYPE).select(*cols)
        .unionByName(dom_inf).unionByName(rng_inf)
    )
    if len(sc_pairs) <= _INLINE_RULE_MAX:
        sc_inf = (
            types.select("s", "sk",
                         F.explode(_matches(sc_pairs, F.col("o"))).alias("c"))
            .select(typed(F.col("s"), F.col("sk"), F.col("c")).alias("q"))
            .select("q.*")
        )
    else:
        sc = _pairs_df(spark, sc_pairs, "sub_c", "sup_c")
        sc_inf = (
            types.join(F.broadcast(sc), types["o"] == sc["sub_c"])
            .select(typed(F.col("s"), F.col("sk"), F.col("sup_c")).alias("q"))
            .select("q.*")
        )

    # rdfs5 / rdfs11: the closures themselves as triples
    tbox_inf_rows = (
        [(None, "iri", a, SUBPROP, "iri", b, None, None)
         for a, b in sp_pairs]
        + [(None, "iri", a, SUBCLASS, "iri", b, None, None)
           for a, b in sc_pairs]
    )
    schema = ("g string, sk string, s string, p string, ok string, "
              "o string, odt string, olg string")
    from .localrel import local_df

    tbox_inf = local_df(spark, tbox_inf_rows, schema)

    inferred = (prop_inf.unionByName(dom_inf).unionByName(rng_inf)
                .unionByName(sc_inf).unionByName(tbox_inf))
    out = abox.unionByName(inferred) if include_asserted else inferred
    return out.distinct()


def sameas_resolve(quads: DataFrame, pred: str = OWL_SAMEAS,
                   drop_links: bool = True,
                   broadcast_mapping: bool = True,
                   cc_driver_threshold: int = 100_000) -> DataFrame:
    """Collapse owl:sameAs identity groups to canonical IRIs (smushing).

    sameAs edges -> connected components (pipeline.canonicalize: hybrid
    driver union-find under `cc_driver_threshold` edges, distributed
    min-label + pointer jumping above) -> canonical = lexicographic min
    of each component -> every subject and every IRI object rewrites
    through the (node -> canonical) mapping.

    The mapping tracks the alias evidence, not the corpus, so both
    rewrite joins BROADCAST it by default — two map-side passes over
    the quad stream, zero quad shuffle before the final set-dedup.
    Pass `broadcast_mapping=False` for corpus-scale identity graphs
    (e.g. URL-level sameAs from a crawl), where the mapping itself is
    big and the joins must shuffle.

    `drop_links=True` removes the sameAs triples themselves from the
    output (their information is now in the canonical IRIs).
    """
    cols = ["g", "sk", "s", "p", "ok", "o", "odt", "olg"]
    from .pipeline.canonicalize import connected_components

    edges = (
        quads.where((F.col("p") == pred) & (F.col("ok") == "iri"))
        .select(F.col("s").alias("src"), F.col("o").alias("dst"))
        .distinct()
    )
    comp = connected_components(edges, driver_threshold=cc_driver_threshold)
    mapping = (
        comp.where(F.col("node") != F.col("comp"))
        .select(F.col("node"), F.col("comp").alias("canon"))
    )
    if broadcast_mapping:
        mapping = F.broadcast(mapping)

    out = quads.select(*cols)
    if drop_links:
        out = out.where(F.col("p") != pred)

    sm = mapping.withColumnRenamed("node", "s_node") \
                .withColumnRenamed("canon", "s_canon")
    out = (
        out.join(sm, out["s"] == sm["s_node"], "left")
        .withColumn("s", F.coalesce(F.col("s_canon"), F.col("s")))
        .drop("s_node", "s_canon")
    )
    om = mapping.withColumnRenamed("node", "o_node") \
                .withColumnRenamed("canon", "o_canon")
    out = (
        out.join(om, (out["o"] == om["o_node"]) & (out["ok"] == "iri"),
                 "left")
        .withColumn("o", F.coalesce(F.col("o_canon"), F.col("o")))
        .drop("o_node", "o_canon")
    )
    return out.select(*cols).distinct()
