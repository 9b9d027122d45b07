"""Similarity search over embedding columns (array<float>).

* `cosine_topk` — exact brute-force top-k: broadcast the (small) query set,
  score with pure higher-order-function arithmetic (zip_with/aggregate in
  double precision, JVM-side), rank with a window partitioned by query.
* `lsh_topk` — the scale path: random-hyperplane LSH buckets shrink the
  candidate set before exact scoring; hyperplanes are seeded driver-side
  constants so the operator stays deterministic.
"""

from __future__ import annotations

import json
import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double"),
    ))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k neighbors per query -> (qid, rank, neighbor, cosine).

    queries: (qid, qvec). Broadcast the query side: the scan of the big
    embedding table is then a single map-side pass; the only shuffle is the
    per-query top-k (tiny: k rows per query per partition after the window's
    partial rank pruning with AQE)."""
    # per-vector norms computed once per side and carried through the
    # join: the per-pair cosine is one dot fold instead of three —
    # identical floats (norm_expr over the same vector is deterministic;
    # same trick as semantic_dedup_pairs)
    q = queries.select(F.col("qid"), F.col("qvec"),
                       norm_expr(F.col("qvec")).alias("qnrm"))
    pairs = embeddings.select(
        F.col(id_col).alias("neighbor"), F.col(vec_col).alias("v"),
        norm_expr(F.col(vec_col)).alias("nrm"),
    ).crossJoin(F.broadcast(q))
    scored = pairs.where(F.col("neighbor") != F.col("qid")).select(
        "qid", "neighbor",
        F.round(dot_expr(F.col("v"), F.col("qvec"))
                / (F.col("nrm") * F.col("qnrm")), 4).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "neighbor", "cosine")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _sql_quote(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _dot_sql(col_sql: str, plane: list[float]) -> str:
    """Same dot product as `dot_expr`, rendered as ONE SQL string.

    Building 24+ plane dots from Python-side lambda HOFs costs ~4 s of
    py4j round-trips PER PLAN BUILD (measured; the JVM optimize+execute
    is under 1 s) — a single F.expr parse is one round-trip and the JVM
    parser is fast.  Semantics identical: element cast to double, literal
    double array, sequential left-fold sum."""
    arr = ", ".join(f"CAST({x!r} AS DOUBLE)" for x in plane)
    return (f"aggregate(zip_with({col_sql}, array({arr}), "
            f"(x, y) -> CAST(x AS DOUBLE) * y), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")


def _bucket_sql(col_sql: str, planes: list[list[float]], offset: int) -> str:
    bits = " + ".join(
        f"IF({_dot_sql(col_sql, p)} >= 0, {1 << i}, 0)"
        for i, p in enumerate(planes)
    )
    return f"CAST({bits} + {offset} AS INT)"


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from seeded random hyperplanes — the
    single-table form of `lsh_keys_col`: same per-plane dot fold, same
    left-to-right bit sum (aggregate fold == the former explicit
    ``bits[0] + bits[1] + ...`` chain), one matrix literal
    (see `_mat_lit` — analyzer + py4j cost)."""
    n_planes = len(planes)
    mat = _mat_lit(planes)
    bits = F.lit([1 << i for i in range(n_planes)])
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        F.lit(0),
        lambda acc, i: acc + F.when(
            dot_expr(vec, F.element_at(mat, i + 1)) >= 0,
            F.element_at(bits, i + 1)).otherwise(F.lit(0)),
    ).cast("int")


def lsh_keys_col(vec: Column, tables: list[list[list[float]]]) -> Column:
    """Array of the L table-namespaced bucket keys for `vec` — the same
    bits/offset formula as `_bucket_sql` (key = t * 2^n_planes + sign
    pattern; per-plane dot is the identical zip_with/aggregate fold, so
    the keys are bit-identical), built as a tiny nested-HOF tree over one
    matrix literal instead of n_tables x n_planes x dim per-element SQL
    literals (see `_mat_lit` — analyzer cost).  Per-row work is
    unchanged: one dot fold per (table, plane)."""
    n_planes = len(tables[0])
    width = 1 << n_planes
    mat = _mat_lit([p for t in tables for p in t])
    bits = F.lit([1 << i for i in range(n_planes)])
    return F.transform(
        F.sequence(F.lit(0), F.lit(len(tables) - 1)),
        lambda t: (F.aggregate(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            F.lit(0),
            lambda acc, i: acc + F.when(
                dot_expr(vec, F.element_at(mat, t * n_planes + i + 1)) >= 0,
                F.element_at(bits, i + 1)).otherwise(F.lit(0)),
        ) + t * width).cast("int"),
    )


def centroids(dim: int, n_cells: int, seed: int = 7) -> list[list[float]]:
    """Seeded coarse-quantizer centroids (random Gaussian directions).

    A trained k-means codebook drops in identically — the operator only
    needs a deterministic list of vectors; random directions already give
    the cell-pruning shape and keep the operator reproducible without a
    training pass."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_cells)]


def _mat_lit(rows: list[list[float]]) -> Column:
    """A whole plane/centroid matrix as ONE array<array<double>> literal.

    Every Dataset creation re-runs the analyzer over the full logical
    plan, so a formulation that renders n_rows x dim per-element literal
    nodes (the old SQL-string rendering, or PySpark's
    ``F.array(*[F.lit(row) ...])``, which additionally pays one py4j
    call PER ELEMENT) charges tree-size-proportional driver time to
    every transformation step of the query build — measured ~0.6 s per
    lsh_topk construction at 24x64 planes.  ``from_json`` of one string
    literal is a 3-node tree for the analyzer and is folded to a plain
    Literal by Catalyst's ConstantFolding before execution (foldable
    child => foldable), so the per-row plan sees exactly the same
    constant array.  Doubles round-trip exactly: ``json.dumps`` emits
    Python's shortest-round-trip repr and the JVM parse is IEEE
    round-to-nearest (A/B-verified bit-identical bucket sums)."""
    payload = json.dumps([[float(x) for x in r] for r in rows])
    return F.from_json(F.lit(payload), "array<array<double>>")


def _cell_dots(vec: Column, cells: list[list[float]]) -> Column:
    # one transform over a single matrix literal: constant node count,
    # and a constant number of lambda-construction py4j round-trips
    # (the per-cell dot_expr loop paid ~3 lambdas per cell)
    return F.transform(_mat_lit(cells), lambda c: dot_expr(vec, c))


def _cell_dots_sql(col_name: str, cells: list[list[float]]) -> str:
    return ("array(" + ", ".join(
        _dot_sql(_sql_quote(col_name), c) for c in cells) + ")")


def ivf_cell_expr(vec: Column, cells: list[list[float]]) -> Column:
    """1-based index of the best-scoring (max dot product) centroid;
    first-max tie-break — deterministic and SQL-mirrorable."""
    dots = _cell_dots(vec, cells)
    return F.array_position(dots, F.array_max(dots)).cast("int")


def ivf_probe_expr(vec: Column, cells: list[list[float]],
                   nprobe: int) -> Column:
    """The nprobe best cells for a query: sort (-dot, index) structs —
    float ordering is identical across engines — and take the head."""
    dots = _cell_dots(vec, cells)
    ranked = F.array_sort(F.transform(
        F.sequence(F.lit(1), F.lit(len(cells))),
        lambda i: F.struct((-F.element_at(dots, i)).alias("nd"),
                           i.alias("idx")),
    ))
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["idx"])


def train_centroids(embeddings: DataFrame, n_cells: int = 16,
                    iters: int = 3, dim: int | None = None, seed: int = 7,
                    vec_col: str = "embedding") -> list[list[float]]:
    """Distributed spherical k-means coarse quantizer for `ivf_topk`.

    Lloyd iterations expressed as DataFrame aggregation: assign each
    vector to its best cell (argmax dot — the same rule ivf_topk uses to
    store/probe, so training optimizes exactly the quantizer the search
    path applies), then recompute each centroid as the per-dimension mean
    of its members (``dim`` avg() aggregates → ONE shuffle per iteration
    with map-side partial aggregation), L2-normalized on the driver.  The
    collected state is n_cells x dim floats — dictionary-sized regardless
    of corpus size, so the loop is iters small jobs, not a driver
    bottleneck.  Deterministic end-to-end: seeded init (`centroids`),
    first-max tie-break in assignment; empty cells keep their previous
    centroid.

    NULL/empty embedding rows (failed encodes) are dropped before
    assignment — a NULL vector argmaxes to a NULL cell, which would
    survive the groupBy and crash the centroid update — and an
    all-null/empty input raises rather than returning a codebook trained
    on nothing.
    """
    embeddings = embeddings.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0))
    first = embeddings.select(vec_col).head(1)
    if not first:
        raise ValueError(
            "train_centroids: no non-null, non-empty vectors in "
            f"column {vec_col!r}")
    if dim is None:
        dim = len(first[0][0])
    cells = centroids(dim, n_cells, seed)
    for _ in range(iters):
        assigned = embeddings.select(
            F.col(vec_col).alias("v"),
            ivf_cell_expr(F.col(vec_col), cells).alias("cell"),
        )
        rows = assigned.groupBy("cell").agg(
            *[F.avg(F.col("v")[i].cast("double")).alias(f"m{i}")
              for i in range(dim)]
        ).collect()
        new_cells = list(cells)
        for r in rows:
            if r["cell"] is None:  # defensive: null cells are pre-filtered
                continue
            m = [float(r[f"m{i}"]) for i in range(dim)]
            norm = math.sqrt(sum(x * x for x in m))
            if norm > 0:
                new_cells[r["cell"] - 1] = [x / norm for x in m]
        cells = new_cells
    return cells


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 16, nprobe: int = 4, dim: int | None = None,
             seed: int = 7, cells: list[list[float]] | None = None,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF-style approximate top-k: the inverted-file scale path.

    Every vector is assigned to its best coarse cell (ONE stored int —
    unlike LSH's L bucket keys there is no index blow-up); each query
    probes its ``nprobe`` best cells and scores exactly within them.
    Expected scan fraction ~ nprobe/n_cells of the corpus.  At 100 TB the
    cell id is the partition column, so a probe is partition pruning, and
    the seeded random codebook is swapped for a trained k-means one
    without touching the plan.  Probe fan-out multiplies only the (small,
    broadcast) query side."""
    if cells is None:
        if dim is None:
            dim = len(embeddings.select(vec_col).first()[0])
        cells = centroids(dim, n_cells, seed)
    else:
        n_cells = len(cells)
    # matrix-literal HOF formulation (see _mat_lit): constant tree size,
    # same per-row folds in the same order — bit-identical cells/probes
    emb_c = embeddings.select(
        F.col(id_col).alias("neighbor"), F.col(vec_col).alias("v"),
        norm_expr(F.col(vec_col)).alias("nrm"),
        ivf_cell_expr(F.col(vec_col), cells).alias("cell"),
    )
    q_c = queries.select(
        "qid", "qvec", norm_expr(F.col("qvec")).alias("qnrm"),
        F.explode(ivf_probe_expr(F.col("qvec"), cells, nprobe))
        .alias("cell"),
    )
    cand = emb_c.join(F.broadcast(q_c), "cell").where(
        F.col("neighbor") != F.col("qid")
    )
    # carried norms: one dot fold per candidate (see cosine_topk)
    scored = cand.select(
        "qid", "neighbor",
        F.round(dot_expr(F.col("v"), F.col("qvec"))
                / (F.col("nrm") * F.col("qnrm")), 4).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "neighbor", "cosine")
    )


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             n_planes: int = 6, dim: int | None = None, seed: int = 42,
             multiprobe: bool = True, n_tables: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket.

    Multi-TABLE (``n_tables`` = L): L independent seeded hyperplane sets,
    each hashing every vector to its own bucket space; candidates are the
    union across tables (the classical LSH amplification — miss probability
    per true neighbor drops from p to p^L).  The big table carries L bucket
    keys (one explode, Lx index rows — the canonical space-for-recall
    trade; at scale these are L stored partition columns, not a runtime
    explode).  Duplicate (qid, neighbor) candidates that collide in more
    than one table are dropped BEFORE exact scoring so each pair is scored
    once.

    Multi-PROBE (default): within each table, each query also probes every
    bucket at Hamming distance 1 in sign-pattern space (one flipped
    hyperplane) — near neighbors just across one hyperplane are recovered.
    The probe fan-out multiplies only the (small, broadcast) QUERY side;
    the big table is still scanned once and hash-joined.

    At 100 TB this turns a full-table scan per query batch into a
    partition-pruned bucket scan (bucket is a stored/partition column in
    the production layout).  Pass ``dim`` when known — inferring it costs a
    driver `first()` action on the big table.
    """
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    n_tables = max(1, n_tables)
    tables = [hyperplanes(dim, n_planes, seed + 7919 * t)
              for t in range(n_tables)]
    # Bucket key is namespaced per table: key = t * 2^n_planes + bucket.
    # matrix-literal HOF formulation (see lsh_keys_col / _mat_lit):
    # bit-identical keys, constant expression-tree size
    emb_b = embeddings.select(
        F.col(id_col).alias("neighbor"), F.col(vec_col).alias("v"),
        norm_expr(F.col(vec_col)).alias("nrm"),
        F.explode(lsh_keys_col(F.col(vec_col), tables)).alias("bucket"),
    )
    qbase = queries.select(
        "qid", "qvec", norm_expr(F.col("qvec")).alias("qnrm"),
        F.posexplode(lsh_keys_col(F.col("qvec"), tables)).alias("t", "b0")
    )
    if multiprobe:
        probes = F.array(
            F.col("b0"),
            *[F.col("b0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        q_b = qbase.select("qid", "qvec", "qnrm",
                           F.explode(probes).alias("bucket"))
    else:
        q_b = qbase.select("qid", "qvec", "qnrm",
                           F.col("b0").alias("bucket"))
    cand = (
        emb_b.join(F.broadcast(q_b), "bucket")
        .where(F.col("neighbor") != F.col("qid"))
        # union of L tables: score each (qid, neighbor) once
        .dropDuplicates(["qid", "neighbor"])
    )
    # carried norms: one dot fold per candidate (see cosine_topk)
    scored = cand.select(
        "qid", "neighbor",
        F.round(dot_expr(F.col("v"), F.col("qvec"))
                / (F.col("nrm") * F.col("qnrm")), 4).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "neighbor", "cosine")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory side of the ANN scale story
# ---------------------------------------------------------------------------
def pq_codebooks(dim: int, m: int, k: int,
                 seed: int = 13) -> list[list[list[float]]]:
    """Seeded PQ codebooks: m subspaces x k codewords x (dim/m) floats.
    As with `centroids`, a trained k-means codebook drops in identically;
    the seeded version keeps every downstream number reproducible in the
    DuckDB oracle without a training pass."""
    if dim % m:
        raise ValueError("m must divide dim")
    rng = random.Random(seed)
    sub = dim // m
    return [[[rng.gauss(0.0, 1.0) for _ in range(sub)]
             for _ in range(k)] for _ in range(m)]


def _l2_sql(elem_fn, base: int, codeword: list[float]) -> str:
    """Sum of squared differences between vector elements starting at
    0-based `base` and a literal codeword — rendered as an explicit
    left-to-right scalar sum so the SPARK and DUCKDB renderings add in
    the same order and stay bit-identical."""
    terms = []
    for i, c in enumerate(codeword):
        e = elem_fn(base + i)
        terms.append(f"({e} - CAST({c!r} AS DOUBLE)) * "
                     f"({e} - CAST({c!r} AS DOUBLE))")
    return "(" + " + ".join(terms) + ")"


def pq_codes_sql(elem_fn, codebooks: list[list[list[float]]],
                 position_fn, arr_fn=None) -> str:
    """array<int> of 1-based codeword indices (first-min argmin per
    subspace).  `elem_fn(i0)` renders 0-based element access for the
    engine; `position_fn(arr_sql)` renders first-position-of-min;
    `arr_fn(items)` renders array construction (Spark `array(...)`
    default; DuckDB passes a `[...]` renderer)."""
    if arr_fn is None:
        def arr_fn(items):
            return "array(" + ", ".join(items) + ")"
    sub = len(codebooks[0][0])
    parts = []
    for j, cb in enumerate(codebooks):
        dists = [_l2_sql(elem_fn, j * sub, cw) for cw in cb]
        parts.append(position_fn(arr_fn(dists)))
    return arr_fn(parts)


def pq_adc_sql(q_elem_fn, codebooks: list[list[list[float]]],
               cw_elem_fn) -> str:
    """Asymmetric-distance (ADC) approximation: sum over subspaces of
    ||q_sub - codeword[codes[j]]||^2, rendered as ONE explicit
    left-to-right scalar sum so both engines add in the same order.
    `q_elem_fn(i0)` renders 0-based query-vector element access;
    `cw_elem_fn(j, i)` renders element i (0-based) of the j-th
    subspace's SELECTED codeword (the engine-specific nested lookup
    through the stored codes column)."""
    sub = len(codebooks[0][0])
    terms = []
    for j in range(len(codebooks)):
        for i in range(sub):
            q = q_elem_fn(j * sub + i)
            c = cw_elem_fn(j, i)
            terms.append(f"(({q}) - ({c})) * (({q}) - ({c}))")
    return "(" + " + ".join(terms) + ")"
