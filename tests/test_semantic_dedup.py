"""SemDeDup-style semantic dedup: brute-force differential + kill-switch."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from rdf_mapper_spark.ops.dedup import semantic_dedup, semantic_dedup_pairs
from rdf_mapper_spark.ops.similarity import centroids

DIM = 8
N = 60
THR = 0.8


def _vecs():
    rng = random.Random(11)
    base = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(N // 3)]
    out = []
    for i, b in enumerate(base):
        out.append((3 * i, b))
        # two jittered near-dups of each base vector
        for j in (1, 2):
            out.append((3 * i + j,
                        [x + rng.gauss(0, 0.02) for x in b]))
    return out


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(y * y for y in b)))


def _cell(v, cells):
    dots = [sum(x * y for x, y in zip(v, c)) for c in cells]
    return dots.index(max(dots))


def _brute(vecs, cells, thr, max_cell=None):
    by_cell: dict[int, list] = {}
    for i, v in vecs:
        by_cell.setdefault(_cell(v, cells), []).append((i, v))
    pairs = set()
    for members in by_cell.values():
        if max_cell is not None and len(members) > max_cell:
            continue
        for (i, vi), (j, vj) in (
                (a, b) for a in members for b in members if a[0] < b[0]):
            if round(_cos(vi, vj), 4) >= thr:
                pairs.add((i, j))
    return pairs


def test_pairs_match_brute_force(spark):
    vecs = _vecs()
    cells = centroids(DIM, 4, seed=7)
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b) for r in
           semantic_dedup_pairs(df, threshold=THR, cells=cells,
                                dim=DIM).collect()}
    assert got == _brute(vecs, cells, THR)
    assert got  # fixture actually produces near-dups


def test_clusters_min_id_survives(spark):
    vecs = _vecs()
    cells = centroids(DIM, 4, seed=7)
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, threshold=THR, cells=cells, dim=DIM).collect()
    assert len(out) == len(vecs)               # every id accounted for
    by_id = {r.vec_id: r for r in out}
    # union-find the brute pairs to components, survivor = min
    parent = {i: i for i, _ in vecs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _brute(vecs, cells, THR):
        parent[find(a)] = find(b)
    for i, _ in vecs:
        comp_min = min(j for j, _ in vecs if find(j) == find(i))
        assert by_id[i].canonical_id == comp_min
        assert by_id[i].keep == (comp_min == i)


def test_max_cell_kill_switch(spark):
    # identical vectors all land in one cell; cap excludes the cell
    vecs = [(i, [1.0] * DIM) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cells = centroids(DIM, 4, seed=7)
    full = semantic_dedup_pairs(df, threshold=0.9, cells=cells, dim=DIM)
    assert full.count() == 20 * 19 // 2
    capped = semantic_dedup_pairs(df, threshold=0.9, cells=cells, dim=DIM,
                                  max_cell=10)
    assert capped.count() == 0
    # the clusters fall back to everyone-keeps-themselves
    out = semantic_dedup(df, threshold=0.9, cells=cells, dim=DIM,
                         max_cell=10)
    assert out.where(~F.col("keep")).count() == 0


def test_no_cartesian_in_plan(spark):
    vecs = _vecs()
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    plan = semantic_dedup_pairs(df, threshold=THR, n_cells=4, dim=DIM) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
