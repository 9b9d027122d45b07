"""Multi-probe LSH ANN recall vs the exact verifier (cosine_topk)."""

import random

from rdf_mapper_spark.ops.similarity import cosine_topk, lsh_topk


def _fixture(spark, n=300, dim=16, seed=11):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.where("vec_id < 4").selectExpr(
        "vec_id as qid", "embedding as qvec"
    )
    return emb, queries


def test_multiprobe_beats_single_probe_recall(spark):
    emb, queries = _fixture(spark)
    k = 10
    exact = {(r.qid, r.neighbor)
             for r in cosine_topk(emb, queries, k=k).collect()}
    single = {(r.qid, r.neighbor)
              for r in lsh_topk(emb, queries, k=k, n_planes=5, dim=16,
                                multiprobe=False, n_tables=1).collect()}
    multi = {(r.qid, r.neighbor)
             for r in lsh_topk(emb, queries, k=k, n_planes=5, dim=16,
                               multiprobe=True, n_tables=1).collect()}
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi >= r_single
    assert r_multi >= 0.2, (r_single, r_multi)  # seeded: deterministic


def test_multitable_recall_at_10(spark):
    """The shipped configuration: L seeded plane sets union-ed.

    Recall@10 target >= 0.6 vs the exact verifier (round-2 verdict item #1;
    single-table multiprobe measured 0.21 on this fixture)."""
    emb, queries = _fixture(spark)
    k = 10
    exact = {(r.qid, r.neighbor)
             for r in cosine_topk(emb, queries, k=k).collect()}
    multi = {(r.qid, r.neighbor)
             for r in lsh_topk(emb, queries, k=k, n_planes=5, dim=16,
                               multiprobe=True, n_tables=6).collect()}
    recall = len(multi & exact) / len(exact)
    assert recall >= 0.6, recall


def test_multitable_beats_single_table(spark):
    emb, queries = _fixture(spark, n=250, seed=23)
    k = 10
    exact = {(r.qid, r.neighbor)
             for r in cosine_topk(emb, queries, k=k).collect()}
    one = {(r.qid, r.neighbor)
           for r in lsh_topk(emb, queries, k=k, n_planes=5, dim=16,
                             n_tables=1).collect()}
    six = {(r.qid, r.neighbor)
           for r in lsh_topk(emb, queries, k=k, n_planes=5, dim=16,
                             n_tables=6).collect()}
    assert len(six & exact) >= len(one & exact)


def test_multiprobe_no_duplicate_pairs(spark):
    emb, queries = _fixture(spark, n=120)
    rows = lsh_topk(emb, queries, k=20, n_planes=4, dim=16).collect()
    pairs = [(r.qid, r.neighbor) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_ivf_recall_and_pruning(spark):
    """IVF: recall@10 vs the exact verifier at the shipped nprobe, and
    probe-pruning actually prunes (fewer candidates than the corpus)."""
    from pyspark.sql import functions as F

    from rdf_mapper_spark.ops.similarity import (
        centroids,
        ivf_cell_expr,
        ivf_topk,
    )

    emb, queries = _fixture(spark, n=300, dim=16, seed=31)
    k = 10
    exact = {(r.qid, r.neighbor)
             for r in cosine_topk(emb, queries, k=k).collect()}
    got = {(r.qid, r.neighbor)
           for r in ivf_topk(emb, queries, k=k, n_cells=8, nprobe=4,
                             dim=16).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, recall
    # every vector lands in exactly one of the 8 cells; cells partition
    cells = centroids(16, 8, 7)
    dist = emb.select(
        ivf_cell_expr(F.col("embedding"), cells).alias("c")
    ).groupBy("c").count().collect()
    assert sum(r["count"] for r in dist) == 300
    assert 1 <= len(dist) <= 8
    # nprobe = n_cells degenerates to exact (full scan, same top-k)
    full = {(r.qid, r.neighbor)
            for r in ivf_topk(emb, queries, k=k, n_cells=8, nprobe=8,
                              dim=16).collect()}
    assert full == exact


def test_trained_centroids_improve_quantizer_and_recall(spark):
    """Spherical k-means training: (a) the quantizer objective — mean
    cosine between a vector and its assigned centroid — improves over the
    seeded random codebook; (b) IVF recall with the trained codebook is at
    least as good as the random one at the same nprobe budget.
    All seeded/deterministic."""
    from pyspark.sql import functions as F

    from rdf_mapper_spark.ops.similarity import (
        centroids, cosine_expr, ivf_cell_expr, ivf_topk, train_centroids,
    )

    # clustered fixture: k-means helps when the corpus HAS cluster
    # structure (real embedding corpora do); on isotropic Gaussian noise a
    # trained codebook cannot beat a random one, so testing there would be
    # meaningless
    rng = random.Random(31)
    n_clusters, dim = 6, 16
    centers = [[rng.gauss(0, 1) for _ in range(dim)]
               for _ in range(n_clusters)]
    rows = []
    for i in range(300):
        c = centers[i % n_clusters]
        rows.append((i, [x + rng.gauss(0, 0.25) for x in c]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.where("vec_id < 4").selectExpr(
        "vec_id as qid", "embedding as qvec")
    k = 10
    n_cells, nprobe = 8, 2

    def objective(cells):
        dots = ivf_cell_expr(F.col("embedding"), cells)
        # mean cosine(v, centroid[assigned])
        cell_arrays = F.array(*[
            F.lit([float(x) for x in c]) for c in cells
        ])
        return emb.select(
            F.avg(cosine_expr(
                F.col("embedding"),
                F.element_at(cell_arrays, dots),
            )).alias("obj")
        ).first()["obj"]

    random_cells = centroids(16, n_cells, seed=7)
    trained = train_centroids(emb, n_cells=n_cells, iters=3, dim=16, seed=7)
    assert objective(trained) > objective(random_cells)

    exact = {(r.qid, r.neighbor)
             for r in cosine_topk(emb, queries, k=k).collect()}
    r_random = len({(r.qid, r.neighbor) for r in ivf_topk(
        emb, queries, k=k, n_cells=n_cells, nprobe=nprobe, dim=16,
    ).collect()} & exact) / len(exact)
    r_trained = len({(r.qid, r.neighbor) for r in ivf_topk(
        emb, queries, k=k, nprobe=nprobe, cells=trained,
    ).collect()} & exact) / len(exact)
    assert r_trained >= r_random, (r_random, r_trained)
    assert r_trained >= 0.5, r_trained


def test_train_centroids_skips_null_and_empty_vectors(spark):
    """NULL/empty embeddings (failed encodes) must not crash training —
    and must not perturb the codebook: training on the dirty frame equals
    training on the clean subset."""
    import pytest
    from pyspark.sql.types import (ArrayType, FloatType, LongType,
                                   StructField, StructType)

    from rdf_mapper_spark.ops.similarity import train_centroids

    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
    ])
    clean = [(i, [float((i * 7 + d) % 5) + 0.1 for d in range(4)])
             for i in range(40)]
    dirty = clean + [(100, None), (101, [])]
    c_clean = train_centroids(spark.createDataFrame(clean, schema),
                              n_cells=4, iters=2)
    c_dirty = train_centroids(spark.createDataFrame(dirty, schema),
                              n_cells=4, iters=2)
    assert c_clean == c_dirty
    with pytest.raises(ValueError, match="no non-null"):
        train_centroids(
            spark.createDataFrame([(1, None)], schema), n_cells=2)
