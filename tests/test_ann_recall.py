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
                                multiprobe=False).collect()}
    multi = {(r.qid, r.neighbor)
             for r in lsh_topk(emb, queries, k=k, n_planes=5, dim=16,
                               multiprobe=True).collect()}
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi >= r_single
    assert r_multi >= 0.5, (r_single, r_multi)  # seeded: deterministic


def test_multiprobe_no_duplicate_pairs(spark):
    emb, queries = _fixture(spark, n=120)
    rows = lsh_topk(emb, queries, k=20, n_planes=4, dim=16).collect()
    pairs = [(r.qid, r.neighbor) for r in rows]
    assert len(pairs) == len(set(pairs))
