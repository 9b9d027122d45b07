"""Recall guarantees of the banded near-dup operators.

SimHash: with bands = max_hamming + 1 contiguous chunks, any pair within
the radius must share at least one exact chunk (pigeonhole) — plant pairs
at the boundary and assert they are found.

Embedding LSH: the bucketed path must be a subset of the exact all-pairs
verifier, and its per-bucket survivors must carry identical cosines.
"""

import pytest
from pyspark.sql import functions as F

from rdf_mapper_spark.ops.dedup import (
    embedding_near_dups,
    embedding_near_dups_exact,
    simhash64,
    simhash_near_dups,
)


def _simhash_of(spark, text: str) -> int:
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(simhash64(F.col("text")).alias("h")).first()["h"]


def _mutate_to_hamming(spark, base: str, words: list[str], target: int) -> str:
    """Greedily append/swap words until the simhash Hamming distance from
    `base` is exactly `target` (deterministic search over a word pool)."""
    h0 = _simhash_of(spark, base)
    best = None
    pool = []
    toks = base.split(" ")
    # candidate variants: replace the i-th token with a pool word
    for i in range(min(len(toks), 6)):
        for w in words:
            t2 = list(toks)
            t2[i] = w
            pool.append(" ".join(t2))
    for cand in pool:
        h1 = _simhash_of(spark, cand)
        d = bin(h0 ^ h1).count("1")
        if d == target:
            return cand
        if best is None or abs(d - target) < abs(best[1] - target):
            best = (cand, d)
    pytest.skip(f"no candidate at Hamming {target} (closest {best[1]})")


def test_simhash_finds_pair_at_hamming_6(spark):
    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "engineers review the quarterly partition strategy document")
    words = ["zebra", "quantum", "lattice", "harbor", "velvet", "union",
             "crimson", "oak", "tundra", "prism", "ember", "flux",
             "granite", "ivory", "jade", "koala"]
    near = _mutate_to_hamming(spark, base, words, 6)
    docs = spark.createDataFrame(
        [(1, base), (2, near),
         (3, "completely different text about astronomy and star formation "
             "in distant elliptical galaxies observed last spring")],
        ["doc_id", "text"],
    )
    pairs = simhash_near_dups(docs, max_hamming=6)
    found = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert (1, 2) in found, f"Hamming-6 pair missed: {found}"
    assert found[(1, 2)] == 6


def test_simhash_radius_guarantee_exhaustive(spark):
    """Brute-force check on a small corpus: banded candidates == exact
    all-pairs filter at the advertised radius (no recall loss)."""
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "alpha beta gamma delta epsilon zeta kappa iota",
        "lambda mu nu xi omicron pi rho sigma",
        "lambda mu nu xi omicron pi rho tau",
        "totally unrelated content about parquet row groups",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    for radius in (3, 6, 10):
        # radius > 7 is opt-in: requires an explicit bucket cap
        cap = {"max_bucket": 1000} if radius > 7 else {}
        banded = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_near_dups(docs, max_hamming=radius,
                                       **cap).collect()
        }
        hs = {r.doc_id: r.h for r in docs.select(
            "doc_id", simhash64(F.col("text")).alias("h")).collect()}
        exact = {
            (a, b, bin(hs[a] ^ hs[b]).count("1"))
            for a in hs for b in hs if a < b
            and bin(hs[a] ^ hs[b]).count("1") <= radius
        }
        assert banded == exact, f"radius {radius}: {banded} != {exact}"


def test_simhash_finds_pair_at_hamming_4(spark):
    """Planted pair at the SHIPPED radius (entry query uses max_hamming=4)."""
    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "engineers review the quarterly partition strategy document")
    words = ["zebra", "quantum", "lattice", "harbor", "velvet", "union",
             "crimson", "oak", "tundra", "prism", "ember", "flux",
             "granite", "ivory", "jade", "koala"]
    near = _mutate_to_hamming(spark, base, words, 4)
    docs = spark.createDataFrame(
        [(1, base), (2, near),
         (3, "completely different text about astronomy and star formation "
             "in distant elliptical galaxies observed last spring")],
        ["doc_id", "text"],
    )
    pairs = simhash_near_dups(docs, max_hamming=4)
    found = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert found.get((1, 2)) == 4, f"Hamming-4 pair missed: {found}"


def test_simhash_wide_radius_requires_bucket_cap(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="max_bucket"):
        simhash_near_dups(docs, max_hamming=8)
    # opt-in with an explicit cap works
    assert simhash_near_dups(docs, max_hamming=8,
                             max_bucket=100).count() == 0


def test_simhash_band_stats_and_bucket_cap(spark):
    """The stats view reports bucket sizes; the cap drops mega-buckets."""
    from rdf_mapper_spark.ops.dedup import simhash_band_stats

    # 6 identical docs -> every band bucket has n=6; 1 distinct doc
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(6)]
        + [(99, "totally different words about parquet and shuffles")],
        ["doc_id", "text"],
    )
    stats = simhash_band_stats(docs, max_hamming=3).collect()
    assert stats[0]["n"] == 6  # ordered desc
    assert all(r["n"] >= 1 for r in stats)
    # cap below the clone-cluster size suppresses its pairs entirely
    capped = simhash_near_dups(docs, max_hamming=3, max_bucket=5)
    assert capped.count() == 0
    uncapped = simhash_near_dups(docs, max_hamming=3)
    assert uncapped.count() == 15  # C(6,2) identical pairs


def test_simhash_md5_variant_matches_duckdb_semantics(spark):
    """60-bit md5 simhash: banded pairs == exact all-pairs at the radius
    (same guarantee as the xxhash64 path, different hash family)."""
    from pyspark.sql import functions as F

    from rdf_mapper_spark.ops.dedup import simhash_md5

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "lambda mu nu xi omicron pi rho sigma",
        "totally unrelated content about parquet row groups",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    hs = {r.doc_id: r.h for r in docs.select(
        "doc_id", simhash_md5(F.col("text")).alias("h")).collect()}
    assert all(0 <= h < (1 << 60) for h in hs.values())
    for radius in (4, 6):
        banded = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_near_dups(
                docs, max_hamming=radius, hash_fn=simhash_md5,
                bits=60).collect()
        }
        exact = {
            (a, b, bin(hs[a] ^ hs[b]).count("1"))
            for a in hs for b in hs if a < b
            and bin(hs[a] ^ hs[b]).count("1") <= radius
        }
        assert banded == exact, f"radius {radius}"


def test_embedding_lsh_subset_of_exact(spark):
    import random

    rng = random.Random(7)
    dim = 16
    base = [rng.gauss(0, 1) for _ in range(dim)]
    rows = []
    for i in range(40):
        if i % 4 == 0:  # planted near-dups of base
            v = [x + rng.gauss(0, 0.05) for x in base]
        else:
            v = [rng.gauss(0, 1) for _ in range(dim)]
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {(r.id_a, r.id_b): r.cosine
             for r in embedding_near_dups_exact(emb, threshold=0.9).collect()}
    lsh = {(r.id_a, r.id_b): r.cosine
           for r in embedding_near_dups(
               emb, threshold=0.9, n_planes=4, dim=dim).collect()}
    assert exact, "fixture must plant pairs above the threshold"
    assert lsh, "bucketed path found nothing — recall collapsed"
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # planted clones point the same way -> hyperplane buckets agree:
    # recall on the planted cluster should be total here
    assert set(lsh) == set(exact)


def test_simhash_numpy_matches_expression_formulation(spark):
    # the Arrow/numpy vote fold and the pure-Column formulation must be
    # bit-identical (same xxhash64 token hashes in both)
    from pyspark.sql import functions as F

    from rdf_mapper_spark.ops.dedup import _simhash64_expr

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate([
            "alpha beta gamma delta", "", "one", "x y z w v u t s r q",
            "the quick brown fox jumps over the lazy dog",
        ])], ["doc_id", "text"],
    )
    diff = docs.select(
        (simhash64(F.col("text")) == _simhash64_expr(F.col("text")))
        .alias("eq")
    ).where(~F.col("eq")).count()
    assert diff == 0


def test_jaccard_stop_shingle_filter_keeps_true_pairs(spark):
    # pairs overlapping on rare shingles survive the stop-shingle filter
    # with their EXACT jaccard; 'common'-only overlaps are pruned
    docs = spark.createDataFrame([
        (1, "common rareA rareB rareC x1"),
        (2, "common rareA rareB rareC x2"),   # near-dup of 1
        (3, "common other words entirely y1"),
        (4, "common more unrelated tokens z1"),
    ], ["doc_id", "text"])
    from rdf_mapper_spark.ops.dedup import jaccard_pairs

    exact = {(r.id_a, r.id_b): r.jaccard
             for r in jaccard_pairs(docs, threshold=0.5, n=1).collect()}
    # 'common' appears in all 4 docs -> df 4 > cap(0.6*4)=2 -> stop shingle
    filtered = {(r.id_a, r.id_b): r.jaccard
                for r in jaccard_pairs(docs, threshold=0.5, n=1,
                                       stop_df_frac=0.6).collect()}
    assert (1, 2) in filtered
    assert filtered[(1, 2)] == exact[(1, 2)]  # TRUE jaccard incl. stop
    assert set(filtered) == set(exact)


def test_dedup_clusters_transitive_and_numeric_min(spark):
    """Pairs (9,10), (10,11) must collapse into ONE cluster with NUMERIC
    canonical 9 (a lexicographic min would pick '10'); singletons keep
    themselves; determinism across re-runs."""
    from pyspark.sql.types import (LongType, StructField, StructType)

    from rdf_mapper_spark.ops.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i,) for i in (2, 9, 10, 11, 30)],
        StructType([StructField("doc_id", LongType(), False)]))
    pairs = spark.createDataFrame(
        [(9, 10), (10, 11)],
        StructType([StructField("id_a", LongType(), False),
                    StructField("id_b", LongType(), False)]))
    out = {r.doc_id: (r.canonical_id, r.keep)
           for r in dedup_clusters(docs, pairs).collect()}
    assert out == {2: (2, True), 9: (9, True), 10: (9, False),
                   11: (9, False), 30: (30, True)}
    again = {r.doc_id: (r.canonical_id, r.keep)
             for r in dedup_clusters(docs, pairs).collect()}
    assert out == again


def test_bloom_decontamination_equals_exact(spark):
    """Bloom-prefiltered decontamination must be bit-identical to the
    exact path (zero false negatives by construction) and keep the bloom
    check JVM-side in the scan (no Python, no extra shuffle before the
    verify join)."""
    from rdf_mapper_spark.ops.dedup import (
        contaminated_docs,
        contaminated_docs_bloom,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{(i * 7 + j) % 40}" for j in range(15)))
         for i in range(120)],
        ["doc_id", "text"])
    corpus = docs.where("doc_id % 10 != 0")
    bench = docs.where("doc_id % 10 = 0")
    exact = {(r.doc_id, r.n_shared_grams)
             for r in contaminated_docs(corpus, bench, n=3).collect()}
    bloom = {(r.doc_id, r.n_shared_grams)
             for r in contaminated_docs_bloom(corpus, bench, n=3).collect()}
    assert exact == bloom and exact
    plan = (contaminated_docs_bloom(corpus, bench, n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
