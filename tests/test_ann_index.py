"""Stored ANN index layouts (ops/ann_index.py): build-once /
partition-pruned query, equal to the recompute-path operators."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from rdf_mapper_spark.ops.ann_index import (
    build_ivf_index,
    build_lsh_index,
    ivf_topk_indexed,
    lsh_topk_indexed,
    read_meta,
)
from rdf_mapper_spark.ops.similarity import centroids, ivf_topk, lsh_topk

SCHEMA = StructType([
    StructField("vec_id", LongType(), False),
    StructField("embedding", ArrayType(FloatType()), True),
])
DIM = 8


def _emb(spark, n=120):
    import random

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0.0, 1.0) for _ in range(DIM)])
            for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


def _queries(emb):
    return emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))


def _rows(df):
    return sorted((r.qid, r.rank, r.neighbor) for r in df.collect())


def test_ivf_indexed_equals_recompute(spark, tmp_path):
    emb = _emb(spark)
    cells = centroids(DIM, 8, seed=7)
    path = str(tmp_path / "ivf")
    meta = build_ivf_index(emb, path, cells)
    assert read_meta(path)["n_cells"] == 8 and meta["dim"] == DIM
    got = ivf_topk_indexed(spark, path, _queries(emb), k=5, nprobe=3)
    want = ivf_topk(emb, _queries(emb), k=5, n_cells=8, nprobe=3,
                    dim=DIM, cells=cells)
    assert _rows(got) == _rows(want)


def test_lsh_indexed_equals_recompute(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "lsh")
    build_lsh_index(emb, path, dim=DIM, n_planes=4, n_tables=2, seed=42)
    got = lsh_topk_indexed(spark, path, _queries(emb), k=5)
    want = lsh_topk(emb, _queries(emb), k=5, n_planes=4, n_tables=2,
                    seed=42, dim=DIM)
    assert _rows(got) == _rows(want)


def test_ivf_index_scan_is_partition_pruned(spark, tmp_path):
    """The probe must touch only the probed cells' files — the property
    that makes the stored layout the 100-TB shape (scan fraction ~
    nprobe/n_cells, NOT a full re-hash scan)."""
    emb = _emb(spark)
    cells = centroids(DIM, 8, seed=7)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, cells)
    full = spark.read.parquet(path)
    pruned = full.where(F.col("cell").isin([1, 2]))
    # the physical scan carries a partition filter, not a post-filter
    # (inputFiles() reports the unfiltered FileIndex, so read the scan
    # node's numFiles metric after execution instead)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan, plan

    def files_read(df):
        df.collect()  # count() would build a NEW QueryExecution
        leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
        scan = leaves.head()
        return scan.metrics().apply("numFiles").value()

    assert 0 < files_read(pruned) < files_read(full)


def test_index_excludes_null_and_empty_vectors(spark, tmp_path):
    rows = [(0, [1.0] * DIM), (1, None), (2, [])]
    emb = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, centroids(DIM, 2, seed=7))
    assert [r.vec_id for r in spark.read.parquet(path).collect()] == [0]


def test_append_equals_full_build(spark, tmp_path):
    """build(A) + append(B) == build(A+B): assignment is a pure function
    of (vector, frozen codebook), so incremental maintenance commutes
    with build order for BOTH index kinds."""
    from rdf_mapper_spark.ops.ann_index import append_to_index

    emb = _emb(spark, 120)
    a = emb.where(F.col("vec_id") < 60)
    b = emb.where(F.col("vec_id") >= 60)
    q = _queries(emb)

    cells = centroids(DIM, 8, seed=7)
    p_full, p_inc = str(tmp_path / "full"), str(tmp_path / "inc")
    build_ivf_index(emb, p_full, cells)
    build_ivf_index(a, p_inc, cells)
    append_to_index(b, p_inc)
    assert _rows(ivf_topk_indexed(spark, p_inc, q, k=5, nprobe=3)) == \
        _rows(ivf_topk_indexed(spark, p_full, q, k=5, nprobe=3))

    l_full, l_inc = str(tmp_path / "lfull"), str(tmp_path / "linc")
    build_lsh_index(emb, l_full, dim=DIM, n_planes=4, n_tables=2)
    build_lsh_index(a, l_inc, dim=DIM, n_planes=4, n_tables=2)
    append_to_index(b, l_inc)
    assert _rows(lsh_topk_indexed(spark, l_inc, q, k=5)) == \
        _rows(lsh_topk_indexed(spark, l_full, q, k=5))


def test_ivfpq_codes_and_adc_sanity(spark, tmp_path):
    """PQ codes are deterministic per vector; ADC distance to a vector's
    own reconstruction is far smaller than to a distant vector's; the
    probe scan carries the same partition filter as plain IVF."""
    import random

    from rdf_mapper_spark.ops.ann_index import (
        build_ivfpq_index,
        ivfpq_topk_indexed,
        read_meta,
    )
    from rdf_mapper_spark.ops.similarity import centroids, pq_codebooks

    rng = random.Random(5)
    near = [[1.0 + rng.gauss(0, .01) for _ in range(DIM)]
            for _ in range(6)]
    far = [[-1.0 + rng.gauss(0, .01) for _ in range(DIM)]
           for _ in range(6)]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(near + far)], SCHEMA)
    path = str(tmp_path / "ivfpq")
    cells = centroids(DIM, 4, seed=7)
    build_ivfpq_index(emb, path, cells,
                      pq_codebooks(DIM, 4, 8, seed=13))
    meta = read_meta(path)
    assert meta["kind"] == "ivfpq" and len(meta["codebooks"]) == 4
    stored = {r.vec_id: list(r.codes)
              for r in spark.read.parquet(path).collect()}
    # near-identical vectors quantize to identical codes
    assert stored[0] == stored[1] == stored[2]
    assert stored[6] == stored[7]
    assert stored[0] != stored[6]

    q = spark.createDataFrame([(0, near[0]), (6, far[0])],
                              "qid long, qvec array<double>")
    out = ivfpq_topk_indexed(spark, path, q, k=4, nprobe=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    # ADC ranks the same-cluster vectors above the opposite cluster
    assert {r.neighbor for r in by_q[0][:3]} <= set(range(6))
    assert {r.neighbor for r in by_q[6][:3]} <= set(range(6, 12))


def test_ivfpq_index_does_not_store_vectors(spark, tmp_path):
    """The compression contract: the stored index carries codes + cell,
    never the raw vector."""
    from rdf_mapper_spark.ops.ann_index import build_ivfpq_index
    from rdf_mapper_spark.ops.similarity import centroids, pq_codebooks

    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, centroids(DIM, 4, seed=7),
                      pq_codebooks(DIM, 4, 8, seed=13))
    cols = set(spark.read.parquet(path).columns)
    assert cols == {"vec_id", "codes", "cell"}


def test_ivfpq_append_equals_full_build(spark, tmp_path):
    from rdf_mapper_spark.ops.ann_index import (
        append_to_index,
        build_ivfpq_index,
        ivfpq_topk_indexed,
    )
    from rdf_mapper_spark.ops.similarity import centroids, pq_codebooks

    emb = _emb(spark, 120)
    a = emb.where(F.col("vec_id") < 60)
    b = emb.where(F.col("vec_id") >= 60)
    q = _queries(emb)
    cells = centroids(DIM, 8, seed=7)
    cbs = pq_codebooks(DIM, 4, 8, seed=13)
    p_full, p_inc = str(tmp_path / "full"), str(tmp_path / "inc")
    build_ivfpq_index(emb, p_full, cells, cbs)
    build_ivfpq_index(a, p_inc, cells, cbs)
    append_to_index(b, p_inc)
    assert _rows(ivfpq_topk_indexed(spark, p_inc, q, k=5, nprobe=3)) == \
        _rows(ivfpq_topk_indexed(spark, p_full, q, k=5, nprobe=3))
