"""Paragraph dedup, per-key frequency capping, sequence packing."""

from pyspark.sql import functions as F

from rdf_mapper_spark.ops.dedup import dedup_paragraphs
from rdf_mapper_spark.ops.sampling import cap_per_key
from rdf_mapper_spark.ops.text import pack_sequences


def test_dedup_paragraphs_first_occurrence(spark):
    rows = [
        (1, "alpha\nshared\nbeta"),
        (2, "shared\ngamma"),       # 'shared' repeats -> dropped here
        (3, "shared"),              # nothing left -> doc vanishes
        (4, "beta\ndelta"),         # 'beta' first seen in doc 1
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.text for r in dedup_paragraphs(d).collect()}
    assert got == {1: "alpha\nshared\nbeta", 2: "gamma", 4: "delta"}


def test_dedup_paragraphs_position_breaks_ties_within_doc(spark):
    d = spark.createDataFrame([(1, "x\nx\ny")], ["doc_id", "text"])
    got = dedup_paragraphs(d).collect()[0].text
    assert got == "x\ny"  # second 'x' inside the same doc is a repeat


def test_cap_per_key_matches_naive_window_under_hot_key(spark):
    from pyspark.sql import Window

    rows = [(i, "hot" if i % 10 else f"cold{i}") for i in range(200)]
    d = spark.createDataFrame(rows, ["doc_id", "k"])
    got = {(r.doc_id, r.k) for r in cap_per_key(d, "k", 7).collect()}
    w = Window.partitionBy("k").orderBy("doc_id")
    naive = {(r.doc_id, r.k)
             for r in d.withColumn("rn", F.row_number().over(w))
             .where("rn <= 7").drop("rn").collect()}
    assert got == naive
    # the hot key really got capped
    assert sum(1 for _, k in got if k == "hot") == 7


def test_pack_sequences_budget_and_group_isolation(spark):
    rows = [(i, "tok " * 10) for i in range(8)]          # 10 tokens each
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           pack_sequences(d, budget_tokens=25, group_size=4).collect()}
    # group 0: cum 0,10,20,30 -> packs 0,0,0,1
    assert [out[i].pack_id for i in range(4)] == [0, 0, 0, 1]
    # group 1 restarts its own token stream
    assert [out[i].pack_id for i in range(4, 8)] == [0, 0, 0, 1]
    assert out[4].start_tok == 0 and out[7].start_tok == 30
    # a doc longer than the budget still gets exactly one row
    big = spark.createDataFrame([(0, "tok " * 100)], ["doc_id", "text"])
    rows_big = pack_sequences(big, budget_tokens=25, group_size=4).collect()
    assert len(rows_big) == 1 and rows_big[0].pack_id == 0


def test_pack_sequences_plan_is_group_partitioned(spark):
    d = spark.createDataFrame([(i, "a b c") for i in range(10)],
                              ["doc_id", "text"])
    plan = (pack_sequences(d, budget_tokens=8, group_size=4)
            ._jdf.queryExecution().executedPlan().toString())
    # the window must partition by grp -- never a global single-task sort
    assert "Exchange SinglePartition" not in plan, plan
    assert "EvalPython" not in plan
