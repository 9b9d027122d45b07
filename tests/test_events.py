"""Gap-based sessionization."""

import datetime as dt

from rdf_mapper_spark.ops.events import session_stats, sessionize


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")


def test_sessionize_gap_boundaries(spark):
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0, 7, 1.0),
        (2, t0 + 10 * m, 7, 1.0),          # same session
        (3, t0 + 40 * m, 7, 1.0),          # exactly 30 min -> SAME (strict >)
        (4, t0 + 71 * m, 7, 1.0),          # 31 min -> new session
        (5, t0, 8, 1.0),                   # other user independent
    ]
    out = {r.event_id: r for r in
           sessionize(_ev(spark, rows), gap_minutes=30).collect()}
    assert [out[i].session_idx for i in (1, 2, 3, 4)] == [0, 0, 0, 1]
    assert out[5].session_idx == 0
    assert out[4].session_id == "7:1"


def test_session_stats_rollup(spark):
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [(1, t0, 7, 2.5), (2, t0 + 5 * m, 7, 1.5),
            (3, t0 + 60 * m, 7, 4.0)]
    out = {r.session_id: r for r in
           session_stats(_ev(spark, rows), gap_minutes=30).collect()}
    s0 = out["7:0"]
    assert s0.n_events == 2 and s0.value_sum == 4.0
    assert s0.session_start == t0 and s0.session_end == t0 + 5 * m
    assert out["7:1"].n_events == 1


def test_sessionize_single_user_keyed_shuffle(spark):
    t0 = dt.datetime(2024, 1, 1)
    d = _ev(spark, [(i, t0 + dt.timedelta(minutes=i), i % 3, 1.0)
                    for i in range(30)])
    plan = (sessionize(d)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("Exchange") == 1, plan
    assert "Exchange SinglePartition" not in plan


def test_asof_join_semantics(spark):
    import datetime as dt

    from rdf_mapper_spark.ops.events import asof_join

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    L = spark.createDataFrame(
        [(1, t0 + 2 * m, 7), (2, t0 + 5 * m, 7), (3, t0 + 1 * m, 8),
         (4, t0 + 3 * m, 8)],
        "event_id long, ts timestamp, user_id long")
    R = spark.createDataFrame(
        [(7, t0 + 1 * m, 10.0), (7, t0 + 4 * m, 20.0),
         (8, t0 + 3 * m, 30.0)],          # equal-ts: must match (<=)
        "user_id long, ts timestamp, v double")
    out = {r.event_id: r for r in
           asof_join(L, R, "user_id", "ts", ["v"]).collect()}
    assert out[1].v == 10.0 and out[1].matched_ts == t0 + 1 * m
    assert out[2].v == 20.0                       # latest wins
    assert out[3].v is None and out[3].matched_ts is None  # nothing earlier
    assert out[4].v == 30.0                       # tie: right at equal ts


def test_asof_join_single_shuffle_no_python(spark):
    import datetime as dt

    from rdf_mapper_spark.ops.events import asof_join

    t0 = dt.datetime(2024, 1, 1)
    L = spark.createDataFrame([(i, t0, i % 3) for i in range(9)],
                              "event_id long, ts timestamp, user_id long")
    R = spark.createDataFrame([(i % 3, t0, 1.0) for i in range(3)],
                              "user_id long, ts timestamp, v double")
    plan = (asof_join(L, R, "user_id", "ts", ["v"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan         # the whole point: not a join
    assert "EvalPython" not in plan
