"""Event-stream analytics: gap-based sessionization and session rollups.

The standard clickstream primitive a web-scale pipeline needs next to
the crawl tables: split each user's event sequence into sessions
wherever the inter-event gap exceeds a threshold, then aggregate per
session.

Scale shape: both windows partition by user_id — ONE shuffle keyed by
user, then lag + running sum evaluate within each user's partition
stream (no global ordering anywhere).  The rollup is an associative
groupBy with map-side partials.  Hot users (bots) cost their own row
count in a single task's sort — at 10^9-events-per-user bot scale,
cap upstream with ops/sampling.cap_per_key on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """-> events + (session_idx, session_id): a new session starts at a
    user's first event and wherever the gap since their previous event
    exceeds `gap_minutes` (strict).  session_idx is 0-based per user;
    session_id = '<user>:<idx>' is globally unique and deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(),
                                             F.col(id_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    # NTZ has no direct double cast; go via ltz (the session-tz offset
    # cancels in the difference, microseconds survive as the fraction)
    def secs(c):
        return c.cast("timestamp_ltz").cast("double")

    is_new = (prev.isNull() |
              (secs(F.col(ts_col)) - secs(prev)
               > gap_minutes * 60)).cast("long")
    # running sum of session starts = 1-based index -> 0-based
    idx = (F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
    return events.withColumn("session_idx", idx).withColumn(
        "session_id",
        F.concat_ws(":", F.col(user_col).cast("string"),
                    F.col("session_idx").cast("string")),
    )


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id",
                  value_col: str = "value") -> DataFrame:
    """-> one row per session: bounds, event count, value sum.
    Associative aggregation over `sessionize` output — map-side partials
    combine, so the shuffle moves one partial row per (session, task)."""
    s = sessionize(events, gap_minutes, user_col, ts_col, id_col)
    return (
        s.groupBy(user_col, "session_idx", "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("value_sum"),
        )
    )


def asof_join(left: DataFrame, right: DataFrame, on: str, ts_col: str,
              value_cols: list[str]) -> DataFrame:
    """As-of (last-known-value) join: every left row picks up the MOST
    RECENT right row with the same key and right.ts <= left.ts — the
    enrichment primitive for event streams (attach the latest snapshot,
    price, or preceding event without an O(n^2) range join).

    Implementation is the scalable tagged-union trick, not a join at
    all: union both sides, ONE per-key window ordered by (ts, side
    right-first so ties match), forward-fill the right values with
    last(ignorenulls), keep the left rows.  One shuffle keyed by `on`;
    no per-row Python; ties on equal right (key, ts) are broken by the
    union order and should be pre-deduplicated by the caller for full
    determinism.  `value_cols` must not collide with left column names;
    the matched right timestamp rides along as `matched_ts` (NULL = no
    earlier right row, exactly LEFT OUTER asof semantics).
    """
    from pyspark.sql import Window

    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    r = right.select(
        F.col(on), F.col(ts_col),
        F.col(ts_col).alias("matched_ts"),
        *[F.col(c) for c in value_cols],
    ).withColumn("__side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(on)
         .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"__f_{c}")
          for c in ["matched_ts", *value_cols]],
    )
    return filled.where(F.col("__side") == 1).select(
        *lcols,
        F.col("__f_matched_ts").alias("matched_ts"),
        *[F.col(f"__f_{c}").alias(c) for c in value_cols],
    )
