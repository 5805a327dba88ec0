"""Window functions and event-time windowed aggregations.

The reference has no window operators (SURVEY §2.6) and its "streaming" is
the Hadoop Streaming protocol (§2.11); the Spark-native surface adds real
analytic windows and event-time windows.  The batch queries here are the
exact semantics the Structured Streaming jobs in
``mongo_hadoop_spark.streaming`` produce incrementally — tested for
equivalence in tests/test_streaming.py.

Scale notes: ranking windows partition by key (no global sort); tumbling /
sliding windows are pure projections before a keyed aggregation, so they
shuffle once on (window, key) — exactly the plan a 1000-executor job wants.
Session windows use lag+cumsum within user partitions (one shuffle on
user_id).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mongo_hadoop_spark.functions import dec_to_double
from mongo_hadoop_spark.session import table


def _dec(col, p: int = 12, s: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# Ranking window: top-3 orders per customer
# ---------------------------------------------------------------------------

def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


TOPN_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Running aggregate: cumulative spend per customer over time
# ---------------------------------------------------------------------------

def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        dec_to_double(F.sum(_dec("o_totalprice")).over(w)).alias("running_spend"),
    )


RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       sum(o_totalprice::decimal(12,2)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::double AS running_spend
FROM orders
"""


# ---------------------------------------------------------------------------
# Lag/lead analytics: inter-event gap seconds per user
# ---------------------------------------------------------------------------

def window_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_timestamp("ts")).over(w)
    return e.select(
        "user_id",
        "event_id",
        (F.unix_timestamp("ts") - prev).alias("gap_seconds"),
    )


GAPS_SQL = """
SELECT user_id, event_id,
       floor(epoch(ts))::bigint - lag(floor(epoch(ts))::bigint) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
       ) AS gap_seconds
FROM events
"""


# ---------------------------------------------------------------------------
# Tumbling event-time window (Structured Streaming window() semantics:
# epoch-aligned, [start, start+len) )
# ---------------------------------------------------------------------------

TUMBLE_SECONDS = 21600  # 6 hours


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    win = F.window("ts", f"{TUMBLE_SECONDS} seconds")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"),
             dec_to_double(F.sum(_dec("value"))).alias("total_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type", "cnt", "total_value",
        )
    )


TUMBLING_SQL = f"""
SELECT (floor(epoch(ts) / {TUMBLE_SECONDS})::bigint * {TUMBLE_SECONDS}) AS window_start,
       event_type, count(*) AS cnt, (trunc(sum(value::decimal(12,2)))::bigint::double + (((sum(value::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS total_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sliding event-time window (12h window, 6h slide → each event in 2 windows)
# ---------------------------------------------------------------------------

SLIDE_SECONDS = 21600
WINDOW_SECONDS = 43200


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    win = F.window("ts", f"{WINDOW_SECONDS} seconds", f"{SLIDE_SECONDS} seconds")
    return (
        e.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start"), "cnt")
    )


SLIDING_SQL = f"""
WITH assigned AS (
  SELECT (floor(epoch(ts) / {SLIDE_SECONDS})::bigint * {SLIDE_SECONDS}) AS window_start FROM events
  UNION ALL
  SELECT (floor(epoch(ts) / {SLIDE_SECONDS})::bigint * {SLIDE_SECONDS}) - {SLIDE_SECONDS} AS window_start
  FROM events
)
SELECT window_start, count(*) AS cnt FROM assigned GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Session windows: 30-minute inactivity gap per user (lag + cumulative sum)
# ---------------------------------------------------------------------------

SESSION_GAP_SECONDS = 1800


def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    new_session = F.when(
        (epoch - F.lag(epoch).over(w)) > SESSION_GAP_SECONDS, 1
    ).otherwise(0)
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = e.select(
        "user_id", "event_id", epoch.alias("epoch_s"),
        F.sum(new_session).over(wcum).cast("long").alias("session_idx"),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("epoch_s").alias("session_start"),
        F.max("epoch_s").alias("session_end"),
    )


SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, floor(epoch(ts))::bigint AS epoch_s,
         CASE WHEN floor(epoch(ts))::bigint
                   - lag(floor(epoch(ts))::bigint) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_SECONDS} THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, event_id, epoch_s,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )::bigint AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, count(*) AS n_events,
       min(epoch_s) AS session_start, max(epoch_s) AS session_end
FROM numbered GROUP BY 1, 2
"""



def window_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend quartile per customer via *threshold* bucketing, not ntile.

    A global ``ntile(4)`` window serializes every row through one task —
    the same scale-killer as any unpartitioned ranking.  The distributed
    formulation: compute the three ``percentile_disc`` cut points with an
    ordinary (map-side-partial) aggregate, broadcast the 1-row threshold
    frame, and assign buckets by comparison.  Boundary ties share a
    bucket (quantile semantics) rather than splitting by remainder
    (ntile semantics) — the distribution-correct behavior at any scale.
    """
    o = table(spark, sf_dir, "orders")
    spend = (o.groupBy("o_custkey")
             .agg(dec_to_double(F.sum(_dec("o_totalprice"))).alias("spend")))
    spend.createOrReplaceTempView("__spend_q")
    cuts = spark.sql("""
        SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY spend) AS q1,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY spend) AS q2,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY spend) AS q3
        FROM __spend_q
    """)
    quartile = (
        F.when(F.col("spend") <= F.col("q1"), 1)
        .when(F.col("spend") <= F.col("q2"), 2)
        .when(F.col("spend") <= F.col("q3"), 3)
        .otherwise(4)
    )
    return (spend.crossJoin(F.broadcast(cuts))
            .select("o_custkey", "spend", quartile.alias("quartile")))


QUARTILES_SQL = """
WITH spend AS (
  SELECT o_custkey, (trunc(sum(o_totalprice::decimal(12,2)))::bigint::double + (((sum(o_totalprice::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS spend
  FROM orders GROUP BY 1
),
cuts AS (
  SELECT quantile_disc(spend, 0.25) AS q1,
         quantile_disc(spend, 0.50) AS q2,
         quantile_disc(spend, 0.75) AS q3
  FROM spend
)
SELECT o_custkey, spend,
       CASE WHEN spend <= q1 THEN 1
            WHEN spend <= q2 THEN 2
            WHEN spend <= q3 THEN 3
            ELSE 4 END AS quartile
FROM spend CROSS JOIN cuts
"""

QUERIES = {
    "window_topn_per_group": window_topn_per_group,
    "window_running_sum": window_running_sum,
    "window_event_gaps": window_event_gaps,
    "events_tumbling_window": events_tumbling_window,
    "events_sliding_window": events_sliding_window,
    "events_session_windows": events_session_windows,
    "window_spend_quartiles": window_spend_quartiles,
}

ORACLES = {
    "window_topn_per_group": TOPN_SQL,
    "window_running_sum": RUNNING_SQL,
    "window_event_gaps": GAPS_SQL,
    "events_tumbling_window": TUMBLING_SQL,
    "events_sliding_window": SLIDING_SQL,
    "events_session_windows": SESSION_SQL,
    "window_spend_quartiles": QUARTILES_SQL,
}
