"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For every event, find the user's most recent order at or before the
event's timestamp.  The reference has no such operator (its host engines
don't either); this is the training-pipeline extension shape: attach the
latest dimension state to a fact stream without a range cross-join.

Spark-first formulation (the scalable one): tag both inputs, union them,
and run ONE window over (user, time) — `last(o_orderkey, ignorenulls)`
over rows-unbounded-preceding.  Cost is a single hash shuffle on the key
plus a sort within partitions, identical to how a merge-based as-of join
executes on any engine; candidate volume is |events| + |orders|, never
|events| × |orders|.  A range-predicate join (`e.ts >= o.date`) would be
a cross-ish join Catalyst can only nest-loop — the union-window shape is
the difference between O(n log n) and O(n·m) at 100 TB.

Determinism: orders are pre-collapsed to one row per (user, date) with
``max(o_orderkey)`` (DuckDB's ASOF tie choice is otherwise unspecified),
and at equal timestamps orders sort before events so a same-instant order
counts as "at or before".
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mongo_hadoop_spark.session import table


def events_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    order_rows = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        "o_orderkey",
        F.lit(None).cast("long").alias("event_id"),
    )
    event_rows = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_order").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        order_rows.unionByName(event_rows)
        .withColumn("asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .where(F.col("is_order") == 0)
        .select("event_id", "user_id",
                F.unix_micros(F.col("t")).alias("ts_us"),
                "asof_orderkey")
    )


ASOF_SQL = """
WITH o1 AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       o1.o_orderkey AS asof_orderkey
FROM events ASOF LEFT JOIN o1
  ON events.user_id = o1.o_custkey AND events.ts >= o1.o_orderdate
"""


TOLERANCE_DAYS = 7
_TOL_US = TOLERANCE_DAYS * 86_400_000_000


def events_asof_last_order_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound: the most recent order still
    counts only if it is within TOLERANCE_DAYS of the event.

    Same union + single-window shape (one shuffle); the tolerance is a
    post-window null-out on TZ-free epoch-micro arithmetic, so the cost
    is identical to the unbounded as-of join at any scale.
    """
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    order_rows = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        "o_orderkey",
        F.lit(None).cast("long").alias("event_id"),
    )
    event_rows = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_order").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        order_rows.unionByName(event_rows)
        .withColumn("asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn(
            "asof_t",
            F.last(F.when(F.col("is_order") == 1, F.col("t")),
                   ignorenulls=True).over(w),
        )
        .where(F.col("is_order") == 0)
    )
    fresh = (F.unix_micros(F.col("t")) - F.unix_micros(F.col("asof_t"))) <= _TOL_US
    return merged.select(
        "event_id", "user_id",
        F.unix_micros(F.col("t")).alias("ts_us"),
        F.when(fresh, F.col("asof_orderkey")).alias("asof_orderkey"),
    )


ASOF_TOL_SQL = f"""
WITH o1 AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CASE WHEN epoch_us(ts) - epoch_us(o1.o_orderdate) <= {_TOL_US}
            THEN o1.o_orderkey END AS asof_orderkey
FROM events ASOF LEFT JOIN o1
  ON events.user_id = o1.o_custkey AND events.ts >= o1.o_orderdate
"""


def events_asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every event, the user's EARLIEST order at
    or after the event — the label-attachment direction ("did the user
    convert after this event?") of the same operator family.

    Identical union + single-window shape and cost as the backward join;
    only the frame flips: ``first(o_orderkey, ignorenulls)`` over
    current-row→unbounded-following, events sorting before same-instant
    orders so an equal-timestamp order counts as "at or after".
    """
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    order_rows = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        "o_orderkey",
        F.lit(None).cast("long").alias("event_id"),
    )
    event_rows = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_order").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        order_rows.unionByName(event_rows)
        .withColumn("next_orderkey",
                    F.first("o_orderkey", ignorenulls=True).over(w))
        .where(F.col("is_order") == 0)
        .select("event_id", "user_id",
                F.unix_micros(F.col("t")).alias("ts_us"),
                "next_orderkey")
    )


ASOF_NEXT_SQL = """
WITH o1 AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       o1.o_orderkey AS next_orderkey
FROM events ASOF LEFT JOIN o1
  ON events.user_id = o1.o_custkey AND events.ts <= o1.o_orderdate
"""


QUERIES = {
    "events_asof_last_order": events_asof_last_order,
    "events_asof_last_order_tolerance": events_asof_last_order_tolerance,
    "events_asof_next_order": events_asof_next_order,
}

ORACLES = {
    "events_asof_last_order": ASOF_SQL,
    "events_asof_last_order_tolerance": ASOF_TOL_SQL,
    "events_asof_next_order": ASOF_NEXT_SQL,
}
