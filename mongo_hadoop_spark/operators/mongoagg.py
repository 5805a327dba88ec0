"""Gate queries for the Mongo aggregation-pipeline compiler.

Each query builds a *pipeline document* (the language a MongoDB user
already has) and runs it through :mod:`mongo_hadoop_spark.plans.aggpipe`,
which compiles stages onto DataFrame operations — so the oracle checks
both the compiler's semantics and the determinism rules (decimal sums via
``$toDecimal``/``$toDouble``, canonical ``$addToSet`` order, explicit
sort keys).

Reference provenance: the reference executes Mongo query documents
server-side and hand-builds aggregations in the host framework (e.g.
examples/treasury_yield/src/.../TreasuryYieldXMLConfig.java,
examples/enron/hive/hive_enron.q); the pipeline language is the
first-class Mongo surface its users write, compiled here Spark-first.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mongo_hadoop_spark.plans.aggpipe import aggregate
from mongo_hadoop_spark.session import spread, table


def pipeline_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$match → $addFields($toDecimal) → $group → $project($toDouble) → $sort."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$match": {"o_orderstatus": "F"}},
        {"$addFields": {"pd": {"$toDecimal": "$o_totalprice"}}},
        {"$group": {"_id": "$o_orderpriority",
                    "n": {"$sum": 1},
                    "total": {"$sum": "$pd"},
                    "best": {"$max": "$o_totalprice"}}},
        {"$project": {"_id": 1, "n": 1,
                      "total": {"$toDouble": "$total"},
                      "best": 1}},
        {"$sort": {"_id": 1}},
    ])


PIPELINE_STATUS_SQL = """
SELECT o_orderpriority AS _id,
       count(*) AS n,
       (trunc((sum(CAST(o_totalprice AS DECIMAL(38,6)))))::bigint::double + ((((sum(CAST(o_totalprice AS DECIMAL(38,6)))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS total,
       max(o_totalprice) AS best
FROM orders WHERE o_orderstatus = 'F'
GROUP BY 1 ORDER BY 1
"""


def pipeline_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$project($split/$toLower) → $unwind → $match → $group → $sort/$limit.

    The shakespeare word-count shape (reference:
    examples/shakespeare) written as a pipeline instead of a MapReduce job.
    """
    docs = table(spark, sf_dir, "documents")
    return aggregate(docs, [
        {"$project": {"w": {"$split": [{"$toLower": "$text"}, " "]}}},
        {"$unwind": "$w"},
        {"$match": {"w": {"$ne": ""}}},
        {"$group": {"_id": "$w", "n": {"$sum": 1}}},
        {"$sort": {"n": -1, "_id": 1}},
        {"$limit": 20},
    ])


PIPELINE_WORDCOUNT_SQL = """
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
)
SELECT w AS _id, count(*) AS n FROM toks
WHERE w <> '' GROUP BY 1 ORDER BY n DESC, _id ASC LIMIT 20
"""


def pipeline_lookup_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$lookup(customer) → $unwind → $group by market segment.

    The $lookup compiles to a pre-aggregated equality join (array-of-docs
    shape); Catalyst broadcasts the aggregated customer side when small.
    """
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return aggregate(orders, [
        {"$lookup": {"from": "customer", "localField": "o_custkey",
                     "foreignField": "c_custkey", "as": "cust"}},
        {"$unwind": "$cust"},
        {"$addFields": {"pd": {"$toDecimal": "$o_totalprice"}}},
        {"$group": {"_id": "$cust.c_mktsegment",
                    "n_orders": {"$sum": 1},
                    "revenue": {"$sum": "$pd"},
                    "custs": {"$addToSet": "$cust.c_mktsegment"}}},
        {"$project": {"_id": 1, "n_orders": 1,
                      "revenue": {"$toDouble": "$revenue"},
                      "n_seg": {"$size": "$custs"}}},
        {"$sort": {"_id": 1}},
    ], tables={"customer": customer})


PIPELINE_LOOKUP_SQL = """
SELECT c_mktsegment AS _id,
       count(*) AS n_orders,
       (trunc((sum(CAST(o_totalprice AS DECIMAL(38,6)))))::bigint::double + ((((sum(CAST(o_totalprice AS DECIMAL(38,6)))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS revenue,
       1 AS n_seg
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def pipeline_sortbycount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$sortByCount over event types (count desc, _id tiebreak)."""
    events = table(spark, sf_dir, "events")
    return aggregate(events, [{"$sortByCount": "$event_type"}])


PIPELINE_SORTBYCOUNT_SQL = """
SELECT event_type AS _id, count(*) AS count
FROM events GROUP BY 1 ORDER BY count DESC, _id ASC
"""



def pipeline_bucket_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$bucket histogram of order values with decimal revenue per bucket."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$addFields": {"pd": {"$toDecimal": "$o_totalprice"}}},
        {"$bucket": {
            "groupBy": "$o_totalprice",
            "boundaries": [0, 50000, 100000, 200000, 400000, 10000000],
            "default": -1,
            "output": {"n": {"$sum": 1}, "revenue": {"$sum": "$pd"}},
        }},
        {"$project": {"_id": 1, "n": 1, "revenue": {"$toDouble": "$revenue"}}},
        {"$sort": {"_id": 1}},
    ])


def pipeline_bucket_auto_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$bucketAuto: 4 ~equal-count order-value buckets with decimal
    revenue — quantile boundaries computed engine-side, no global sort."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$addFields": {"pd": {"$toDecimal": "$o_totalprice"}}},
        {"$bucketAuto": {
            "groupBy": "$o_totalprice",
            "buckets": 4,
            "output": {"n": {"$sum": 1}, "revenue": {"$sum": "$pd"}},
        }},
        {"$project": {"_id_min": 1, "_id_max": 1, "n": 1,
                      "revenue": {"$toDouble": "$revenue"}}},
        {"$sort": {"_id_min": 1}},
    ])


PIPELINE_BUCKET_AUTO_SQL = """
WITH t AS (SELECT o_totalprice AS v FROM orders),
c AS (
  SELECT [quantile_disc(v, 0.25), quantile_disc(v, 0.50),
          quantile_disc(v, 0.75)] AS cs,
         min(v) AS gmin, max(v) AS gmax
  FROM t
),
b AS (
  SELECT v, len(list_filter(cs, x -> v > x)) AS idx, cs, gmin, gmax
  FROM t, c
)
SELECT CASE WHEN idx = 0 THEN gmin ELSE cs[idx] END AS _id_min,
       CASE WHEN idx = 3 THEN gmax ELSE cs[idx + 1] END AS _id_max,
       count(*) AS n,
       (trunc((sum(CAST(v AS DECIMAL(38,6)))))::bigint::double + ((((sum(CAST(v AS DECIMAL(38,6)))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS revenue
FROM b GROUP BY 1, 2 ORDER BY 1
"""


def pipeline_bucket_auto_granularity(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """$bucketAuto with ``granularity`` (Mongo 3.4 preferred-number
    boundary snapping): ~equal-count order-value buckets whose
    boundaries land on the 1-2-5 series — lower bound rounded down,
    interior/upper rounded up (upper strictly: the server's
    exclusive-max contract), colliding boundaries collapsed.  Snapping
    is a double comparison against literal candidates shared verbatim
    with the oracle — no runtime log/pow, bit-equal in both engines.
    Plan: one extra 1-row quantile aggregate broadcast back; no global
    sort at any input size."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$bucketAuto": {
            "groupBy": "$o_totalprice",
            "buckets": 5,
            "granularity": "1-2-5",
            "output": {"n": {"$sum": 1},
                       "max_price": {"$max": "$o_totalprice"}},
        }},
        {"$sort": {"_id_min": 1}},
    ])


# GK accuracy for the *_approx driver gates: rank-error bound ε·N =
# N/1e6 < 1/2 for any input under 500k rows, so at every verification
# scale (sf0.001–sf0.1) approx_percentile PROVABLY returns the exact
# percentile_disc value (convention-match pinned in tests/test_aggpipe.py)
# — the gates share the exact oracles verbatim — while the aggregation
# state stays a mergeable summary bounded by O((1/ε)·log(εN)) at ANY
# input size.  Production runs tune this down (default 10⁴ ≈ 1 MB of
# state); the scale probe runs the default too (SCALE.md round 9).
GATE_PCTL_ACCURACY = 1_000_000


def pipeline_bucket_auto_quartiles_approx(spark: SparkSession,
                                          sf_dir: str) -> DataFrame:
    """pipeline_bucket_auto_quartiles in the PRODUCTION percentile mode:
    boundary quantiles via ``approx_percentile`` (mergeable bounded-state
    GK summary — never an O(N) reducer buffer) instead of exact
    ``percentile_disc``.  Same exact oracle: see GATE_PCTL_ACCURACY."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$addFields": {"pd": {"$toDecimal": "$o_totalprice"}}},
        {"$bucketAuto": {
            "groupBy": "$o_totalprice",
            "buckets": 4,
            "output": {"n": {"$sum": 1}, "revenue": {"$sum": "$pd"}},
        }},
        {"$project": {"_id_min": 1, "_id_max": 1, "n": 1,
                      "revenue": {"$toDouble": "$revenue"}}},
        {"$sort": {"_id_min": 1}},
    ], percentile_accuracy=GATE_PCTL_ACCURACY)


def pipeline_bucket_auto_granularity_approx(spark: SparkSession,
                                            sf_dir: str) -> DataFrame:
    """pipeline_bucket_auto_granularity in the PRODUCTION percentile
    mode (``approx_percentile`` boundaries; see GATE_PCTL_ACCURACY).
    The r8 scale probe measured the exact path at 2.3× wall at 10× data
    — the one O(N) single-reducer buffer in the engine; this is the
    swap the $bucketAuto docstring promises, now code + gate instead of
    prose.  The granularity snap is unchanged: boundaries still land on
    the shared 1-2-5 literal series, bit-equal across engines."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$bucketAuto": {
            "groupBy": "$o_totalprice",
            "buckets": 5,
            "granularity": "1-2-5",
            "output": {"n": {"$sum": 1},
                       "max_price": {"$max": "$o_totalprice"}},
        }},
        {"$sort": {"_id_min": 1}},
    ], percentile_accuracy=GATE_PCTL_ACCURACY)


def pipeline_percentile_approx(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """$percentile + $median per order priority in the PRODUCTION mode:
    both accumulators compile to ``approx_percentile`` (the server's own
    method='approximate' semantics, honored instead of ignored).  Exact
    quantile_disc oracle per GATE_PCTL_ACCURACY (per-group n at sf0.1 is
    ~30k, five hundred-fold under the 500k rank-exactness bound)."""
    import pyspark.sql.functions as F

    orders = table(spark, sf_dir, "orders")
    out = aggregate(orders, [
        {"$group": {
            "_id": "$o_orderpriority",
            "price_q": {"$percentile": {"input": "$o_totalprice",
                                        "p": [0.25, 0.5, 0.9],
                                        "method": "approximate"}},
            "med": {"$median": {"input": "$o_totalprice",
                                "method": "approximate"}},
        }},
        {"$sort": {"_id": 1}},
    ], percentile_accuracy=GATE_PCTL_ACCURACY)
    return out.select(
        "_id",
        F.element_at("price_q", 1).alias("p25"),
        F.element_at("price_q", 2).alias("p50"),
        F.element_at("price_q", 3).alias("p90"),
        "med",
    )


PIPELINE_PCTL_APPROX_SQL = """
SELECT o_orderpriority AS _id,
       quantile_disc(o_totalprice, 0.25) AS p25,
       quantile_disc(o_totalprice, 0.5) AS p50,
       quantile_disc(o_totalprice, 0.9) AS p90,
       quantile_disc(o_totalprice, 0.5) AS med
FROM orders GROUP BY 1 ORDER BY 1
"""


def _bucket_auto_granularity_sql() -> str:
    from mongo_hadoop_spark.plans.aggpipe import (
        granularity_candidates_values)

    ca = "[" + granularity_candidates_values("1-2-5") + "]"
    qs = ", ".join(f"quantile_disc(v, {i}/5)" for i in range(1, 5))
    return f"""
WITH t AS (SELECT o_totalprice AS v FROM orders),
raw AS (
  SELECT [{qs}] AS q,
         min(v) AS vmin, max(v) AS vmax
  FROM t
),
snapped AS (
  SELECT list_max(list_filter({ca}, c -> c <= vmin)) AS blo,
         list_min(list_filter({ca}, c -> c > vmax)) AS bhi,
         list_sort(list_distinct(list_transform(q,
           x -> list_min(list_filter({ca}, c -> c >= x))))) AS sq
  FROM raw
),
cuts AS (
  SELECT blo, bhi,
         list_filter(sq, b -> b > blo AND b < bhi) AS interior
  FROM snapped
),
b AS (
  SELECT v, blo, bhi, interior,
         len(list_filter(interior, c -> v >= c)) AS idx
  FROM t, cuts
)
SELECT CASE WHEN idx = 0 THEN blo ELSE interior[idx] END AS _id_min,
       CASE WHEN idx = len(interior) THEN bhi
            ELSE interior[idx + 1] END AS _id_max,
       count(*) AS n,
       max(v) AS max_price
FROM b GROUP BY 1, 2 ORDER BY 1
"""


PIPELINE_BUCKET_SQL = """
WITH b AS (
  SELECT CASE
           WHEN o_totalprice >= 0 AND o_totalprice < 50000 THEN 0
           WHEN o_totalprice >= 50000 AND o_totalprice < 100000 THEN 50000
           WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 100000
           WHEN o_totalprice >= 200000 AND o_totalprice < 400000 THEN 200000
           WHEN o_totalprice >= 400000 AND o_totalprice < 10000000 THEN 400000
           ELSE -1
         END AS _id,
         o_totalprice
  FROM orders
)
SELECT _id, count(*) AS n,
       (trunc((sum(CAST(o_totalprice AS DECIMAL(38,6)))))::bigint::double + ((((sum(CAST(o_totalprice AS DECIMAL(38,6)))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS revenue
FROM b GROUP BY 1 ORDER BY 1
"""


def pipeline_window_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$setWindowFields: per-customer order sequence number, running
    decimal spend, and previous order value ($shift)."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$addFields": {"pd": {"$toDecimal": "$o_totalprice"}}},
        {"$setWindowFields": {
            "partitionBy": "$o_custkey",
            "sortBy": {"o_orderdate": 1, "o_orderkey": 1},
            "output": {
                "seq": {"$documentNumber": {}},
                "running": {"$sum": "$pd",
                            "window": {"documents": ["unbounded", "current"]}},
                "prev_price": {"$shift": {"output": "$o_totalprice",
                                          "by": -1, "default": 0.0}},
            },
        }},
        {"$match": {"seq": {"$lte": 3}}},
        {"$project": {"o_custkey": 1, "o_orderkey": 1, "seq": 1,
                      "running": {"$toDouble": "$running"},
                      "prev_price": 1}},
    ])


def pipeline_window_percentiles(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """$median/$percentile as WINDOW operators (Mongo 7.0,
    $setWindowFields): per-customer running median and [p25, p90] of
    order value over (unbounded, current) — the discrete-exact default
    (sorted-frame pick, quantile_disc convention; the approx production
    mode applies here too via percentile_accuracy).  First 4 orders per
    customer keep the gate output bounded."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$setWindowFields": {
            "partitionBy": "$o_custkey",
            "sortBy": {"o_orderdate": 1, "o_orderkey": 1},
            "output": {
                "seq": {"$documentNumber": {}},
                "run_med": {"$median": {"input": "$o_totalprice",
                                        "method": "approximate"},
                            "window": {"documents": ["unbounded",
                                                     "current"]}},
                "run_q": {"$percentile": {"input": "$o_totalprice",
                                          "p": [0.25, 0.9],
                                          "method": "approximate"},
                          "window": {"documents": ["unbounded",
                                                   "current"]}},
            },
        }},
        {"$match": {"seq": {"$lte": 4}}},
        {"$project": {"o_custkey": 1, "o_orderkey": 1, "seq": 1,
                      "run_med": 1,
                      "run_p25": {"$arrayElemAt": ["$run_q", 0]},
                      "run_p90": {"$arrayElemAt": ["$run_q", 1]}}},
    ])


PIPELINE_WINDOW_PCTL_SQL = """
WITH w AS (
  SELECT o_custkey, o_orderkey,
         row_number() OVER win AS seq,
         quantile_disc(o_totalprice, 0.5) OVER wf AS run_med,
         quantile_disc(o_totalprice, 0.25) OVER wf AS run_p25,
         quantile_disc(o_totalprice, 0.9) OVER wf AS run_p90
  FROM orders
  WINDOW win AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey),
         wf AS (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT o_custkey, o_orderkey, seq, run_med, run_p25, run_p90
FROM w WHERE seq <= 4
"""


def pipeline_window_percentiles_approx(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """:func:`pipeline_window_percentiles` in the PRODUCTION percentile
    mode (r10, verdict item 4): ``percentile_accuracy`` compiles the
    window $median/$percentile to a windowed ``approx_percentile`` —
    the mergeable bounded-state GK path for corpus-sized partitions.
    Shares the exact quantile_disc oracle verbatim: at gate scale every
    per-customer frame holds ≤ a few dozen orders, orders of magnitude
    under the GK rank-exactness bound ε·n < ½ (n < accuracy), so the
    approximate answer IS the exact discrete one — the same regime
    argument as the other *_approx twins."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$setWindowFields": {
            "partitionBy": "$o_custkey",
            "sortBy": {"o_orderdate": 1, "o_orderkey": 1},
            "output": {
                "seq": {"$documentNumber": {}},
                "run_med": {"$median": {"input": "$o_totalprice",
                                        "method": "approximate"},
                            "window": {"documents": ["unbounded",
                                                     "current"]}},
                "run_q": {"$percentile": {"input": "$o_totalprice",
                                          "p": [0.25, 0.9],
                                          "method": "approximate"},
                          "window": {"documents": ["unbounded",
                                                   "current"]}},
            },
        }},
        {"$match": {"seq": {"$lte": 4}}},
        {"$project": {"o_custkey": 1, "o_orderkey": 1, "seq": 1,
                      "run_med": 1,
                      "run_p25": {"$arrayElemAt": ["$run_q", 0]},
                      "run_p90": {"$arrayElemAt": ["$run_q", 1]}}},
    ], percentile_accuracy=GATE_PCTL_ACCURACY)


def pipeline_datediff_weekstarts(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """$dateDiff week = startOfWeek-BOUNDARY CROSSINGS (server
    semantics, r10 gate for the r9 fix): order-date → ship-date week
    lag per lineitem under three different week conventions (default
    Sunday, Monday, Thursday), histogrammed over the joined fact
    tables.  A Saturday→Sunday ship is 1 under the default and 0 under
    Monday — the convention disagreement this gate pins cross-engine.

    Plan: orderkey equi-join (shuffle on the join key — both sides are
    fact tables at scale; AQE broadcasts the small side at gate SF),
    then three per-row day-arithmetic expressions and ONE keyed agg —
    no window, no Python.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .select("o_orderdate", "l_shipdate"))
    diffs = aggregate(j, [
        {"$addFields": {
            "w_sun": {"$dateDiff": {"startDate": "$o_orderdate",
                                    "endDate": "$l_shipdate",
                                    "unit": "week"}},
            "w_mon": {"$dateDiff": {"startDate": "$o_orderdate",
                                    "endDate": "$l_shipdate",
                                    "unit": "week",
                                    "startOfWeek": "monday"}},
            "w_thu": {"$dateDiff": {"startDate": "$o_orderdate",
                                    "endDate": "$l_shipdate",
                                    "unit": "week",
                                    "startOfWeek": "Thursday"}},
        }},
        {"$group": {"_id": {"s": "$w_sun", "m": "$w_mon", "t": "$w_thu"},
                    "n_lines": {"$sum": 1}}},
    ])
    return diffs.select(
        F.col("_id.s").alias("w_sun"), F.col("_id.m").alias("w_mon"),
        F.col("_id.t").alias("w_thu"), "n_lines")


# DuckDB dayofweek: 0=Sunday..6=Saturday; days-since-week-start under
# offset ``off`` = (dayofweek(d) + 7 - off) % 7.  Aligning both endpoints
# to their week start makes the day gap an exact multiple of 7.
_DD_WEEK = ("(date_diff('day', "
            "a::date - ((dayofweek(a) + 7 - {off}) % 7)::int, "
            "b::date - ((dayofweek(b) + 7 - {off}) % 7)::int) // 7)"
            "::bigint")

PIPELINE_DATEDIFF_WEEKSTARTS_SQL = f"""
WITH j AS (
  SELECT o.o_orderdate AS a, l.l_shipdate AS b
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT {_DD_WEEK.format(off=0)} AS w_sun,
       {_DD_WEEK.format(off=1)} AS w_mon,
       {_DD_WEEK.format(off=4)} AS w_thu,
       count(*) AS n_lines
FROM j GROUP BY 1, 2, 3
"""


def pipeline_window_range_frames(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """$setWindowFields RANGE windows (the time-bounded form): per
    user, trailing-1-hour event count and min event id over the event
    stream — ``{"range": [-1, 0], "unit": "hour"}`` compiled to
    ``rangeBetween`` over epoch-millis (inclusive bounds, ties by key
    included on both engines by frame definition, so the result is
    order-independent).  Pre-r9 a range frame fell through SILENTLY to
    the default documents frame — this gate pins the execution."""
    events = table(spark, sf_dir, "events")
    return aggregate(events, [
        {"$setWindowFields": {
            "partitionBy": "$user_id",
            "sortBy": {"ts": 1},
            "output": {
                "n_1h": {"$count": {},
                         "window": {"range": [-1, 0], "unit": "hour"}},
                "min_eid_1h": {"$min": "$event_id",
                               "window": {"range": [-1, 0],
                                          "unit": "hour"}},
            },
        }},
        {"$project": {"event_id": 1, "user_id": 1,
                      "n_1h": 1, "min_eid_1h": 1}},
    ])


PIPELINE_WINDOW_RANGE_SQL = """
SELECT event_id, user_id,
       count(*) OVER wf AS n_1h,
       min(event_id) OVER wf AS min_eid_1h
FROM events
WINDOW wf AS (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


PIPELINE_WINDOW_SQL = """
WITH w AS (
  SELECT o_custkey, o_orderkey,
         row_number() OVER win AS seq,
         (trunc((sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))::bigint::double + ((((sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS running,
         coalesce(lag(o_totalprice, 1) OVER win, 0.0) AS prev_price
  FROM orders
  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT o_custkey, o_orderkey, seq, running, prev_price FROM w WHERE seq <= 3
"""



def pipeline_densify_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$group → $densify → $fill: gapless per-user event counts.

    Densify materializes the missing user ids in [min, max] and $fill
    zeroes their counts — the gap-filling shape every windowed
    time-series/feature pipeline needs before a rolling computation."""
    events = table(spark, sf_dir, "events")
    return aggregate(events, [
        {"$group": {"_id": "$user_id", "n": {"$sum": 1}}},
        {"$addFields": {"user_id": "$_id"}},
        {"$project": {"user_id": 1, "n": 1}},
        {"$densify": {"field": "user_id", "range": {"step": 1, "bounds": "full"}}},
        {"$fill": {"output": {"n": {"value": {"$toLong": 0}}}}},
        {"$sort": {"user_id": 1}},
    ])


PIPELINE_DENSIFY_SQL = """
WITH per AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY 1
),
axis AS (
  SELECT unnest(generate_series((SELECT min(user_id) FROM per),
                                (SELECT max(user_id) FROM per), 1)) AS user_id
)
SELECT axis.user_id, coalesce(per.n, 0) AS n
FROM axis LEFT JOIN per USING (user_id)
ORDER BY user_id
"""


def pipeline_densify_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$dateTrunc(month) → $group → $densify(unit: month) → $fill: gapless
    monthly order counts over a sparse keyset (r12 — calendar-unit
    densify).  Stepping is anchored (lo + i·step months, timestampadd);
    the month-start axis is in the clamp-free regime where the server's
    iterative $dateAdd, Spark's sequence(), and DuckDB's generate_series
    all agree exactly."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$match": {"$expr": {"$eq": [{"$mod": ["$o_orderkey", 997]}, 0]}}},
        {"$addFields": {"m": {"$dateTrunc": {"date": "$o_orderdate",
                                             "unit": "month"}}}},
        {"$group": {"_id": "$m", "n": {"$sum": 1}}},
        {"$addFields": {"m": "$_id"}},
        {"$project": {"m": 1, "n": 1}},
        {"$densify": {"field": "m",
                      "range": {"step": 1, "unit": "month",
                                "bounds": "full"}}},
        {"$fill": {"output": {"n": {"value": {"$toLong": 0}}}}},
        {"$project": {"month": {"$dateToString": {"format": "%Y-%m-%d",
                                                  "date": "$m"}},
                      "n": 1}},
        {"$sort": {"month": 1}},
    ])


PIPELINE_DENSIFY_MONTHLY_SQL = """
WITH per AS (
  SELECT date_trunc('month', o_orderdate)::timestamp AS m, count(*) AS n
  FROM orders WHERE o_orderkey % 997 = 0 GROUP BY 1
),
b AS (SELECT min(m) AS lo, max(m) AS hi FROM per),
axis AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH))::timestamp
             AS m FROM b)
SELECT strftime(axis.m, '%Y-%m-%d') AS month, coalesce(per.n, 0) AS n
FROM axis LEFT JOIN per USING (m) ORDER BY month
"""


def pipeline_densify_quarterly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned calendar densify: per-priority quarterly order counts,
    $densify bounds:"partition" with unit quarter (r12) — each
    o_orderpriority band gets its own gapless quarter axis."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$match": {"$expr": {"$eq": [{"$mod": ["$o_orderkey", 499]}, 0]}}},
        {"$addFields": {"q": {"$dateTrunc": {"date": "$o_orderdate",
                                             "unit": "quarter"}}}},
        {"$group": {"_id": {"pri": "$o_orderpriority", "q": "$q"},
                    "n": {"$sum": 1}}},
        {"$addFields": {"pri": "$_id.pri", "q": "$_id.q"}},
        {"$project": {"pri": 1, "q": 1, "n": 1}},
        {"$densify": {"field": "q", "partitionByFields": ["pri"],
                      "range": {"step": 1, "unit": "quarter",
                                "bounds": "partition"}}},
        {"$fill": {"output": {"n": {"value": {"$toLong": 0}}}}},
        {"$project": {"pri": 1,
                      "quarter": {"$dateToString": {"format": "%Y-%m-%d",
                                                    "date": "$q"}},
                      "n": 1}},
        {"$sort": {"pri": 1, "quarter": 1}},
    ])


PIPELINE_DENSIFY_QUARTERLY_SQL = """
WITH per AS (
  SELECT o_orderpriority AS pri,
         date_trunc('quarter', o_orderdate)::timestamp AS q, count(*) AS n
  FROM orders WHERE o_orderkey % 499 = 0 GROUP BY 1, 2
),
b AS (SELECT pri, min(q) AS lo, max(q) AS hi FROM per GROUP BY 1),
axis AS (SELECT pri,
                unnest(generate_series(lo, hi, INTERVAL 3 MONTH))::timestamp
                    AS q FROM b)
SELECT axis.pri, strftime(axis.q, '%Y-%m-%d') AS quarter,
       coalesce(per.n, 0) AS n
FROM axis LEFT JOIN per USING (pri, q) ORDER BY pri, quarter
"""


def pipeline_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$setWindowFields N-accumulators (r12): whole-partition-default
    $topN / $addToSet / $count per customer — the window forms share the
    group accumulators' contracts (ranked ties broken by the output
    value; $addToSet canonical-sorted; no-frame default = the WHOLE
    partition, the server's documented default)."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$match": {"$expr": {"$eq": [{"$mod": ["$o_custkey", 97]}, 0]}}},
        {"$setWindowFields": {
            "partitionBy": "$o_custkey",
            "sortBy": {"o_orderdate": 1, "o_orderkey": 1},
            "output": {
                "seq": {"$documentNumber": {}},
                "top3": {"$topN": {"sortBy": {"o_totalprice": -1},
                                   "output": "$o_orderkey", "n": 3}},
                "pris": {"$addToSet": "$o_orderpriority"},
                "n": {"$count": {}},
            }}},
        {"$match": {"seq": 1}},
        # arrays render as joined strings (the repo's cross-engine
        # determinism idiom — raw array cells defeat the local
        # row-sort canonicalization)
        {"$project": {
            "custkey": "$o_custkey",
            "top3": {"$reduce": {
                "input": {"$map": {"input": "$top3", "as": "x",
                                   "in": {"$toString": "$$x"}}},
                "initialValue": "",
                "in": {"$concat": [
                    "$$value",
                    {"$cond": [{"$eq": ["$$value", ""]}, "", ","]},
                    "$$this"]}}},
            "pris": {"$reduce": {
                "input": "$pris", "initialValue": "",
                "in": {"$concat": [
                    "$$value",
                    {"$cond": [{"$eq": ["$$value", ""]}, "", ","]},
                    "$$this"]}}},
            "n": 1}},
        {"$sort": {"custkey": 1}},
    ])


PIPELINE_WINDOW_TOP_ORDERS_SQL = """
SELECT o_custkey AS custkey,
       array_to_string(
         (array_agg(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1:3],
         ',') AS top3,
       array_to_string(list_sort(list_distinct(array_agg(o_orderpriority))),
                       ',') AS pris,
       count(*) AS n
FROM orders WHERE o_custkey % 97 = 0
GROUP BY 1 ORDER BY 1
"""


GRAPH_MAX_DEPTH = 3


def pipeline_graphlookup_reports(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$graphLookup over a derived customer hierarchy, oracle-checked
    against a DuckDB recursive CTE.

    The hierarchy is synthesized deterministically (parent = custkey/10 —
    an integer-division tree over the existing keys), so the bounded BFS
    unroll and the recursive CTE must discover identical descendant sets:
    every customer with at least one transitive report within
    GRAPH_MAX_DEPTH+1 generations, with the distinct-descendant count.
    """
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.floor(F.col("c_custkey") / 10).cast("long").alias("parent"),
    )
    return aggregate(cust, [
        {"$graphLookup": {"from": "cust", "startWith": "$id",
                          "connectFromField": "id",
                          "connectToField": "parent",
                          "as": "reports", "maxDepth": GRAPH_MAX_DEPTH}},
        {"$addFields": {"n_reports": {"$size": "$reports"}}},
        {"$match": {"n_reports": {"$gt": 0}}},
        {"$project": {"id": 1, "n_reports": {"$toLong": "$n_reports"}}},
    ], tables={"cust": cust})


PIPELINE_GRAPH_SQL = f"""
WITH RECURSIVE edges AS (
  SELECT c_custkey AS id, (c_custkey // 10)::bigint AS parent FROM customer
),
walk AS (
  SELECT id AS root, id AS node, 0 AS depth FROM edges
  UNION ALL
  SELECT w.root, e.id AS node, w.depth + 1
  FROM walk w JOIN edges e ON e.parent = w.node
  WHERE w.depth <= {GRAPH_MAX_DEPTH}
)
SELECT root AS id, count(DISTINCT node) AS n_reports
FROM walk WHERE depth >= 1
GROUP BY 1 HAVING count(DISTINCT node) > 0
"""

def pipeline_merge_objects_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$mergeObjects as a $group ACCUMULATOR (r12) — the canonical
    two-level idiom from the server docs: group once to one sparse
    single-key document per (customer, status), then merge the sparse
    documents per customer.  Keys are DISTINCT within the outer group,
    so later-wins is order-independent and the merge→$objectToArray→
    $unwind round-trip must reproduce the flat two-key GROUP BY the
    DuckDB oracle computes.  Money goes through the decimal-sum
    convention (engine-deterministic float totals).

    r13 note: ``spread`` on the orders scan was tried (safe — every
    accumulator is encounter-order-independent) and REVERTED: the
    min-of-3 idle bench read 0.89 → 1.20 s with it — the round-robin
    exchange of the scan output costs more than the single-task decimal
    partial aggregation it parallelizes at this row count."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$addFields": {"pd": {"$toDecimal": "$o_totalprice"}}},
        {"$group": {"_id": {"c": "$o_custkey", "s": "$o_orderstatus"},
                    "tot": {"$sum": "$pd"}}},
        {"$project": {"c": "$_id.c",
                      "m": {"$arrayToObject": [[
                          {"k": "$_id.s", "v": {"$toDouble": "$tot"}}]]}}},
        {"$group": {"_id": "$c", "merged": {"$mergeObjects": "$m"}}},
        {"$project": {"custkey": "$_id",
                      "kv": {"$objectToArray": "$merged"}}},
        {"$unwind": "$kv"},
        {"$project": {"custkey": 1, "status": "$kv.k", "tot": "$kv.v"}},
        {"$sort": {"custkey": 1, "status": 1}},
    ])


PIPELINE_MERGE_OBJECTS_SQL = """
SELECT o_custkey AS custkey, o_orderstatus AS status,
       (trunc((sum(CAST(o_totalprice AS DECIMAL(38,6)))))::bigint::double + ((((sum(CAST(o_totalprice AS DECIMAL(38,6)))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS tot
FROM orders
GROUP BY 1, 2 ORDER BY 1, 2
"""


def pipeline_lookup_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated $lookup sub-pipeline with the FULL stage language
    (r12): the sub-pipeline ($group over the whole foreign collection)
    references nothing from the outer document, so it compiles once
    through the main pipeline compiler and broadcasts as a one-row
    array to every outer row — the server's uncorrelated-subquery
    cache, with zero per-row recomputation and no shuffle on the outer
    side.  Previously only a leading $match + $project/$sort/$limit
    were accepted here; $group refused."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return aggregate(cust, [
        {"$match": {"c_custkey": {"$mod": [100, 0]}}},
        {"$lookup": {"from": "orders", "pipeline": [
            {"$group": {"_id": "$o_orderstatus", "n": {"$sum": 1}}},
            {"$sort": {"_id": 1}}], "as": "stats"}},
        {"$unwind": "$stats"},
        {"$project": {"custkey": "$c_custkey", "status": "$stats._id",
                      "n": "$stats.n"}},
        {"$sort": {"custkey": 1, "status": 1}},
    ], tables={"orders": orders})


PIPELINE_LOOKUP_UNCORRELATED_SQL = """
SELECT c.c_custkey AS custkey, s.status, s.n
FROM (SELECT c_custkey FROM customer WHERE c_custkey % 100 = 0) c
CROSS JOIN (SELECT o_orderstatus AS status, count(*)::bigint AS n
            FROM orders GROUP BY 1) s
ORDER BY 1, 2
"""


def pipeline_dotted_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dotted-path WRITES (r12): $addFields/$set create nested
    documents (intermediates materialized, siblings preserved), $unset
    removes one nested field, dotted $project inclusion reassembles the
    nested shape, and $group reads the nested paths back — previously
    every dotted write compiled to a FLAT column literally named "a.b"
    and the later nested read missed it silently.  The oracle flattens
    the same computation in plain SQL, so any drift in the nested
    round-trip (lost sibling, stale subfield, leaked unset field)
    changes the final counts."""
    orders = table(spark, sf_dir, "orders")
    return aggregate(orders, [
        {"$addFields": {"meta.pri": "$o_orderpriority",
                        "meta.bucket": {"$mod": ["$o_custkey", 7]}}},
        {"$set": {"meta.flag": {"$cond": [
            {"$gt": ["$o_totalprice", 150000]}, 1, 0]}}},
        {"$unset": "meta.pri"},
        {"$project": {"meta.bucket": 1, "meta.flag": 1}},
        {"$group": {"_id": {"b": "$meta.bucket", "f": "$meta.flag"},
                    "n": {"$sum": 1}}},
        {"$project": {"bucket": "$_id.b", "flag": "$_id.f",
                      "n": 1}},
        {"$sort": {"bucket": 1, "flag": 1}},
    ])


PIPELINE_DOTTED_PATHS_SQL = """
SELECT (o_custkey % 7)::bigint AS bucket,
       CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS flag,
       count(*) AS n
FROM orders
GROUP BY 1, 2 ORDER BY 1, 2
"""


GRAPH_FX_MOD = 499       # node domain: o_orderkey residues mod this
GRAPH_FX_ROOT_STEP = 7   # roots = nodes divisible by this


def pipeline_graphlookup_unbounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$graphLookup WITHOUT maxDepth — the server's traversal-to-
    fixpoint semantics (r12), oracle-checked against a DuckDB recursive
    CTE with a depth cap no real path can hit.

    The graph is a deterministic contracting map over the order-key
    residues: ``next = node // 3`` — every chain funnels to node 0,
    whose edge is the SELF-LOOP 0→0, so the fixpoint loop must prove
    cycle termination (visited-value pruning), not just tree descent.
    Depth is ≤ log₃(mod) ≈ 6, so the eager per-level loop stays cheap
    at any scale factor.  Each root reports how many edge-docs its walk
    reached and the maximum BFS depth among them (depthField)."""
    nodes = (table(spark, sf_dir, "orders")
             .select((F.col("o_orderkey") % GRAPH_FX_MOD)
                     .cast("long").alias("node"))
             .distinct())
    edges = nodes.select(
        "node", F.floor(F.col("node") / 3).cast("long").alias("next"))
    roots = (nodes.where(F.col("node") % GRAPH_FX_ROOT_STEP == 0)
             .select(F.col("node").alias("start")))
    return aggregate(roots, [
        {"$graphLookup": {"from": "edges", "startWith": "$start",
                          "connectFromField": "next",
                          "connectToField": "node",
                          "as": "walk", "depthField": "d"}},
        {"$project": {
            "start": 1,
            "n_reached": {"$toLong": {"$size": "$walk"}},
            "max_depth": {"$max": {"$map": {
                "input": "$walk", "as": "w", "in": "$$w.d"}}},
        }},
        {"$sort": {"start": 1}},
    ], tables={"edges": edges})


PIPELINE_GRAPH_UNBOUNDED_SQL = f"""
WITH RECURSIVE nodes AS (
  SELECT DISTINCT (o_orderkey % {GRAPH_FX_MOD})::bigint AS node FROM orders
),
edges AS (SELECT node, (node // 3)::bigint AS next FROM nodes),
walk AS (
  SELECT n.node AS start, e.node AS node, e.next, 0 AS d
  FROM nodes n JOIN edges e ON e.node = n.node
  WHERE n.node % {GRAPH_FX_ROOT_STEP} = 0
  UNION
  SELECT w.start, e.node, e.next, w.d + 1
  FROM walk w JOIN edges e ON e.node = w.next
  WHERE w.d < {GRAPH_FX_MOD}
),
vis AS (SELECT start, node, min(d) AS d FROM walk GROUP BY 1, 2)
SELECT start, count(*)::bigint AS n_reached, max(d)::bigint AS max_depth
FROM vis GROUP BY 1 ORDER BY 1
"""


def pipeline_object_to_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$arrayToObject → $objectToArray round-trip: the schemaless
    document-reshaping pair (SURVEY §1.3 mode 1 — dynamic keys as data).

    Builds a per-event dynamic document from scalar fields, explodes it
    back to (k, v) entries, and aggregates per key — the canonical
    "pivot an object into rows" pattern Mongo users write with this
    stage family.  Dynamic documents compile to MAP columns, entries to
    `map_entries` transforms — all JVM-side, no Python.
    """
    events = table(spark, sf_dir, "events")
    return aggregate(events, [
        {"$project": {
            "event_id": 1,
            "m": {"$arrayToObject": [[
                {"k": "type", "v": "$event_type"},
                {"k": "uid", "v": {"$toString": "$user_id"}},
            ]]},
        }},
        {"$project": {"event_id": 1, "kv": {"$objectToArray": "$m"}}},
        {"$unwind": "$kv"},
        {"$group": {"_id": "$kv.k", "n": {"$sum": 1},
                    "vals": {"$addToSet": "$kv.v"}}},
        {"$project": {"_id": 1, "n": 1, "n_values": {"$size": "$vals"}}},
        {"$sort": {"_id": 1}},
    ])


PIPELINE_OBJ_ARRAY_SQL = """
WITH kv AS (
  SELECT 'type' AS k, event_type AS v FROM events
  UNION ALL
  SELECT 'uid' AS k, user_id::varchar AS v FROM events
)
SELECT k AS _id, count(*) AS n, count(DISTINCT v) AS n_values
FROM kv GROUP BY 1 ORDER BY 1
"""


def pipeline_regex_type_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo 4.2 regex/type expression family on the hot text path:
    $regexFindAll (match + 0-based code-point idx), $type, $isNumber,
    $strLenBytes, plus the ANSI-safe $arrayElemAt (out-of-range → missing,
    like the server — Spark 4 defaults ANSI on, so this compiles to
    try_element_at).

    Scale: every expression is a per-row JVM builtin (regexp_extract_all +
    an `aggregate` fold for offsets) — map-only, whole-stage codegen, the
    one shuffle is the final sort.
    """
    documents = table(spark, sf_dir, "documents")
    return aggregate(documents, [
        {"$project": {
            "doc_id": 1,
            "finds": {"$regexFindAll": {"input": "$text", "regex": "s[a-z]+"}},
            "lang_ty": {"$type": "$lang"},
            "id_is_num": {"$isNumber": "$doc_id"},
            "lang_bytes": {"$strLenBytes": "$lang"},
        }},
        {"$project": {
            "doc_id": 1, "lang_ty": 1, "id_is_num": 1, "lang_bytes": 1,
            "n_hits": {"$size": "$finds"},
            "first_hit": {"$getField": {
                "field": "match",
                "input": {"$arrayElemAt": ["$finds", 0]}}},
            "first_idx": {"$getField": {
                "field": "idx",
                "input": {"$arrayElemAt": ["$finds", 0]}}},
        }},
        {"$match": {"n_hits": {"$gt": 0}}},
        {"$sort": {"doc_id": 1}},
    ])


# first_idx oracle: instr(text, first_hit) is sound for this pattern —
# any earlier literal occurrence of the matched string would itself start
# a valid match, contradicting it being the regex scan's first hit.
PIPELINE_REGEX_TYPE_SQL = """
WITH f AS (
  SELECT doc_id, text,
         regexp_extract_all(text, 's[a-z]+') AS hits,
         CASE WHEN lang IS NULL THEN 'null' ELSE 'string' END AS lang_ty,
         doc_id IS NOT NULL AS id_is_num,
         strlen(lang) AS lang_bytes
  FROM documents
)
SELECT doc_id, lang_ty, id_is_num, lang_bytes,
       len(hits) AS n_hits,
       hits[1] AS first_hit,
       instr(text, hits[1]) - 1 AS first_idx
FROM f
WHERE len(hits) > 0
ORDER BY doc_id
"""


# deterministic 64-dim query vector in exact-decimal steps; the SAME
# Python-built literal is embedded in the Spark plan and the oracle SQL,
# so both engines parse identical double constants
_VS_QUERY = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]


def pipeline_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$vectorSearch (Atlas Vector Search) as a pipeline stage: filtered
    cosine top-10 with the score surfaced via {$meta: "vectorSearchScore"}.

    Plan shape: pre-filter reaches the parquet scan, scoring is one
    per-row fold, and orderBy+limit plans as TakeOrderedAndProject —
    per-partition top-k, k-row merge, no global sort.
    """
    emb = table(spark, sf_dir, "embeddings")
    return aggregate(emb, [
        {"$vectorSearch": {
            "index": "emb_index", "path": "embedding",
            "queryVector": _VS_QUERY, "numCandidates": 100, "limit": 10,
            "filter": {"label": {"$gte": 1}}}},
        {"$project": {"vec_id": 1, "label": 1,
                      "score": {"$meta": "vectorSearchScore"}}},
    ])


_VS_QV_SQL = "[" + ", ".join(repr(v) for v in _VS_QUERY) + "]::double[]"

# score mirrors the stage exactly: (1 + dot/(qn*cn)) / 2 with
# left-to-right double folds on both engines
PIPELINE_VECTOR_SEARCH_SQL = f"""
WITH c AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::double) AS cd
  FROM embeddings WHERE label >= 1
)
SELECT vec_id, label,
       (1 + list_dot_product({_VS_QV_SQL}, cd)
            / (sqrt(list_dot_product({_VS_QV_SQL}, {_VS_QV_SQL}))
               * sqrt(list_dot_product(cd, cd)))) / 2 AS score
FROM c
ORDER BY score DESC LIMIT 10
"""


def pipeline_geo_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$geoNear (planar 2d): filtered nearest-events with a bounded
    radius and the distance reported in a named field.

    The coordinate pair is projected from scalar columns first (the
    server would read it off a 2d index); $geoNear then pre-filters,
    computes one per-row planar distance, range-bounds it BEFORE the
    ascending sort, and emits `dist`.
    """
    events = table(spark, sf_dir, "events")
    with_loc = events.select(
        "event_id", "event_type",
        F.expr("array(value, cast(user_id % 97 AS double))").alias("loc"))
    return aggregate(with_loc, [
        {"$geoNear": {"near": [50.0, 48.0], "key": "loc",
                      "distanceField": "dist",
                      "query": {"event_type": "click"},
                      "maxDistance": 30.0, "spherical": False}},
        {"$project": {"event_id": 1, "dist": 1}},
    ])


PIPELINE_GEO_NEAR_SQL = """
WITH d AS (
  SELECT event_id,
         sqrt((value - 50.0) * (value - 50.0)
              + ((user_id % 97)::double - 48.0)
                * ((user_id % 97)::double - 48.0)) AS dist
  FROM events
  WHERE event_type = 'click'
)
SELECT event_id, dist FROM d WHERE dist <= 30.0 ORDER BY dist, event_id
"""


def pipeline_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$search (Atlas Search surface): compound query — must-match text
    with a range filter and a mustNot exclusion — with the relevance
    score surfaced via {$meta: "searchScore"}.

    Score = raw term frequency (documented constant-IDF deviation; no
    Lucene index object exists here), so the oracle is exact token
    counting.  Plan: per-row token expressions, one relevance sort.
    """
    documents = table(spark, sf_dir, "documents")
    return aggregate(documents, [
        {"$search": {
            "index": "default",
            "compound": {
                "must": [{"text": {"query": "scan window", "path": "text"}}],
                "filter": [{"range": {"path": "n_chars",
                                      "gte": 100, "lte": 400}}],
                "mustNot": [{"phrase": {"query": "slow merge",
                                        "path": "text"}}],
            }}},
        {"$project": {"doc_id": 1, "lang": 1,
                      "score": {"$meta": "searchScore"}}},
        {"$sort": {"doc_id": 1}},
    ])


PIPELINE_TEXT_SEARCH_SQL = r"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS ws,
         '  ' || array_to_string(
                   list_filter(string_split_regex(lower(text), '\s+'),
                               x -> x <> ''), '  ') || '  ' AS stream
  FROM documents
),
scored AS (
  SELECT doc_id, lang, n_chars,
         (len(list_filter(ws, x -> x = 'scan'))
          + len(list_filter(ws, x -> x = 'window')))::double AS score,
         (length(stream) - length(replace(stream, ' slow  merge ', '')))
           / length(' slow  merge ') AS phrase_hits
  FROM t
)
SELECT doc_id, lang, score
FROM scored
WHERE score > 0 AND n_chars >= 100 AND n_chars <= 400 AND phrase_hits = 0
ORDER BY doc_id
"""


def pipeline_text_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$text`` compatibility bridge (find-language text query): the
    server grammar — OR'd terms, a required ``"phrase"``, a negated
    ``-term`` — compiled onto the $search token machinery, with the
    server's fts score (per matching term, ``0.5 * tf/n_tokens + 0.5``,
    field weight 1) surfaced via ``{$meta: "textScore"}`` and the
    server's meta-sort form (always best-first).

    Documented deviations (plans/aggpipe.py:_stage_text_match): the
    engine has no text index, so ``path`` names the searched field and
    tokens match exactly (no stemming / stop words).  Plan: per-row
    token expressions on the scan — zero shuffles before the sort.
    """
    documents = spread(spark, table(spark, sf_dir, "documents"))
    return aggregate(documents, [
        {"$match": {"$text": {"$search": 'spark merge "table part" -dup',
                              "path": "text"}}},
        {"$project": {"doc_id": 1, "lang": 1,
                      "score": {"$meta": "textScore"}}},
        {"$sort": {"score": {"$meta": "textScore"}, "doc_id": 1}},
    ])


# score terms in the bridge's positive-term order (spark, merge, then
# the phrase's own words table, part), summed LEFT-TO-RIGHT to mirror
# the Spark expression exactly (IEEE addition is order-sensitive)
PIPELINE_TEXT_QUERY_SQL = r"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
scored AS (
  SELECT doc_id, lang, ws, len(ws) AS n,
         len(list_filter(ws, x -> x = 'spark')) AS tf1,
         len(list_filter(ws, x -> x = 'merge')) AS tf2,
         len(list_filter(ws, x -> x = 'table')) AS tf3,
         len(list_filter(ws, x -> x = 'part')) AS tf4
  FROM t
)
SELECT doc_id, lang,
       (CASE WHEN tf1 > 0 THEN 0.5 * (tf1::double / n::double) + 0.5
             ELSE 0.0 END)
       + (CASE WHEN tf2 > 0 THEN 0.5 * (tf2::double / n::double) + 0.5
               ELSE 0.0 END)
       + (CASE WHEN tf3 > 0 THEN 0.5 * (tf3::double / n::double) + 0.5
               ELSE 0.0 END)
       + (CASE WHEN tf4 > 0 THEN 0.5 * (tf4::double / n::double) + 0.5
               ELSE 0.0 END) AS score
FROM scored
WHERE (tf1 > 0 OR tf2 > 0 OR tf3 > 0 OR tf4 > 0)
  AND instr('  ' || array_to_string(ws, '  ') || '  ', ' table  part ') > 0
  AND NOT list_contains(ws, 'dup')
ORDER BY score DESC, doc_id
"""


def pipeline_text_query_diacritics(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """$text with the server's default diacritic folding (r9 — the last
    refused knob on the bridge): the SAME query as pipeline_text_query
    but spelled with accented characters ('spärk', 'mérge', 'tàble
    pärt', '-dũp'), which must fold to identical results.  Query terms
    fold through str.translate at compile time; document tokens fold
    through F.translate in the scan (identity on this ASCII corpus, but
    the expression is in the plan and the unit suite exercises accented
    documents); the oracle folds with DuckDB translate() over the same
    literal pair."""
    documents = spread(spark, table(spark, sf_dir, "documents"))
    return aggregate(documents, [
        {"$match": {"$text": {"$search": 'spärk mérge "tàble pärt" -dũp',
                              "path": "text"}}},
        {"$project": {"doc_id": 1, "lang": 1,
                      "score": {"$meta": "textScore"}}},
        {"$sort": {"score": {"$meta": "textScore"}, "doc_id": 1}},
    ])


def _text_query_diacritics_sql() -> str:
    from mongo_hadoop_spark.plans.aggpipe import _diacritic_fold_map

    src, dst = _diacritic_fold_map()
    return rf"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(
                       translate(lower(text), '{src}', '{dst}'), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
scored AS (
  SELECT doc_id, lang, ws, len(ws) AS n,
         len(list_filter(ws, x -> x = 'spark')) AS tf1,
         len(list_filter(ws, x -> x = 'merge')) AS tf2,
         len(list_filter(ws, x -> x = 'table')) AS tf3,
         len(list_filter(ws, x -> x = 'part')) AS tf4
  FROM t
)
SELECT doc_id, lang,
       (CASE WHEN tf1 > 0 THEN 0.5 * (tf1::double / n::double) + 0.5
             ELSE 0.0 END)
       + (CASE WHEN tf2 > 0 THEN 0.5 * (tf2::double / n::double) + 0.5
               ELSE 0.0 END)
       + (CASE WHEN tf3 > 0 THEN 0.5 * (tf3::double / n::double) + 0.5
               ELSE 0.0 END)
       + (CASE WHEN tf4 > 0 THEN 0.5 * (tf4::double / n::double) + 0.5
               ELSE 0.0 END) AS score
FROM scored
WHERE (tf1 > 0 OR tf2 > 0 OR tf3 > 0 OR tf4 > 0)
  AND instr('  ' || array_to_string(ws, '  ') || '  ', ' table  part ') > 0
  AND NOT list_contains(ws, 'dup')
ORDER BY score DESC, doc_id
"""


def pipeline_array_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-form accumulator EXPRESSIONS (Mongo 5.2/7.0 $project
    surface): $sum/$avg/$min/$max/$median/$minN/$maxN/$first/$last and
    $stdDevPop applied to an array operand per row — the per-document
    vector-statistics shape ($median documented as the exact discrete
    lower median vs the server's approximate t-digest).

    Exactness: the embedding floats are first quantized to integers
    (floor(x*1000) — one deterministic IEEE multiply+floor), so every
    fold/sum is integer-exact in binary64 regardless of order; the
    stddev is two exact sums + one division + sqrt (correctly rounded
    both engines).  Plan: pure per-row array expressions — map-only,
    zero shuffles before the sort.
    """
    emb = table(spark, sf_dir, "embeddings")
    ints = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
               " * 1000.0) AS BIGINT))").alias("q"))
    return aggregate(ints, [
        {"$match": {"vec_id": {"$mod": [7, 0]}}},
        {"$project": {
            "vec_id": 1,
            "q_sum": {"$sum": "$q"},
            "q_avg": {"$avg": "$q"},
            "q_min": {"$min": "$q"},
            "q_max": {"$max": "$q"},
            "q_med": {"$median": {"input": "$q", "method": "approximate"}},
            # joined to strings: the driver compare hashes scalar cells
            "q_top2": {"$reduce": {
                "input": {"$maxN": {"n": 2, "input": "$q"}},
                "initialValue": "",
                "in": {"$concat": [
                    "$$value",
                    {"$cond": [{"$eq": ["$$value", ""]}, "", ","]},
                    {"$toString": "$$this"}]}}},
            "q_bot2": {"$reduce": {
                "input": {"$minN": {"n": 2, "input": "$q"}},
                "initialValue": "",
                "in": {"$concat": [
                    "$$value",
                    {"$cond": [{"$eq": ["$$value", ""]}, "", ","]},
                    {"$toString": "$$this"}]}}},
            "q_first": {"$first": "$q"},
            "q_last": {"$last": "$q"},
            "q_sd": {"$stdDevPop": "$q"},
        }},
        {"$sort": {"vec_id": 1}},
    ])


PIPELINE_ARRAY_AGGREGATES_SQL = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> floor(x::double * 1000.0)::bigint) AS q,
         len(embedding) AS n
  FROM embeddings
  WHERE vec_id % 7 = 0
)
SELECT vec_id,
       list_sum(q)::double AS q_sum,
       list_sum(q)::double / n::double AS q_avg,
       list_min(q) AS q_min,
       list_max(q) AS q_max,
       list_sort(q)[cast(ceil(n / 2.0) AS int)] AS q_med,
       array_to_string(list_slice(list_reverse_sort(q), 1, 2), ',')
         AS q_top2,
       array_to_string(list_slice(list_sort(q), 1, 2), ',') AS q_bot2,
       q[1] AS q_first,
       q[n] AS q_last,
       sqrt(greatest(
         (list_sum(list_transform(q, x -> x * x))::double
          - list_sum(q)::double * list_sum(q)::double / n::double)
         / n::double, 0.0)) AS q_sd
FROM q
ORDER BY vec_id
"""


def pipeline_search_querystring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$search queryString (Lucene boolean syntax): field:term, AND/OR/
    NOT and parentheses parsed by a recursive-descent mini-parser and
    compiled to token-membership predicates — constant score, per-row
    evaluation, zero shuffles beyond the final sort."""
    documents = table(spark, sf_dir, "documents")
    return aggregate(documents, [
        {"$search": {"queryString": {
            "defaultPath": "text",
            "query": "stream AND (batch OR merge) AND NOT slow"}}},
        {"$project": {"doc_id": 1, "lang": 1}},
        {"$sort": {"doc_id": 1}},
    ])


PIPELINE_SEARCH_QUERYSTRING_SQL = r"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
)
SELECT doc_id, lang FROM t
WHERE list_contains(ws, 'stream')
  AND (list_contains(ws, 'batch') OR list_contains(ws, 'merge'))
  AND NOT list_contains(ws, 'slow')
ORDER BY doc_id
"""


def pipeline_match_operators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Find-language operators beyond comparisons: match-side
    $elemMatch (scalar-element form), $mod, $bitsAllSet and $size —
    all per-row predicates compiled onto the scan (exists() higher-order
    lambda for $elemMatch — no explode, no shuffle)."""
    emb = table(spark, sf_dir, "embeddings")
    return aggregate(emb, [
        {"$match": {"embedding": {"$elemMatch": {"$gt": 0.3}, "$size": 64},
                    "label": {"$mod": [3, 1]},
                    "vec_id": {"$bitsAllSet": 5}}},
        {"$project": {"vec_id": 1, "label": 1}},
        {"$sort": {"vec_id": 1}},
    ])


PIPELINE_MATCH_OPS_SQL = """
SELECT vec_id, label
FROM embeddings
WHERE len(list_filter(embedding, x -> x > 0.3)) > 0
  AND len(embedding) = 64
  AND label % 3 = 1
  AND (vec_id & 5) = 5
ORDER BY vec_id
"""


def pipeline_search_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$search text with `fuzzy` (Atlas typo tolerance): query tokens
    match any word within maxEdits=1 Levenshtein distance; the score is
    the count of fuzzy-matched words.  Edit distance is integer-exact in
    every engine, so fuzzy search stays oracle-gateable (unlike Atlas's
    index-dependent fuzzy scoring)."""
    documents = table(spark, sf_dir, "documents")
    return aggregate(documents, [
        {"$search": {"text": {"query": "stre4m bath", "path": "text",
                              "fuzzy": {"maxEdits": 1}}}},
        {"$project": {"doc_id": 1, "score": {"$meta": "searchScore"}}},
        {"$sort": {"score": -1, "doc_id": 1}},
        {"$limit": 25},
    ])


PIPELINE_SEARCH_FUZZY_SQL = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
s AS (
  SELECT doc_id,
         (len(list_filter(ws, x -> levenshtein(x, 'stre4m') <= 1))
          + len(list_filter(ws, x -> levenshtein(x, 'bath') <= 1)))
           AS score
  FROM t
)
SELECT doc_id, score::double AS score FROM s WHERE score > 0
ORDER BY score DESC, doc_id LIMIT 25
"""


#: planar test polygon for $geoWithin (non-convex quad)
_GEO_POLY = [(50.0, 10.0), (90.0, 30.0), (60.0, 55.0), (40.0, 25.0)]


def _polygon_sql(x: str, y: str, verts: list[tuple[float, float]]) -> str:
    """Even-odd ray-cast SQL for a literal polygon — the SAME Python
    computes the edge constants embedded in the Spark plan
    (plans/aggpipe.py _geo_within) and this oracle, so every compared
    double is identical."""
    expr = None
    for (xi, yi), (xj, yj) in zip(verts, verts[-1:] + verts[:-1]):
        if yj == yi:
            continue
        t = (f"(({yi!r}::double > {y}) <> ({yj!r}::double > {y})"
             f" AND {x} < ({xj - xi!r}::double * ({y} - {yi!r}::double)"
             f" / {yj - yi!r}::double + {xi!r}::double))")
        expr = t if expr is None else f"({expr} <> {t})"
    return expr or "FALSE"


def pipeline_geo_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$geoWithin (planar 2d) in the match language: $box, $center and
    $polygon shapes OR-combined over an [x, y] coordinate pair, rolled
    up per event type.  Every shape is a per-row arithmetic predicate —
    no shuffle beyond the final keyed count."""
    events = table(spark, sf_dir, "events")
    with_loc = events.select(
        "event_id", "event_type",
        F.expr("array(value, cast(user_id % 97 AS double))").alias("loc"))
    return aggregate(with_loc, [
        {"$match": {"$or": [
            {"loc": {"$geoWithin": {"$box": [[10.0, 5.0], [45.0, 40.0]]}}},
            {"loc": {"$geoWithin": {"$center": [[70.0, 70.0], 12.0]}}},
            {"loc": {"$geoWithin": {"$polygon": _GEO_POLY}}},
        ]}},
        {"$group": {"_id": "$event_type", "n": {"$sum": 1}}},
        {"$sort": {"_id": 1}},
    ])


_GEO_Y = "((user_id % 97)::double)"

PIPELINE_GEO_WITHIN_SQL = f"""
SELECT event_type AS _id, count(*)::bigint AS n
FROM events
WHERE (value >= 10.0::double AND value <= 45.0::double
       AND {_GEO_Y} >= 5.0::double AND {_GEO_Y} <= 40.0::double)
   OR ((value - 70.0::double) * (value - 70.0::double)
       + ({_GEO_Y} - 70.0::double) * ({_GEO_Y} - 70.0::double)
       <= 12.0::double * 12.0::double)
   OR {_polygon_sql("value", _GEO_Y, _GEO_POLY)}
GROUP BY event_type ORDER BY _id
"""


#: degree-coordinate projection shared by the spherical geo queries —
#: the SAME expression text runs in both engines (fmod and subtraction
#: are exact IEEE ops)
_SPH_LON = "(value % 3.6e2) - 1.8e2"
_SPH_LAT = "cast(user_id % 181 AS double) - 9e1"


def pipeline_geo_center_sphere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$geoWithin $centerSphere (spherical geometry) in the match
    language: events whose synthesized [lon, lat] falls within 0.3
    radians of (20E, 80S) on the unit sphere, rolled up per event type.

    The predicate is the deterministic-polynomial haversine kernel of
    plans/trig.py — h <= sin^2(r/2), asin-free, a pure per-row map
    before the keyed count; the oracle runs the identical IEEE
    expression tree (cross-rendering equality pinned by
    tests/test_trig.py), which is what makes spherical geometry
    hash-gateable at all."""
    events = spread(spark, table(spark, sf_dir, "events"))
    with_loc = events.select(
        "event_id", "event_type",
        F.expr(f"array({_SPH_LON}, {_SPH_LAT})").alias("loc"))
    return aggregate(with_loc, [
        {"$match": {"loc": {"$geoWithin":
                            {"$centerSphere": [[20.0, -80.0], 0.3]}}}},
        {"$group": {"_id": "$event_type", "n": {"$sum": 1}}},
        {"$sort": {"_id": 1}},
    ])


def _center_sphere_pred_sql(lon: str, lat: str,
                            clon: float, clat: float, r: float) -> str:
    from mongo_hadoop_spark.plans.trig import (
        _dlit, center_sphere_threshold, haversine_h_sql)
    h = haversine_h_sql(lon, lat, _dlit(clon), _dlit(clat))
    return f"({h} <= {_dlit(center_sphere_threshold(r))})"


def _geo_center_sphere_sql() -> str:
    return f"""
WITH pts AS (
  SELECT event_type, ({_SPH_LON}) AS lon, ({_SPH_LAT}) AS lat FROM events
)
SELECT event_type AS _id, count(*)::bigint AS n
FROM pts
WHERE {_center_sphere_pred_sql("lon", "lat", 20.0, -80.0, 0.3)}
GROUP BY event_type ORDER BY _id
"""


def pipeline_geo_near_sphere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$geoNear spherical:true — filtered nearest-events by great-circle
    distance with the radian distance scaled to meters via
    distanceMultiplier (MongoDB's legacy-pair spherical semantics).

    The range bound runs on the monotone h-kernel (asin-free, against a
    driver-computed sin^2(r/2) literal), the ascending sort on the
    kernel too; only surviving rows pay the polynomial asin for the
    reported distance — scale shape identical to the planar $geoNear
    (per-row map + one range sort)."""
    events = table(spark, sf_dir, "events")
    with_loc = events.select(
        "event_id", "event_type",
        F.expr(f"array({_SPH_LON}, {_SPH_LAT})").alias("loc"))
    from mongo_hadoop_spark.plans.trig import EARTH_RADIUS_M
    return aggregate(with_loc, [
        {"$geoNear": {"near": [-50.0, -80.0], "key": "loc",
                      "distanceField": "dist_m",
                      "query": {"event_type": "view"},
                      "maxDistance": 0.5, "spherical": True,
                      "distanceMultiplier": EARTH_RADIUS_M}},
        {"$project": {"event_id": 1, "dist_m": 1}},
    ])


def _geo_near_sphere_sql() -> str:
    from mongo_hadoop_spark.plans.trig import (
        _dlit, center_sphere_threshold, dist_rad_from_h_sql,
        haversine_h_sql, EARTH_RADIUS_M)
    h = haversine_h_sql("lon", "lat", _dlit(-50.0), _dlit(-80.0))
    return f"""
WITH pts AS (
  SELECT event_id, ({_SPH_LON}) AS lon, ({_SPH_LAT}) AS lat
  FROM events WHERE event_type = 'view'
),
k AS (
  SELECT event_id, {h} AS h FROM pts
)
SELECT event_id,
       {dist_rad_from_h_sql("h")} * {_dlit(EARTH_RADIUS_M)} AS dist_m
FROM k
WHERE h <= {_dlit(center_sphere_threshold(0.5))}
ORDER BY dist_m, event_id
"""


#: a holed quadrilateral straddling the antimeridian plus a second
#: MultiPolygon part in the west — exercises wrap-around straddle
#: tests, the hole parity, and multi-part folding in one query
_GEO_POLY_SPHERE = {
    "type": "MultiPolygon",
    "coordinates": [
        # deep-south so the sf0.001 lat range (-90..-76) still lands hits
        [[(150.0, -88.0), (-160.0, -88.0), (-160.0, -40.0),
          (150.0, -40.0), (150.0, -88.0)],
         [(165.0, -80.0), (-175.0, -80.0), (-175.0, -60.0),
          (165.0, -60.0), (165.0, -80.0)]],
        [[(-60.0, -85.0), (-20.0, -85.0), (-20.0, -45.0),
          (-60.0, -45.0), (-60.0, -85.0)]],
    ],
}


def pipeline_geo_polygon_sphere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$geoWithin $geometry (GeoJSON spherical polygons) in the match
    language: events inside a holed antimeridian-straddling
    MultiPolygon, rolled up per event type.

    The predicate is the even-odd meridian-ray fold of plans/trig.py —
    per-edge great-circle normals are driver literals, the point pays
    the four coordinate polynomials once, and holes/parts contribute
    edges to the same parity (north pole exterior by convention).  A
    pure per-row map ahead of the keyed count; the oracle unrolls the
    identical per-edge IEEE ops over a CTE-bound point vector."""
    events = table(spark, sf_dir, "events")
    with_loc = events.select(
        "event_id", "event_type",
        F.expr(f"array({_SPH_LON}, {_SPH_LAT})").alias("loc"))
    return aggregate(with_loc, [
        {"$match": {"loc": {"$geoWithin":
                            {"$geometry": _GEO_POLY_SPHERE}}}},
        {"$group": {"_id": "$event_type", "n": {"$sum": 1}}},
        {"$sort": {"_id": 1}},
    ])


def _geo_polygon_sphere_sql() -> str:
    from mongo_hadoop_spark.plans.trig import (
        sphere_polygon_pred_sql, sphere_vec_sql)
    rings = [r for poly in _GEO_POLY_SPHERE["coordinates"] for r in poly]
    px, py, pz = sphere_vec_sql("lon", "lat")
    pred = sphere_polygon_pred_sql("lon", "px", "py", "pz", rings)
    return f"""
WITH pts AS (
  SELECT event_type, ({_SPH_LON}) AS lon, ({_SPH_LAT}) AS lat FROM events
),
vec AS (
  SELECT event_type, lon, {px} AS px, {py} AS py, {pz} AS pz FROM pts
)
SELECT event_type AS _id, count(*)::bigint AS n
FROM vec WHERE {pred}
GROUP BY event_type ORDER BY _id
"""


#: second synthesized coordinate pair for the stored segment — exact
#: integer/fmod arithmetic, identical text in both engines
_SPH_LON2 = "((value * 7e0) % 3.6e2) - 1.8e2"
_SPH_LAT2 = "cast((user_id * 3 + 41) % 181 AS double) - 9e1"


def pipeline_geo_intersects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$geoIntersects (GeoJSON spherical): each event carries a
    synthesized geodesic TRACK segment (two legacy coordinate pairs),
    matched against the holed antimeridian MultiPolygon — intersecting
    means an endpoint inside OR the arc crossing a boundary edge, so
    pass-through tracks with both endpoints outside still count (the
    case $geoWithin cannot see).

    Plan — the vector-materialized shape: the endpoint unit vectors
    and their cross product are PROJECTED as columns (plain polynomial
    arithmetic — whole-stage codegen, computed once per row), and the
    filter's interpreted work shrinks to the per-edge folds over
    attribute references (two parity aggregates + the crossing exists,
    ~a dozen flops per edge).  Evaluating the vectors inside the
    predicate's HOF binding instead (what the $match-language rendering
    must do, having only a field reference) re-derives every polynomial
    per row in interpreted mode — measured 4x slower end-to-end.  Same
    one-scan zero-extra-shuffle shape either way; the oracle's CTEs
    mirror this projection exactly.  The $match-language operator
    (plans/aggpipe.py _geo_intersects / trig.sphere_geo_intersects_expr)
    computes the identical predicate and is pinned bit-equal in
    tests/test_spherepoly.py."""
    from mongo_hadoop_spark.plans.trig import (
        _geo_edges_array_sql, sphere_crossing_fold_sql,
        sphere_parity_fold_sql, sphere_polygon_prefilter_sql,
        sphere_vec_sql)

    rings = [r for poly in _GEO_POLY_SPHERE["coordinates"] for r in poly]
    events = spread(spark, table(spark, sf_dir, "events"))
    pts = events.selectExpr(
        "event_type",
        f"({_SPH_LON}) AS lon1", f"({_SPH_LAT}) AS lat1",
        f"({_SPH_LON2}) AS lon2", f"({_SPH_LAT2}) AS lat2")
    ax, ay, az = sphere_vec_sql("lon1", "lat1")
    bx, by, bz = sphere_vec_sql("lon2", "lat2")
    vec = pts.selectExpr(
        "event_type", "lon1", "lat1", "lon2", "lat2",
        f"{ax} AS ax", f"{ay} AS ay", f"{az} AS az",
        f"{bx} AS bx", f"{by} AS by", f"{bz} AS bz")
    # monotonically_increasing_id is an optimizer BARRIER, not data:
    # referencing a nondeterministic-sourced column inside the filter
    # condition (the never-true `__barrier < 0` disjunct below; an
    # IS NULL test would constant-fold away — the id is non-nullable)
    # makes the predicate non-pushable, so the projected vectors stay
    # materialized columns — without it PushPredicateThroughNonJoin
    # substitutes every polynomial into each of the predicate's ~180
    # per-edge references and the interpreted filter slows ~50x
    # (measured 420 s at sf0.1).  An unreferenced barrier column gets
    # column-pruned away first, which is why it must appear IN the
    # condition.
    nab = vec.selectExpr(
        "*",
        "ay * bz - az * by AS nabx",
        "az * bx - ax * bz AS naby",
        "ax * by - ay * bx AS nabz",
        "monotonically_increasing_id() AS __barrier")
    edges = _geo_edges_array_sql(rings)
    pre_a = sphere_polygon_prefilter_sql("lon1", "lat1", rings)
    pre_b = sphere_polygon_prefilter_sql("lon2", "lat2", rings)
    parity_a = sphere_parity_fold_sql(edges, "lon1", "ax", "ay", "az")
    parity_b = sphere_parity_fold_sql(edges, "lon2", "bx", "by", "bz")
    crossing = sphere_crossing_fold_sql(
        edges, "ax", "ay", "az", "bx", "by", "bz",
        "nabx", "naby", "nabz")
    pred = (f"({pre_a} AND {parity_a}) OR ({pre_b} AND {parity_b}) "
            f"OR {crossing} OR (__barrier < CAST(0 AS LONG))")
    return (nab.where(F.expr(pred))
            .groupBy(F.col("event_type").alias("_id"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("_id"))


def _geo_intersects_sql() -> str:
    from mongo_hadoop_spark.plans.trig import (
        sphere_polygon_pred_sql, sphere_segment_crossing_sql,
        sphere_vec_sql)
    rings = [r for poly in _GEO_POLY_SPHERE["coordinates"] for r in poly]
    ax, ay, az = sphere_vec_sql("lon1", "lat1")
    bx, by, bz = sphere_vec_sql("lon2", "lat2")
    pred_a = sphere_polygon_pred_sql("lon1", "ax", "ay", "az", rings)
    pred_b = sphere_polygon_pred_sql("lon2", "bx", "by", "bz", rings)
    crossing = sphere_segment_crossing_sql(
        "ax", "ay", "az", "bx", "by", "bz",
        "nabx", "naby", "nabz", rings)
    return f"""
WITH pts AS (
  SELECT event_type, ({_SPH_LON}) AS lon1, ({_SPH_LAT}) AS lat1,
         ({_SPH_LON2}) AS lon2, ({_SPH_LAT2}) AS lat2
  FROM events
),
vec AS (
  SELECT event_type, lon1, lon2,
         {ax} AS ax, {ay} AS ay, {az} AS az,
         {bx} AS bx, {by} AS by, {bz} AS bz
  FROM pts
),
nab AS (
  SELECT *, ay * bz - az * by AS nabx,
            az * bx - ax * bz AS naby,
            ax * by - ay * bx AS nabz
  FROM vec
)
SELECT event_type AS _id, count(*)::bigint AS n
FROM nab
WHERE {pred_a} OR {pred_b} OR {crossing}
GROUP BY event_type ORDER BY _id
"""


def pipeline_search_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$search wildcard / regex / in operators (Atlas term-level
    queries) composed under compound: wildcard-filtered sources, a
    regex must, and an `in` language filter — constant-score matches,
    anchored whole-value semantics (no analyzed index here)."""
    documents = table(spark, sf_dir, "documents")
    return aggregate(documents, [
        {"$search": {"compound": {
            "must": [{"regex": {"query": ".*stream.*batch.*",
                                "path": "text"}}],
            "filter": [{"wildcard": {"query": "src*", "path": "source"}},
                       {"in": {"path": "lang", "value": ["en", "es"]}}],
        }}},
        {"$project": {"doc_id": 1, "lang": 1, "source": 1}},
        {"$sort": {"doc_id": 1}},
    ])


PIPELINE_SEARCH_WILDCARD_SQL = """
SELECT doc_id, lang, source
FROM documents
WHERE regexp_matches(text, '^(?:.*stream.*batch.*)$')
  AND regexp_matches(source, '^src.*$')
  AND lang IN ('en', 'es')
ORDER BY doc_id
"""


def pipeline_lookup_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$lookup pipeline form (Mongo 3.6+) with let/$$variables: for each
    F-status order, its ≥10-quantity lineitems priced at or under the
    order's total, top-2 by price — a correlated top-k sub-pipeline.

    Decorrelated plan (plans/aggpipe.py _stage_lookup_pipeline): the
    $eq[$l_orderkey, $$okey] term is the equi-join key (foreign side
    pre-aggregated per key → 1:1 join), the $lte[$l_extendedprice,
    $$cap] term filters array ELEMENTS with a correlated lambda, and
    $project/$sort/$limit run inside the array — per-order top-k with
    no extra shuffle and no nested loop.
    """
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    return aggregate(orders, [
        {"$match": {"o_orderstatus": "F"}},
        {"$lookup": {
            "from": "lineitem",
            "let": {"okey": "$o_orderkey", "cap": "$o_totalprice"},
            "pipeline": [
                {"$match": {"l_quantity": {"$gte": 10},
                            "$expr": {"$and": [
                                {"$eq": ["$l_orderkey", "$$okey"]},
                                {"$lte": ["$l_extendedprice", "$$cap"]}]}}},
                {"$project": {"l_linenumber": 1, "l_extendedprice": 1}},
                {"$sort": {"l_extendedprice": -1, "l_linenumber": 1}},
                {"$limit": 2},
            ],
            "as": "top_items"}},
        {"$project": {"o_orderkey": 1,
                      "n_top": {"$size": "$top_items"},
                      "best": {"$arrayElemAt": ["$top_items.l_extendedprice",
                                                0]}}},
        {"$sort": {"o_orderkey": 1}},
        {"$limit": 100},
    ], tables={"lineitem": lineitem})


PIPELINE_LOOKUP_CORRELATED_SQL = """
WITH o AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
),
j AS (
  SELECT o.o_orderkey, l.l_extendedprice,
         row_number() OVER (PARTITION BY o.o_orderkey
                            ORDER BY l.l_extendedprice DESC, l.l_linenumber)
           AS rn
  FROM o JOIN lineitem l
    ON l.l_orderkey = o.o_orderkey
   AND l.l_quantity >= 10
   AND l.l_extendedprice <= o.o_totalprice
),
g AS (
  SELECT o_orderkey, count(*) AS n_top,
         max(CASE WHEN rn = 1 THEN l_extendedprice END) AS best
  FROM j WHERE rn <= 2 GROUP BY o_orderkey
)
SELECT o.o_orderkey, coalesce(g.n_top, 0)::int AS n_top, g.best
FROM o LEFT JOIN g USING (o_orderkey)
ORDER BY o.o_orderkey LIMIT 100
"""


def pipeline_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$search text clause with real BM25 scoring (the Atlas/Lucene
    model): corpus stats (N, Σdl, per-term df) come from ONE broadcast
    1-row aggregation — the role the Lucene index plays server-side.

    Exactness: k1=6/5, b=3/4 integer-scale the tf part into one
    bigint/bigint division; idf uses the rational surrogate
    u = (2N−2df+1)/(2df+1) for ln(1+u) — every double compared is
    reproducible cross-engine (see _stage_search_text_bm25).
    """
    documents = table(spark, sf_dir, "documents")
    return aggregate(documents, [
        {"$search": {"index": "default",
                     "text": {"query": "scan window merge", "path": "text",
                              "bm25": True}}},
        {"$project": {"doc_id": 1, "lang": 1,
                      "score": {"$meta": "searchScore"}}},
        {"$sort": {"score": -1, "doc_id": 1}},
        {"$limit": 20},
    ])


# the BM25-scored document set (terms: scan / window / merge), shared by
# the bm25 / rankFusion / scoreFusion oracles.  Mirrors the stage exactly:
# whole-bit idf, 20·TL-integer-scaled tf part, left-to-right double adds.
def _bm25_docs_sql(corpus: str = "documents") -> str:
    """BM25 oracle CTE chain over ``corpus`` (a table name or derived
    table).  The corpus MUST equal the Spark pipeline's input frame:
    the fusion queries run over documents ⋈ embeddings, which at
    sf0.01 happens to equal ``documents`` (both 500 rows) but diverges
    from sf0.1 up (5000 docs vs 2000 embeddings) — corpus statistics
    (N, Σdl, df) and the candidate cut both shift with the frame."""
    return rf"""
  bm_t AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x <> '') AS ws
    FROM {corpus}
  ),
  bm_d AS (
    SELECT doc_id, lang, len(ws)::bigint AS dl,
           len(list_filter(ws, x -> x = 'scan'))::bigint AS tf0,
           len(list_filter(ws, x -> x = 'window'))::bigint AS tf1,
           len(list_filter(ws, x -> x = 'merge'))::bigint AS tf2
    FROM bm_t
  ),
  bm_s AS (
    SELECT count(*)::bigint AS n, sum(dl)::bigint AS tl,
           sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::bigint AS df0,
           sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::bigint AS df1,
           sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::bigint AS df2
    FROM bm_d
  ),
  bm25 AS (
    SELECT doc_id, lang,
           (((2 * n - 2 * df0 + 1)::double / (2 * df0 + 1)::double)
              * ((44 * tf0 * tl)::double
                 / (20 * tf0 * tl + 6 * tl + 18 * dl * n)::double)
            + ((2 * n - 2 * df1 + 1)::double / (2 * df1 + 1)::double)
              * ((44 * tf1 * tl)::double
                 / (20 * tf1 * tl + 6 * tl + 18 * dl * n)::double)
            + ((2 * n - 2 * df2 + 1)::double / (2 * df2 + 1)::double)
              * ((44 * tf2 * tl)::double
                 / (20 * tf2 * tl + 6 * tl + 18 * dl * n)::double)
           ) AS score
    FROM bm_d, bm_s
    WHERE tf0 + tf1 + tf2 > 0
  )
"""


_BM25_DOCS_SQL = _bm25_docs_sql()
_BM25_HYBRID_SQL = _bm25_docs_sql(
    "(SELECT d.* FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)")

PIPELINE_SEARCH_BM25_SQL = f"""
WITH {_BM25_DOCS_SQL}
SELECT doc_id, lang, score
FROM bm25
ORDER BY score DESC, doc_id LIMIT 20
"""


def _hybrid_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings on doc_id = vec_id — a corpus with both a
    text and an embedding column, the shape hybrid search runs on.

    No broadcast hint: BOTH sides are corpus-sized, so the join must stay
    a shuffled equi-join at scale (a forced broadcast of `embeddings`
    would OOM the executors at 100 TB).  On small inputs Spark's size
    estimate stays under `autoBroadcastJoinThreshold` and the planner
    (or AQE) still picks a broadcast on its own — the decision is
    stats-driven, never pinned.
    """
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "lang", "source", "n_chars", "embedding")


def pipeline_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$rankFusion (Mongo 8.0) — hybrid search: an exact-cosine
    $vectorSearch pipeline and a BM25 $search pipeline fused by
    reciprocal rank,  score = Σ_p w_p / (60 + rank_p).

    Plan shape: both candidate sets are limit-bounded (enforced by the
    stage), rank windows sort ≤ 40 rows, the fused 40-row score table
    broadcast-joins back to the corpus.  Tie determinism: tied scores
    share a rank (rank(), documented deviation from the server's
    internal-order tiebreak).
    """
    corpus = _hybrid_corpus(spark, sf_dir)
    return aggregate(corpus, [
        {"$rankFusion": {
            "key": "doc_id",
            "input": {"pipelines": {
                "vector": [{"$vectorSearch": {
                    "index": "emb", "path": "embedding",
                    "queryVector": _VS_QUERY, "numCandidates": 100,
                    "limit": 40, "tiebreak": "doc_id"}}],
                "text": [{"$search": {"text": {"query": "scan window merge",
                                               "path": "text",
                                               "bm25": True},
                                      "tiebreak": "doc_id"}},
                         {"$limit": 40}],
            }},
            "combination": {"weights": {"vector": 2, "text": 1}},
        }},
        {"$project": {"doc_id": 1, "lang": 1, "score": {"$meta": "score"}}},
        {"$sort": {"score": -1, "doc_id": 1}},
        {"$limit": 15},
    ])


# the two ranked candidate sets shared by the fusion oracles: exact-cosine
# top-40 (Atlas normalization (1+cos)/2) and BM25 top-40.  Both LIMIT cuts
# carry an explicit doc_id tiebreak, matching the pipelines' tiebreak
# engine extension — score ties at the boundary appear from sf0.1 up, and
# an untied cut keeps an engine-dependent row set.
_FUSION_CANDS_SQL = f"""
  {_BM25_HYBRID_SQL},
  vec_scored AS (
    SELECT vec_id AS doc_id,
           (1 + list_dot_product({{qv}},
                                 list_transform(embedding, x -> x::double))
                / (sqrt(list_dot_product({{qv}}, {{qv}}))
                   * sqrt(list_dot_product(
                         list_transform(embedding, x -> x::double),
                         list_transform(embedding, x -> x::double))))) / 2
             AS vscore
    FROM embeddings
  ),
  vec_top AS (
    SELECT doc_id, vscore FROM vec_scored
    ORDER BY vscore DESC, doc_id ASC LIMIT 40
  ),
  txt_top AS (
    SELECT doc_id, score AS tscore FROM bm25
    ORDER BY score DESC, doc_id ASC LIMIT 40
  )
"""


def _fusion_cands_sql() -> str:
    # str.replace, not .format — the BM25 fragment contains format('{:b}')
    return _FUSION_CANDS_SQL.replace("{qv}", _VS_QV_SQL)


PIPELINE_RANK_FUSION_SQL = f"""
WITH {_fusion_cands_sql()},
  vec_rank AS (
    SELECT doc_id, rank() OVER (ORDER BY vscore DESC) AS r FROM vec_top
  ),
  txt_rank AS (
    SELECT doc_id, rank() OVER (ORDER BY tscore DESC) AS r FROM txt_top
  ),
  fused AS (
    SELECT coalesce(v.doc_id, t.doc_id) AS doc_id,
           (CASE WHEN v.r IS NULL THEN 0.0::double
                 ELSE 2.0::double / (60 + v.r)::double END
            + CASE WHEN t.r IS NULL THEN 0.0::double
                   ELSE 1.0::double / (60 + t.r)::double END) AS score
    FROM vec_rank v FULL OUTER JOIN txt_rank t USING (doc_id)
  )
SELECT d.doc_id, d.lang, f.score
FROM fused f JOIN documents d USING (doc_id)
ORDER BY f.score DESC, d.doc_id LIMIT 15
"""


def pipeline_score_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$scoreFusion (Mongo 8.1) — hybrid search on normalized scores:
    each pipeline's relevance scores minMaxScaler-normalize to [0, 1]
    over its own candidate set (1-row broadcast min/max stats), then a
    weighted average over ALL input pipelines (missing ⇒ 0).

    minMaxScaler + weighted average are pure IEEE arithmetic on already
    cross-engine-exact scores, so this stays oracle-gateable (sigmoid
    normalization exists too but goes through exp() — pytest-checked
    with tolerance instead).
    """
    corpus = _hybrid_corpus(spark, sf_dir)
    return aggregate(corpus, [
        {"$scoreFusion": {
            "key": "doc_id",
            "input": {
                "pipelines": {
                    "vector": [{"$vectorSearch": {
                        "index": "emb", "path": "embedding",
                        "queryVector": _VS_QUERY, "numCandidates": 100,
                        "limit": 40, "tiebreak": "doc_id"}}],
                    "text": [{"$search": {"text": {
                        "query": "scan window merge", "path": "text",
                        "bm25": True}, "tiebreak": "doc_id"}},
                        {"$limit": 40}],
                },
                "normalization": "minMaxScaler",
            },
            "combination": {"method": "avg",
                            "weights": {"vector": 2, "text": 1}},
        }},
        {"$project": {"doc_id": 1, "lang": 1, "score": {"$meta": "score"}}},
        {"$sort": {"score": -1, "doc_id": 1}},
        {"$limit": 15},
    ])


PIPELINE_SCORE_FUSION_SQL = f"""
WITH {_fusion_cands_sql()},
  vec_stats AS (
    SELECT min(vscore) AS lo, max(vscore) AS hi FROM vec_top
  ),
  vec_norm AS (
    SELECT doc_id,
           CASE WHEN s.hi = s.lo THEN 0.0::double
                ELSE (vscore - s.lo) / (s.hi - s.lo) END AS nv
    FROM vec_top, vec_stats s
  ),
  txt_stats AS (
    SELECT min(tscore) AS lo, max(tscore) AS hi FROM txt_top
  ),
  txt_norm AS (
    SELECT doc_id,
           CASE WHEN s.hi = s.lo THEN 0.0::double
                ELSE (tscore - s.lo) / (s.hi - s.lo) END AS nt
    FROM txt_top, txt_stats s
  ),
  fused AS (
    SELECT coalesce(v.doc_id, t.doc_id) AS doc_id,
           (2.0::double * coalesce(v.nv, 0.0::double)
            + 1.0::double * coalesce(t.nt, 0.0::double)) / 2.0::double
             AS score
    FROM vec_norm v FULL OUTER JOIN txt_norm t USING (doc_id)
  )
SELECT d.doc_id, d.lang, f.score
FROM fused f JOIN documents d USING (doc_id)
ORDER BY f.score DESC, d.doc_id LIMIT 15
"""


def pipeline_bitwise_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$bitAnd / $bitOr / $bitXor / $bitNot (Mongo 6.3 bitwise integer
    family) — per-row flag math rolled up per event type."""
    events = table(spark, sf_dir, "events")
    return aggregate(events, [
        {"$project": {
            "event_type": 1,
            "ax": {"$bitAnd": ["$event_id", "$user_id"]},
            "ox": {"$bitOr": ["$event_id", "$user_id"]},
            "xx": {"$bitXor": ["$event_id", "$user_id",
                               {"$bitNot": "$event_id"}]}}},
        {"$group": {"_id": "$event_type",
                    "sum_and": {"$sum": "$ax"},
                    "sum_or": {"$sum": "$ox"},
                    "sum_xor": {"$sum": "$xx"}}},
        {"$sort": {"_id": 1}},
    ])


PIPELINE_BITWISE_SQL = """
SELECT event_type AS _id,
       sum(event_id & user_id)::bigint AS sum_and,
       sum(event_id | user_id)::bigint AS sum_or,
       sum(xor(xor(event_id, user_id), ~event_id))::bigint AS sum_xor
FROM events GROUP BY event_type ORDER BY _id
"""


def pipeline_jsonschema_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$jsonSchema as a data-quality gate: the server's collection-
    validator language used inside $match — required fields, bsonType
    (runtime typeof, constant-folded on static columns), enum, pattern,
    and numeric/length bounds — then a per-language yield rollup.

    JSON Schema presence semantics: a missing (null) property passes
    everything except `required`.
    """
    documents = table(spark, sf_dir, "documents")
    return aggregate(documents, [
        {"$match": {"$jsonSchema": {
            "required": ["doc_id", "text"],
            "properties": {
                "lang": {"bsonType": "string", "enum": ["en", "de", "fr"]},
                "n_chars": {"bsonType": "long",
                            "minimum": 120, "maximum": 420},
                "text": {"pattern": "scan", "minLength": 100},
            }}}},
        {"$group": {"_id": "$lang", "n": {"$sum": 1}}},
        {"$sort": {"_id": 1}},
    ])


PIPELINE_JSONSCHEMA_SQL = """
SELECT lang AS _id, count(*) AS n
FROM documents
WHERE doc_id IS NOT NULL AND text IS NOT NULL
  AND (lang IS NULL OR lang IN ('en', 'de', 'fr'))
  AND (n_chars IS NULL OR (n_chars >= 120 AND n_chars <= 420))
  AND regexp_matches(text, 'scan') AND length(text) >= 100
GROUP BY 1 ORDER BY 1
"""


def pipeline_redact_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$redact field-level access control: one condition evaluated at the
    root AND at every embedded document (schema-driven recursion).

    Builds a nested doc per event with per-level `pub` flags, then
    redacts: a non-public root drops the row, a non-public subdocument
    nulls out (the engine's missing).  The whole stage compiles to
    per-row expressions — no shuffle, no Python.
    """
    events = table(spark, sf_dir, "events")
    return aggregate(events, [
        {"$project": {
            "event_id": 1,
            "pub": {"$mod": ["$user_id", 2]},
            "detail": {"pub": {"$cond": [{"$lt": ["$value", 100]}, 1, 0]},
                       "value": "$value", "note": "$event_type"}}},
        {"$redact": {"$cond": [{"$eq": [{"$ifNull": ["$pub", 1]}, 0]},
                               "$$PRUNE", "$$DESCEND"]}},
        {"$project": {"event_id": 1,
                      "detail_value": "$detail.value",
                      "note": "$detail.note"}},
        {"$sort": {"event_id": 1}},
    ])


PIPELINE_REDACT_SQL = """
SELECT event_id,
       CASE WHEN value < 100 THEN value END AS detail_value,
       CASE WHEN value < 100 THEN event_type END AS note
FROM events WHERE user_id % 2 = 1 ORDER BY event_id
"""


def pipeline_top_orders_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo 5.2/7.0 ranked-accumulator family in one $group: $topN
    (3 priciest order keys), $bottom (cheapest), $median (discrete).

    Tie semantics are pinned: the collected struct sorts by (negated
    sort key, output), so price ties break by output ascending for the
    front of the array and descending at the back — replicated exactly
    in the oracle's window ranks.
    """
    import pyspark.sql.functions as F

    orders = table(spark, sf_dir, "orders")
    out = aggregate(orders, [
        {"$group": {
            "_id": "$o_orderstatus",
            "top3": {"$topN": {"output": "$o_orderkey",
                               "sortBy": {"o_totalprice": -1}, "n": 3}},
            "cheapest": {"$bottom": {"output": "$o_orderkey",
                                     "sortBy": {"o_totalprice": -1}}},
            "median_price": {"$median": {"input": "$o_totalprice",
                                         "method": "approximate"}},
        }},
        {"$sort": {"_id": 1}},
    ])
    # gate outputs are scalar-only (driver value-hash): join the id array
    return out.select(
        "_id",
        F.array_join(
            F.transform("top3", lambda x: x.cast("string")), ","
        ).alias("top3"),
        "cheapest", "median_price",
    )


PIPELINE_TOP_ORDERS_SQL = """
WITH ranked AS (
  SELECT o_orderstatus AS _id, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rn_top,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice ASC, o_orderkey DESC)
           AS rn_bot
  FROM orders
),
top3 AS (
  SELECT _id, string_agg(o_orderkey::varchar, ',' ORDER BY rn_top) AS top3
  FROM ranked WHERE rn_top <= 3 GROUP BY _id
),
bott AS (
  SELECT _id, o_orderkey AS cheapest FROM ranked WHERE rn_bot = 1
),
medi AS (
  SELECT _id, o_totalprice AS median_price FROM (
    SELECT _id, o_totalprice,
           row_number() OVER (PARTITION BY _id ORDER BY o_totalprice ASC)
             AS rp,
           count(*) OVER (PARTITION BY _id) AS n
    FROM ranked
  ) WHERE rp = greatest(ceil(n * 0.5), 1)
)
SELECT _id, top3, cheapest, median_price
FROM top3 JOIN bott USING (_id) JOIN medi USING (_id)
ORDER BY _id
"""


def pipeline_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$percentile (discrete quartiles) + $bottomN per order priority."""
    import pyspark.sql.functions as F

    orders = table(spark, sf_dir, "orders")
    out = aggregate(orders, [
        {"$group": {
            "_id": "$o_orderpriority",
            "price_q": {"$percentile": {"input": "$o_totalprice",
                                        "p": [0.25, 0.5, 0.75],
                                        "method": "approximate"}},
            "cheap2": {"$bottomN": {"output": "$o_custkey",
                                    "sortBy": {"o_totalprice": -1},
                                    "n": 2}},
        }},
        {"$sort": {"_id": 1}},
    ])
    # scalar-only gate output: quartile array → columns, clerk list → csv
    return out.select(
        "_id",
        F.element_at("price_q", 1).alias("p25"),
        F.element_at("price_q", 2).alias("p50"),
        F.element_at("price_q", 3).alias("p75"),
        F.array_join(
            F.transform("cheap2", lambda x: x.cast("string")), ","
        ).alias("cheap2"),
    )


PIPELINE_PRICE_PCT_SQL = """
WITH sorted AS (
  SELECT o_orderpriority AS _id,
         list(o_totalprice ORDER BY o_totalprice ASC) AS l,
         count(*) AS n
  FROM orders GROUP BY 1
),
pct AS (
  SELECT _id,
         l[greatest(ceil(n * 0.25), 1)::int] AS p25,
         l[greatest(ceil(n * 0.5), 1)::int] AS p50,
         l[greatest(ceil(n * 0.75), 1)::int] AS p75
  FROM sorted
),
ranked AS (
  SELECT o_orderpriority AS _id, o_custkey,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_custkey ASC) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
cheap AS (
  SELECT _id, string_agg(o_custkey::varchar, ',' ORDER BY rn) AS cheap2
  FROM ranked WHERE rn > n - 2 GROUP BY _id
)
SELECT _id, p25, p50, p75, cheap2
FROM pct JOIN cheap USING (_id) ORDER BY _id
"""


def pipeline_event_calculus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$setWindowFields $derivative + $integral (Mongo 5.0 time-series).

    Per user, ordered by ts: velocity = Δvalue/Δseconds since the user's
    first event, and the cumulative trapezoidal integral of the
    (decimal-cast) value series in unit-seconds.  The integral's running
    sum is decimal-exact by construction (Δms · (y+lag y) summed as
    DECIMAL(38,6), one double division by 2·unit at the end); both
    first-row results are null (no Δt yet) in engine and oracle alike.
    """
    events = table(spark, sf_dir, "events")
    out = aggregate(events, [
        {"$addFields": {"vd": {"$toDecimal": "$value"}}},
        {"$setWindowFields": {
            "partitionBy": "$user_id",
            "sortBy": {"ts": 1},
            "output": {
                "vel": {"$derivative": {"input": "$value",
                                        "unit": "second"},
                        "window": {"documents": ["unbounded", "current"]}},
                "cum_integral": {"$integral": {"input": "$vd",
                                               "unit": "second"},
                                 "window": {"documents": ["unbounded",
                                                          "current"]}},
            },
        }},
    ])
    return out.select("user_id", "event_id", "vel", "cum_integral")


PIPELINE_CALCULUS_SQL = """
WITH t AS (
  SELECT user_id, event_id, ts, value,
         epoch_ms(ts) AS ms,
         CAST(value AS DECIMAL(38,6)) AS vd
  FROM events
),
l AS (
  SELECT user_id, event_id, value, ms, ts,
         ms - lag(ms) OVER w AS dt,
         (vd + lag(vd) OVER w) AS ysum,
         first_value(value) OVER wf AS v0,
         first_value(ms) OVER wf AS ms0
  FROM t
  WINDOW w AS (PARTITION BY user_id ORDER BY ts),
         wf AS (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id,
       CASE WHEN ms - ms0 <> 0
            THEN (value - v0)::double / ((ms - ms0)::double / 1000.0)
       END AS vel,
       ((sum((dt * ysum)::decimal(38,6))
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         * 1000000)::decimal(38,0))::double / 2000000000.0
         AS cum_integral
FROM l
"""


def pipeline_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$fill method:"linear" — interpolate nulls between surrounding
    observations on the time axis (Mongo 5.3 time-series gap filling).

    Every 5th event's value is nulled via $cond, then linearly refilled
    per user over ts; leading/trailing nulls stay null.  Interpolation is
    the fixed IEEE shape pv + (nv-pv)·Δ/Δ on epoch-ms — deterministic
    across engines, oracle-replicated with IGNORE NULLS windows.
    """
    events = table(spark, sf_dir, "events")
    out = aggregate(events, [
        {"$addFields": {"v": {"$cond": [
            {"$eq": [{"$mod": ["$event_id", 5]}, 0]}, None, "$value"]}}},
        {"$fill": {"partitionBy": "$user_id", "sortBy": {"ts": 1},
                   "output": {"v": {"method": "linear"}}}},
    ])
    return out.select("user_id", "event_id", "v")


PIPELINE_FILL_LINEAR_SQL = """
WITH base AS (
  SELECT user_id, event_id, ts, epoch_ms(ts) AS k,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
  FROM events
),
w AS (
  SELECT user_id, event_id, v, k,
         last_value(v IGNORE NULLS) OVER wb AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN k END IGNORE NULLS)
           OVER wb AS pk,
         first_value(v IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN k END IGNORE NULLS)
           OVER wf AS nk
  FROM base
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, event_id,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NULL OR nv IS NULL THEN NULL
            ELSE pv + (nv - pv) * ((k - pk)::double / (nk - pk)::double)
       END AS v
FROM w
"""


def pipeline_search_highlights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$search`` ``highlight`` option (Atlas ``searchHighlights``
    meta): hit/text run segmentation of the matched field, flattened to
    one row per segment so every run hash-gates — columns doc_id, seg
    (1-based run index), value (original tokens, case preserved), type
    ('hit'|'text'), n_hits (the passage score).

    Scale: uses the flat segment form (search_highlight_segments) —
    the run boundaries posexplode through a Generate barrier that
    materializes the token/flag arrays as physical attributes, so
    per-segment work is O(segment).  Flattening the nested $meta struct
    instead re-inlines the tokenize subtree into every per-segment
    lambda (Catalyst does no CSE inside lambda bodies): measured 60 s
    vs ~1 s at sf0.1.  Map-only over the matched scan either way.
    """
    from mongo_hadoop_spark.plans.aggpipe import search_highlight_segments

    documents = table(spark, sf_dir, "documents").select("doc_id", "text")
    flat = search_highlight_segments(documents, "text", ["scan", "merge"])
    return flat.select("doc_id", "seg", "value", "type", "n_hits")


PIPELINE_SEARCH_HIGHLIGHTS_SQL = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM documents
),
f AS (
  SELECT doc_id, ws,
         list_transform(ws, w -> lower(w) IN ('scan', 'merge')) AS flags
  FROM t
),
m AS (
  SELECT doc_id, ws, flags,
         list_filter(generate_series(1, len(ws)),
                     i -> i = 1 OR flags[i] != flags[i-1]) AS bounds,
         len(list_filter(flags, x -> x))::bigint AS n_hits
  FROM f
  WHERE len(list_filter(flags, x -> x)) > 0
),
b AS (
  SELECT doc_id, ws, flags, bounds, n_hits,
         list_append(bounds[2:], len(ws) + 1) AS ends
  FROM m
)
SELECT doc_id, k AS seg,
       array_to_string(ws[bounds[k]:ends[k] - 1], ' ') AS value,
       CASE WHEN flags[bounds[k]] THEN 'hit' ELSE 'text' END AS type,
       n_hits
FROM (SELECT *, unnest(generate_series(1, len(bounds))) AS k FROM b)
"""


def pipeline_exp_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$setWindowFields`` ``$expMovingAvg`` (Mongo 5.0): per-user EMA
    of event values, N=3 → α = 1/2 — a dyadic α, so every fold step
    (0.5·x + 0.5·acc) is exact halving and the whole EMA chain is
    bit-reproducible cross-engine.  Sort carries the unique event_id
    tiebreak so the fold order (and hence the oracle hash) is total.

    Scale: one user-keyed shuffle; the collected prefix is per-user-
    sized (bounded group cardinality), the fold row-local.
    """
    events = table(spark, sf_dir, "events")
    return aggregate(events, [
        {"$setWindowFields": {
            "partitionBy": "$user_id",
            "sortBy": {"ts": 1, "event_id": 1},
            "output": {"ema": {"$expMovingAvg": {"input": "$value",
                                                 "N": 3}}},
        }},
        {"$project": {"user_id": 1, "event_id": 1, "value": 1, "ema": 1}},
    ])


PIPELINE_EXP_MOVING_AVG_SQL = """
WITH w AS (
  SELECT user_id, event_id, value,
         -- strip nulls like Spark's collect_list (the stage skips
         -- non-numeric values); an all-null prefix folds to NULL
         list_filter(
           list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW),
           x -> x IS NOT NULL) AS vals
  FROM events
)
SELECT user_id, event_id, value,
       CASE WHEN len(vals) > 0
            THEN list_reduce(vals, (acc, x) -> 0.5e0 * x + 0.5e0 * acc)
       END AS ema
FROM w
"""


def pipeline_search_meta_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$searchMeta`` facet collector (Atlas metadata-only search) over
    the documents matching the text operator 'scan': total count, a
    string facet on lang (top 10 by count desc / _id asc) and a number
    facet on n_chars ([0,150,300,450) + 'other' default), flattened
    from the stage's single metadata document into (facet, _id, count,
    total) rows so every bucket hash-gates.

    Scale: the stage is one matched scan feeding one cardinality-
    bounded aggregate per collector, combined by broadcast scalar
    joins (see _stage_search_meta); the flatten is row-local.
    """
    documents = table(spark, sf_dir, "documents")
    meta = aggregate(documents, [{"$searchMeta": {"facet": {
        "operator": {"text": {"query": "scan", "path": "text"}},
        "facets": {
            "langs": {"type": "string", "path": "lang"},
            "sizes": {"type": "number", "path": "n_chars",
                      "boundaries": [0, 150, 300, 450],
                      "default": "other"},
        }}, "count": {"type": "total"}}}])
    tagged = meta.select(
        F.col("count.total").alias("total"),
        F.explode(F.concat(
            F.transform(
                "facet.langs.buckets",
                lambda s: F.struct(F.lit("langs").alias("facet"),
                                   s["_id"].alias("_id"),
                                   s["count"].alias("count"))),
            F.transform(
                "facet.sizes.buckets",
                lambda s: F.struct(F.lit("sizes").alias("facet"),
                                   s["_id"].alias("_id"),
                                   s["count"].alias("count"))),
        )).alias("b"))
    return tagged.select(F.col("b.facet").alias("facet"),
                         F.col("b._id").alias("_id"),
                         F.col("b.count").alias("count"), "total")


PIPELINE_SEARCH_META_SQL = r"""
WITH matched AS (
  SELECT * FROM documents
  WHERE list_contains(
    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
    'scan')
),
total AS (SELECT count(*)::bigint AS total FROM matched),
langs AS (
  SELECT 'langs' AS facet, lang::varchar AS _id, count(*)::bigint AS count
  FROM matched GROUP BY lang
  ORDER BY count DESC, _id ASC LIMIT 10
),
sizes AS (
  SELECT 'sizes' AS facet,
         CASE WHEN n_chars >= 0 AND n_chars < 150 THEN '0'
              WHEN n_chars >= 150 AND n_chars < 300 THEN '150'
              WHEN n_chars >= 300 AND n_chars < 450 THEN '300'
              ELSE 'other' END AS _id,
         count(*)::bigint AS count
  FROM matched WHERE n_chars IS NOT NULL GROUP BY 2
)
SELECT facet, _id, count, total
FROM (SELECT * FROM langs UNION ALL SELECT * FROM sizes), total
"""


QUERIES = {
    "pipeline_search_highlights": pipeline_search_highlights,
    "pipeline_exp_moving_avg": pipeline_exp_moving_avg,
    "pipeline_search_meta_facets": pipeline_search_meta_facets,
    "pipeline_vector_search": pipeline_vector_search,
    "pipeline_geo_near": pipeline_geo_near,
    "pipeline_geo_center_sphere": pipeline_geo_center_sphere,
    "pipeline_geo_near_sphere": pipeline_geo_near_sphere,
    "pipeline_geo_polygon_sphere": pipeline_geo_polygon_sphere,
    "pipeline_geo_intersects": pipeline_geo_intersects,
    "pipeline_regex_type_report": pipeline_regex_type_report,
    "pipeline_redact_levels": pipeline_redact_levels,
    "pipeline_text_search": pipeline_text_search,
    "pipeline_text_query": pipeline_text_query,
    "pipeline_text_query_diacritics": pipeline_text_query_diacritics,
    "pipeline_array_aggregates": pipeline_array_aggregates,
    "pipeline_lookup_correlated": pipeline_lookup_correlated,
    "pipeline_geo_within": pipeline_geo_within,
    "pipeline_search_wildcard": pipeline_search_wildcard,
    "pipeline_search_fuzzy": pipeline_search_fuzzy,
    "pipeline_match_operators": pipeline_match_operators,
    "pipeline_search_querystring": pipeline_search_querystring,
    "pipeline_search_bm25": pipeline_search_bm25,
    "pipeline_rank_fusion": pipeline_rank_fusion,
    "pipeline_score_fusion": pipeline_score_fusion,
    "pipeline_bitwise_flags": pipeline_bitwise_flags,
    "pipeline_jsonschema_gate": pipeline_jsonschema_gate,
    "pipeline_object_to_array": pipeline_object_to_array,
    "pipeline_top_orders_per_status": pipeline_top_orders_per_status,
    "pipeline_price_percentiles": pipeline_price_percentiles,
    "pipeline_event_calculus": pipeline_event_calculus,
    "pipeline_fill_linear": pipeline_fill_linear,
    "pipeline_status_rollup": pipeline_status_rollup,
    "pipeline_wordcount": pipeline_wordcount,
    "pipeline_lookup_segment": pipeline_lookup_segment,
    "pipeline_sortbycount": pipeline_sortbycount,
    "pipeline_bucket_order_values": pipeline_bucket_order_values,
    "pipeline_bucket_auto_quartiles": pipeline_bucket_auto_quartiles,
    "pipeline_bucket_auto_granularity": pipeline_bucket_auto_granularity,
    "pipeline_bucket_auto_quartiles_approx":
        pipeline_bucket_auto_quartiles_approx,
    "pipeline_bucket_auto_granularity_approx":
        pipeline_bucket_auto_granularity_approx,
    "pipeline_percentile_approx": pipeline_percentile_approx,
    "pipeline_window_fields": pipeline_window_fields,
    "pipeline_window_percentiles": pipeline_window_percentiles,
    "pipeline_window_percentiles_approx": pipeline_window_percentiles_approx,
    "pipeline_datediff_weekstarts": pipeline_datediff_weekstarts,
    "pipeline_window_range_frames": pipeline_window_range_frames,
    "pipeline_densify_user_counts": pipeline_densify_user_counts,
    "pipeline_densify_monthly": pipeline_densify_monthly,
    "pipeline_densify_quarterly": pipeline_densify_quarterly,
    "pipeline_window_top_orders": pipeline_window_top_orders,
    "pipeline_graphlookup_reports": pipeline_graphlookup_reports,
    "pipeline_graphlookup_unbounded": pipeline_graphlookup_unbounded,
    "pipeline_merge_objects_rollup": pipeline_merge_objects_rollup,
    "pipeline_lookup_uncorrelated": pipeline_lookup_uncorrelated,
    "pipeline_dotted_paths": pipeline_dotted_paths,
}

ORACLES = {
    "pipeline_search_highlights": PIPELINE_SEARCH_HIGHLIGHTS_SQL,
    "pipeline_exp_moving_avg": PIPELINE_EXP_MOVING_AVG_SQL,
    "pipeline_search_meta_facets": PIPELINE_SEARCH_META_SQL,
    "pipeline_vector_search": PIPELINE_VECTOR_SEARCH_SQL,
    "pipeline_geo_near": PIPELINE_GEO_NEAR_SQL,
    "pipeline_geo_center_sphere": _geo_center_sphere_sql(),
    "pipeline_geo_near_sphere": _geo_near_sphere_sql(),
    "pipeline_geo_polygon_sphere": _geo_polygon_sphere_sql(),
    "pipeline_geo_intersects": _geo_intersects_sql(),
    "pipeline_regex_type_report": PIPELINE_REGEX_TYPE_SQL,
    "pipeline_redact_levels": PIPELINE_REDACT_SQL,
    "pipeline_text_search": PIPELINE_TEXT_SEARCH_SQL,
    "pipeline_text_query": PIPELINE_TEXT_QUERY_SQL,
    "pipeline_text_query_diacritics": _text_query_diacritics_sql(),
    "pipeline_array_aggregates": PIPELINE_ARRAY_AGGREGATES_SQL,
    "pipeline_lookup_correlated": PIPELINE_LOOKUP_CORRELATED_SQL,
    "pipeline_geo_within": PIPELINE_GEO_WITHIN_SQL,
    "pipeline_search_wildcard": PIPELINE_SEARCH_WILDCARD_SQL,
    "pipeline_search_fuzzy": PIPELINE_SEARCH_FUZZY_SQL,
    "pipeline_match_operators": PIPELINE_MATCH_OPS_SQL,
    "pipeline_search_querystring": PIPELINE_SEARCH_QUERYSTRING_SQL,
    "pipeline_search_bm25": PIPELINE_SEARCH_BM25_SQL,
    "pipeline_rank_fusion": PIPELINE_RANK_FUSION_SQL,
    "pipeline_score_fusion": PIPELINE_SCORE_FUSION_SQL,
    "pipeline_bitwise_flags": PIPELINE_BITWISE_SQL,
    "pipeline_jsonschema_gate": PIPELINE_JSONSCHEMA_SQL,
    "pipeline_object_to_array": PIPELINE_OBJ_ARRAY_SQL,
    "pipeline_top_orders_per_status": PIPELINE_TOP_ORDERS_SQL,
    "pipeline_price_percentiles": PIPELINE_PRICE_PCT_SQL,
    "pipeline_event_calculus": PIPELINE_CALCULUS_SQL,
    "pipeline_fill_linear": PIPELINE_FILL_LINEAR_SQL,
    "pipeline_status_rollup": PIPELINE_STATUS_SQL,
    "pipeline_wordcount": PIPELINE_WORDCOUNT_SQL,
    "pipeline_lookup_segment": PIPELINE_LOOKUP_SQL,
    "pipeline_sortbycount": PIPELINE_SORTBYCOUNT_SQL,
    "pipeline_bucket_order_values": PIPELINE_BUCKET_SQL,
    "pipeline_bucket_auto_quartiles": PIPELINE_BUCKET_AUTO_SQL,
    "pipeline_bucket_auto_granularity": _bucket_auto_granularity_sql(),
    # *_approx gates share the exact oracles: rank-exact by the GK
    # ε·N < 1/2 bound at verification SF (see GATE_PCTL_ACCURACY)
    "pipeline_bucket_auto_quartiles_approx": PIPELINE_BUCKET_AUTO_SQL,
    "pipeline_bucket_auto_granularity_approx":
        _bucket_auto_granularity_sql(),
    "pipeline_percentile_approx": PIPELINE_PCTL_APPROX_SQL,
    "pipeline_window_fields": PIPELINE_WINDOW_SQL,
    "pipeline_window_percentiles": PIPELINE_WINDOW_PCTL_SQL,
    "pipeline_window_percentiles_approx": PIPELINE_WINDOW_PCTL_SQL,
    "pipeline_datediff_weekstarts": PIPELINE_DATEDIFF_WEEKSTARTS_SQL,
    "pipeline_window_range_frames": PIPELINE_WINDOW_RANGE_SQL,
    "pipeline_densify_user_counts": PIPELINE_DENSIFY_SQL,
    "pipeline_densify_monthly": PIPELINE_DENSIFY_MONTHLY_SQL,
    "pipeline_densify_quarterly": PIPELINE_DENSIFY_QUARTERLY_SQL,
    "pipeline_window_top_orders": PIPELINE_WINDOW_TOP_ORDERS_SQL,
    "pipeline_graphlookup_reports": PIPELINE_GRAPH_SQL,
    "pipeline_graphlookup_unbounded": PIPELINE_GRAPH_UNBOUNDED_SQL,
    "pipeline_merge_objects_rollup": PIPELINE_MERGE_OBJECTS_SQL,
    "pipeline_lookup_uncorrelated": PIPELINE_LOOKUP_UNCORRELATED_SQL,
    "pipeline_dotted_paths": PIPELINE_DOTTED_PATHS_SQL,
}
