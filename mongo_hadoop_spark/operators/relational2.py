"""Second wave of relational coverage: semi/anti joins, grouping sets,
distinct aggregation, multi-collection golden semantics, and the
grouped-map (applyInPandas) reducer surface.

Reference hooks:
- Treasury "doubled" outputs: a union of two copies of the collection
  doubles count/sum but leaves avg invariant
  (examples/treasury_yield/src/test/java/com/mongodb/hadoop/
   TreasuryTest.compareDoubled:100-116, TestStandalone.java:79-95).
- Hadoop Streaming reducer: arbitrary per-key reduce over grouped docs
  (streaming/language_support/python/pymongo_hadoop/reducer.py:108-124) —
  Spark-native: ``groupBy(key).applyInPandas`` (Arrow-batched, A6/T2).
- Semi/anti joins and grouping sets are "free in Spark" (SURVEY §2.4,
  §2.5) — these queries prove them against the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mongo_hadoop_spark.functions import dec_to_double
from mongo_hadoop_spark.session import table


def _dec(col, p: int = 12, s: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# TPC-H Q4-style — semi join: orders with at least one late lineitem
# ---------------------------------------------------------------------------

def tpch_q4_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q22-style — anti join: above-average-balance customers with no
# URGENT orders (condition chosen so the synthetic data yields rows)
# ---------------------------------------------------------------------------

def tpch_q22_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    # scalar subquery as a broadcast 1-row join — no driver-side collect
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg((dec_to_double(F.sum(_dec("c_acctbal")))
              / F.count(F.lit(1))).alias("avg_bal"))
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .drop("avg_bal")
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_to_double(F.sum(_dec("c_acctbal"))).alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT c_mktsegment, count(*) AS numcust,
       (trunc(sum(c_acctbal::decimal(12,2)))::bigint::double + (((sum(c_acctbal::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT (trunc(sum(c_acctbal::decimal(12,2)))::bigint::double + (((sum(c_acctbal::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Cube aggregation (grouping sets beyond rollup)
# ---------------------------------------------------------------------------

def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# TPC-H Q16-style — distinct aggregation: supplier variety per part type
# ---------------------------------------------------------------------------

def count_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_type, p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Treasury "doubled": union of two copies — count/sum double, avg invariant
# ---------------------------------------------------------------------------

def treasury_doubled(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    both = o.unionByName(o)  # two "collections" with identical content (S8)
    cnt = F.count(F.lit(1))
    return both.groupBy(F.year("o_orderdate").alias("yr")).agg(
        cnt.alias("cnt"),
        dec_to_double(F.sum(_dec("o_totalprice"))).alias("sum_price"),
        (dec_to_double(F.sum(_dec("o_totalprice"))) / cnt).alias("avg_price"),
    )


DOUBLED_SQL = """
SELECT year(o_orderdate) AS yr, count(*) AS cnt,
       (trunc(sum(o_totalprice::decimal(12,2)))::bigint::double + (((sum(o_totalprice::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS sum_price,
       (trunc(sum(o_totalprice::decimal(12,2)))::bigint::double + (((sum(o_totalprice::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) / count(*) AS avg_price
FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Grouped-map reducer (A6/T2): per-user robust stats via applyInPandas
# ---------------------------------------------------------------------------

_REDUCE_SCHEMA = (
    "user_id long, n long, median_value double, iqr double"
)


def _lerp_quantile(v: list, q: float) -> float:
    """Linear-interpolated quantile with the exact formula mirrored in the
    oracle SQL: v[lo] + (v[hi]-v[lo]) * frac — numpy's np.quantile uses a
    different lerp arrangement that can differ in the last ulp, so this is
    computed by hand for bit-parity."""
    import math

    pos = (len(v) - 1) * q
    lo = math.floor(pos)
    hi = math.ceil(pos)
    frac = pos - lo
    a, b = v[lo], v[hi]
    return a + (b - a) * frac


def _user_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    v = sorted(pdf["value"].tolist())
    med = _lerp_quantile(v, 0.5)
    iqr = _lerp_quantile(v, 0.75) - _lerp_quantile(v, 0.25)
    return pd.DataFrame({
        "user_id": [pdf["user_id"].iloc[0]],
        "n": [len(v)],
        "median_value": [med],
        "iqr": [iqr],
    })


def _reduce_rows(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reduce complete, value-sorted groups of (user_id, value) rows."""
    out = []
    for uid, s in pdf.groupby("user_id", sort=False)["value"]:
        v = s.tolist()
        med = _lerp_quantile(v, 0.5)
        iqr = _lerp_quantile(v, 0.75) - _lerp_quantile(v, 0.25)
        out.append((uid, len(v), med, iqr))
    return pd.DataFrame(out, columns=["user_id", "n", "median_value", "iqr"])


def _streaming_reducer(batches):
    """itertools.groupby-style streaming reduce over a key-sorted partition
    stream — the direct analog of the reference's reducer protocol
    (streaming/language_support/python/pymongo_hadoop/reducer.py:108-124),
    which groups a sorted record stream by ``_id``.  Arrow batches split
    groups arbitrarily, so the last (possibly incomplete) group of each
    batch is carried into the next; everything before it is complete and
    reduced batch-at-a-time.  No per-group Arrow exchange — one pandas
    groupby per ~10k-row batch."""
    carry = None
    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        if not len(pdf):
            continue
        last = pdf["user_id"].iloc[-1]
        boundary = pdf["user_id"].values == last
        carry = pdf[boundary]
        done = pdf[~boundary]
        if len(done):
            yield _reduce_rows(done)
    if carry is not None and len(carry):
        yield _reduce_rows(carry)


def grouped_reducer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hadoop-Streaming reducer surface, Spark-native: arbitrary
    Python per-key reduce over a key-grouped, key-sorted stream.

    Shape: hash-repartition on the key (shuffle — groups land whole in one
    partition), JVM-side sort within partitions by (key, value), then one
    ``mapInPandas`` pass with group-boundary carry.  Sorting by value
    JVM-side means the Python side never sorts; quantiles read the
    already-ordered runs, matching the oracle's ``list(value ORDER BY
    value)`` exactly.  At 100 TB this is the scalable reducer shape: cost
    is one shuffle plus a linear scan, with no per-group Arrow round-trip
    (cf. ``grouped_reducer_stats_grouped_map`` for the per-group API)."""
    e = table(spark, sf_dir, "events")
    return (
        e.select("user_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "value")
        .mapInPandas(_streaming_reducer, _REDUCE_SCHEMA)
    )


def grouped_reducer_stats_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same reduce via ``groupBy().applyInPandas`` (grouped-map API) —
    semantically identical, one Arrow exchange per group; kept as the
    API-parity variant and cross-checked against the streaming form."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(_user_stats, _REDUCE_SCHEMA)


def _q_sql(q: str) -> str:
    """DuckDB fragment computing the same lerp quantile over sorted list l
    (1-based indexing)."""
    return (
        f"(l[(floor((len(l)-1) * {q}))::int + 1]"
        f" + (l[(ceil((len(l)-1) * {q}))::int + 1]"
        f"    - l[(floor((len(l)-1) * {q}))::int + 1])"
        f"   * (((len(l)-1) * {q}) - floor((len(l)-1) * {q})))"
    )


REDUCER_SQL = f"""
WITH g AS (
  SELECT user_id, count(*) AS n, list(value ORDER BY value) AS l
  FROM events GROUP BY 1
)
SELECT user_id, n,
       {_q_sql('0.5')} AS median_value,
       ({_q_sql('0.75')} - {_q_sql('0.25')}) AS iqr
FROM g
"""


# ---------------------------------------------------------------------------
# U9 — JSON ⇄ struct bridging round-trip on the props column
# ---------------------------------------------------------------------------

def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    rebuilt = F.concat(F.lit('{"k": '), k.cast("string"), F.lit("}"))
    return e.select("event_id", k.alias("k"), rebuilt.alias("props_rebuilt"))


JSON_RT_SQL = """
SELECT event_id, json_extract_string(props, '$.k')::bigint AS k,
       '{"k": ' || json_extract_string(props, '$.k')::bigint || '}' AS props_rebuilt
FROM events
"""


# ---------------------------------------------------------------------------
# O4 — custom sort comparator: order by a computed expression
# ---------------------------------------------------------------------------

def custom_sort_comparator(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "n_chars")
        .orderBy((F.col("n_chars") % 7).asc(), F.col("doc_id").desc())
        .limit(50)
    )


CUSTOM_SORT_SQL = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars % 7 ASC, doc_id DESC LIMIT 50
"""


QUERIES = {
    "json_roundtrip": json_roundtrip,
    "custom_sort_comparator": custom_sort_comparator,
    "tpch_q4_semijoin": tpch_q4_semijoin,
    "tpch_q22_antijoin": tpch_q22_antijoin,
    "cube_agg": cube_agg,
    "count_distinct_suppliers": count_distinct_suppliers,
    "treasury_doubled": treasury_doubled,
    "grouped_reducer_stats": grouped_reducer_stats,
}

ORACLES = {
    "json_roundtrip": JSON_RT_SQL,
    "custom_sort_comparator": CUSTOM_SORT_SQL,
    "tpch_q4_semijoin": Q4_SQL,
    "tpch_q22_antijoin": Q22_SQL,
    "cube_agg": CUBE_SQL,
    "count_distinct_suppliers": Q16_SQL,
    "treasury_doubled": DOUBLED_SQL,
    "grouped_reducer_stats": REDUCER_SQL,
}
