"""Fourth relational wave — the remaining classic TPC-H shapes adapted to
the synthetic schema: cross-nation volume (q7), profit rollup (q9),
multi-exists suppliers-who-kept-waiting (q21), and value-share ranking
(q11).  (q2/q16/q20 live in relational5.py, over a partsupp relation
derived from lineitem's distinct supplier/part pairs.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mongo_hadoop_spark.functions import dec_to_double
from mongo_hadoop_spark.session import table


def _dec(col, p: int = 12, s: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")



def _rev():
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))


# ---------------------------------------------------------------------------
# Q7 — volume between two nations by year (supp nation ↔ cust nation)
# ---------------------------------------------------------------------------

def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("ck"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dec_to_double(F.sum(_rev())).alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       (trunc(sum(l_extendedprice::decimal(12,2)
           * (1::decimal(12,2) - l_discount::decimal(12,2))))::bigint::double + (((sum(l_extendedprice::decimal(12,2)
           * (1::decimal(12,2) - l_discount::decimal(12,2))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q9 — profit by supplier nation and year (cost modeled from part price)
# ---------------------------------------------------------------------------

def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    amount = _rev() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("p_name").contains("a"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(dec_to_double(F.sum(amount)).alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       (trunc(sum(l_extendedprice::decimal(12,2)
             * (1::decimal(12,2) - l_discount::decimal(12,2))
           - p_retailprice::decimal(12,2) * l_quantity::decimal(12,2)))::bigint::double + (((sum(l_extendedprice::decimal(12,2)
             * (1::decimal(12,2) - l_discount::decimal(12,2))
           - p_retailprice::decimal(12,2) * l_quantity::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0)
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%a%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers with multi-line orders where ONLY they shipped late
# (EXISTS other supplier on order ∧ NOT EXISTS other late supplier)
# ---------------------------------------------------------------------------

LATE = "2000-01-01"


def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    late = li.where(F.col("l_shipdate") >= F.lit(LATE).cast("timestamp"))
    l1 = late.alias("l1")
    l2 = li.alias("l2")
    l3 = late.alias("l3")
    # exists another supplier on the same order
    has_other = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    # ...but no OTHER supplier was late on that order
    only_late = has_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        only_late.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = f"""
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_shipdate >= TIMESTAMP '{LATE}'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate >= TIMESTAMP '{LATE}')
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q11-style — part value share: parts whose lineitem value exceeds a
# fraction of the total (scalar aggregate reuse, no collect)
# ---------------------------------------------------------------------------

# scale-robust threshold: 1.5× the mean per-part value (a fixed fraction
# of the total would go empty as the part count grows with scale factor)
SHARE_MULTIPLE = 1.5


def tpch_q11_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    value = _dec("l_extendedprice") * _dec("l_quantity")
    per_part = li.groupBy("l_partkey").agg(F.sum(value).alias("part_value_dec"))
    total = per_part.agg(
        dec_to_double(F.sum("part_value_dec")).alias("total_value"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value_dec").cast("double")
               > F.col("total_value") / F.col("n_parts") * SHARE_MULTIPLE)
        .select("l_partkey", F.col("part_value_dec").cast("double").alias("part_value"))
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         sum(l_extendedprice::decimal(12,2) * l_quantity::decimal(12,2)) AS part_value_dec
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT (trunc(sum(part_value_dec))::bigint::double + (((sum(part_value_dec) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS total_value, count(*) AS n_parts FROM per_part
)
SELECT l_partkey, part_value_dec::double AS part_value
FROM per_part, tot
WHERE part_value_dec::double > total_value / n_parts * {SHARE_MULTIPLE}
"""


# ---------------------------------------------------------------------------
# Q8-style — market share of one supplier nation inside a region, by year.
# 7-table join (the widest shape in the suite) with a conditional share:
# both sums are exact decimal aggregates converted to double only at the
# final division, so the ratio is bit-stable across engines.  Region,
# nation, part, supplier are all broadcast — at 100 TB only lineitem,
# orders and customer shuffle, and AQE picks the join order inside that
# core.
# ---------------------------------------------------------------------------

MKT_REGION = "ASIA"
MKT_NATION = "NATION_1"
MKT_PTYPE = "ECONOMY"


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == MKT_PTYPE)
    r = table(spark, sf_dir, "region").where(F.col("r_name") == MKT_REGION)
    n_cust = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    n_supp = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    rev = _rev()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(r), F.col("crk") == r.r_regionkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("snk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (dec_to_double(F.sum(F.when(F.col("supp_nation") == MKT_NATION, rev)))
             / dec_to_double(F.sum(rev))).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q8_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       (trunc(sum(CASE WHEN n2.n_name = '{MKT_NATION}'
                THEN l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2)) END))::bigint::double + (((sum(CASE WHEN n2.n_name = '{MKT_NATION}'
                THEN l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2)) END) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0)
         / (trunc(sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))))::bigint::double + (((sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0)
         AS mkt_share,
       count(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = '{MKT_PTYPE}' AND r_name = '{MKT_REGION}'
GROUP BY 1
"""


QUERIES = {
    "tpch_q7_nation_volume": tpch_q7_nation_volume,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q9_profit": tpch_q9_profit,
    "tpch_q21_waiting_supplier": tpch_q21_waiting_supplier,
    "tpch_q11_value_share": tpch_q11_value_share,
}

ORACLES = {
    "tpch_q7_nation_volume": Q7_SQL,
    "tpch_q8_market_share": Q8_SQL,
    "tpch_q9_profit": Q9_SQL,
    "tpch_q21_waiting_supplier": Q21_SQL,
    "tpch_q11_value_share": Q11_SQL,
}
