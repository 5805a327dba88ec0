"""Third relational wave: outer joins, correlated-aggregate joins,
disjunctive predicate pushdown, and view-style having-max — TPC-H q13 /
q15 / q17 / q19 shapes adapted to the synthetic schema.

All decimal-exact; tie-breaks deterministic; oracles bit-exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mongo_hadoop_spark.functions import dec_to_double
from mongo_hadoop_spark.session import table


def _dec(col, p: int = 12, s: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer join, filtered)
# ---------------------------------------------------------------------------

def tpch_q13_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY 1
) GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by revenue (view + having max)
# ---------------------------------------------------------------------------

def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    revenue = (
        li.groupBy("l_suppkey")
        .agg(F.sum(rev).alias("total_rev_dec"))
    )
    max_rev = revenue.agg(F.max("total_rev_dec").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_rev_dec") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            dec_to_double(F.col("total_rev_dec")).alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey, sum(l_extendedprice::decimal(12,2)
         * (1::decimal(12,2) - l_discount::decimal(12,2))) AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, (trunc(total_rev_dec)::bigint::double + (((total_rev_dec % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_dec = (SELECT max(total_rev_dec) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue vs per-part average (correlated agg join)
# ---------------------------------------------------------------------------

def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    per_part_avg = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg((dec_to_double(F.sum(_dec("l_quantity")))
              / F.count(F.lit(1)) * 0.5).alias("half_avg_qty"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (dec_to_double(F.sum(_dec("l_extendedprice"))) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         (trunc(sum(l_quantity::decimal(12,2)))::bigint::double + (((sum(l_quantity::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) / count(*) * 0.5 AS half_avg_qty
  FROM lineitem GROUP BY 1
)
SELECT (trunc(sum(l_extendedprice::decimal(12,2)))::bigint::double + (((sum(l_extendedprice::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) / 7.0 AS avg_yearly,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = pk
WHERE p_brand = 'Brand#1' AND l_quantity < half_avg_qty
"""


# ---------------------------------------------------------------------------
# Q19 — disjunctive multi-predicate revenue (OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------

def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_type") == "PROMO") & (F.col("p_size") <= 15)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(dec_to_double(F.sum(rev)).alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


Q19_SQL = """
SELECT (trunc(sum(l_extendedprice::decimal(12,2)
           * (1::decimal(12,2) - l_discount::decimal(12,2))))::bigint::double + (((sum(l_extendedprice::decimal(12,2)
           * (1::decimal(12,2) - l_discount::decimal(12,2))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_type = 'PROMO' AND p_size <= 15 AND l_quantity BETWEEN 20 AND 40)
"""


QUERIES = {
    "tpch_q13_distribution": tpch_q13_distribution,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q17_small_quantity": tpch_q17_small_quantity,
    "tpch_q19_disjunctive": tpch_q19_disjunctive,
}

ORACLES = {
    "tpch_q13_distribution": Q13_SQL,
    "tpch_q15_top_supplier": Q15_SQL,
    "tpch_q17_small_quantity": Q17_SQL,
    "tpch_q19_disjunctive": Q19_SQL,
}
