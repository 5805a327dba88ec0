"""Fifth relational wave — the last classic TPC-H shapes, adapted to the
synthetic schema by *deriving* a partsupp relation from the distinct
``(l_partkey, l_suppkey)`` pairs in lineitem (the schema ships no partsupp
table; the pairs carry identical join semantics).

Shapes covered here and nowhere else in the gate:

- q2  — correlated scalar MIN subquery per group (decorrelated to a single
        window-min pass on the Spark side; the oracle keeps the authentic
        correlated form and lets DuckDB decorrelate it);
- q16 — NOT IN subquery (null-free anti-join) + COUNT(DISTINCT) per
        multi-attribute group;
- q20 — IN subquery over a HAVING-filtered aggregate (semi-join against a
        derived aggregate with a scale-robust threshold).

Reference parity note: the reference connector has no joins of its own
(SURVEY §2.4, `examples/treasury_yield/.../TestStandalone.java:79-95` models
multi-input as union+reduce); these shapes exercise the host-engine surface
the connector was built to feed, exactly as Hive/Pig would have issued them.

Scale posture (100 TB): the derived partsupp distinct is one shuffle on the
pair key; part/supplier/nation/region are broadcast (dims); q2's min is a
window over the same partitioning as the preceding join key, q20's
threshold is a broadcast scalar — no driver-side collect anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mongo_hadoop_spark.functions import dec_to_double
from mongo_hadoop_spark.session import table


def _dec(col, p: int = 12, s: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp: distinct supplier/part pairs that ever shipped."""
    return (table(spark, sf_dir, "lineitem")
            .select("l_partkey", "l_suppkey").distinct())


# ---------------------------------------------------------------------------
# Q2 — cheapest-supplier-per-part in a region (min s_acctbal stands in for
# min ps_supplycost, which the schema lacks)
# ---------------------------------------------------------------------------

Q2_REGION = "EUROPE"
Q2_MAX_SIZE = 15


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    p = (table(spark, sf_dir, "part")
         .where(F.col("p_size") <= Q2_MAX_SIZE)
         .select("p_partkey"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = (table(spark, sf_dir, "region")
         .where(F.col("r_name") == Q2_REGION))
    cand = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "s_name", "s_acctbal", "n_name")
    )
    # decorrelated form of `WHERE s_acctbal = (SELECT min(...) ... same part)`:
    # one window pass, partitioned on the join key we already shuffled by
    w = Window.partitionBy("p_partkey")
    return (cand.withColumn("min_bal", F.min("s_acctbal").over(w))
            .where(F.col("s_acctbal") == F.col("min_bal"))
            .drop("min_bal"))


Q2_SQL = f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p_partkey, s_name, s_acctbal, n_name
  FROM ps
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}' AND p_size <= {Q2_MAX_SIZE}
)
SELECT p_partkey, s_name, s_acctbal, n_name
FROM cand c1
WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
                   WHERE c2.p_partkey = c1.p_partkey)
"""


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part attribute group, excluding complained-
# about suppliers via NOT IN
# ---------------------------------------------------------------------------

Q16_EXCLUDED_BRAND = "Brand#13"
Q16_SIZES = (3, 9, 10, 16, 24, 29, 36, 45)
Q16_BAD_SUPPLIER_PATTERN = "%7"  # s_name suffix


def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _partsupp(spark, sf_dir)
    p = (table(spark, sf_dir, "part")
         .where((F.col("p_brand") != Q16_EXCLUDED_BRAND)
                & F.col("p_size").isin(*Q16_SIZES))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (table(spark, sf_dir, "supplier")
           .where(F.col("s_name").endswith(Q16_BAD_SUPPLIER_PATTERN[1:]))
           .select("s_suppkey"))
    # NOT IN over a null-free key == left anti join (s_suppkey is never null)
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCLUDED_BRAND}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_name LIKE '{Q16_BAD_SUPPLIER_PATTERN}')
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess shipped volume of promo-ish parts
# ---------------------------------------------------------------------------

Q20_SHIP_LO = "1997-01-01"
Q20_SHIP_HI = "1999-01-01"
# scale-robust threshold: 1.5× the mean per-(supplier,part) shipped quantity
# (a fixed constant would saturate as group sizes grow with scale factor)
Q20_MULTIPLE = 1.5


def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = (table(spark, sf_dir, "part")
         .where(F.col("p_name").contains("a"))
         .select("p_partkey"))
    s = table(spark, sf_dir, "supplier")
    shipped = (
        li.where((F.col("l_shipdate") >= F.lit(Q20_SHIP_LO).cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit(Q20_SHIP_HI).cast("timestamp")))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
    )
    # exact-decimal mean, cast to double only at the comparison (bit-identical
    # across engines and partitionings)
    thresh = shipped.agg(
        (dec_to_double(F.sum("qty_dec")) / F.count(F.lit(1))).alias("mean_qty"))
    qual = (shipped.crossJoin(F.broadcast(thresh))
            .where(F.col("qty_dec").cast("double")
                   > F.col("mean_qty") * Q20_MULTIPLE)
            .select("l_suppkey").distinct())
    return (s.join(F.broadcast(qual), s.s_suppkey == qual.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name", "s_acctbal"))


Q20_SQL = f"""
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         sum(l_quantity::decimal(12,2)) AS qty_dec
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%a%'
    AND l_shipdate >= TIMESTAMP '{Q20_SHIP_LO}'
    AND l_shipdate < TIMESTAMP '{Q20_SHIP_HI}'
  GROUP BY 1, 2
), thresh AS (
  SELECT sum(qty_dec)::double / count(*) AS mean_qty FROM shipped
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM shipped, thresh
                    WHERE qty_dec::double > mean_qty * {Q20_MULTIPLE})
"""


QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q16_supplier_cnt": tpch_q16_supplier_cnt,
    "tpch_q20_excess_suppliers": tpch_q20_excess_suppliers,
}

ORACLES = {
    "tpch_q2_min_cost_supplier": Q2_SQL,
    "tpch_q16_supplier_cnt": Q16_SQL,
    "tpch_q20_excess_suppliers": Q20_SQL,
}
