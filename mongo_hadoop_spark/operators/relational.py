"""Reference-parity relational jobs + TPC-H-style analytics.

Reference jobs reproduced (SURVEY §2.5, §2.1):
- A1/A2 treasury avg-by-year (+ upsert-doc emission)
  (examples/treasury_yield/.../TreasuryYieldMapper.java:47-52,
   TreasuryYieldUpdateReducer.java:46-80)
- A3 enron pair counting (examples/enron/.../EnronMailMapper.java:26-62)
- A4 sensors log rollup with $inc update docs
  (examples/sensors/.../LogReducer.java)
- A5 shakespeare frequent-short-token counting
  (examples/shakespeare/.../Shakespeare.java)
- S6/U8 GridFS-style regex tokenization
  (core/.../GridFSInputFormat.java:252-281)
- S8 multi-collection union (core/.../splitter/MultiMongoCollectionSplitter.java)
- Hive pushdown conjunction semantics
  (hive/.../input/HiveMongoInputFormat.java:102-123; HiveQueryTest.java:33-61)
- F3/F4 sort/limit/skip (core/.../input/MongoInputSplit.java:281-296)
- S2 dotted-path key extraction (core/.../util/MongoPathRetriever.java:23-50)
- U2 ObjectId→seconds (pig/.../udf/ObjectIdToSeconds.java:17-38)

TPC-H-style queries exercise joins/aggregation at scale; Catalyst picks
broadcast vs sort-merge joins (small dims region/nation/supplier are
broadcast), AQE coalesces post-shuffle partitions.  All monetary math is
decimal-exact then cast to double for oracle parity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mongo_hadoop_spark.functions import (
    dec_to_double,
    make_object_id,
    md5_long_sql,
    object_id_to_seconds,
    tokenize,
)
from mongo_hadoop_spark.session import spread, table


def _dec(col, p: int = 12, s: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# A1 — treasury avg-by-year (orders as the dated/valued collection)
# ---------------------------------------------------------------------------

def a1_avg_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dec_to_double(F.sum(_dec("o_totalprice"))).alias("sum_price"),
            (dec_to_double(F.sum(_dec("o_totalprice"))) / F.count(F.lit(1))).alias("avg_price"),
        )
    )


A1_SQL = """
SELECT year(o_orderdate) AS yr,
       count(*) AS cnt,
       (trunc(sum(o_totalprice::decimal(12,2)))::bigint::double + (((sum(o_totalprice::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS sum_price,
       (trunc(sum(o_totalprice::decimal(12,2)))::bigint::double + (((sum(o_totalprice::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) / count(*) AS avg_price
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A2 — treasury upsert-aggregate: emit per-year *update documents*
# ($set counters + $inc), integer-only payload for cross-engine stability
# ---------------------------------------------------------------------------

def a2_upsert_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    agg = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.sum(_dec("o_totalprice")) * 100).cast("long").alias("sum_cents"),
    )
    update_doc = F.concat(
        F.lit('{"$set": {"count": '), F.col("cnt").cast("string"),
        F.lit(', "sum_cents": '), F.col("sum_cents").cast("string"),
        F.lit('}, "$inc": {"numCalculations": 1}}'),
    )
    return agg.select("yr", "cnt", "sum_cents", update_doc.alias("update_doc"))


A2_SQL = """
WITH agg AS (
  SELECT year(o_orderdate) AS yr, count(*) AS cnt,
         (sum(o_totalprice::decimal(12,2)) * 100)::bigint AS sum_cents
  FROM orders GROUP BY 1
)
SELECT yr, cnt, sum_cents,
       '{"$set": {"count": ' || cnt || ', "sum_cents": ' || sum_cents ||
       '}, "$inc": {"numCalculations": 1}}' AS update_doc
FROM agg
"""


# ---------------------------------------------------------------------------
# A3 — pair counting: explode tokens, count (source, token) pairs
# ---------------------------------------------------------------------------

def a3_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select("source", F.explode(tokenize("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


A3_SQL = r"""
SELECT source, t.token AS token, count(*) AS cnt
FROM documents,
     unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t(token)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# A4 — device log rollup: count per user, emit $inc update docs
# ---------------------------------------------------------------------------

def a4_log_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    agg = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("logs_count"))
    inc_doc = F.concat(
        F.lit('{"$inc": {"logs_count": '), F.col("logs_count").cast("string"), F.lit("}}")
    )
    return agg.select("user_id", "logs_count", inc_doc.alias("inc_doc"))


A4_SQL = """
SELECT user_id, count(*) AS logs_count,
       '{"$inc": {"logs_count": ' || count(*) || '}}' AS inc_doc
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A5 — frequent short tokens (shakespeare exclamations analog:
# ≤3-word phrases occurring ≥5 times; here ≤3-char tokens ≥5 times)
# ---------------------------------------------------------------------------

def a5_frequent_short_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokenize("text")).alias("token"))
        .where(F.length("token") <= 3)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .where(F.col("occurrences") >= 5)
    )


A5_SQL = r"""
SELECT t.token AS token, count(*) AS occurrences
FROM documents,
     unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t(token)
WHERE length(t.token) <= 3
GROUP BY 1 HAVING count(*) >= 5
"""


# ---------------------------------------------------------------------------
# S6 — GridFS-style tokenization stats per file/document
# ---------------------------------------------------------------------------

def s6_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = tokenize("text")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


S6_SQL = r"""
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
       len(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))) AS n_distinct
FROM documents
"""


# ---------------------------------------------------------------------------
# S8 — multi-collection union: two filtered reads union'd then aggregated
# ---------------------------------------------------------------------------

def s8_multi_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    part_f = o.where(F.col("o_orderstatus") == "F")
    part_o = o.where(F.col("o_orderstatus") == "O")
    return (
        part_f.unionByName(part_o)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"),
             dec_to_double(F.sum(_dec("o_totalprice"))).alias("total"))
    )


S8_SQL = """
SELECT o_orderpriority, count(*) AS cnt,
       (trunc(sum(o_totalprice::decimal(12,2)))::bigint::double + (((sum(o_totalprice::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS total
FROM (
  SELECT * FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT * FROM orders WHERE o_orderstatus = 'O'
) GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Hive pushdown conjunction: user filter AND'd with static table query
# (HiveMongoInputFormat.java:102-123 $and merge; HiveQueryTest row counts)
# ---------------------------------------------------------------------------

def hive_pushdown_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # static "table query" {l_linenumber: 1} AND pushed predicate l_quantity > 20
    return (
        li.where((F.col("l_linenumber") == 1) & (F.col("l_quantity") > 20))
        .agg(F.count(F.lit(1)).alias("matching_rows"))
    )


HIVE_PD_SQL = """
SELECT count(*) AS matching_rows FROM lineitem
WHERE l_linenumber = 1 AND l_quantity > 20
"""


# ---------------------------------------------------------------------------
# F3/O3 — global sort + limit with deterministic tiebreak
# ---------------------------------------------------------------------------

def f3_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


F3_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# F4 — skip/limit pagination (MongoInputSplit.java:291-296 skip/limit cursor
# modifiers).  ``offset(skip).limit(n)`` plans as a single
# TakeOrderedAndProject(limit=skip+n, offset=skip): each task keeps its local
# top-(skip+n) and only those rows reach the driver — no global-window
# single-task sort, so the plan survives arbitrarily large inputs as long as
# skip+n is small (the only regime where skip-pagination makes sense).
# ---------------------------------------------------------------------------

def f4_skip_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey")
        .offset(20)
        .limit(10)
    )


F4_SQL = """
SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 20
"""


# ---------------------------------------------------------------------------
# S2 — dotted-path key extraction from a JSON props column
# ---------------------------------------------------------------------------

def s2_dotted_key_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy(k.alias("k")).agg(F.count(F.lit(1)).alias("cnt"))


S2_SQL = """
SELECT json_extract_string(props, '$.k')::int AS k, count(*) AS cnt
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# U2 — ObjectId synthesis + embedded-timestamp extraction
# ---------------------------------------------------------------------------

def u2_objectid_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    oid = make_object_id(F.unix_timestamp("ts"), F.col("event_id"))
    return e.select(
        "event_id",
        oid.alias("oid"),
        object_id_to_seconds(oid).alias("oid_seconds"),
    )


U2_SQL = """
SELECT event_id,
       lpad(lower(to_hex(floor(epoch(ts))::bigint)), 8, '0')
         || substr(md5(event_id::varchar), 1, 16) AS oid,
       ('0x' || substr(lpad(lower(to_hex(floor(epoch(ts))::bigint)), 8, '0'), 1, 8))::bigint
         AS oid_seconds
FROM events
"""


# ---------------------------------------------------------------------------
# TPC-H Q1 — pricing summary (decimal-exact)
# ---------------------------------------------------------------------------

def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread (session.spread): the local single-row-group lineitem scan
    # is one task, so the eight decimal partial aggregations serialize
    # on one core; at cluster scale the scan splits and this is a no-op.
    # Decimal sums are exact, so the round-robin row order cannot change
    # any output value.
    li = spread(spark, table(spark, sf_dir, "lineitem"))
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(12,2)") + _dec("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_to_double(F.sum(_dec("l_quantity"))).alias("sum_qty"),
            dec_to_double(F.sum(_dec("l_extendedprice"))).alias("sum_base_price"),
            dec_to_double(F.sum(disc_price)).alias("sum_disc_price"),
            dec_to_double(F.sum(charge)).alias("sum_charge"),
            (dec_to_double(F.sum(_dec("l_quantity"))) / cnt).alias("avg_qty"),
            (dec_to_double(F.sum(_dec("l_extendedprice"))) / cnt).alias("avg_price"),
            (dec_to_double(F.sum(_dec("l_discount"))) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       (trunc(sum(l_quantity::decimal(12,2)))::bigint::double + (((sum(l_quantity::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS sum_qty,
       (trunc(sum(l_extendedprice::decimal(12,2)))::bigint::double + (((sum(l_extendedprice::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS sum_base_price,
       (trunc(sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))))::bigint::double + (((sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS sum_disc_price,
       (trunc(sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))
           * (1::decimal(12,2) + l_tax::decimal(12,2))))::bigint::double + (((sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))
           * (1::decimal(12,2) + l_tax::decimal(12,2))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS sum_charge,
       (trunc(sum(l_quantity::decimal(12,2)))::bigint::double + (((sum(l_quantity::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) / count(*) AS avg_qty,
       (trunc(sum(l_extendedprice::decimal(12,2)))::bigint::double + (((sum(l_extendedprice::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) / count(*) AS avg_price,
       (trunc(sum(l_discount::decimal(12,2)))::bigint::double + (((sum(l_discount::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# TPC-H Q3 — shipping priority (join + agg + top-k)
# ---------------------------------------------------------------------------

def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                 "o_orderpriority")
        .agg(dec_to_double(F.sum(rev)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
       (trunc(sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))))::bigint::double + (((sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# TPC-H Q5 — local supplier volume (6-way join, broadcast dims)
# ---------------------------------------------------------------------------

def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dec_to_double(F.sum(rev)).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       (trunc(sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))))::bigint::double + (((sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 — forecast revenue change (pure scan + filter pushdown, F1)
# ---------------------------------------------------------------------------

def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(_dec("l_extendedprice") * _dec("l_discount"))).cast("double").alias("revenue"))
    )


Q6_SQL = """
SELECT (trunc(sum(l_extendedprice::decimal(12,2) * l_discount::decimal(12,2)))::bigint::double + (((sum(l_extendedprice::decimal(12,2) * l_discount::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 — returned-item customer revenue, top 20
# ---------------------------------------------------------------------------

def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_to_double(F.sum(rev)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       (trunc(sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))))::bigint::double + (((sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# TPC-H Q12-style — priority shipping counts by line status
# ---------------------------------------------------------------------------

def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).cast("long").alias("high_line_count"),
            F.sum(1 - high).cast("long").alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::bigint AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)::bigint AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q14-style — promo revenue share
# ---------------------------------------------------------------------------

def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dec_to_double(F.sum(F.when(F.col("p_type") == "PROMO", rev)))
                / dec_to_double(F.sum(rev))
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT 100.0 * (trunc(sum(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2)) END))::bigint::double + (((sum(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2)) END) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0)
             / (trunc(sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))))::bigint::double + (((sum(l_extendedprice::decimal(12,2) * (1::decimal(12,2) - l_discount::decimal(12,2))) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 — large-volume orders (agg → having → join → top-k)
# ---------------------------------------------------------------------------

def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty_dec"))
        .where(F.col("total_qty_dec") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            dec_to_double(F.col("total_qty_dec")).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity::decimal(12,2)) AS total_qty_dec,
         (trunc(sum(l_quantity::decimal(12,2)))::bigint::double + (((sum(l_quantity::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity::decimal(12,2)) > 150
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.8 — free in Spark, proven here)
# ---------------------------------------------------------------------------

def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.exceptAll(o.distinct()).distinct()


EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    f_cust = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_cust = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f_cust.intersect(o_cust)


INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
"""


# ---------------------------------------------------------------------------
# Rollup aggregation (SURVEY §2.5 — grouping sets, free in Spark)
# ---------------------------------------------------------------------------

def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"),
             dec_to_double(F.sum(_dec("l_quantity"))).alias("sum_qty"))
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       (trunc(sum(l_quantity::decimal(12,2)))::bigint::double + (((sum(l_quantity::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""



def groupingsets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): per-(flag,status),
    per-flag, and per-status marginals in one pass — Spark expands the
    sets into one shuffle with grouping-id, no re-scan per set."""
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus))
    """)


GROUPINGSETS_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       (trunc(sum(l_quantity::decimal(12,2)))::bigint::double + (((sum(l_quantity::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), (l_linestatus))
"""

# ---------------------------------------------------------------------------
# Broadcast dimension join (customer → nation → region)
# ---------------------------------------------------------------------------

def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             dec_to_double(F.sum(_dec("c_acctbal"))).alias("total_acctbal"))
    )


BROADCAST_SQL = """
SELECT r_name, count(*) AS n_customers, (trunc(sum(c_acctbal::decimal(12,2)))::bigint::double + (((sum(c_acctbal::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""


QUERIES = {
    "a1_avg_by_year": a1_avg_by_year,
    "a2_upsert_docs": a2_upsert_docs,
    "a3_pair_counts": a3_pair_counts,
    "a4_log_rollup": a4_log_rollup,
    "a5_frequent_short_tokens": a5_frequent_short_tokens,
    "s6_tokenize_stats": s6_tokenize_stats,
    "s8_multi_union": s8_multi_union,
    "hive_pushdown_conjunction": hive_pushdown_conjunction,
    "f3_sort_limit": f3_sort_limit,
    "f4_skip_pagination": f4_skip_pagination,
    "s2_dotted_key_extract": s2_dotted_key_extract,
    "u2_objectid_seconds": u2_objectid_seconds,
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "tpch_q10": tpch_q10,
    "tpch_q12": tpch_q12,
    "tpch_q14": tpch_q14,
    "tpch_q18": tpch_q18,
    "set_except": set_except,
    "set_intersect": set_intersect,
    "rollup_agg": rollup_agg,
    "groupingsets_agg": groupingsets_agg,
    "broadcast_dim_join": broadcast_dim_join,
}

ORACLES = {
    "a1_avg_by_year": A1_SQL,
    "a2_upsert_docs": A2_SQL,
    "a3_pair_counts": A3_SQL,
    "a4_log_rollup": A4_SQL,
    "a5_frequent_short_tokens": A5_SQL,
    "s6_tokenize_stats": S6_SQL,
    "s8_multi_union": S8_SQL,
    "hive_pushdown_conjunction": HIVE_PD_SQL,
    "f3_sort_limit": F3_SQL,
    "f4_skip_pagination": F4_SQL,
    "s2_dotted_key_extract": S2_SQL,
    "u2_objectid_seconds": U2_SQL,
    "tpch_q1": Q1_SQL,
    "tpch_q3": Q3_SQL,
    "tpch_q5": Q5_SQL,
    "tpch_q6": Q6_SQL,
    "tpch_q10": Q10_SQL,
    "tpch_q12": Q12_SQL,
    "tpch_q14": Q14_SQL,
    "tpch_q18": Q18_SQL,
    "set_except": EXCEPT_SQL,
    "set_intersect": INTERSECT_SQL,
    "rollup_agg": ROLLUP_SQL,
    "groupingsets_agg": GROUPINGSETS_SQL,
    "broadcast_dim_join": BROADCAST_SQL,
}
