#!/usr/bin/env python
"""Bucketed co-located join demonstration: the 100 TB join strategy.

At cluster scale the dominant cost of orders ⋈ lineitem is the shuffle
of BOTH fact tables onto the join key.  Bucketing (`bucketBy` on the
join key at write time) pre-partitions the data ON DISK so Catalyst
plans a SortMergeJoin with ZERO Exchange operators — each task reads
bucket i of both tables and joins locally.  A 100 TB pipeline pays the
bucketed write once and amortizes it over every downstream join and
keyed aggregation on the same key.

This tool writes orders/lineitem as bucketed managed tables (sized so
sf0.1 buckets ≈ one task each), asserts the plan property the claim
rests on — NO Exchange in the bucketed join, 2 Exchanges in the
unbucketed one — and times both joins warm.  Run:

    python tools/bucketed_join_demo.py [--buckets 16] [--sf-dir ...]

Reference context: the reference connector's ShardChunkMongoSplitter
(core/src/main/java/com/mongodb/hadoop/splitter/
ShardChunkMongoSplitter.java:98-119) carries shard locality so MapReduce
tasks read co-located chunks; bucketing is the Spark-native equivalent
contract — co-locate on the key once, never shuffle it again.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--buckets", type=int, default=16)
    args = ap.parse_args()

    from mongo_hadoop_spark.session import get_spark, table

    spark = get_spark(app_name="bucketed-join-demo", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    orders = table(spark, args.sf_dir, "orders")
    lineitem = table(spark, args.sf_dir, "lineitem")

    spark.sql("DROP TABLE IF EXISTS demo_orders_b")
    spark.sql("DROP TABLE IF EXISTS demo_lineitem_b")
    (orders.write.bucketBy(args.buckets, "o_orderkey")
     .sortBy("o_orderkey").mode("overwrite")
     .saveAsTable("demo_orders_b"))
    (lineitem.write.bucketBy(args.buckets, "l_orderkey")
     .sortBy("l_orderkey").mode("overwrite")
     .saveAsTable("demo_lineitem_b"))

    def join_of(o, li):
        return (o.join(li, o["o_orderkey"] == li["l_orderkey"])
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col("l_quantity")
                           .cast("decimal(20,2)")).alias("qty")))

    ob = spark.table("demo_orders_b")
    lb = spark.table("demo_lineitem_b")
    # disable broadcast so both plans show their shuffle strategy (at
    # 100 TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = join_of(ob, lb)
        plain = join_of(orders, lineitem)

        def exchanges(df) -> int:
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange")

        ex_b, ex_p = exchanges(bucketed), exchanges(plain)
        # the property the whole demo rests on
        assert ex_b == 1, f"bucketed join should shuffle ONLY the final " \
            f"4-row aggregation, saw {ex_b} Exchanges"
        assert ex_p >= 3, f"unbucketed join should shuffle both sides, " \
            f"saw {ex_p} Exchanges"

        def timed(df) -> float:
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
            return round(best, 3)

        t_b, t_p = timed(bucketed), timed(plain)
        import json
        print(json.dumps({"buckets": args.buckets,
                          "exchanges_bucketed": ex_b,
                          "exchanges_unbucketed": ex_p,
                          "sec_bucketed": t_b, "sec_unbucketed": t_p,
                          "speedup": round(t_p / max(t_b, 1e-9), 2)}))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS demo_orders_b")
        spark.sql("DROP TABLE IF EXISTS demo_lineitem_b")
    spark.stop()


if __name__ == "__main__":
    main()
