"""Skew-aware aggregation: two-phase salted group-by.

At 100 TB a handful of hot keys (one user, one null-ish default) can pin a
single reducer.  The classic fix: salt the key, aggregate partially per
(key, salt), then merge partials per key — two small shuffles instead of
one skewed one.  AQE's skew-join splitting handles joins; this is the
aggregation-side equivalent, exposed as an operator so pipelines can apply
it declaratively.

The salt is deterministic (row id mod buckets), so results are exactly
reproducible and the oracle is the plain group-by.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mongo_hadoop_spark.functions import dec_to_double
from mongo_hadoop_spark.session import table

SALT_BUCKETS = 16


def salted_aggregate(df: DataFrame, key: str, salt_src: str,
                     buckets: int = SALT_BUCKETS) -> DataFrame:
    """Generic two-phase count/sum aggregate of ``value`` by ``key``."""
    salted = df.withColumn("_salt", F.pmod(F.col(salt_src), F.lit(buckets)))
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("_sum"),
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("n_events"),
        dec_to_double(F.sum("_sum")).alias("total_value"),
    )


def skew_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return salted_aggregate(e, "user_id", "event_id")


SALTED_SQL = """
SELECT user_id, count(*) AS n_events,
       (trunc(sum(value::decimal(12,2)))::bigint::double + (((sum(value::decimal(12,2)) % 1)::decimal(16,15)) * 1000000000000000)::bigint::double / 1000000000000000.0) AS total_value
FROM events GROUP BY 1
"""

QUERIES = {"skew_salted_rollup": skew_salted_rollup}
ORACLES = {"skew_salted_rollup": SALTED_SQL}


def skewed_join_aqe(spark: SparkSession, left: DataFrame, right: DataFrame,
                    key: str) -> DataFrame:
    """Join under AQE skew handling: adaptive execution detects oversized
    partitions at runtime and splits them across tasks, so one hot key
    cannot pin a single reducer — the join-side complement of
    :func:`salted_aggregate` (no manual salting, no plan change, results
    identical).  Tests drive it with thresholds lowered so the splitting
    is observable at test scale; at production scale the defaults
    (skewedPartitionFactor=5, skewedPartitionThresholdInBytes=256MB)
    apply."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    return left.join(right, key)
