"""HLL sketch: estimate accuracy, mergeability, determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mongo_hadoop_spark.operators.sketches import (
    HLL_M, _hll_registers, hll_estimate, merge_registers,
    sketch_hll_documents, sketch_hll_users,
)
from mongo_hadoop_spark.session import table


def _regs(df):
    return [(r.register, r.max_rho) for r in df.collect()]


def test_estimate_within_hll_error_bound(spark):
    # standard error for m=256 is 1.04/sqrt(256) = 6.5%; allow 3 sigma
    for n in (100, 1000, 20000):
        keyed = spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
        est = hll_estimate(_regs(_hll_registers(keyed)))
        assert abs(est - n) / n < 3 * 1.04 / (HLL_M ** 0.5), (n, est)


def test_sketch_users_close_to_exact(spark):
    e = table(spark, SF_SMOKE, "events")
    exact = e.select("user_id").distinct().count()
    est = hll_estimate(_regs(sketch_hll_users(spark, SF_SMOKE)))
    # tiny cardinalities go through linear counting — near-exact
    assert abs(est - exact) / exact < 0.05


def test_merge_equals_sketch_of_union(spark):
    a = spark.range(0, 5000).select(F.concat(F.lit("x"), F.col("id")).alias("key"))
    b = spark.range(2500, 9000).select(F.concat(F.lit("x"), F.col("id")).alias("key"))
    merged = merge_registers(_hll_registers(a), _hll_registers(b))
    whole = _hll_registers(a.unionAll(b))
    assert sorted(_regs(merged)) == sorted(_regs(whole))


def test_registers_deterministic_across_partitionings(spark):
    d = table(spark, SF_SMOKE, "documents").select(F.col("text").alias("key"))
    r1 = sorted(_regs(_hll_registers(d.repartition(1))))
    r32 = sorted(_regs(_hll_registers(d.repartition(32))))
    assert r1 == r32
