"""Deterministic polynomial trig (plans/trig.py): cross-engine
bit-exactness (the whole point of the module) and accuracy vs math.*."""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from mongo_hadoop_spark.plans import trig


def _duck_eval(sql_fn, values, col="x"):
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame({"i": range(len(values)), col: values}))
        return [r[0] for r in
                con.execute(f"SELECT {sql_fn(col)} FROM t ORDER BY i"
                            ).fetchall()]
    finally:
        con.close()


def _spark_eval(spark, col_fn, values):
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(values)],
                               "i long, x double")
    rows = df.select("i", col_fn(F.col("x")).alias("y")).collect()
    return [r["y"] for r in sorted(rows, key=lambda r: r["i"])]


def test_sin_cos_accuracy_against_libm():
    xs = [(-1 + 2 * i / 2000) * (math.pi / 2) for i in range(2001)]
    for got, x in zip(_duck_eval(trig.sin_sql, xs), xs):
        assert abs(got - math.sin(x)) <= 1e-13, x   # worst ~4e-14 at pi/2
    for got, x in zip(_duck_eval(trig.cos_sql, xs), xs):
        assert abs(got - math.cos(x)) <= 1e-13, x


def test_asin_accuracy_against_libm():
    ts = [i / 2000 for i in range(2001)]
    for got, t in zip(_duck_eval(trig.asin_sql, ts), ts):
        assert abs(got - math.asin(t)) <= 5e-13, t


def test_cross_engine_bit_exact(spark):
    rng = random.Random(20260815)
    xs = [rng.uniform(-math.pi / 2, math.pi / 2) for _ in range(300)]
    assert _duck_eval(trig.sin_sql, xs) == _spark_eval(spark, trig.sin_col, xs)
    assert _duck_eval(trig.cos_sql, xs) == \
        _spark_eval(spark, trig.cos_col, xs)
    ts = [rng.random() for _ in range(300)] + [0.0, 0.5, 1.0]
    assert _duck_eval(trig.asin_sql, ts) == \
        _spark_eval(spark, trig.asin_col, ts)


def test_haversine_cross_engine_and_accuracy(spark):
    rng = random.Random(7)
    pts = [(rng.uniform(-180, 180), rng.uniform(-90, 90),
            rng.uniform(-180, 180), rng.uniform(-90, 90))
           for _ in range(200)]
    con = duckdb.connect()
    try:
        pdf = pd.DataFrame(pts, columns=["lon1", "lat1", "lon2", "lat2"])
        pdf.insert(0, "i", range(len(pts)))
        con.register("t", pdf)
        h_sql = trig.haversine_h_sql("lon1", "lat1", "lon2", "lat2")
        duck = [r[0] for r in con.execute(
            f"SELECT {trig.dist_rad_from_h_sql('h')} FROM "
            f"(SELECT i, {h_sql} AS h FROM t) ORDER BY i").fetchall()]
    finally:
        con.close()
    df = spark.createDataFrame(
        [(i, *map(float, p)) for i, p in enumerate(pts)],
        "i long, lon1 double, lat1 double, lon2 double, lat2 double")
    h = trig.haversine_h_col(F.col("lon1"), F.col("lat1"),
                             F.col("lon2"), F.col("lat2"))
    rows = df.select(
        "i", (F.lit(2.0) * trig.asin_col(
            F.sqrt(F.least(h, F.lit(1.0))))).alias("d")).collect()
    spark_d = [r["d"] for r in sorted(rows, key=lambda r: r["i"])]
    assert duck == spark_d          # bit-for-bit across engines
    for got, (lon1, lat1, lon2, lat2) in zip(duck, pts):
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dphi, dlam = p2 - p1, math.radians(lon2 - lon1)
        hh = (math.sin(dphi / 2) ** 2
              + math.cos(p1) * math.cos(p2) * math.sin(dlam / 2) ** 2)
        want = 2 * math.asin(min(1.0, math.sqrt(hh)))
        assert abs(got - want) <= 1e-11 * max(1.0, want)


def test_kernel_survives_whole_stage_codegen(spark):
    """The first cut of the trig trees blew Janino's 64 KB per-method
    limit and dropped whole stages to interpreted mode; the flattened
    trees (no sign CASE, degree-space fold, branch-free asin) fit.
    With fallback disabled, a too-big tree raises instead of degrading
    silently — pinned on the two registry plan shapes: kernel-filter +
    keyed agg ($centerSphere match) and kernel + asin projection + sort
    ($geoNear spherical)."""
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        df = spark.createDataFrame(
            [(float(i % 360 - 180), float(i % 180 - 90), "t%d" % (i % 5))
             for i in range(400)],
            "lon double, lat double, k string")
        h = trig.haversine_h_col(F.col("lon"), F.col("lat"),
                                 F.lit(20.0), F.lit(10.0))
        agg = df.where(h <= F.lit(0.3)).groupBy("k").count().collect()
        assert agg
        near = (df.withColumn("_h", h).where(F.col("_h") <= F.lit(0.9))
                .withColumn("d", F.lit(2.0) * trig.asin_col(
                    F.sqrt(F.least(F.col("_h"), F.lit(1.0)))))
                .orderBy("d").select("k", "d").collect())
        assert near and all(r["d"] >= 0 for r in near)
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_center_sphere_threshold_clamps():
    assert trig.center_sphere_threshold(math.pi) == 1.0
    assert trig.center_sphere_threshold(10.0) == 1.0   # > pi: whole sphere
    assert trig.center_sphere_threshold(0.0) == 0.0
    t = trig.center_sphere_threshold(0.5)
    assert abs(t - math.sin(0.25) ** 2) < 1e-16
