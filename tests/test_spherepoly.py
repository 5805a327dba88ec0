"""Spherical polygons ($geoWithin $geometry, plans/trig.py): the
even-odd meridian-ray predicate must (a) agree with a libm reference
implementation of the same geometry away from boundaries, (b) be
bit-identical across the Spark-Column and DuckDB-SQL renderings, and
(c) honor the documented north-pole-exterior convention."""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pyspark.sql.functions as F
import pytest

from mongo_hadoop_spark.plans import trig


# --- libm reference: SAME algorithm, full-precision trig ---------------

def _ref_inside(lon, lat, rings):
    lam, phi = math.radians(lon), math.radians(lat)
    p = (math.cos(phi) * math.cos(lam),
         math.cos(phi) * math.sin(lam), math.sin(phi))
    inside = False
    margin = math.inf          # distance-to-boundary proxy for skipping
    for lon1, _, lon2, _, n in trig.polygon_edges(rings):
        da = trig._wrap180(lon1 - lon)
        db = trig._wrap180(lon2 - lon)
        margin = min(margin, abs(da), abs(db))
        ndp = n[0] * p[0] + n[1] * p[1] + n[2] * p[2]
        if (da > 0) != (db > 0) and abs(da - db) < 180:
            margin = min(margin, abs(ndp))
            if ndp * n[2] < 0:
                inside = not inside
    return inside, margin


def _spark_inside(spark, pts, rings):
    df = spark.createDataFrame(
        [(i, float(lo), float(la)) for i, (lo, la) in enumerate(pts)],
        "i long, lon double, lat double")
    pred = trig.sphere_polygon_pred_col(F.col("lon"), F.col("lat"), rings)
    rows = df.select("i", pred.alias("y")).collect()
    return [bool(r["y"]) for r in sorted(rows, key=lambda r: r["i"])]


def _duck_inside(pts, rings):
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame(
            {"i": range(len(pts)), "lon": [p[0] for p in pts],
             "lat": [p[1] for p in pts]}))
        px, py, pz = trig.sphere_vec_sql("lon", "lat")
        pred = trig.sphere_polygon_pred_sql("lon", "px", "py", "pz", rings)
        return [bool(r[0]) for r in con.execute(
            f"SELECT {pred} FROM (SELECT i, lon, {px} AS px, {py} AS py, "
            f"{pz} AS pz FROM t) ORDER BY i").fetchall()]
    finally:
        con.close()


SQUARE = [[(10.0, 10.0), (30.0, 10.0), (30.0, 30.0), (10.0, 30.0),
           (10.0, 10.0)]]
HOLED = SQUARE + [[(15.0, 15.0), (25.0, 15.0), (25.0, 25.0),
                   (15.0, 25.0), (15.0, 15.0)]]
ANTIMERIDIAN = [[(150.0, -20.0), (-150.0, -20.0), (-150.0, 20.0),
                 (150.0, 20.0), (150.0, -20.0)]]
EQUATOR = [[(0.0, 0.0), (120.0, 0.0), (-120.0, 0.0), (0.0, 0.0)]]
SOUTH_CAP = [[(0.0, -60.0), (120.0, -60.0), (-120.0, -60.0),
              (0.0, -60.0)]]


def test_semantic_pins(spark):
    cases = [
        (SQUARE, (20, 20), True), (SQUARE, (20, 35), False),
        (SQUARE, (5, 20), False), (SQUARE, (-170, -50), False),
        # hole: annulus member yes, hole interior no
        (HOLED, (12, 20), True), (HOLED, (20, 20), False),
        # antimeridian-crossing ring contains the 180 meridian
        (ANTIMERIDIAN, (180, 0), True), (ANTIMERIDIAN, (170, 0), True),
        (ANTIMERIDIAN, (0, 0), False), (ANTIMERIDIAN, (170, 40), False),
        # north-pole-exterior convention: equatorial ring = southern cap
        (EQUATOR, (50, -40), True), (EQUATOR, (50, 40), False),
        # axis-winding ring around the south pole
        (SOUTH_CAP, (77, -85), True), (SOUTH_CAP, (77, -30), False),
    ]
    for rings, pt, want in cases:
        got = _spark_inside(spark, [pt], rings)[0]
        assert got == want, (rings[0][0], pt, want)
        assert _duck_inside([pt], rings)[0] == want, (pt, "duck")


def _random_ring(rng, n):
    """A star-shaped (hence simple) ring around a random center: sorted
    bearings, jittered radii (2..25 deg), projected via small-circle
    offsets — plain lon/lat math is fine for TEST geometry."""
    clon, clat = rng.uniform(-150, 150), rng.uniform(-55, 55)
    angs = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
    pts = []
    for a in angs:
        r = rng.uniform(2, 25)
        lat = max(-89.0, min(89.0, clat + r * math.sin(a)))
        lon = clon + r * math.cos(a) / max(0.2, math.cos(
            math.radians(lat)))
        pts.append((trig._wrap180(lon), lat))
    return pts + [pts[0]]


@pytest.mark.parametrize("seed", [3, 17, 101])
def test_random_polygons_match_reference_and_cross_engine(spark, seed):
    rng = random.Random(seed)
    rings = [_random_ring(rng, rng.randint(3, 8))]
    pts = [(rng.uniform(-180, 180), rng.uniform(-89, 89))
           for _ in range(400)]
    want = [_ref_inside(lon, lat, rings) for lon, lat in pts]
    got_spark = _spark_inside(spark, pts, rings)
    got_duck = _duck_inside(pts, rings)
    assert got_spark == got_duck          # bit-identical renderings
    for (w, margin), g, pt in zip(want, got_spark, pts):
        if margin > 1e-9:                 # skip boundary-degenerate pts
            assert g == w, (pt, margin)


def test_refusals():
    with pytest.raises(ValueError, match="closed"):
        trig.polygon_edges([[(0, 0), (10, 0), (10, 10)]])
    with pytest.raises(ValueError, match="poles"):
        trig.polygon_edges([[(0, 90.0), (10, 0), (10, 10), (0, 90.0)]])
    with pytest.raises(ValueError, match="zero-length"):
        trig.polygon_edges([[(0, 30.0), (0.0, 30.0), (10, 10),
                             (0, 30.0)]])
    # any 180-deg-longitude-span edge passes over a pole: the straddle
    # test cannot see it, so it is rejected (not silently ignored) —
    # antipodal endpoints are the special case lat1 == -lat2
    for bad in [[(0, 30.0), (180.0, -30.0), (10, 10), (0, 30.0)]],\
               [[(0, 10.0), (180.0, 20.0), (90, 15.0), (0, 10.0)]]:
        with pytest.raises(ValueError, match="over a pole"):
            trig.polygon_edges(bad)
    with pytest.raises(ValueError, match="at most"):
        big = [(math.cos(i) + i * 1e-6, math.sin(i)) for i in range(40)]
        trig.polygon_edges([big + [big[0]]])


def test_geo_within_geometry_match(spark):
    """The $match-language plumbing end-to-end, incl. MultiPolygon."""
    from mongo_hadoop_spark.operators.mongoagg import aggregate

    df = spark.createDataFrame(
        [(1, [20.0, 20.0]), (2, [20.0, 35.0]), (3, [-170.0, -50.0]),
         (4, [50.0, 52.0])],
        "id long, loc array<double>")
    got = aggregate(df, [
        {"$match": {"loc": {"$geoWithin": {"$geometry": {
            "type": "MultiPolygon",
            "coordinates": [SQUARE, [[(40.0, 50.0), (60.0, 50.0),
                                      (60.0, 55.0), (40.0, 55.0),
                                      (40.0, 50.0)]]]}}}}},
        {"$sort": {"id": 1}},
    ]).select("id").collect()
    assert [r["id"] for r in got] == [1, 4]
    with pytest.raises(ValueError, match="Polygon"):
        aggregate(df, [{"$match": {"loc": {"$geoWithin": {
            "$geometry": {"type": "LineString",
                          "coordinates": [(0, 0), (1, 1)]}}}}}])


def test_polygon_survives_whole_stage_codegen(spark):
    """Max-budget ring (32 vertices): with codegen fallback disabled the
    unrolled parity predicate must still compile."""
    rng = random.Random(5)
    ring = _random_ring(rng, trig.MAX_POLYGON_VERTICES)
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        df = spark.createDataFrame(
            [(float(i % 360 - 180), float(i % 179 - 89), "t%d" % (i % 5))
             for i in range(400)],
            "lon double, lat double, k string")
        pred = trig.sphere_polygon_pred_col(F.col("lon"), F.col("lat"),
                                            [ring])
        assert df.where(pred).groupBy("k").count().collect() is not None
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_prefilter_is_sound_under_geodesic_sag(spark):
    """The codegen'd bounding prefilter must never drop true members:
    a wide high-latitude edge sags ~24 deg poleward of its endpoints —
    points under the apex are inside and must survive (the oracle
    rendering has no prefilter, so the cross-engine pins also guard
    this; here the hazard is planted explicitly)."""
    rings = [[(-80.0, 60.0), (80.0, 60.0), (0.0, 10.0), (-80.0, 60.0)]]
    lat_lo, lat_hi, lon_iv = trig.polygon_prefilter_bounds(rings)
    assert lat_hi > 84.0            # the sag apex made it into the box
    pts = [(0.0, 84.0), (5.0, 83.0), (-5.0, 80.0),   # under the apex
           (0.0, 30.0), (0.0, 86.0), (120.0, 50.0)]
    got = _spark_inside(spark, pts, rings)
    want = [_ref_inside(lon, lat, rings)[0] for lon, lat in pts]
    assert got == want == [True, True, True, True, False, False]
    assert _duck_inside(pts, rings) == want


# --- $geoIntersects: segment-vs-polygon crossing ------------------------

def _ref_crossing(a, b, rings):
    """libm reference for the four-determinant arc-crossing test,
    returning (crosses, margin) — margin is the smallest |determinant|
    so boundary-degenerate random cases can be skipped."""
    def unit(lon, lat):
        lam, phi = math.radians(lon), math.radians(lat)
        return (math.cos(phi) * math.cos(lam),
                math.cos(phi) * math.sin(lam), math.sin(phi))

    def dot(u, v):
        return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

    A, B = unit(*a), unit(*b)
    nab = (A[1] * B[2] - A[2] * B[1], A[2] * B[0] - A[0] * B[2],
           A[0] * B[1] - A[1] * B[0])
    crosses, margin = False, math.inf
    for lon1, lat1, lon2, lat2, n in trig.polygon_edges(rings):
        C, D = unit(lon1, lat1), unit(lon2, lat2)
        acb, bda = -dot(nab, C), dot(nab, D)
        cbd, dac = -dot(n, B), dot(n, A)
        margin = min(margin, abs(acb), abs(bda), abs(cbd), abs(dac))
        if acb * bda > 0 and acb * cbd > 0 and acb * dac > 0:
            crosses = True
    return crosses, margin


def _ref_intersects(a, b, rings):
    ia, m1 = _ref_inside(a[0], a[1], rings)
    ib, m2 = _ref_inside(b[0], b[1], rings)
    xc, m3 = _ref_crossing(a, b, rings)
    return ia or ib or xc, min(m1, m2, m3)


def _spark_seg(spark, segs, rings):
    df = spark.createDataFrame(
        [(i, float(a[0]), float(a[1]), float(b[0]), float(b[1]))
         for i, (a, b) in enumerate(segs)],
        "i long, lon1 double, lat1 double, lon2 double, lat2 double")
    pred = trig.sphere_segment_intersects_col(
        F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"), rings)
    rows = df.select("i", pred.alias("y")).collect()
    return [bool(r["y"]) for r in sorted(rows, key=lambda r: r["i"])]


def _duck_seg(segs, rings):
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame(
            {"i": range(len(segs)),
             "lon1": [a[0] for a, _ in segs],
             "lat1": [a[1] for a, _ in segs],
             "lon2": [b[0] for _, b in segs],
             "lat2": [b[1] for _, b in segs]}))
        ax, ay, az = trig.sphere_vec_sql("lon1", "lat1")
        bx, by, bz = trig.sphere_vec_sql("lon2", "lat2")
        pa = trig.sphere_polygon_pred_sql("lon1", "ax", "ay", "az", rings)
        pb = trig.sphere_polygon_pred_sql("lon2", "bx", "by", "bz", rings)
        xc = trig.sphere_segment_crossing_sql(
            "ax", "ay", "az", "bx", "by", "bz",
            "nabx", "naby", "nabz", rings)
        return [bool(r[0]) for r in con.execute(f"""
            SELECT ({pa}) OR ({pb}) OR {xc} FROM (
              SELECT *, ay * bz - az * by AS nabx,
                        az * bx - ax * bz AS naby,
                        ax * by - ay * bx AS nabz
              FROM (SELECT i, lon1, lon2,
                           {ax} AS ax, {ay} AS ay, {az} AS az,
                           {bx} AS bx, {by} AS by, {bz} AS bz
                    FROM t))
            ORDER BY i""").fetchall()]
    finally:
        con.close()


def test_segment_intersects_semantic_pins(spark):
    cases = [
        # endpoints inside
        (((15, 15), (25, 25)), SQUARE, True),
        # pass-through: both endpoints outside, arc crosses two edges —
        # the case $geoWithin cannot express
        (((0, 20), (40, 20)), SQUARE, True),
        # disjoint
        (((50, 50), (60, 60)), SQUARE, False),
        (((-170, -50), (-160, -40)), SQUARE, False),
        # entirely inside the hole: parity False at both ends, no
        # boundary crossing -> not intersecting (hole is not region)
        (((17, 20), (23, 20)), HOLED, False),
        # hole to outside: crosses the hole edge AND the outer edge
        (((20, 20), (40, 20)), HOLED, True),
        # degenerate zero-length segment falls back to point-inside
        (((20, 20), (20, 20)), SQUARE, True),
        (((40, 20), (40, 20)), SQUARE, False),
        # antimeridian-straddling region, pass-through across 180
        (((140, 0), (-140, 0)), ANTIMERIDIAN, True),
    ]
    for (a, b), rings, want in cases:
        assert _spark_seg(spark, [(a, b)], rings)[0] == want, (a, b, want)
        assert _duck_seg([(a, b)], rings)[0] == want, (a, b, "duck")


@pytest.mark.parametrize("seed", [7, 23])
def test_random_segments_match_reference_and_cross_engine(spark, seed):
    rng = random.Random(seed)
    rings = [_random_ring(rng, rng.randint(3, 8))]
    segs = []
    for _ in range(300):
        a = (rng.uniform(-180, 180), rng.uniform(-89, 89))
        # mix of short hops (likely near the ring) and long hauls
        if rng.random() < 0.5:
            b = (trig._wrap180(a[0] + rng.uniform(-30, 30)),
                 max(-89.0, min(89.0, a[1] + rng.uniform(-30, 30))))
        else:
            b = (rng.uniform(-180, 180), rng.uniform(-89, 89))
        segs.append((a, b))
    want = [_ref_intersects(a, b, rings) for a, b in segs]
    got_spark = _spark_seg(spark, segs, rings)
    got_duck = _duck_seg(segs, rings)
    assert got_spark == got_duck          # bit-identical renderings
    for (w, margin), g, seg in zip(want, got_spark, segs):
        if margin > 1e-9:
            assert g == w, (seg, margin)


def test_geo_intersects_match(spark):
    """$geoIntersects end-to-end through the match language: runtime
    size dispatch between stored points and stored segments, plus the
    spec refusals."""
    from mongo_hadoop_spark.operators.mongoagg import aggregate

    df = spark.createDataFrame(
        [(1, [20.0, 20.0]),                  # point inside
         (2, [20.0, 35.0]),                  # point outside
         (3, [0.0, 20.0, 40.0, 20.0]),       # pass-through segment
         (4, [50.0, 50.0, 60.0, 60.0])],     # disjoint segment
        "id long, loc array<double>")
    got = aggregate(df, [
        {"$match": {"loc": {"$geoIntersects": {"$geometry": {
            "type": "Polygon", "coordinates": SQUARE}}}}},
        {"$sort": {"id": 1}},
    ]).select("id").collect()
    assert [r["id"] for r in got] == [1, 3]
    with pytest.raises(ValueError, match="Polygon"):
        aggregate(df, [{"$match": {"loc": {"$geoIntersects": {
            "$geometry": {"type": "LineString",
                          "coordinates": [(0, 0), (1, 1)]}}}}}])
    with pytest.raises(ValueError, match="geometry"):
        aggregate(df, [{"$match": {"loc": {"$geoIntersects": {
            "$centerSphere": [[0.0, 0.0], 1.0]}}}}])


def test_geo_intersects_one_string_rendering_matches_column(spark):
    """The match compiler's one-string SQL rendering (plan-build fast
    path) must be bit-identical to the Column rendering on random
    segments AND random points."""
    rng = random.Random(41)
    rings = [_random_ring(rng, rng.randint(3, 8))]
    rows = []
    for i in range(200):
        a = (rng.uniform(-180, 180), rng.uniform(-89, 89))
        b = (rng.uniform(-180, 180), rng.uniform(-89, 89))
        rows.append((i, [a[0], a[1], b[0], b[1]] if i % 2 else [a[0], a[1]]))
    df = spark.createDataFrame(rows, "i long, loc array<double>")
    col_pred = F.when(
        F.size("loc") >= 4,
        trig.sphere_segment_intersects_col(
            F.col("loc").getItem(0), F.col("loc").getItem(1),
            F.col("loc").getItem(2), F.col("loc").getItem(3), rings)
    ).otherwise(trig.sphere_polygon_pred_col(
        F.col("loc").getItem(0), F.col("loc").getItem(1), rings))
    txt_pred = F.expr(trig.sphere_geo_intersects_expr("loc", rings))
    got = df.select("i", col_pred.alias("c"), txt_pred.alias("t")).collect()
    for r in got:
        assert bool(r["c"]) == bool(r["t"]), (r["i"],)
