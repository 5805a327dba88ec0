"""Deterministic spherical trigonometry, bit-identical across engines.

Spherical geometry ($centerSphere, $geoNear spherical:true) needs sin /
cos / asin, but libm transcendentals are NOT bit-identical between the
JVM and DuckDB — the reason the feature was deferred for four rounds.
This module removes the transcendentals: every function is a fixed
truncated-series polynomial evaluated with plain IEEE-754 double
arithmetic (+, -, *, /, sqrt, abs, comparisons), all of which both
engines execute correctly-rounded and therefore identically.  The SAME
coefficient table and the SAME expression-tree shape are rendered two
ways — as a PySpark ``Column`` (for match-language predicates, where
only a Column is in hand) and as a SQL string (for stage compilers and
the DuckDB oracles) — so any Spark/DuckDB pairing of the two renderings
produces equal doubles.  tests/test_trig.py pins the cross-engine
bit-exactness on random inputs and the accuracy against ``math.*``.

Accuracy (pinned by test): |sin - math.sin| and |cos - math.cos|
<= 1e-13 absolute on their preconditioned ranges; |asin - math.asin|
<= 5e-13; great-circle distance relative error < 1e-11 — far below any
physical meaning at earth scale (< 0.1 mm), with the payoff that the
DuckDB hash gate holds exactly.

Preconditions (callers guarantee by construction):
- ``sin``: |x| <= pi/2  (half-angles; the haversine builder reduces
  longitude differences to [0, 180] in EXACT degree arithmetic first,
  so no radian range reduction — with its tree-duplicating CASEs —
  ever reaches the polynomial; sin^2 is even, so the sign can drop too)
- ``cos``: |x| <= pi/2  (latitudes in radians)
- ``asin``: 0 <= t <= 1 (sqrt of a clamped haversine kernel); branch-
  free via asin(t) = pi/2 - 2 asin(sqrt((1-t)/2)), whose inner argument
  always lands in [0, sqrt(1/2)]

The flat structure matters operationally: the first cut (radian range
reduction + sign CASE + two-branch asin) tripled every subtree and blew
Janino's 64 KB per-method codegen limit, silently dropping the whole
stage to interpreted mode.  tests/test_trig.py pins that the kernel
compiles (no CodeGenerator fallback) via a plan-size canary.

Reference analog: the reference passes ``$nearSphere``/``$centerSphere``
queries opaquely to the server via ``mongo.input.query``
(core/src/main/java/com/mongodb/hadoop/util/MongoConfigUtil.java:674-702);
here the engine executes the spherical predicate itself.
"""

from __future__ import annotations

import math
from fractions import Fraction

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = [
    "sin_col", "sin_sql", "cos_col", "cos_sql", "asin_col", "asin_sql",
    "haversine_h_col", "haversine_h_sql", "dist_rad_from_h_sql",
    "center_sphere_threshold", "EARTH_RADIUS_M",
]

#: MongoDB's legacy-coordinate earth radius (meters) — what the server
#: multiplies radian distances by for $geoNear GeoJSON output.
EARTH_RADIUS_M = 6378100.0


def _dlit(v: float) -> str:
    """Exact double literal for BOTH SQL dialects (exponent-suffixed so
    DuckDB parses DOUBLE directly instead of DECIMAL-first — same
    hazard/fix as operators/linalg.py::_dlit)."""
    s = repr(float(v))
    return s if ("e" in s or "E" in s) else s + "e0"


# --- coefficient tables: nearest-double of the exact rationals ---------

#: sin(x) = x * P(x^2), P = sum c_n u^n, c_n = (-1)^n / (2n+1)!
_SIN_COEFFS = [float(Fraction((-1) ** n, math.factorial(2 * n + 1)))
               for n in range(9)]          # degree 17 in x

#: cos(x) = Q(x^2), c_n = (-1)^n / (2n)!
_COS_COEFFS = [float(Fraction((-1) ** n, math.factorial(2 * n)))
               for n in range(10)]         # degree 18 in x

#: asin(t) = t * R(t^2), c_n = (2n)! / (4^n (n!)^2 (2n+1)); used via the
#: half-angle identity so the argument is <= sqrt(1/2) — u = t^2 <= 1/2,
#: so the tail decays as 2^-n: 41 terms put it near 3e-15
_ASIN_COEFFS = [float(Fraction(math.factorial(2 * n),
                               4 ** n * math.factorial(n) ** 2
                               * (2 * n + 1)))
                for n in range(41)]

_PI = math.pi
_PI_2 = math.pi / 2          # exact: power-of-two division


# --- SQL-string rendering ---------------------------------------------

def _horner_sql(u: str, coeffs: list[float]) -> str:
    s = _dlit(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        s = f"({_dlit(c)} + {u} * {s})"
    return s


def sin_sql(x: str) -> str:
    """sin for |x| <= pi/2 (odd polynomial — handles sign itself).
    ``x`` should be a SHORT expression — it is substituted 3 times."""
    return f"({x} * {_horner_sql(f'({x} * {x})', _SIN_COEFFS)})"


def cos_sql(x: str) -> str:
    """cos for |x| <= pi/2 (even function — no reduction needed)."""
    return _horner_sql(f"({x} * {x})", _COS_COEFFS)


def asin_sql(t: str) -> str:
    """asin for t in [0, 1], branch-free: asin(t) = pi/2 -
    2 asin(sqrt((1-t)/2)); the inner argument is in [0, sqrt(1/2)],
    inside the series' pinned-accuracy range.  (Near t=0 the leading
    pi/2 terms cancel, so error is ~1e-16 ABSOLUTE — fine for
    distances: sub-nanometer at earth scale.)"""
    inner = f"sqrt((1e0 - {t}) * 5e-1)"
    core = f"({inner} * {_horner_sql(f'({inner} * {inner})', _ASIN_COEFFS)})"
    return f"({_dlit(_PI_2)} - 2e0 * {core})"


_D2R = f"({_dlit(_PI)} / 1.8e2)"


def haversine_h_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """The haversine kernel h = sin^2(dphi/2) + cos(phi1) cos(phi2)
    sin^2(dlam/2) — monotone in great-circle distance on [0, pi], so
    within-radius tests and distance ordering need no asin at all.
    Inputs in DEGREES (lon in [-180, 180], lat in [-90, 90]).

    The longitude difference (up to 360 deg) folds into [0, 180] with
    EXACT degree arithmetic — abs and subtraction from 360 are IEEE-
    exact, and sin^2 is even and 360-periodic, so the fold changes
    nothing mathematically while keeping the polynomial argument inside
    |x| <= pi/2."""
    dphi2 = f"(({lat2} - {lat1}) * {_D2R} * 5e-1)"
    adl = f"abs({lon2} - {lon1})"
    fold = f"(CASE WHEN {adl} > 1.8e2 THEN 3.6e2 - {adl} ELSE {adl} END)"
    dlam2 = f"({fold} * {_D2R} * 5e-1)"
    sp, sl = sin_sql(dphi2), sin_sql(dlam2)
    c1, c2 = cos_sql(f"({lat1} * {_D2R})"), cos_sql(f"({lat2} * {_D2R})")
    return f"({sp} * {sp} + {c1} * {c2} * {sl} * {sl})"


def dist_rad_from_h_sql(h: str) -> str:
    """Great-circle distance (radians) from a PRE-BOUND kernel column —
    bind h to a short name first (the asin substitutes its argument ~7
    times)."""
    return f"(2e0 * {asin_sql(f'sqrt(least({h}, 1e0))')})"


# --- Column rendering (same trees, for match-language predicates) -----

def _horner_col(u: Column, coeffs: list[float]) -> Column:
    s: Column = F.lit(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        s = F.lit(c) + u * s
    return s


def sin_col(x: Column) -> Column:
    return x * _horner_col(x * x, _SIN_COEFFS)


def cos_col(x: Column) -> Column:
    return _horner_col(x * x, _COS_COEFFS)


def asin_col(t: Column) -> Column:
    inner = F.sqrt((F.lit(1.0) - t) * F.lit(0.5))
    return F.lit(_PI_2) - F.lit(2.0) * (
        inner * _horner_col(inner * inner, _ASIN_COEFFS))


def haversine_h_col(lon1: Column, lat1: Column,
                    lon2: Column, lat2: Column) -> Column:
    d2r = F.lit(_PI) / F.lit(180.0)
    dphi2 = (lat2 - lat1) * d2r * F.lit(0.5)
    adl = F.abs(lon2 - lon1)
    fold = F.when(adl > F.lit(180.0), F.lit(360.0) - adl).otherwise(adl)
    dlam2 = fold * d2r * F.lit(0.5)
    sp, sl = sin_col(dphi2), sin_col(dlam2)
    c1, c2 = cos_col(lat1 * d2r), cos_col(lat2 * d2r)
    return sp * sp + c1 * c2 * sl * sl


def center_sphere_threshold(r_rad: float) -> float:
    """The h-kernel threshold sin^2(r/2) for a $centerSphere radius,
    computed ONCE in Python (math.sin — a single driver-side literal
    embedded identically in both engines; no cross-engine evaluation).
    Radii >= pi cover the whole sphere, so r clamps to pi (threshold 1,
    and h <= 1 always)."""
    r = min(float(r_rad), _PI)
    if r < 0:
        raise ValueError("$centerSphere radius must be non-negative")
    s = math.sin(r * 0.5)
    return s * s


# --- spherical polygons ($geoWithin $geometry) -------------------------
#
# Point-in-spherical-polygon by meridian-ray even-odd counting: cast the
# ray from the test point P along its meridian to the NORTH pole and
# count geodesic-edge crossings; odd = inside.  The north pole is BY
# CONVENTION exterior (so an equatorial ring selects the southern cap) —
# this matches MongoDB's smaller-region rule for every ring whose
# intended region excludes the north pole, and is well-defined even for
# axis-winding rings.  Holes and MultiPolygon parts simply contribute
# their edges to the same parity fold.
#
# Why the longitude straddle test is exact: longitude is strictly
# monotone along any non-polar great circle and sweeps exactly 180 deg
# per 180 deg of arc (the antipodal map adds 180 to both), so a MINOR
# arc always spans < 180 deg of longitude — the wrapped endpoint
# difference.  Hence edge (A,B) crosses P's meridian iff
# wrap180(lonA-lonP) and wrap180(lonB-lonP) have opposite signs and
# |dA| + |dB| < 180 — plain IEEE degree arithmetic, identical in both
# engines.  Whether the crossing lies NORTH of P needs no division:
# with N = A x B (a driver-side literal) and P the point's unit vector,
# tan(phi_cross) = -K/Nz and N.P = cos(phiP) * Nz *
# (tan(phiP) - tan(phi_cross)), so "crossing strictly north" is just
# (N.P) * Nz < 0.  The only per-row transcendentals are sin/cos of the
# point's own lon/lat — the same fixed polynomials as the haversine
# kernel, so the DuckDB oracle reproduces every bit.

#: conservative vertex budget — keeps the unrolled predicate well under
#: Janino's 64 KB per-method codegen cap (canary-tested at the budget)
MAX_POLYGON_VERTICES = 32


def lon_sincos_sql(lon: str) -> tuple[str, str]:
    """(sin, cos) of a DEGREE longitude in [-180, 180].  The fold to
    [0, 90] is exact degree arithmetic (abs / subtraction from 180);
    the sign factors sit OUTSIDE the polynomials so the series trees
    are never duplicated into CASE branches.  ``lon`` must be a SHORT
    pre-bound reference — it is substituted many times."""
    a = f"abs({lon})"
    b = f"(CASE WHEN {a} > 9e1 THEN 1.8e2 - {a} ELSE {a} END)"
    sb, cb = sin_sql(f"({b} * {_D2R})"), cos_sql(f"({b} * {_D2R})")
    sin = f"((CASE WHEN {lon} < 0e0 THEN -1e0 ELSE 1e0 END) * {sb})"
    cos = f"((CASE WHEN {a} > 9e1 THEN -1e0 ELSE 1e0 END) * {cb})"
    return sin, cos


def lon_sincos_col(lon: Column) -> tuple[Column, Column]:
    a = F.abs(lon)
    b = F.when(a > F.lit(90.0), F.lit(180.0) - a).otherwise(a)
    d2r = F.lit(_PI) / F.lit(180.0)
    sb, cb = sin_col(b * d2r), cos_col(b * d2r)
    sin = F.when(lon < F.lit(0.0), F.lit(-1.0)).otherwise(F.lit(1.0)) * sb
    cos = F.when(a > F.lit(90.0), F.lit(-1.0)).otherwise(F.lit(1.0)) * cb
    return sin, cos


def sphere_vec_sql(lon: str, lat: str) -> tuple[str, str, str]:
    """Unit-sphere (px, py, pz) from DEGREE lon/lat — latitudes are
    already in [-90, 90] so they feed the polynomials directly."""
    slam, clam = lon_sincos_sql(lon)
    sphi = sin_sql(f"({lat} * {_D2R})")
    cphi = cos_sql(f"({lat} * {_D2R})")
    return (f"({cphi} * {clam})", f"({cphi} * {slam})", sphi)


def sphere_vec_col(lon: Column, lat: Column) -> tuple[Column, Column,
                                                      Column]:
    d2r = F.lit(_PI) / F.lit(180.0)
    slam, clam = lon_sincos_col(lon)
    sphi, cphi = sin_col(lat * d2r), cos_col(lat * d2r)
    return cphi * clam, cphi * slam, sphi


def _unit_vec(lon: float, lat: float) -> tuple[float, float, float]:
    lam, phi = math.radians(lon), math.radians(lat)
    return (math.cos(phi) * math.cos(lam),
            math.cos(phi) * math.sin(lam), math.sin(phi))


def _wrap180(d: float) -> float:
    if d > 180.0:
        return d - 360.0
    if d <= -180.0:
        return d + 360.0
    return d


def polygon_edges(rings) -> list[tuple[float, float, float, float,
                                       tuple[float, float, float]]]:
    """Validate GeoJSON rings and precompute per-edge
    (lonA, latA, lonB, latB, unit-normalized N = A x B) on the DRIVER —
    vertex trig uses libm here because N only ever enters the plans as
    literals, identical in both engines by construction.  Edges whose
    wrapped longitude span is exactly 180 deg are rejected: the great
    circle through two points 180 deg apart in longitude runs THROUGH
    the poles, so the arc between them is not longitude-monotone and
    the meridian-straddle test cannot see it (same-longitude meridian
    SEGMENTS are fine — a ray along a different meridian can never
    cross them)."""
    edges = []
    n_verts = 0
    if not rings:
        raise ValueError("$geometry needs at least one ring")
    for ring in rings:
        pts = [(float(p[0]), float(p[1])) for p in ring]
        if len(pts) < 4 or pts[0] != pts[-1]:
            raise ValueError("$geometry ring must be closed "
                             "(first == last) with >= 4 positions")
        pts = pts[:-1]
        n_verts += len(pts)
        for lon, lat in pts:
            if not (-180.0 <= lon <= 180.0):
                raise ValueError(f"ring longitude {lon} out of "
                                 "[-180, 180]")
            if not (-90.0 < lat < 90.0):
                raise ValueError("ring vertices at the poles are "
                                 "unsupported (longitude undefined)")
        for (lon1, lat1), (lon2, lat2) in zip(pts,
                                              pts[1:] + pts[:1]):
            if (lon1, lat1) == (lon2, lat2):
                raise ValueError("degenerate ring edge (zero-length)")
            if abs(_wrap180(lon2 - lon1)) == 180.0:
                raise ValueError(
                    "ring edge spans exactly 180 deg of longitude — "
                    "its geodesic passes over a pole (antipodal "
                    "endpoints are a special case); split the edge "
                    "with an intermediate vertex")
            a, b = _unit_vec(lon1, lat1), _unit_vec(lon2, lat2)
            nx = a[1] * b[2] - a[2] * b[1]
            ny = a[2] * b[0] - a[0] * b[2]
            nz = a[0] * b[1] - a[1] * b[0]
            norm = math.sqrt(nx * nx + ny * ny + nz * nz)
            edges.append((lon1, lat1, lon2, lat2,
                          (nx / norm, ny / norm, nz / norm)))
    if n_verts > MAX_POLYGON_VERTICES:
        raise ValueError(f"$geometry supports at most "
                         f"{MAX_POLYGON_VERTICES} vertices total "
                         f"(got {n_verts}) — the predicate unrolls "
                         "per-edge")
    return edges


def _wrap_sql(d: str) -> str:
    return (f"(CASE WHEN {d} > 1.8e2 THEN {d} - 3.6e2 "
            f"WHEN {d} <= -1.8e2 THEN {d} + 3.6e2 ELSE {d} END)")


def sphere_polygon_pred_sql(lon: str, px: str, py: str, pz: str,
                            rings) -> str:
    """The even-odd predicate over PRE-BOUND short names: ``lon`` the
    point's degree longitude and (px, py, pz) its unit vector (from
    sphere_vec_sql — bind them in a CTE; each is referenced once per
    edge)."""
    terms = []
    for lon1, _, lon2, _, (nx, ny, nz) in polygon_edges(rings):
        da = _wrap_sql(f"({_dlit(lon1)} - {lon})")
        db = _wrap_sql(f"({_dlit(lon2)} - {lon})")
        ndp = (f"({_dlit(nx)} * {px} + {_dlit(ny)} * {py} "
               f"+ {_dlit(nz)} * {pz})")
        terms.append(f"((({da} > 0e0) <> ({db} > 0e0)) "
                     f"AND abs({da} - {db}) < 1.8e2 "
                     f"AND {ndp} * {_dlit(nz)} < 0e0)")
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} <> {t})"
    return out


def sphere_polygon_pred_col(lon: Column, lat: Column, rings) -> Column:
    """Column rendering: the parity fold runs as ``aggregate`` over a
    LITERAL edge array, with the point's vector bound ONCE through a
    single-element ``transform`` lambda.  An unrolled per-edge tree was
    tried first and abandoned: whole-stage codegen fuses the filter
    into one Janino method, whose 64 KB cap a ~6-vertex ring already
    blows (the three vector polynomials duplicate per edge).  The HOF
    form keeps the expression tree edge-count-free — the polynomials
    appear once and each row pays polys + E tiny terms — at the cost of
    the filter dropping out of whole-stage codegen (ArrayTransform is
    CodegenFallback); the fold subtree evaluates via expression eval.
    Every per-edge float op (wrap CASE, the N.P dot, the comparisons)
    is the same op sequence the unrolled SQL rendering runs, so the
    two renderings stay bit-identical (pinned on random polygons)."""
    edges = polygon_edges(rings)
    edge_arr = F.expr("array(" + ", ".join(
        f"named_struct('la', {_dlit(l1)}, 'lb', {_dlit(l2)}, "
        f"'nx', {_dlit(nx)}, 'ny', {_dlit(ny)}, 'nz', {_dlit(nz)})"
        for l1, _, l2, _, (nx, ny, nz) in edges) + ")")
    px, py, pz = sphere_vec_col(lon, lat)
    bound = F.array(F.struct(px.alias("px"), py.alias("py"),
                             pz.alias("pz"), lon.alias("lon")))

    def _wrap(d0: Column) -> Column:
        return (F.when(d0 > F.lit(180.0), d0 - F.lit(360.0))
                .when(d0 <= F.lit(-180.0), d0 + F.lit(360.0))
                .otherwise(d0))

    def _term(e: Column, v: Column) -> Column:
        da = _wrap(e["la"] - v["lon"])
        db = _wrap(e["lb"] - v["lon"])
        ndp = (e["nx"] * v["px"] + e["ny"] * v["py"]
               + e["nz"] * v["pz"])
        return (((da > F.lit(0.0)) != (db > F.lit(0.0)))
                & (F.abs(da - db) < F.lit(180.0))
                & (ndp * e["nz"] < F.lit(0.0)))

    fold = F.element_at(
        F.transform(bound, lambda v: F.aggregate(
            edge_arr, F.lit(False), lambda acc, e: acc != _term(e, v))),
        1)
    # codegen'd bounding conjunct first: FilterExec short-circuits
    # conjuncts, so rows outside the box never pay the interpreted fold
    return sphere_polygon_prefilter_col(lon, lat, rings) & fold


# --- polygon bounding prefilter ----------------------------------------
#
# The parity fold evaluates via expression eval (CodegenFallback), so
# every scanned row pays polys + E edge terms.  A driver-computed
# bounding box over the polygon REGION, emitted as a plain codegen'd
# conjunct ahead of the fold, lets FilterExec's conjunct short-circuit
# skip the interpreted work for every row that cannot possibly be
# inside.  Soundness (box ⊇ region) is what matters — the box never
# decides membership, it only skips:
# - Latitude: a bounded (non-axis-winding) region's extremes lie on its
#   edges; an edge's latitude range is its endpoints' range widened to
#   the great circle's vertex latitude when the vertex point (the
#   circle's closest approach to a pole) falls on the edge's longitude
#   interval ("geodesic sag").  Axis-winding rings (longitude
#   traversal sum ±360) extend the region to the south pole (the
#   north-pole-exterior convention), so lat_lo drops to -90.
# - Longitude: the union of the edges' short-way wrapped intervals;
#   disabled entirely when a winding ring makes every longitude
#   reachable.
# A 1e-6 deg margin swallows the ~1e-13 polynomial-vs-libm fuzz.  The
# DuckDB oracle rendering deliberately has NO prefilter: the random-
# polygon cross-engine equality pin therefore doubles as the soundness
# test (an unsound box would flip Spark rows to False that the oracle
# keeps True).

_BOX_MARGIN = 1e-6


def _lon_in_arc(lon: float, lon1: float, lon2: float) -> bool:
    """Is ``lon`` on the short-way longitude interval lon1 -> lon2?"""
    da, db = _wrap180(lon1 - lon), _wrap180(lon2 - lon)
    if da == 0.0 or db == 0.0:
        return True
    return (da > 0) != (db > 0) and abs(da - db) < 180.0


def polygon_prefilter_bounds(rings):
    """(lat_lo, lat_hi, lon_intervals | None) for the polygon REGION,
    driver-side libm (enters the plan only as literals).  Consumes the
    SAME per-edge normals as the parity fold (polygon_edges), so the
    prefilter cannot drift from the predicate it guards."""
    lat_lo, lat_hi = 90.0, -90.0
    intervals: list[tuple[float, float]] = []
    lon_any = False
    ring_sizes = [len(r) - 1 for r in rings]
    all_edges = polygon_edges(rings)
    pos = 0
    for n_edges in ring_sizes:
        ring_edges = all_edges[pos:pos + n_edges]
        pos += n_edges
        if abs(sum(_wrap180(l2 - l1)
                   for l1, _, l2, _, _ in ring_edges)) > 180.0:
            lat_lo = -90.0          # axis-winding: region reaches the
            lon_any = True          # south pole, every longitude occurs
        for lon1, lat1, lon2, lat2, (nx, ny, nz) in ring_edges:
            lo, hi = min(lat1, lat2), max(lat1, lat2)
            if nz * nz < 1.0 - 1e-12:
                # great-circle vertex (closest point to the north pole):
                # v = z - (z.n) n, normalized
                vx, vy, vz = -nz * nx, -nz * ny, 1.0 - nz * nz
                vn = math.sqrt(vx * vx + vy * vy + vz * vz)
                v_lat = math.degrees(math.asin(vz / vn))
                v_lon = math.degrees(math.atan2(vy, vx))
                if _lon_in_arc(v_lon, lon1, lon2):
                    hi = max(hi, v_lat)
                s_lon = _wrap180(v_lon + 180.0)
                if _lon_in_arc(s_lon, lon1, lon2):
                    lo = min(lo, -v_lat)
            lat_lo, lat_hi = min(lat_lo, lo), max(lat_hi, hi)
            d = _wrap180(lon2 - lon1)
            lo_l, hi_l = (lon1, lon1 + d) if d >= 0 else (lon1 + d, lon1)
            if hi_l > 180.0:        # split wrapped interval at +/-180
                intervals += [(lo_l, 180.0), (-180.0, hi_l - 360.0)]
            elif lo_l < -180.0:
                intervals += [(lo_l + 360.0, 180.0), (-180.0, hi_l)]
            else:
                intervals.append((lo_l, hi_l))
    if lon_any:
        merged = None
    else:
        intervals.sort()
        merged = []
        for lo_l, hi_l in intervals:
            if merged and lo_l <= merged[-1][1] + _BOX_MARGIN:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi_l))
            else:
                merged.append((lo_l, hi_l))
        if sum(h - l for l, h in merged) > 300.0:
            merged = None           # not selective enough to pay for
    return (max(lat_lo - _BOX_MARGIN, -90.0),
            min(lat_hi + _BOX_MARGIN, 90.0), merged)


def sphere_polygon_prefilter_col(lon: Column, lat: Column,
                                 rings) -> Column:
    lat_lo, lat_hi, lon_iv = polygon_prefilter_bounds(rings)
    pred = (lat >= F.lit(lat_lo)) & (lat <= F.lit(lat_hi))
    if lon_iv is not None:
        t = None
        for lo, hi in lon_iv:
            term = ((lon >= F.lit(lo - _BOX_MARGIN))
                    & (lon <= F.lit(hi + _BOX_MARGIN)))
            t = term if t is None else t | term
        pred = pred & t
    return pred


# --- great-circle segment vs polygon-boundary crossing ------------------
#
# $geoIntersects support: a stored geodesic SEGMENT (the minor arc
# A->B) intersects a polygon iff an endpoint lies inside (the parity
# predicate above) or the arc crosses a boundary edge.  Arc-arc
# crossing uses the classic four-determinant same-sign test (the
# robust formulation popularized by S2's SimpleCrossing): with
# N_ab = A x B and N_cd = C x D,
#
#   acb = -(N_ab . C),  bda = N_ab . D,
#   cbd = -(N_cd . B),  dac = N_cd . A,
#
# the minor arcs cross iff all four scalars share a strict sign.  The
# first pair says C and D straddle A-B's great circle with the correct
# orientation, the second pair the converse; the sign CONSISTENCY
# between the pairs is what rejects the antipodal intersection point,
# which plain straddle-straddle testing accepts.  Everything is +,*,-
# on doubles — correctly rounded and identical in both engines; the
# polygon edge vectors (C, D, N_cd) are driver-side literals from the
# same polygon_edges() the parity fold consumes, and the per-row A, B
# vectors come from the pinned sphere_vec polynomials.  N_cd is the
# NORMALIZED edge normal (polygon_edges divides by the norm) — only
# signs matter here, so normalization is harmless, and using the same
# literals as the parity fold keeps the two predicates consistent.
#
# Degenerate rows are conservative: a zero-length stored segment
# (A == B) gives N_ab = 0, every scalar 0, no strict sign — no
# crossing (the endpoint-inside test still decides); antipodal A, -A
# likewise never report a crossing (the geodesic is undefined there).
# Boundary tangencies (an endpoint exactly ON an edge's great circle)
# make a scalar exactly 0 and report no crossing — measure-zero, same
# convention as the parity fold's strict inequalities.

_SEG_FIELDS = ("cx", "cy", "cz", "dx", "dy", "dz", "nx", "ny", "nz")


def _segment_edge_literals(rings) -> list[tuple]:
    """Per-edge (C vector, D vector, N_cd) literal tuples — endpoint
    unit vectors via driver-side libm (they enter plans as literals
    only, like the normals)."""
    out = []
    for lon1, lat1, lon2, lat2, n in polygon_edges(rings):
        c, d = _unit_vec(lon1, lat1), _unit_vec(lon2, lat2)
        out.append((c[0], c[1], c[2], d[0], d[1], d[2],
                    n[0], n[1], n[2]))
    return out


def sphere_segment_crossing_col(lonA: Column, latA: Column,
                                lonB: Column, latB: Column,
                                rings) -> Column:
    """True when the minor arc A->B crosses ANY polygon-boundary edge.

    Same HOF shape as the parity fold (see sphere_polygon_pred_col's
    codegen rationale): edges are one literal struct array, the
    per-row endpoint vectors and their cross product bind ONCE through
    nested single-element ``transform`` lambdas, and ``exists`` ORs
    the per-edge four-sign tests — the expression tree stays
    edge-count-free."""
    edge_arr = F.expr("array(" + ", ".join(
        "named_struct(" + ", ".join(
            f"'{f}', {_dlit(v)}" for f, v in zip(_SEG_FIELDS, t)) + ")"
        for t in _segment_edge_literals(rings)) + ")")
    ax, ay, az = sphere_vec_col(lonA, latA)
    bx, by, bz = sphere_vec_col(lonB, latB)
    vec = F.array(F.struct(ax.alias("ax"), ay.alias("ay"), az.alias("az"),
                           bx.alias("bx"), by.alias("by"), bz.alias("bz")))

    def _term(e: Column, u: Column) -> Column:
        acb = -(u["nx"] * e["cx"] + u["ny"] * e["cy"] + u["nz"] * e["cz"])
        bda = u["nx"] * e["dx"] + u["ny"] * e["dy"] + u["nz"] * e["dz"]
        cbd = -(e["nx"] * u["bx"] + e["ny"] * u["by"] + e["nz"] * u["bz"])
        dac = e["nx"] * u["ax"] + e["ny"] * u["ay"] + e["nz"] * u["az"]
        return ((acb * bda > F.lit(0.0)) & (acb * cbd > F.lit(0.0))
                & (acb * dac > F.lit(0.0)))

    def _with_normal(v: Column) -> Column:
        w = F.array(F.struct(
            v["ax"].alias("ax"), v["ay"].alias("ay"), v["az"].alias("az"),
            v["bx"].alias("bx"), v["by"].alias("by"), v["bz"].alias("bz"),
            (v["ay"] * v["bz"] - v["az"] * v["by"]).alias("nx"),
            (v["az"] * v["bx"] - v["ax"] * v["bz"]).alias("ny"),
            (v["ax"] * v["by"] - v["ay"] * v["bx"]).alias("nz")))
        return F.element_at(
            F.transform(w, lambda u: F.exists(
                edge_arr, lambda e: _term(e, u))), 1)

    return F.element_at(F.transform(vec, _with_normal), 1)


def sphere_segment_crossing_sql(ax: str, ay: str, az: str,
                                bx: str, by: str, bz: str,
                                nabx: str, naby: str, nabz: str,
                                rings) -> str:
    """SQL rendering over PRE-BOUND short names: the endpoint unit
    vectors (ax..az, bx..bz) and their cross product (nabx..nabz =
    ay*bz - az*by, az*bx - ax*bz, ax*by - ay*bx — bind with EXACTLY
    that operand order to stay bit-identical with the Column form)."""
    terms = []
    for (cx, cy, cz, dx, dy, dz, nx, ny, nz) in \
            _segment_edge_literals(rings):
        acb = (f"(-({nabx} * {_dlit(cx)} + {naby} * {_dlit(cy)} "
               f"+ {nabz} * {_dlit(cz)}))")
        bda = (f"({nabx} * {_dlit(dx)} + {naby} * {_dlit(dy)} "
               f"+ {nabz} * {_dlit(dz)})")
        cbd = (f"(-({_dlit(nx)} * {bx} + {_dlit(ny)} * {by} "
               f"+ {_dlit(nz)} * {bz}))")
        dac = (f"({_dlit(nx)} * {ax} + {_dlit(ny)} * {ay} "
               f"+ {_dlit(nz)} * {az})")
        terms.append(f"({acb} * {bda} > 0e0 AND {acb} * {cbd} > 0e0 "
                     f"AND {acb} * {dac} > 0e0)")
    return "(" + " OR ".join(terms) + ")"


def sphere_segment_intersects_col(lonA: Column, latA: Column,
                                  lonB: Column, latB: Column,
                                  rings) -> Column:
    """$geoIntersects for a stored geodesic segment vs a GeoJSON
    polygon: an endpoint inside (even-odd parity, holes/multi-parts
    included) OR a boundary-edge crossing.  A segment lying entirely
    inside a hole reports False (both endpoints outside by parity, no
    crossing) — correct, since the hole is not part of the region."""
    return (sphere_polygon_pred_col(lonA, latA, rings)
            | sphere_polygon_pred_col(lonB, latB, rings)
            | sphere_segment_crossing_col(lonA, latA, lonB, latB, rings))


# --- one-string Spark-SQL rendering of $geoIntersects --------------------
#
# The Column renderings above build the predicate through thousands of
# py4j calls (each polynomial node is a JVM round-trip), which measured
# ~8.5 s of PLAN-BUILD time for the full segment predicate — the exact
# failure mode SCALE.md's round-4 finding pinned ("wide literal
# expressions must be built as SQL strings").  The functions below
# emit the ENTIRE predicate as one Spark-SQL string (one JVM parse):
# the same HOF-bound shape, the same IEEE op sequences (pinned equal to
# the Column rendering in tests/test_spherepoly.py), with the parity
# folds, the crossing test, and the bounding prefilters all inlined.
# The match compiler uses this path whenever it has the field NAME in
# hand (always, outside $elemMatch).

def sphere_polygon_prefilter_sql(lon: str, lat: str, rings) -> str:
    """SQL text of the codegen'd bounding prefilter — same literals and
    comparison ops as sphere_polygon_prefilter_col."""
    lat_lo, lat_hi, lon_iv = polygon_prefilter_bounds(rings)
    parts = [f"({lat} >= {_dlit(lat_lo)} AND {lat} <= {_dlit(lat_hi)})"]
    if lon_iv is not None:
        terms = " OR ".join(
            f"({lon} >= {_dlit(lo - _BOX_MARGIN)} "
            f"AND {lon} <= {_dlit(hi + _BOX_MARGIN)})"
            for lo, hi in lon_iv)
        parts.append(f"({terms})")
    return "(" + " AND ".join(parts) + ")"


def _geo_edges_array_sql(rings) -> str:
    """ONE literal struct array carrying both the parity fields
    (la, lb, nx, ny, nz) and the crossing fields (cx..dz) per edge, so
    every HOF binding in the one-string rendering shares it."""
    rows = []
    for (lon1, _, lon2, _, (nx, ny, nz)), seg in zip(
            polygon_edges(rings), _segment_edge_literals(rings)):
        fields = [f"'la', {_dlit(lon1)}", f"'lb', {_dlit(lon2)}"]
        fields += [f"'{f}', {_dlit(v)}" for f, v in zip(_SEG_FIELDS, seg)]
        rows.append("named_struct(" + ", ".join(fields) + ")")
    return "array(" + ", ".join(rows) + ")"


def _parity_hof_sql(edges_sql: str, lon: str,
                    px: str, py: str, pz: str) -> str:
    """Spark-SQL text of the even-odd parity fold — op-for-op the
    sphere_polygon_pred_col HOF (wrap CASE, straddle tests, N.P dot,
    XOR aggregate), with the point bound once through a one-element
    transform."""
    def wrap(d: str) -> str:
        return (f"(CASE WHEN {d} > 1.8e2 THEN {d} - 3.6e2 "
                f"WHEN {d} <= -1.8e2 THEN {d} + 3.6e2 ELSE {d} END)")

    da, db = wrap("(e.la - v.lon)"), wrap("(e.lb - v.lon)")
    term = (f"((({da} > 0e0) != ({db} > 0e0)) "
            f"AND abs({da} - {db}) < 1.8e2 "
            f"AND (e.nx * v.px + e.ny * v.py + e.nz * v.pz) "
            f"* e.nz < 0e0)")
    return (f"element_at(transform(array(named_struct("
            f"'lon', {lon}, 'px', {px}, 'py', {py}, 'pz', {pz})), "
            f"v -> aggregate({edges_sql}, false, "
            f"(acc, e) -> acc != {term})), 1)")


def _crossing_hof_sql(edges_sql: str, ax: str, ay: str, az: str,
                      bx: str, by: str, bz: str) -> str:
    """Spark-SQL text of the four-determinant arc-crossing exists —
    op-for-op sphere_segment_crossing_col."""
    acb = "(-(u.nx * e.cx + u.ny * e.cy + u.nz * e.cz))"
    bda = "(u.nx * e.dx + u.ny * e.dy + u.nz * e.dz)"
    cbd = "(-(e.nx * u.bx + e.ny * u.by + e.nz * u.bz))"
    dac = "(e.nx * u.ax + e.ny * u.ay + e.nz * u.az)"
    term = (f"({acb} * {bda} > 0e0 AND {acb} * {cbd} > 0e0 "
            f"AND {acb} * {dac} > 0e0)")
    return (f"element_at(transform(array(named_struct("
            f"'ax', {ax}, 'ay', {ay}, 'az', {az}, "
            f"'bx', {bx}, 'by', {by}, 'bz', {bz})), "
            f"v -> element_at(transform(array(named_struct("
            f"'ax', v.ax, 'ay', v.ay, 'az', v.az, "
            f"'bx', v.bx, 'by', v.by, 'bz', v.bz, "
            f"'nx', v.ay * v.bz - v.az * v.by, "
            f"'ny', v.az * v.bx - v.ax * v.bz, "
            f"'nz', v.ax * v.by - v.ay * v.bx)), "
            f"u -> exists({edges_sql}, e -> {term})), 1)), 1)")


def sphere_parity_fold_sql(edges_sql: str, lon: str,
                           px: str, py: str, pz: str) -> str:
    """Flat Spark-SQL parity fold over PRE-BOUND references (projected
    vector columns): same per-edge ops as _parity_hof_sql minus the
    binding transform — for plans that materialize the point vector as
    codegen'd projection columns and keep only the edge fold
    interpreted (the vector-materialized production shape)."""
    def wrap(d: str) -> str:
        return (f"(CASE WHEN {d} > 1.8e2 THEN {d} - 3.6e2 "
                f"WHEN {d} <= -1.8e2 THEN {d} + 3.6e2 ELSE {d} END)")

    da, db = wrap(f"(e.la - {lon})"), wrap(f"(e.lb - {lon})")
    term = (f"((({da} > 0e0) != ({db} > 0e0)) "
            f"AND abs({da} - {db}) < 1.8e2 "
            f"AND (e.nx * {px} + e.ny * {py} + e.nz * {pz}) "
            f"* e.nz < 0e0)")
    return (f"aggregate({edges_sql}, false, "
            f"(acc, e) -> acc != {term})")


def sphere_crossing_fold_sql(edges_sql: str,
                             ax: str, ay: str, az: str,
                             bx: str, by: str, bz: str,
                             nabx: str, naby: str, nabz: str) -> str:
    """Flat Spark-SQL arc-crossing exists over PRE-BOUND references
    (projected endpoint-vector and cross-product columns) — same
    per-edge ops as sphere_segment_crossing_sql's unrolled oracle
    rendering, folded over the literal edge array."""
    acb = f"(-({nabx} * e.cx + {naby} * e.cy + {nabz} * e.cz))"
    bda = f"({nabx} * e.dx + {naby} * e.dy + {nabz} * e.dz)"
    cbd = f"(-(e.nx * {bx} + e.ny * {by} + e.nz * {bz}))"
    dac = f"(e.nx * {ax} + e.ny * {ay} + e.nz * {az})"
    term = (f"({acb} * {bda} > 0e0 AND {acb} * {cbd} > 0e0 "
            f"AND {acb} * {dac} > 0e0)")
    return f"exists({edges_sql}, e -> {term})"


def sphere_geo_intersects_expr(field: str, rings) -> str:
    """The full $geoIntersects predicate over a named array column, as
    one Spark-SQL string: size dispatch (2 = point parity, 4 = segment
    endpoint-parity OR arc-crossing), with each parity guarded by its
    inlined bounding prefilter.  ``field`` is a column/path reference;
    0-based ``[i]`` indexing mirrors the Column form's getItem."""
    lonA, latA = f"{field}[0]", f"{field}[1]"
    lonB, latB = f"{field}[2]", f"{field}[3]"
    edges = _geo_edges_array_sql(rings)
    vec_a = sphere_vec_sql(lonA, latA)
    vec_b = sphere_vec_sql(lonB, latB)
    pre_a = sphere_polygon_prefilter_sql(lonA, latA, rings)
    pre_b = sphere_polygon_prefilter_sql(lonB, latB, rings)
    parity_a = _parity_hof_sql(edges, lonA, *vec_a)
    parity_b = _parity_hof_sql(edges, lonB, *vec_b)
    crossing = _crossing_hof_sql(edges, *vec_a, *vec_b)
    point = f"({pre_a} AND {parity_a})"
    seg = (f"(({pre_a} AND {parity_a}) OR ({pre_b} AND {parity_b}) "
           f"OR {crossing})")
    return (f"(CASE WHEN size({field}) >= 4 THEN {seg} "
            f"ELSE {point} END)")
