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
