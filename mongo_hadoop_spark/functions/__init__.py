"""Scalar/column function library.

Covers the reference's BSON-specific scalar surface (SURVEY §2.9: ObjectId
helpers U1/U2, binary U3, JSON bridging U9, tokenization U7/U8) as pure
built-in column expressions (JVM-side, whole-stage-codegen friendly — no
Python UDFs in any hot path), plus deterministic cross-engine hashing
primitives used by the dedup/similarity operators.

Determinism contract: every function here must produce bit-identical
results in Spark and in the DuckDB oracle SQL (see
``mongo_hadoop_spark.operators``), which is why hashing is built on
``md5`` (identical in both engines) rather than ``xxhash64``/``hash``
(engine-specific seeds/algorithms).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


# ---------------------------------------------------------------------------
# Deterministic decimal -> double conversion (cross-engine parity)
# ---------------------------------------------------------------------------

def dec_to_double(col: Column, scale: int = 15) -> Column:
    """Bit-deterministic DECIMAL(p, ``scale``) -> DOUBLE conversion.

    A plain ``CAST(decimal AS DOUBLE)`` is *not* cross-engine stable once
    the unscaled value exceeds 2^53: Spark converts through BigDecimal
    (one correctly-rounded step) while DuckDB converts the int128 unscaled
    value to double and then divides by 10^scale (two roundings) — a
    measured ~25% of random >2^53 decimals differ by 1 ulp.  This helper
    replaces the cast with an expression tree whose every step is exact
    or a single IEEE-correctly-rounded op, identical in both engines:

        trunc(x)::bigint::double            -- |int part| < 10^18: exact-or-CR
          + ((x % 1) * 10^scale)::bigint::double / 10^scale

    ``x % 1`` keeps the dividend's sign in both engines, the fractional
    unscaled value is < 10^scale <= 10^10 (exact as double), and the
    division/addition are single correctly-rounded IEEE ops.  Fuzz-pinned
    bit-exact vs DuckDB in tests/test_functions.py (400 cases incl.
    negatives and >2^53 magnitudes).

    Contract: the integer part must fit in 18 digits (precision − scale
    ≤ 18) and scale ≤ 15 (10^scale and the fractional unscaled value
    must be ≤ 2^53-exact doubles), which every decimal-sum accumulator
    in this package satisfies.

    ``scale`` may be left at the default 15 regardless of the source
    decimal's scale: the fraction is first cast to DECIMAL(16,15), which
    zero-pads exactly for any source scale ≤ 15, and scaling numerator
    and denominator by the same exact power of ten leaves the correctly-
    rounded quotient — hence the result — bit-identical (pinned in
    tests/test_dec_to_double.py::test_scale_agnostic_default).

    Companion rule (pinned by the events_value_anomalies sf0.1 incident):
    never SUM a ``double_expr::decimal`` where ``double_expr`` is itself
    arithmetic on doubles — engines round double→decimal by different
    algorithms (DuckDB: FP-multiply by 10^scale then round; Spark: round
    the exact binary expansion), so cast each *source column* to decimal
    once and do the arithmetic in decimal (exact) instead.
    """
    hi = col.cast("bigint").cast("double")  # truncates toward zero
    frac = (col % F.lit(1)).cast(f"decimal({scale + 1},{scale})")
    fracu = (frac * F.lit(10 ** scale)).cast("bigint").cast("double")
    return hi + fracu / F.lit(float(10 ** scale))


def dec_to_double_sql(expr: str, scale: int = 15) -> str:
    """DuckDB SQL fragment equivalent to :func:`dec_to_double`.

    Note DuckDB ``decimal::bigint`` ROUNDS, so the integer part goes
    through ``trunc()`` explicitly to match Spark's truncating cast.
    """
    return (
        f"(trunc({expr})::bigint::double"
        f" + ((({expr} % 1)::decimal({scale + 1},{scale}))"
        f" * {10 ** scale})::bigint::double / {float(10 ** scale)!r})"
    )


# ---------------------------------------------------------------------------
# Deterministic hashing (cross-engine parity with DuckDB)
# ---------------------------------------------------------------------------

def md5_long(col: Column | str, salt: str = "") -> Column:
    """Deterministic 60-bit non-negative hash of a string column.

    Spark:   conv(substr(md5(concat(salt, col)), 1, 15), 16, 10) :: long
    DuckDB:  ('0x' || substr(md5(salt || col), 1, 15)) :: bigint

    Both take the first 15 hex digits (60 bits) of the MD5 digest, so the
    value fits a signed 64-bit integer and matches bit-for-bit across
    engines.  Used for MinHash permutations, SimHash word hashes, and
    document fingerprints.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: str = "") -> str:
    """DuckDB SQL fragment equivalent to :func:`md5_long`."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"(('0x' || substr(md5({inner}), 1, 15))::bigint)"


def md5_long_spark_sql(expr: str, salt: str = "") -> str:
    """Spark-SQL string twin of :func:`md5_long` (same value bit-for-bit).

    For wide expressions repeated per band/permutation, building the hash
    as SQL text instead of Column objects avoids the py4j round-trips
    that otherwise dominate plan-construction time (see SCALE.md).
    """
    inner = f"concat('{salt}', {expr})" if salt else expr
    return f"CAST(conv(substr(md5({inner}), 1, 15), 16, 10) AS BIGINT)"


# ---------------------------------------------------------------------------
# ObjectId helpers (reference: pig/udf/ToObjectId.java:14-29,
# ObjectIdToSeconds.java:17-38) — ObjectIds modeled as 24-hex strings
# (SURVEY §1.2) whose first 8 hex chars are the epoch-seconds timestamp.
# ---------------------------------------------------------------------------

def object_id_to_seconds(col: Column | str) -> Column:
    """Epoch seconds embedded in a 24-hex ObjectId string (U2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(c, 1, 8), 16, 10).cast("long")


def make_object_id(epoch_seconds: Column, payload: Column) -> Column:
    """Deterministically synthesize a 24-hex ObjectId from a timestamp and a
    payload column (machine/pid/counter section ← md5 of the payload).

    Reference analog: ObjectId construction in ToObjectId (U1); here the
    random section is derived, so round-trips are testable.
    """
    ts_hex = F.lpad(F.lower(F.hex(epoch_seconds.cast("long"))), 8, "0")
    tail = F.substring(F.md5(payload.cast("string")), 1, 16)
    return F.concat(ts_hex, tail)


def to_object_id(col: Column | str) -> Column:
    """Validate/normalize a 24-hex ObjectId string (U1, ToObjectId.java):
    lowercases and nulls out malformed values."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    return F.when(low.rlike("^[0-9a-f]{24}$"), low)


def to_binary(col: Column | str) -> Column:
    """String/any → binary (U3, ToBinary.java)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("binary")


def to_dbref(ref: Column | str, id_col: Column | str) -> Column:
    """(collection, id) → DBRef struct {$ref, $id} (U4, ToDBRef.java)."""
    r = F.col(ref) if isinstance(ref, str) else ref
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.struct(r.alias("ref"), i.cast("string").alias("id"))


# ---------------------------------------------------------------------------
# Tokenization (U7/U8: enron recipient split, GridFS regex delimiter)
# ---------------------------------------------------------------------------

def tokenize(col: Column | str, pattern: str = r"\s+") -> Column:
    """Split text into tokens on a delimiter regex, dropping empty tokens.

    Reference analog: GridFSInputFormat's regex-delimited record reader
    (core/.../GridFSInputFormat.java:252-281, default delimiter
    ``(\\n|\\r\\n)``) and the enron ``split(to, ',')`` mapper
    (examples/enron/.../EnronMailMapper.java:33-35).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, pattern), lambda t: t != "")


def word_shingles(col: Column | str, n: int) -> Column:
    """Word n-gram shingles of a text column (array<string>).

    Built-in-only implementation: split, then zip_with over n SHIFTED
    SLICES of the token array, folding ``acc + ' ' + next`` — the
    lambdas touch only their own arguments.  The obvious alternative
    (``transform(sequence(...), i -> slice(words, i, n))``) re-evaluates
    the tokenize subtree once PER POSITION, because Catalyst performs no
    common-subexpression elimination inside lambda bodies: measured 55 s
    vs 0.8 s for a single 20 000-token document (the
    pipeline_search_highlights lesson, SCALE.md).  Here ``words`` is
    referenced only by the n top-level slices — an O(n) constant — and
    total work is O(tokens · n).  Output strings are identical
    (left-fold concat ≡ concat_ws), so every md5-derived signature and
    oracle hash is unchanged.  Used by MinHash / n-gram Jaccard dedup.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = tokenize(c)
    m = F.size(words) - F.lit(n - 1)          # shingle count when >= 0
    acc = F.slice(words, 1, m)
    for k in range(1, n):
        acc = F.zip_with(acc, F.slice(words, 1 + k, m),
                         lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(F.size(words) < n,
                  F.array().cast("array<string>")).otherwise(acc)


# ---------------------------------------------------------------------------
# Vector helpers (embedding column ops; array<float> → double math)
# ---------------------------------------------------------------------------

def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two numeric arrays in double.

    ``zip_with`` then left-to-right ``aggregate`` — the accumulation order is
    the array order, matching DuckDB's ``list_dot_product`` on
    double-transformed lists (verified in tests for bit-parity).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """Squared L2 norm in double, sequential accumulation order."""
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))
