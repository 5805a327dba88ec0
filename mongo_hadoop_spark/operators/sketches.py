"""Mergeable cardinality sketches as deterministic, oracle-exact operators.

Spark's built-in ``approx_count_distinct`` is a HyperLogLog, but its
register state is opaque and engine-specific — it cannot be cross-checked
against another engine, merged outside Spark, or stored as a stable
artifact.  This module re-derives HLL from first principles with *pure
integer column math* on the repo's cross-engine md5 hash, so that:

- the **register table is the query result** — (register, max_rho) rows
  are deterministic integers, bit-identical in Spark and DuckDB (the
  correctness gate hashes them);
- the sketch is **mergeable by construction** — union register tables
  and take per-register max (tested: sketch(A ∪ B) == merge(sketch(A),
  sketch(B))), which is what lets 1000 executors sketch 100 TB with one
  256-row shuffle;
- the estimate stays deterministic: the harmonic denominator is the
  *integer* ``Σ 2^(62-rho)`` (exact in int64 — no float summation order
  to drift), with a single float division at the very end.

Layout of the 60-bit hash ``h = md5_long(key)``:
  register index = h % 256 (m=256 registers, b=8)
  payload       = h // 256 (52 bits)
  rho           = leading zeros of the payload within 52 bits, + 1
                = 53 - bitlength(payload)   (payload=0 → rho = 53)

Standard HLL estimate (Flajolet et al. 2007): E = α_m · m² / Σ 2^(-M_j),
with linear counting below 2.5m — implemented in :func:`hll_estimate`
over the register table (driver-side on 256 rows).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mongo_hadoop_spark.functions import md5_long, md5_long_sql
from mongo_hadoop_spark.session import table

HLL_M = 256          # registers (b = 8 index bits)
_PAYLOAD_BITS = 52   # 60-bit hash minus 8 index bits
ALPHA_256 = 0.7213 / (1 + 1.079 / HLL_M)  # α_m for m ≥ 128


def _hll_registers(keyed: DataFrame) -> DataFrame:
    """(register, max_rho) sketch state for the ``key`` string column."""
    h = md5_long(F.col("key"))
    payload = F.floor(h / HLL_M).cast("long")
    rho = F.when(payload == 0, F.lit(_PAYLOAD_BITS + 1)).otherwise(
        F.lit(_PAYLOAD_BITS + 1) - F.length(F.bin(payload))
    ).cast("long")
    return (
        keyed.select((h % HLL_M).cast("long").alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def _hll_sql(key_expr: str, source_sql: str) -> str:
    h = md5_long_sql(key_expr)
    return f"""
WITH hashed AS (
  SELECT {h} AS h FROM ({source_sql})
),
parts AS (
  SELECT (h % {HLL_M})::bigint AS register,
         (CASE WHEN h // {HLL_M} = 0 THEN {_PAYLOAD_BITS + 1}
               ELSE {_PAYLOAD_BITS + 1} - length(bin(h // {HLL_M})) END)::bigint AS rho
  FROM hashed
)
SELECT register, max(rho) AS max_rho FROM parts GROUP BY 1
"""


def sketch_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register table over distinct event users."""
    e = table(spark, sf_dir, "events")
    return _hll_registers(e.select(F.col("user_id").cast("string").alias("key")))


SKETCH_HLL_USERS_SQL = _hll_sql("key", "SELECT user_id::varchar AS key FROM events")


def sketch_hll_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL register table over document texts — the streaming-friendly
    cardinality of a 100 TB corpus (distinct-content count without a
    distinct shuffle: 256 rows of state per executor, merged by max)."""
    d = table(spark, sf_dir, "documents")
    return _hll_registers(d.select(F.col("text").alias("key")))


SKETCH_HLL_DOCS_SQL = _hll_sql("key", "SELECT text AS key FROM documents")


def hll_estimate(registers: list[tuple[int, int]]) -> float:
    """Cardinality estimate from (register, max_rho) rows.

    The harmonic denominator is computed as the exact integer
    ``Σ 2^(62-rho)`` scaled by 2^-62, so every float enters through one
    multiplication and one division — deterministic across platforms.
    Registers absent from the list have M_j = 0.  Linear counting is used
    below 2.5m (standard small-range correction).
    """
    got = dict(registers)
    scaled = sum(1 << (62 - got.get(j, 0)) for j in range(HLL_M))
    est = ALPHA_256 * HLL_M * HLL_M * (2.0 ** 62) / scaled
    zeros = HLL_M - len([j for j in got if got[j] > 0])
    if est <= 2.5 * HLL_M and zeros > 0:
        return HLL_M * math.log(HLL_M / zeros)
    return est


def merge_registers(*register_dfs: DataFrame) -> DataFrame:
    """Merge sketches: union the register tables, keep per-register max.
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) — asserted in tests."""
    out = register_dfs[0]
    for df in register_dfs[1:]:
        out = out.unionAll(df)
    return out.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — the frequency analog
# of the HLL register table above.  d=CMS_D salted md5 hash rows × w=CMS_W
# columns; cell(r, c) = Σ counts of tokens hashing to column c under salt
# r.  The sketch is a *linear* projection of the count vector, so it is
# mergeable by cell-wise addition (1000 executors each sketch their
# partition, one (d·w)-row shuffle merges the corpus sketch), and the
# point estimate min_r cell(r, h_r(x)) always over-counts — never under —
# which is the guarantee tests pin.  Like the HLL, the register table IS
# the query result: deterministic integers, hashed by the driver gate.
# ---------------------------------------------------------------------------

CMS_D = 4    # hash rows
CMS_W = 64   # columns per row

_CMS_COL_SPARK = (
    "CAST(conv(substr(md5(concat('cms{r}', term)), 1, 15), 16, 10) AS BIGINT)"
    f" % {CMS_W}"
)
_CMS_COL_DUCK = (
    "(('0x' || substr(md5('cms{r}' || term), 1, 15))::bigint % " f"{CMS_W})"
)
_WORDS_SQL = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"


def _cms_cells(toks: DataFrame) -> DataFrame:
    """(row, col, cnt) Count-Min cells for a ``term`` string column."""
    pairs = ", ".join(
        f"{r}L, {_CMS_COL_SPARK.format(r=r)}" for r in range(CMS_D)
    )
    return (
        toks.select(
            F.expr(f"stack({CMS_D}, {pairs}) AS (row, col)")
        )
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sketch_cms_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min cell table over all document tokens (d·w rows of state
    for a 100 TB token stream; map-side partial aggregation makes the
    shuffle d·w rows per executor)."""
    from mongo_hadoop_spark.functions import tokenize

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokenize("text")).alias("term"))
    return _cms_cells(toks)


SKETCH_CMS_TOKENS_SQL = f"""
WITH toks AS (
  SELECT unnest({_WORDS_SQL}) AS term FROM documents
),
cells AS (
  {" UNION ALL ".join(
      f"SELECT {r} AS row, {_CMS_COL_DUCK.format(r=r)} AS col FROM toks"
      for r in range(CMS_D)
  )}
)
SELECT row::bigint AS row, col, count(*) AS cnt
FROM cells GROUP BY 1, 2
"""


def sketch_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-estimate audit: the 20 most frequent tokens (term tiebreak)
    with their true counts and CMS estimates min_r cell(r, h_r(term)).

    The estimate join touches d rows per probe term against the d·w-cell
    table (broadcast) — probing is O(1) per term regardless of corpus
    size, which is why CMS is the 100 TB heavy-hitter pre-filter.
    """
    from mongo_hadoop_spark.functions import tokenize

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokenize("text")).alias("term"))
    cells = _cms_cells(toks)
    truth = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("term").asc())
        .limit(20)
    )
    pairs = ", ".join(
        f"{r}L, {_CMS_COL_SPARK.format(r=r)}" for r in range(CMS_D)
    )
    probes = truth.select(
        "term", "true_cnt",
        F.expr(f"stack({CMS_D}, {pairs}) AS (row, col)"),
    )
    return (
        probes.join(F.broadcast(cells), ["row", "col"])
        .groupBy("term", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )


SKETCH_CMS_ESTIMATES_SQL = f"""
WITH toks AS (
  SELECT unnest({_WORDS_SQL}) AS term FROM documents
),
cells AS (
  SELECT row::bigint AS row, col, count(*) AS cnt FROM (
    {" UNION ALL ".join(
        f"SELECT {r} AS row, {_CMS_COL_DUCK.format(r=r)} AS col FROM toks"
        for r in range(CMS_D)
    )}
  ) GROUP BY 1, 2
),
truth AS (
  SELECT term, count(*) AS true_cnt FROM toks GROUP BY term
  ORDER BY true_cnt DESC, term ASC LIMIT 20
),
probes AS (
  {" UNION ALL ".join(
      f"SELECT term, true_cnt, {r}::bigint AS row,"
      f" {_CMS_COL_DUCK.format(r=r)} AS col FROM truth"
      for r in range(CMS_D)
  )}
)
SELECT term, true_cnt, min(cnt) AS est_cnt
FROM probes JOIN cells USING (row, col)
GROUP BY term, true_cnt
"""


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — set membership with one-sided error.  The
# bit table (sorted distinct positions) is the query result: k=BLOOM_K
# salted md5 positions per distinct token over m=BLOOM_M bits.  Mergeable
# by union-distinct (bitwise OR); membership claims never false-negative
# — the property the audit query and tests pin.  Spark ships an opaque
# engine-internal Bloom (DataFrameStatFunctions/runtime join filters);
# this one is a portable, cross-engine-checkable artifact, the same
# rationale as the HLL register table above.
# ---------------------------------------------------------------------------

BLOOM_K = 4    # hash functions
BLOOM_M = 512  # bits

_BLOOM_BIT_SPARK = (
    "CAST(conv(substr(md5(concat('bloom{r}', term)), 1, 15), 16, 10)"
    f" AS BIGINT) % {BLOOM_M}"
)
_BLOOM_BIT_DUCK = (
    "(('0x' || substr(md5('bloom{r}' || term), 1, 15))::bigint % "
    f"{BLOOM_M})"
)


def _bloom_bits(terms: DataFrame) -> DataFrame:
    """(bit) table — distinct positions set by a ``term`` column."""
    pairs = ", ".join(_BLOOM_BIT_SPARK.format(r=r) for r in range(BLOOM_K))
    return (
        terms.distinct()
        .select(F.expr(f"stack({BLOOM_K}, {pairs}) AS (bit)"))
        .distinct()
    )


def sketch_bloom_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom bit table over the distinct document-token vocabulary
    (≤ BLOOM_M rows of state however large the corpus; the distinct is
    the only shuffle and is vocabulary-, not corpus-, sized)."""
    from mongo_hadoop_spark.functions import tokenize

    d = table(spark, sf_dir, "documents")
    return _bloom_bits(d.select(F.explode(tokenize("text")).alias("term")))


SKETCH_BLOOM_TOKENS_SQL = f"""
WITH terms AS (
  SELECT DISTINCT unnest({_WORDS_SQL}) AS term FROM documents
)
SELECT DISTINCT bit FROM (
  {" UNION ALL ".join(
      f"SELECT {_BLOOM_BIT_DUCK.format(r=r)} AS bit FROM terms"
      for r in range(BLOOM_K)
  )}
)
"""


def sketch_bloom_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership audit: the 10 most frequent tokens plus 10 known-absent
    probes, with ground truth and the Bloom claim side by side.

    Guarantee surfaced: ``in_corpus ⇒ in_bloom`` (no false negatives);
    absent probes may show ``in_bloom = true`` — that's the measured
    false-positive rate.  Probing is BLOOM_K lookups against the
    broadcast bit table per probe, O(1) in corpus size.
    """
    from mongo_hadoop_spark.functions import tokenize

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokenize("text")).alias("term"))
    bits = _bloom_bits(toks)
    present = (
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("term").asc())
        .limit(10)
        .select("term", F.lit(True).alias("in_corpus"))
    )
    absent = (
        d.sparkSession.range(10)
        .select(F.concat(F.lit("__absent_probe_"), F.col("id"))
                .alias("term"),
                F.lit(False).alias("in_corpus"))
    )
    probes = present.unionAll(absent)
    pairs = ", ".join(_BLOOM_BIT_SPARK.format(r=r) for r in range(BLOOM_K))
    probe_bits = probes.select(
        "term", "in_corpus", F.expr(f"stack({BLOOM_K}, {pairs}) AS (bit)")
    )
    return (
        probe_bits.join(F.broadcast(bits.withColumn("hit", F.lit(1))),
                        "bit", "left")
        .groupBy("term", "in_corpus")
        .agg((F.count("hit") == BLOOM_K).alias("in_bloom"))
    )


SKETCH_BLOOM_AUDIT_SQL = f"""
WITH toks AS (
  SELECT unnest({_WORDS_SQL}) AS term FROM documents
),
terms AS (SELECT DISTINCT term FROM toks),
bits AS (
  SELECT DISTINCT bit FROM (
    {" UNION ALL ".join(
        f"SELECT {_BLOOM_BIT_DUCK.format(r=r)} AS bit FROM terms"
        for r in range(BLOOM_K)
    )}
  )
),
present AS (
  SELECT term, TRUE AS in_corpus FROM (
    SELECT term, count(*) AS c FROM toks GROUP BY term
    ORDER BY c DESC, term ASC LIMIT 10
  )
),
absent AS (
  SELECT '__absent_probe_' || i::varchar AS term, FALSE AS in_corpus
  FROM generate_series(0, 9) t(i)
),
probes AS (SELECT * FROM present UNION ALL SELECT * FROM absent),
probe_bits AS (
  {" UNION ALL ".join(
      f"SELECT term, in_corpus, {_BLOOM_BIT_DUCK.format(r=r)} AS bit"
      " FROM probes"
      for r in range(BLOOM_K)
  )}
)
SELECT term, in_corpus, count(bits.bit) = {BLOOM_K} AS in_bloom
FROM probe_bits LEFT JOIN bits ON probe_bits.bit = bits.bit
GROUP BY term, in_corpus
"""


# ---------------------------------------------------------------------------
# Relative-error quantile sketch (DDSketch re-derivation, integer-exact)
# ---------------------------------------------------------------------------

#: mantissa bits kept after the leading 1 — relative bucket width ≤ 1/8
DDQ_MBITS = 3
DDQ_PROBS = [0.5, 0.9, 0.99]


def _ddq_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket_id, lo_cents, cnt) bucket table for events.value.

    DDSketch (Masson, Rim & Lee, VLDB 2019) buckets values by
    ``floor(log_γ v)`` for a relative-error guarantee — but ``log()`` is
    not bit-identical across engines, so the bucket index is re-derived
    with pure integer math on cents ``n = floor(100·v)``:

        e  = bitlen(n) − 1                  (the power-of-two exponent)
        k  = floor(n / 2^max(e−3, 0))       (leading 1 + 3 mantissa bits,
                                             k ∈ [8, 15] for e ≥ 3)
        id = e·16 + k,   bucket = [k·2^max(e−3,0), (k+1)·2^max(e−3,0))

    γ = 2^(1/8): relative bucket width ≤ 1/k ≤ 1/8 (exact below 8
    cents).  The whole sketch is ≤ 16·64 buckets for the full int64
    cents range — constant-size, mergeable by summing counts, one
    map-side-combined shuffle at any corpus size.  The only doubles are
    ``100·v`` (same IEEE product both engines) and the final /100
    readback.
    """
    ev = table(spark, sf_dir, "events")
    return ddq_sketch(ev, F.col("value"))


def ddq_sketch(df: DataFrame, value: "F.Column") -> DataFrame:
    """Bucket any positive numeric column into the DDQ grid —
    (bucket_id, lo_cents, cnt); merge two sketches by unioning and
    re-summing cnt per (bucket_id, lo_cents)."""
    n = F.floor(value * F.lit(100)).cast("long")
    n = F.greatest(n, F.lit(1))          # clamp: sketch domain is ≥ 1 cent
    e = (F.length(F.bin(n)) - 1).cast("long")
    shift = F.greatest(e - DDQ_MBITS, F.lit(0))
    p2 = F.pow(F.lit(2.0), shift)        # exact power of two in double
    k = F.floor(n / p2).cast("long")
    return (
        df.select((e * 16 + k).alias("bucket_id"),
                  (k * p2).cast("long").alias("lo_cents"))
        .groupBy("bucket_id", "lo_cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sketch_ddq_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile-sketch state itself — (bucket_id, lo_cents, cnt)
    rows, deterministic integers (the correctness gate hashes them)."""
    return _ddq_bucketed(spark, sf_dir).orderBy("bucket_id")


def sketch_ddq_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 estimates read off the bucket table: for each p the
    answer is the lower bound of the first bucket whose cumulative count
    reaches ``ceil(p·N)`` — within γ = 1/8 relative error of the exact
    rank statistic (pytest-pinned).  The cumulative window runs over the
    ≤ 16·64-row bucket table, not the data."""
    from pyspark.sql import Window

    b = _ddq_bucketed(spark, sf_dir)
    cum = b.withColumn(
        "cum", F.sum("cnt").over(
            Window.orderBy("bucket_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
    total = b.agg(F.sum("cnt").alias("n_total"))
    probs = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in DDQ_PROBS])).alias("p"))
    hits = (probs.crossJoin(F.broadcast(total))
            .join(F.broadcast(cum),
                  F.col("cum") >= F.ceil(F.col("p") * F.col("n_total")))
            .groupBy("p").agg(F.min("lo_cents").alias("lo_cents")))
    return (hits.select("p", (F.col("lo_cents") / F.lit(100))
                        .alias("est"))
            .orderBy("p"))


_DDQ_BUCKETS_SQL = """
  ddq AS (
    SELECT (e * 16 + k)::bigint AS bucket_id, (k * p2)::bigint AS lo_cents,
           count(*) AS cnt
    FROM (
      SELECT e, floor(n / p2)::bigint AS k, p2
      FROM (
        SELECT n, (length(format('{:b}', n)) - 1) AS e,
               power(2.0, greatest(length(format('{:b}', n)) - 1 - 3, 0))
                 AS p2
        FROM (SELECT greatest(floor(value * 100)::bigint, 1) AS n
              FROM events) t0
      ) t1
    ) t2
    GROUP BY 1, 2
  )
"""

SKETCH_DDQ_BUCKETS_SQL = f"""
WITH {_DDQ_BUCKETS_SQL}
SELECT bucket_id, lo_cents, cnt::bigint AS cnt FROM ddq ORDER BY bucket_id
"""

SKETCH_DDQ_QUANTILES_SQL = f"""
WITH {_DDQ_BUCKETS_SQL},
cum AS (
  SELECT bucket_id, lo_cents, cnt,
         sum(cnt) OVER (ORDER BY bucket_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM ddq
),
total AS (SELECT sum(cnt) AS n_total FROM ddq),
probs AS (SELECT unnest([0.5, 0.9, 0.99]::double[]) AS p)
SELECT p, (min(lo_cents) / 100) AS est
FROM probs, total, cum
WHERE cum >= ceil(p * n_total)
GROUP BY p
ORDER BY p
"""


QUERIES = {
    "sketch_hll_users": sketch_hll_users,
    "sketch_hll_documents": sketch_hll_documents,
    "sketch_cms_tokens": sketch_cms_tokens,
    "sketch_cms_estimates": sketch_cms_estimates,
    "sketch_bloom_tokens": sketch_bloom_tokens,
    "sketch_bloom_audit": sketch_bloom_audit,
    "sketch_ddq_buckets": sketch_ddq_buckets,
    "sketch_ddq_quantiles": sketch_ddq_quantiles,
}

ORACLES = {
    "sketch_hll_users": SKETCH_HLL_USERS_SQL,
    "sketch_hll_documents": SKETCH_HLL_DOCS_SQL,
    "sketch_cms_tokens": SKETCH_CMS_TOKENS_SQL,
    "sketch_cms_estimates": SKETCH_CMS_ESTIMATES_SQL,
    "sketch_bloom_tokens": SKETCH_BLOOM_TOKENS_SQL,
    "sketch_bloom_audit": SKETCH_BLOOM_AUDIT_SQL,
    "sketch_ddq_buckets": SKETCH_DDQ_BUCKETS_SQL,
    "sketch_ddq_quantiles": SKETCH_DDQ_QUANTILES_SQL,
}
