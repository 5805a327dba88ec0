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


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

from mongo_hadoop_spark.operators.sketches import (  # noqa: E402
    CMS_D, CMS_W, _cms_cells, sketch_cms_estimates, sketch_cms_tokens,
)


def _cells(df):
    return {(r.row, r.col): r.cnt for r in df.collect()}


def test_cms_never_underestimates(spark):
    est = sketch_cms_estimates(spark, SF_SMOKE).collect()
    assert len(est) == 20
    for r in est:
        assert r.est_cnt >= r.true_cnt, (r.term, r.true_cnt, r.est_cnt)


def test_cms_cells_conserve_total_count(spark):
    """Each hash row partitions the token stream, so every row's cells
    sum to the total token count (linearity of the sketch)."""
    from mongo_hadoop_spark.functions import tokenize

    d = table(spark, SF_SMOKE, "documents")
    n_tokens = (
        d.select(F.size(tokenize("text")).alias("n")).agg(F.sum("n")).collect()[0][0]
    )
    cells = _cells(sketch_cms_tokens(spark, SF_SMOKE))
    for row in range(CMS_D):
        assert sum(v for (r, _), v in cells.items() if r == row) == n_tokens
    assert all(c < CMS_W for (_, c) in cells)


def test_cms_merge_is_cellwise_sum(spark):
    """sketch(A ∪ B) == cell-wise sum of sketch(A) and sketch(B) — the
    property that lets every executor sketch its partition independently."""
    a = spark.range(0, 3000).select(
        F.concat(F.lit("t"), (F.col("id") % 100)).alias("term"))
    b = spark.range(0, 5000).select(
        F.concat(F.lit("t"), (F.col("id") % 37)).alias("term"))
    ca, cb = _cells(_cms_cells(a)), _cells(_cms_cells(b))
    summed = {k: ca.get(k, 0) + cb.get(k, 0) for k in set(ca) | set(cb)}
    whole = _cells(_cms_cells(a.unionAll(b)))
    assert summed == whole


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

from mongo_hadoop_spark.operators.sketches import (  # noqa: E402
    BLOOM_M, _bloom_bits, sketch_bloom_audit,
)


def test_bloom_no_false_negatives_and_measured_fp(spark):
    rows = sketch_bloom_audit(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        if r.in_corpus:
            assert r.in_bloom, r.term  # Bloom guarantee: no false negative
    # absent probes may be claimed present (false positives) but ground
    # truth columns must disagree only in that one direction
    assert all(r.in_bloom or not r.in_corpus for r in rows)


def test_bloom_merge_is_bit_union(spark):
    a = spark.range(0, 200).select(
        F.concat(F.lit("x"), F.col("id")).alias("term"))
    b = spark.range(150, 400).select(
        F.concat(F.lit("x"), F.col("id")).alias("term"))
    bits = lambda df: {r.bit for r in _bloom_bits(df).collect()}
    assert bits(a) | bits(b) == bits(a.unionAll(b))
    assert max(bits(a.unionAll(b))) < BLOOM_M


# ---------------------------------------------------------------------------
# DDQ relative-error quantile sketch
# ---------------------------------------------------------------------------


def test_ddq_sketch_mergeable(spark):
    import pyspark.sql.functions as F
    from mongo_hadoop_spark.operators.sketches import ddq_sketch

    a = spark.range(1, 400).select((F.col("id") * 0.37).alias("v"))
    b = spark.range(400, 900).select((F.col("id") * 0.91).alias("v"))
    whole = ddq_sketch(a.unionAll(b), F.col("v"))
    merged = (ddq_sketch(a, F.col("v")).unionAll(ddq_sketch(b, F.col("v")))
              .groupBy("bucket_id", "lo_cents")
              .agg(F.sum("cnt").alias("cnt")))
    lhs = {(r.bucket_id, r.lo_cents): r.cnt for r in whole.collect()}
    rhs = {(r.bucket_id, r.lo_cents): r.cnt for r in merged.collect()}
    assert lhs == rhs


def test_ddq_sketch_partitioning_invariant(spark):
    import pyspark.sql.functions as F
    from mongo_hadoop_spark.operators.sketches import ddq_sketch

    df = spark.range(1, 2000).select((F.col("id") * 0.137).alias("v"))
    one = {(r.bucket_id, r.lo_cents): r.cnt
           for r in ddq_sketch(df.coalesce(1), F.col("v")).collect()}
    many = {(r.bucket_id, r.lo_cents): r.cnt
            for r in ddq_sketch(df.repartition(7), F.col("v")).collect()}
    assert one == many


def test_ddq_quantile_estimates_within_relative_error(spark):
    """For each probed p: the estimate is the lower bound of the bucket
    holding the ceil(p·N)-ranked value — so est ≤ v_rank and
    v_rank < est·(1 + 1/8) + 0.02 (bucket relative width ≤ 1/k ≤ 1/8,
    plus sub-cent truncation)."""
    import math
    from mongo_hadoop_spark.operators.sketches import (
        sketch_ddq_quantiles, DDQ_PROBS)
    from conftest import SF_SMOKE

    ests = {r.p: r.est for r in sketch_ddq_quantiles(spark, SF_SMOKE).collect()}
    values = sorted(
        r.value for r in
        __import__("mongo_hadoop_spark.session", fromlist=["table"])
        .table(spark, SF_SMOKE, "events").select("value").collect())
    n = len(values)
    for p in DDQ_PROBS:
        rank = math.ceil(p * n)
        v = values[rank - 1]
        est = ests[p]
        assert est <= v + 0.01
        assert v < est * (1 + 1 / 8) + 0.02
