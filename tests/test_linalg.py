"""Embedding linear-algebra operators (operators/linalg.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mongo_hadoop_spark.operators._pca_frozen import (
    PCA_COMPS, PCA_EIGVALS, PCA_FIT_SF_DIR, PCA_MU,
)
from mongo_hadoop_spark.operators.linalg import (
    JL_DIMS, PCA_DIMS, embedding_pca_whitened, embedding_random_projection,
    pca_model,
)

from conftest import SF_SMOKE


def test_jl_projection_preserves_scaled_norms(spark):
    # E[|y|^2] = |v|^2 for the Achlioptas ±1/sqrt(k) construction; on a
    # real corpus the mean ratio must land near 1 (distance preservation)
    from mongo_hadoop_spark.functions import norm2
    from mongo_hadoop_spark.session import table

    proj = embedding_random_projection(spark, SF_SMOKE)
    pn = proj.select(
        "vec_id",
        sum((F.col(f"p{k}") * F.col(f"p{k}") for k in range(JL_DIMS)),
            F.lit(0.0)).alias("py2"))
    orig = table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", norm2(F.col("embedding")).alias("x2"))
    r = (pn.join(orig, "vec_id")
         .agg(F.avg(F.col("py2") / F.col("x2")).alias("ratio"))
         .first())
    assert 0.5 < r["ratio"] < 2.0


def test_pca_model_shapes_and_order(spark):
    mu, comps, eigvals = pca_model(spark, SF_SMOKE)
    assert len(mu) == 64
    assert len(comps) == PCA_DIMS and all(len(w) == 64 for w in comps)
    # descending variance order
    assert eigvals == sorted(eigvals, reverse=True)
    assert eigvals[-1] > 0


def test_frozen_model_matches_fit(spark):
    """The checked-in pretrained model (applied by the registry's
    embedding_pca_whitened and its DuckDB oracle) must equal a fresh
    pca_model fit at the fit corpus — the regeneration pin for
    tools/fit_pca.py.

    The moment aggregations are exact (decimal sums), so ``mu`` pins
    bit-for-bit; the eigendecomposition goes through LAPACK, whose
    reduction order is NOT bit-stable across BLAS threading contexts
    (observed ULP-level run-to-run drift in this container), so
    components/eigenvalues pin to 1e-9 relative — far below any real
    fit-code change, far above LAPACK noise.  The cross-engine hash
    gate is unaffected either way: both engines apply the same frozen
    literals.
    """
    mu, comps, eigvals = pca_model(spark, PCA_FIT_SF_DIR)
    assert mu == PCA_MU
    assert len(comps) == len(PCA_COMPS)
    for got_w, want_w in zip(comps, PCA_COMPS):
        for g, w in zip(got_w, want_w):
            assert abs(g - w) <= 1e-9 * max(1.0, abs(w))
    for g, w in zip(eigvals, PCA_EIGVALS):
        assert abs(g - w) <= 1e-9 * max(1.0, abs(w))


def test_whitened_output_has_identity_covariance(spark):
    # the frozen model was fitted at SF_SMOKE, so the whitening property
    # (zero mean, identity covariance) holds exactly there
    assert PCA_FIT_SF_DIR == SF_SMOKE
    got = embedding_pca_whitened(spark, SF_SMOKE)
    n = got.count()
    aggs = []
    for a in range(PCA_DIMS):
        aggs.append(F.avg(F.col(f"w{a}")).alias(f"m{a}"))
        for b in range(a, PCA_DIMS):
            aggs.append(
                F.avg(F.col(f"w{a}") * F.col(f"w{b}")).alias(f"c{a}_{b}"))
    r = got.agg(*aggs).first().asDict()
    assert n > 0
    for a in range(PCA_DIMS):
        # centered: projection of (v - mu) has zero mean
        assert abs(r[f"m{a}"]) < 1e-6
        # unit variance on the diagonal
        assert abs(r[f"c{a}_{a}"] - 1.0) < 1e-6
        for b in range(a + 1, PCA_DIMS):
            # decorrelated off the diagonal
            assert abs(r[f"c{a}_{b}"]) < 1e-6
