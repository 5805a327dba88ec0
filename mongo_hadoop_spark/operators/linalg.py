"""Distributed embedding linear algebra: exact Gram matrix and
Johnson-Lindenstrauss random projection.

Why these two: at training-data scale the embedding table is the widest
asset in the corpus, and the two standard global operations over it are
(a) second-moment statistics (the Gram / covariance matrix — the input
to PCA whitening, spectral diagnostics, and data-attribution methods)
and (b) dimensionality reduction before ANN indexing (random projection
— the JL lemma guarantees pairwise-distance preservation with an
oblivious, data-independent matrix, which is why production pipelines
run it *before* IVF/PQ training rather than PCA when the corpus is too
big to look at twice).

Scale shapes (100 TB):
- Gram: the d(d+1)/2 upper-triangle products are generated row-locally
  (CPU, not shuffle) and partially aggregated map-side, so the one
  shuffle carries at most d(d+1)/2 rows *per map partition* (2,080 for
  d=64) regardless of corpus size.  Sums go through exact
  ``decimal(27,10)`` so the result is bit-identical across engines and
  partitionings (the same order-independence trick as the Lloyd rounds
  in operators/similarity.py).
- JL projection: entirely row-local — one fold per output dimension
  against a *literal* sign matrix, no shuffle at all.  The sign matrix
  is derived from md5 at plan-build time (Achlioptas ±1 construction),
  so the projection is reproducible everywhere without a stored model,
  and the identical literals are embedded in the DuckDB oracle.

Reference context: the connector has no linear-algebra surface; these
are driver-mandated training-data-pipeline extensions (BASELINE.json).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mongo_hadoop_spark.functions import dec_to_double, dec_to_double_sql
from mongo_hadoop_spark.session import table

EMB_DIM = 64      # embeddings.parquet vector width
JL_DIMS = 8       # projected dimensionality


def _dlit(v: float) -> str:
    """Exact double literal for BOTH SQL dialects.  A plain decimal
    literal (``-0.009130519425199999``) parses as DECIMAL in DuckDB
    first — silently losing low bits even under ``::double`` — while an
    exponent-suffixed literal parses directly as DOUBLE (correctly
    rounded, round-trips repr exactly); Spark treats exponent literals
    as DOUBLE too."""
    s = repr(float(v))
    return s if ("e" in s or "E" in s) else s + "e0"


def _jl_sign(k: int, i: int) -> int:
    """Deterministic ±1 from md5("jl:k:i") — computed at plan-build time
    so both engines see the same literal matrix (an oblivious seeded
    projection, as in practice)."""
    h = hashlib.md5(f"jl:{k}:{i}".encode()).hexdigest()
    return 1 if int(h[:8], 16) % 2 == 0 else -1


_JL_SIGNS = [[_jl_sign(k, i) for i in range(EMB_DIM)] for k in range(JL_DIMS)]


def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram matrix G[i][j] = Σ_rows v_i · v_j, exact.

    Two nested posexplodes generate the per-row products (row-local);
    the groupBy on (i, j) partial-aggregates map-side to ≤ d(d+1)/2
    rows per partition before the shuffle.  Products are computed in
    double (IEEE-identical on both engines), then quantized to exact
    1e-10 integer units via ``floor`` — NOT a double→decimal cast, which
    engines round by different algorithms (DuckDB multiplies by 10^scale
    in FP and rounds, Spark rounds the exact binary expansion; the
    divergence flipped per-row casts ~once per 1.5M rows at sf0.1 in
    events_value_anomalies).  ``floor`` is a single exact IEEE op in
    both engines, the unit sum is order-independent integer arithmetic
    in DECIMAL(38,0), and the one conversion back to double goes through
    :func:`~mongo_hadoop_spark.functions.dec_to_double`.
    """
    emb = table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "embedding", F.posexplode("embedding").alias("i", "xi"))
    pairs = flat.select(
        "i", "xi", F.posexplode("embedding").alias("j", "xj"),
    ).where(F.col("j") >= F.col("i"))
    prod_units = F.floor(
        F.col("xi").cast("double") * F.col("xj").cast("double")
        * F.lit(1e10)).cast("decimal(38,0)")
    return (pairs.groupBy("i", "j")
            .agg((dec_to_double(F.sum(prod_units)) / F.lit(1e10)).alias("g"))
            .orderBy("i", "j"))


GRAM_SQL = f"""
WITH flat AS (
  SELECT gi.i AS i, gj.j AS j,
         floor(embedding[i + 1]::double * embedding[j + 1]::double
               * 1e10)::bigint::decimal(38,0) AS p
  FROM embeddings,
       generate_series(0, {EMB_DIM - 1}) AS gi(i),
       generate_series(0, {EMB_DIM - 1}) AS gj(j)
  WHERE j >= i
)
SELECT i, j, {dec_to_double_sql('sum(p)')} / 1e10 AS g
FROM flat GROUP BY i, j ORDER BY i, j
"""


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection to ``JL_DIMS`` dims: y_k = (s_k · v) / sqrt(k).

    Each output dimension is one left-to-right double fold against a ±1
    literal row of the sign matrix — identical accumulation order to
    DuckDB's ``list_dot_product``, so values are bit-equal.  No shuffle;
    the plan is a pure map over the scan (no output sort: the driver's
    compare is order-insensitive, and a global orderBy over the full
    projection would be a pointless total-sort shuffle at 100 TB).
    """
    emb = table(spark, sf_dir, "embeddings")
    cols = [F.col("vec_id")]
    for k in range(JL_DIMS):
        signs = "array(" + ", ".join(
            f"{s}.0" for s in _JL_SIGNS[k]) + ")"
        # one SQL expression per output dim (not 64 F.lit py4j calls)
        fold = (f"aggregate(zip_with(embedding, {signs},"
                f" (x, y) -> cast(x AS double) * y),"
                f" cast(0.0 AS double), (acc, x) -> acc + x)")
        cols.append(
            (F.expr(fold) / F.lit(float(JL_DIMS) ** 0.5)).alias(f"p{k}"))
    return emb.select(*cols)


def _jl_sql() -> str:
    exprs = []
    for k in range(JL_DIMS):
        signs = "[" + ", ".join(f"{s}.0" for s in _JL_SIGNS[k]) + "]"
        exprs.append(
            f"list_dot_product(list_transform(embedding, x -> x::double),"
            f" {signs}::double[]) / sqrt({float(JL_DIMS)!r}) AS p{k}")
    return ("SELECT vec_id, " + ", ".join(exprs)
            + " FROM embeddings")


PCA_DIMS = 8      # whitened output dimensionality
PCA_EPS = 1e-9    # variance floor before the inverse square root


def pca_model(spark: SparkSession, sf_dir: str):
    """Fit the PCA whitening model: exact first/second moments from two
    tiny aggregations (decimal(27,10) sums — order-independent), then an
    eigendecomposition of the d×d covariance on the driver.

    Returns (mean, components, eigenvalues) as Python lists; components
    are rows of eigvectors for the top ``PCA_DIMS`` variances.  The
    driver-side work is O(d²) collect + O(d³) eigh on a 64×64 matrix —
    constant in corpus size, the legitimate "small model on the driver"
    pattern (same class as the broadcast IVF centroids).
    """
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    flat = emb.select("embedding",
                      F.posexplode("embedding").alias("i", "xi"))
    mean_rows = (flat.groupBy("i")
                 .agg((F.sum(F.col("xi").cast("decimal(27,10)"))
                       .cast("double") / F.count(F.lit(1))).alias("m"))
                 .collect())
    mu = [0.0] * EMB_DIM
    for r in mean_rows:
        mu[r["i"]] = r["m"]
    pairs = flat.select(
        "i", "xi", F.posexplode("embedding").alias("j", "xj"),
    ).where(F.col("j") >= F.col("i"))
    prod = (F.col("xi").cast("double") * F.col("xj").cast("double")
            ).cast("decimal(27,10)")
    gram_rows = (pairs.groupBy("i", "j")
                 .agg(dec_to_double(F.sum(prod)).alias("g"),
                      F.count(F.lit(1)).alias("n"))
                 .collect())
    n = gram_rows[0]["n"] if gram_rows else 1
    cov = np.zeros((EMB_DIM, EMB_DIM))
    for r in gram_rows:
        v = r["g"] / n - mu[r["i"]] * mu[r["j"]]
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = v
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:PCA_DIMS]
    comps = eigvecs[:, order].T          # (PCA_DIMS, d)
    # sign convention: make the largest-|w| coefficient positive so the
    # model is unique (eigh's sign is arbitrary)
    for k in range(comps.shape[0]):
        if comps[k][np.argmax(np.abs(comps[k]))] < 0:
            comps[k] = -comps[k]
    return mu, comps.tolist(), eigvals[order].tolist()


def embedding_pca_whitened_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-fitted PCA whitening: y_k = (w_k · (v − μ)) / sqrt(λ_k + ε)
    with the model fitted on ``sf_dir`` itself (``pca_model``).

    The fitted model is embedded as literal arrays (the broadcast-small-
    model pattern), so the projection is a pure map — one mean-
    subtraction zip and ``PCA_DIMS`` folds per row, no shuffle.  The fit
    itself has no SQL equivalent (eigh), so this corpus-adaptive variant
    is the Python API; the registry entry ``embedding_pca_whitened``
    applies the FROZEN pretrained model instead and hash-gates fully.
    """
    mu, comps, eigvals = pca_model(spark, sf_dir)
    return _apply_whitening(table(spark, sf_dir, "embeddings"),
                            mu, comps, eigvals)


def _apply_whitening(emb: DataFrame, mu, comps, eigvals) -> DataFrame:
    mu_sql = "array(" + ", ".join(_dlit(m) for m in mu) + ")"
    centered = F.expr(
        f"zip_with(embedding, {mu_sql}, (x, y) -> cast(x AS double) - y)")
    out = emb.select("vec_id", centered.alias("c"))
    cols = [F.col("vec_id")]
    for k in range(PCA_DIMS):
        w_sql = "array(" + ", ".join(_dlit(w) for w in comps[k]) + ")"
        fold = (f"aggregate(zip_with(c, {w_sql}, (x, y) -> x * y),"
                f" cast(0.0 AS double), (acc, x) -> acc + x)")
        scale = (eigvals[k] + PCA_EPS) ** 0.5
        cols.append((F.expr(fold) / F.lit(scale)).alias(f"w{k}"))
    return out.select(*cols)


def embedding_pca_whitened(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA whitening with the PRETRAINED model — the production shape.

    y_k = (w_k · (v − μ)) / sqrt(λ_k + ε), where (μ, w, λ) is the model
    fitted offline by ``tools/fit_pca.py`` (= ``pca_model``: two exact
    constant-size decimal aggregations + an O(d³) driver eigh) on the
    sf0.001 reference corpus and frozen into ``_pca_frozen.py``.  This
    mirrors how whitening runs on a real 100 TB pipeline: the model is
    fitted once on a sample job and *applied* everywhere as broadcast
    literals — the application plan here is a pure map (zip + 8 folds
    per row), zero shuffles, zero driver work.

    Fully oracle-gated: the identical literals are embedded in the
    DuckDB SQL (the JL literal-matrix pattern) — Spark's left-fold
    ``aggregate(zip_with(...))`` accumulates in the same order as
    DuckDB's ``list_dot_product``, and the per-component scale
    ``sqrt(λ_k + ε)`` is precomputed in Python and embedded as the same
    literal on both sides, so values are bit-equal.  The fit itself is
    regeneration-pinned by pytest (frozen literals == fresh
    ``pca_model`` fit at the fit corpus), and the whitening property
    (zero mean, identity covariance at the fit corpus) is pinned too.
    """
    from mongo_hadoop_spark.operators._pca_frozen import (
        PCA_COMPS, PCA_EIGVALS, PCA_MU,
    )

    return _apply_whitening(table(spark, sf_dir, "embeddings"),
                            PCA_MU, PCA_COMPS, PCA_EIGVALS)


def _pca_whitened_sql() -> str:
    # NOT list_dot_product: DuckDB's list sums are compensated (Kahan),
    # so they can differ from Spark's plain left fold in the last ulp on
    # non-exact products (the JL oracle gets away with it only because
    # its ±1 multiplications are exact).  An explicit left-associated
    # term chain rounds exactly like aggregate(zip_with(...)).
    from mongo_hadoop_spark.operators._pca_frozen import (
        PCA_COMPS, PCA_EIGVALS, PCA_MU,
    )

    exprs = []
    for k in range(PCA_DIMS):
        terms = " + ".join(
            f"(embedding[{i + 1}]::double - {_dlit(PCA_MU[i])})"
            f" * {_dlit(PCA_COMPS[k][i])}"
            for i in range(EMB_DIM))
        scale = _dlit((PCA_EIGVALS[k] + PCA_EPS) ** 0.5)
        exprs.append(f"({terms}) / {scale} AS w{k}")
    return "SELECT vec_id, " + ", ".join(exprs) + " FROM embeddings"


QUERIES = {
    "embedding_gram_matrix": embedding_gram_matrix,
    "embedding_random_projection": embedding_random_projection,
    "embedding_pca_whitened": embedding_pca_whitened,
}

ORACLES = {
    "embedding_gram_matrix": GRAM_SQL,
    "embedding_random_projection": _jl_sql(),
    "embedding_pca_whitened": _pca_whitened_sql(),
}
