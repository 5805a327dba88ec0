"""Sqrt-temperature source mixing and cluster-stratified sampling."""

import math

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mongo_hadoop_spark.operators import analytics, similarity


def _write_docs(spark, tmp_path, sources):
    """sources: dict source -> n docs."""
    rows = []
    i = 0
    for s, n in sources.items():
        for _ in range(n):
            rows.append((i, f"text {i}", "en", s, 10))
            i += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_mixture_downweights_big_sources(spark, tmp_path):
    """A 100x bigger source must keep a ~10x (not 100x) larger sample —
    the alpha=1/2 temperature property."""
    sf = _write_docs(spark, tmp_path, {"small": 20, "big": 2000})
    rows = {r["source"]: r for r in
            analytics.corpus_source_mixture(spark, sf).collect()}
    # keep rate = min(1, sqrt(CAP/n)): small keeps most, big keeps few
    assert rows["small"]["keep_threshold"] > rows["big"]["keep_threshold"]
    exp_small = min(1.0, math.sqrt(analytics.MIX_CAP / 20))
    exp_big = math.sqrt(analytics.MIX_CAP / 2000)
    # hash-threshold sampling concentrates around the expected rate
    assert abs(rows["small"]["n_kept"] / 20 - exp_small) < 0.35
    assert abs(rows["big"]["n_kept"] / 2000 - exp_big) < 0.05
    # sub-proportional growth: 100x docs -> way under 100x kept
    assert rows["big"]["n_kept"] < 20 * rows["small"]["n_kept"]


def test_mixture_docs_agree_with_report(spark):
    """The doc-level manifest and the per-source report count the same
    survivors, and the manifest is a subset of the corpus."""
    rep = {r["source"]: r["n_kept"] for r in
           analytics.corpus_source_mixture(spark, SF_SMOKE).collect()}
    docs = analytics.corpus_source_mixture_docs(spark, SF_SMOKE)
    got = {r["source"]: r["n"] for r in
           docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {s: n for s, n in rep.items() if n > 0} == got


def test_cluster_sample_bounded_per_cell(spark):
    """At most K vectors per IVF cell; every non-empty cell represented."""
    samp = similarity.embeddings_cluster_sample(spark, SF_SMOKE)
    per_cell = samp.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] <= similarity.CLUSTER_SAMPLE_K for r in per_cell)
    cells = {r["centroid_id"] for r in
             similarity.ivf_assign(spark, SF_SMOKE)
             .select("centroid_id").distinct().collect()}
    assert {r["centroid_id"] for r in per_cell} == cells


def test_mixture_plan_broadcast_counts(spark):
    """The per-source count table reaches the scan as a broadcast join;
    the keep decision is row-local (no extra shuffle of documents)."""
    plan = analytics.corpus_source_mixture_docs(spark, SF_SMOKE)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
