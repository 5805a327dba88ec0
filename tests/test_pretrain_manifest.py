"""Round-6 flagship: the composed CCNet/Gopher/DSIR selection funnel
(operators/pipeline.py::corpus_pretrain_manifest)."""

from __future__ import annotations

from mongo_hadoop_spark.operators.pipeline import corpus_pretrain_manifest

from conftest import SF_SMOKE


def test_funnel_is_monotone_and_covers_corpus(spark):
    rows = corpus_pretrain_manifest(spark, SF_SMOKE).collect()
    assert rows, "manifest must not be empty"
    total_raw = sum(r["n_docs_raw"] for r in rows)
    assert total_raw == 500  # every document accounted for exactly once
    for r in rows:
        # each gate ANDs the previous: counts can only shrink
        assert (r["n_docs_raw"] >= r["n_gopher"] >= r["n_ppl_head_middle"]
                >= r["n_span_clean"] >= r["n_selected"] >= 0)
        if r["n_selected"] == 0:
            assert r["tokens_selected"] == 0
        else:
            assert r["tokens_selected"] > 0
    # the funnel must actually select something corpus-wide
    assert sum(r["n_selected"] for r in rows) > 0


def test_manifest_plan_shape(spark):
    """One declarative plan: threshold cuts are broadcast scalar joins
    (never a cartesian of data rows), no single-partition Window over
    the corpus, stage joins are doc_id-keyed."""
    plan = (corpus_pretrain_manifest(spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "percentile_disc" in plan
