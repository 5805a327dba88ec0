"""Gopher repetition rules (operators/repetition.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Row

from mongo_hadoop_spark.operators import repetition

from conftest import SF_SMOKE


def test_fractions_hand_computed(spark):
    """Pin the statistic on a hand-checkable document: 'a b a b c'
    (n_chars = 9).  Top 2-gram is 'a b' (2 occurrences × 3 chars = 6/9);
    it is also the only duplicated n-gram but n=2 is a top-rule size, so
    every dup{5..10} fraction is 0."""
    import os
    import tempfile

    df = spark.createDataFrame(
        [Row(doc_id=0, text="a b a b c", lang="en", source="s",
             n_chars=9)])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        r = repetition.text_repetition_flags(spark, td).collect()[0]
    assert r["top2_frac"] == 6.0 / 9.0
    # top 3-gram: 'a b a' / 'b a b' / 'a b c' all once → 5 chars / 9
    assert r["top3_frac"] == 5.0 / 9.0
    assert r["top4_frac"] == 7.0 / 9.0   # 'a b a b' once → 7/9
    for n in range(5, 11):
        assert r[f"dup{n}_frac"] == 0.0
    assert r["keep"] is False            # top2 6/9 > 0.20


def test_short_docs_pass_vacuously(spark):
    import os
    import tempfile

    from pyspark.sql import Row
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [Row(doc_id=1, text="one", lang="en", source="s", n_chars=3)]
        ).write.parquet(os.path.join(td, "documents.parquet"))
        r = repetition.text_repetition_flags(spark, td).collect()[0]
    assert r["keep"] is True
    assert all(r[c] == 0.0 for c in r.asDict() if c.endswith("_frac"))


def test_yield_covers_all_sources(spark):
    rows = repetition.corpus_repetition_yield(spark, SF_SMOKE).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    for r in rows:
        assert 0 <= r["n_keep"] <= r["n_docs"]
        assert abs(r["keep_rate"] - r["n_keep"] / r["n_docs"]) < 1e-9
    # the gate is discriminative on the synthetic corpus (some fail)
    assert sum(r["n_keep"] for r in rows) < 500


def test_plan_is_one_doc_keyed_aggregation(spark):
    plan = (repetition.text_repetition_flags(spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan   # nothing corpus-global
