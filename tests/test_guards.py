"""Quadratic-baseline guards: exhaustive operators refuse huge inputs."""

import pytest

from mongo_hadoop_spark.guards import (
    DEFAULT_QUADRATIC_MAX_ROWS,
    QuadraticInputError,
    guard_quadratic,
    quadratic_max_rows,
)
from mongo_hadoop_spark.operators import dedup, similarity

from conftest import SF_SMOKE


def test_guard_passes_small_input(spark):
    df = spark.range(10)
    assert guard_quadratic(df, "op", "alt") is df


def test_guard_trips_above_bound(spark):
    df = spark.range(50)
    with pytest.raises(QuadraticInputError, match="use ivf_knn|Use ivf_knn"):
        guard_quadratic(df, "knn_bruteforce", "ivf_knn", max_rows=49)


def test_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_QUADRATIC_MAX_ROWS", "123")
    assert quadratic_max_rows() == 123
    monkeypatch.delenv("SPARK_GRAFT_QUADRATIC_MAX_ROWS")
    assert quadratic_max_rows() == DEFAULT_QUADRATIC_MAX_ROWS


def test_ngram_jaccard_guard_trips(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_QUADRATIC_MAX_ROWS", "10")
    with pytest.raises(QuadraticInputError, match="dedup_minhash_verified"):
        dedup.dedup_ngram_jaccard(spark, SF_SMOKE)


def test_knn_bruteforce_guard_trips(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_QUADRATIC_MAX_ROWS", "10")
    with pytest.raises(QuadraticInputError, match="ivf_knn"):
        similarity.knn_bruteforce(spark, SF_SMOKE)


def test_gates_unchanged_at_default_bound(spark):
    # the smoke tables are far under the default bound — operators build fine
    assert dedup.dedup_ngram_jaccard(spark, SF_SMOKE).count() >= 0
    assert similarity.knn_bruteforce(spark, SF_SMOKE).count() >= 0


def test_probe_cache_reused(spark, monkeypatch):
    from mongo_hadoop_spark import guards

    guards._PROBE_CACHE.clear()
    df = spark.range(10)
    guards.guard_quadratic(df, "op", "alt", max_rows=50, cache_key="k1")
    key = (guards._source_identity("k1"), 50)
    assert guards._PROBE_CACHE[key] == 10
    # cached value is used even if the underlying df would now differ
    guards._PROBE_CACHE[key] = 3
    assert guards.guard_quadratic(spark.range(100), "op", "alt",
                                  max_rows=50, cache_key="k1") is not None
    # env-bound changes key → fresh probe trips the guard
    import pytest as _pt
    with _pt.raises(guards.QuadraticInputError):
        guards.guard_quadratic(spark.range(100), "op", "alt",
                               max_rows=20, cache_key="k1")


def test_probe_cache_invalidated_on_file_change(spark, tmp_path):
    """Regenerating a source file in place (new mtime/size) must not serve
    a stale probe — the cache key embeds the file's stat identity."""
    from mongo_hadoop_spark import guards

    guards._PROBE_CACHE.clear()
    p = tmp_path / "documents.parquet"
    p.write_bytes(b"v1")
    key = str(tmp_path / "documents")  # stem form, as operators pass it
    guards.guard_quadratic(spark.range(10), "op", "alt",
                           max_rows=50, cache_key=key)
    assert len(guards._PROBE_CACHE) == 1
    # rewrite the file: different size → different identity → fresh probe
    p.write_bytes(b"v2-regenerated")
    guards.guard_quadratic(spark.range(10), "op", "alt",
                           max_rows=50, cache_key=key)
    assert len(guards._PROBE_CACHE) == 2


@pytest.mark.parametrize("op, fixed_twin", [
    ("ivf_assign", "ivf_assign_fixed"),
    ("ivf_assign_refined", "ivf_assign_fixed"),
    ("ivf_assign_lloyd", "ivf_assign_fixed"),
    ("embedding_pq_codes", "embedding_pq_codes_fixed"),
    ("embedding_pq_codes_trained", "embedding_pq_codes_fixed"),
    ("ivf_pq_knn", "ivf_pq_knn_fixed"),
])
def test_mod_slice_teaching_variants_guarded(spark, monkeypatch, op,
                                             fixed_twin):
    """r11 (verdict item 3): the mod-slice variants carry centroid/codebook
    tables ∝ N (2.4-3.5x at 8x, SCALE.md r10) — each refuses oversized
    inputs with a pointer to its corpus-independent _fixed twin."""
    from mongo_hadoop_spark import guards

    guards._PROBE_CACHE.clear()
    monkeypatch.setenv("SPARK_GRAFT_QUADRATIC_MAX_ROWS", "10")
    with pytest.raises(QuadraticInputError, match=fixed_twin):
        getattr(similarity, op)(spark, SF_SMOKE)
    guards._PROBE_CACHE.clear()


def test_mod_slice_variants_build_at_default_bound(spark):
    # smoke tables sit far under 200k rows — plans still build and run
    assert similarity.ivf_assign(spark, SF_SMOKE).count() >= 0
    assert similarity.embedding_pq_codes(spark, SF_SMOKE).count() >= 0
