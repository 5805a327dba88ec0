"""Connected-components dedup clustering (operators/dedup.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mongo_hadoop_spark.operators import dedup

from conftest import SF_SMOKE


def test_clusters_are_transitive_and_canonical(spark):
    cc = dedup.dedup_connected_clusters(spark, SF_SMOKE)
    rows = cc.collect()
    assert len(rows) == 500                      # every doc labeled
    label = {r["doc_id"]: r["cluster_id"] for r in rows}
    # representative is the min member: cluster_id <= doc_id, and the
    # representative's own label is itself
    for d, c in label.items():
        assert c <= d
        assert label[c] == c
    # transitivity against the edge set: endpoints share a label
    pairs = dedup.dedup_minhash_verified(spark, SF_SMOKE).collect()
    assert pairs, "verified pair set must be non-empty at smoke scale"
    for p in pairs:
        assert label[p["doc_a"]] == label[p["doc_b"]]
    # at least one transitive chain exists (some cluster of size >= 3
    # where not every member pair was a direct edge would be ideal, but
    # minimally: clusters collapse more docs than pair count implies)
    n_clustered = sum(1 for d, c in label.items() if c != d)
    assert n_clustered > 0


def test_cluster_stats_account_for_corpus(spark):
    rows = dedup.dedup_cluster_stats(spark, SF_SMOKE).collect()
    assert sum(r["cluster_size"] * r["n_clusters"] for r in rows) == 500
    assert sum(r["docs_dropped"] for r in rows) == \
        sum((r["cluster_size"] - 1) * r["n_clusters"] for r in rows)


def _labels(spark, pairs):
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(a=x, b=y) for x, y in pairs])
    got = dedup.connected_component_labels(df, "a", "b").collect()
    return {r["node"]: r["label"] for r in got}


def test_cc_long_path_exercises_pointer_jumping(spark):
    """A 60-node path graph has diameter 59 — plain Hash-Min would need
    59 supersteps, beyond CC_MAX_ROUNDS=16; pointer jumping must close
    it in ~log2(59) ≈ 6."""
    n = 60
    lab = _labels(spark, [(i, i + 1) for i in range(n - 1)])
    assert set(lab.values()) == {0}
    assert len(lab) == n


def test_cc_multiple_components_and_shapes(spark):
    pairs = (
        [(1, 2), (2, 3), (3, 1)]          # triangle  → label 1
        + [(10, 11), (11, 12)]            # path      → label 10
        + [(20, 21), (20, 22), (20, 23)]  # star      → label 20
        + [(30, 31)]                      # edge      → label 30
    )
    lab = _labels(spark, pairs)
    assert {n: lab[n] for n in (1, 2, 3)} == {1: 1, 2: 1, 3: 1}
    assert {lab[10], lab[11], lab[12]} == {10}
    assert {lab[20], lab[21], lab[22], lab[23]} == {20}
    assert {lab[30], lab[31]} == {30}


def test_cc_bridged_components_merge(spark):
    # two cliques bridged by one edge — the canonical "A≈B, B≈C" case
    pairs = [(1, 2), (1, 3), (2, 3), (7, 8), (7, 9), (8, 9), (3, 7)]
    lab = _labels(spark, pairs)
    assert set(lab.values()) == {1}


def test_cc_empty_pair_graph_returns_empty_labels(spark):
    """Zero input pairs must yield empty labels on round 1, not spin all
    CC_MAX_ROUNDS and raise (r12 advisor: SUM over zero rows observes
    NULL, and `None == 0` is False)."""
    empty = (spark.createDataFrame([(1, 2)], "a long, b long")
             .where(F.lit(False)))
    got = dedup.connected_component_labels(empty, "a", "b").collect()
    assert got == []
