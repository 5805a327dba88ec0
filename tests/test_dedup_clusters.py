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
