"""Fixed-point PageRank over the near-dup graph (operators/graph.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mongo_hadoop_spark.operators import graph
from mongo_hadoop_spark.operators.graph import (
    PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM, PR_ROUNDS, PR_SCALE,
)

from conftest import SF_SMOKE


def _reference_pagerank(pairs: list[tuple[int, int]],
                        rounds: int = PR_ROUNDS) -> dict[int, int]:
    """The module's integer recurrence, straight-line Python — the
    independent arbiter for the distributed plan."""
    edges: list[tuple[int, int]] = []
    for a, b in pairs:
        edges.append((a, b))
        edges.append((b, a))
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: PR_SCALE for n in deg}
    for _ in range(rounds):
        insum = {n: 0 for n in deg}
        for s, d in edges:
            insum[d] += rank[s] // deg[s]
        rank = {n: PR_BASE + (PR_DAMP_NUM * insum[n]) // PR_DAMP_DEN
                for n in deg}
    return rank


def _spark_pagerank(spark, pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Run the production loop on an injected edge list (bypassing the
    MinHash pair generator) by monkey-free recomposition: the loop body
    is what we pin, so rebuild it from the module's own building blocks."""
    pdf = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    edges = (pdf.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
             .unionByName(pdf.select(F.col("doc_b").alias("src"),
                                     F.col("doc_a").alias("dst"))))
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg"))
    ranks = deg.select("node", F.lit(PR_SCALE).cast("long").alias("rank_fp"),
                       "deg")
    for _ in range(PR_ROUNDS):
        contrib = ranks.select("node", F.expr("rank_fp div deg").alias("c"))
        insum = (edges.join(contrib, edges.src == contrib.node)
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum("c").alias("insum")))
        ranks = (deg.join(insum, "node", "left")
                 .select("node",
                         (F.lit(PR_BASE) + F.expr(
                             f"({PR_DAMP_NUM} * coalesce(insum, 0L)) "
                             f"div {PR_DAMP_DEN}")).alias("rank_fp"),
                         "deg"))
    return {r["node"]: r["rank_fp"] for r in ranks.collect()}


TOPOLOGIES = {
    "single_edge": [(1, 2)],
    "path": [(1, 2), (2, 3), (3, 4), (4, 5)],
    "star": [(1, k) for k in range(2, 9)],
    "clique4": [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
    "two_components": [(1, 2), (2, 3), (10, 11)],
    "barbell": [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)],
}


def test_pagerank_matches_reference_on_adversarial_topologies(spark):
    for name, pairs in TOPOLOGIES.items():
        got = _spark_pagerank(spark, pairs)
        want = _reference_pagerank(pairs)
        assert got == want, f"topology {name}: {got} != {want}"


def test_pagerank_star_center_dominates(spark):
    got = _spark_pagerank(spark, TOPOLOGIES["star"])
    center = got[1]
    for leaf in range(2, 9):
        assert got[leaf] < center
    # regular graphs (cliques) have uniform rank: each node sends
    # rank div deg to deg symmetric neighbors, so all nodes stay equal
    # (the exact value sits just under PR_SCALE — `div` truncation
    # leaks mass, e.g. S div 3 * 3 = S - 1)
    clique = _spark_pagerank(spark, TOPOLOGIES["clique4"])
    assert len(set(clique.values())) == 1
    assert abs(next(iter(clique.values())) - PR_SCALE) <= PR_ROUNDS


def test_pagerank_corpus_query_shape(spark):
    df = graph.graph_pagerank_neardup(spark, SF_SMOKE)
    rows = df.collect()
    assert rows, "smoke corpus has verified near-dup pairs"
    assert df.columns == ["doc_id", "rank_fp", "deg"]
    # mass sanity: every rank is >= the teleport floor and bounded by
    # base + 0.85 * (in-degree-weighted max possible contribution)
    for r in rows:
        assert r["rank_fp"] >= PR_BASE
    # degree histogram accounts for exactly the same node set
    hist = graph.graph_degree_histogram(spark, SF_SMOKE).collect()
    assert sum(h["n_nodes"] for h in hist) == len(rows)


def test_survivors_by_authority_pick_max_rank_member(spark):
    from mongo_hadoop_spark.operators.dedup import dedup_connected_clusters

    surv = {r["cluster_id"]: (r["survivor"], r["cluster_size"], r["rank_fp"])
            for r in graph.dedup_survivors_by_authority(
                spark, SF_SMOKE).collect()}
    assert surv, "smoke corpus has multi-doc clusters"
    members: dict[int, list[int]] = {}
    for r in dedup_connected_clusters(spark, SF_SMOKE).collect():
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    rank = {r["doc_id"]: r["rank_fp"]
            for r in graph.graph_pagerank_neardup(spark, SF_SMOKE).collect()}
    for cid, (winner, sz, rfp) in surv.items():
        mem = members[cid]
        assert len(mem) == sz >= 2
        assert winner in mem
        best = max(rank[m] for m in mem)
        assert rank[winner] == best == rfp
        # tiebreak: smallest doc_id among max-rank members
        assert winner == min(m for m in mem if rank[m] == best)
    # every size>=2 cluster is decided, singletons are absent
    assert set(surv) == {c for c, ms in members.items() if len(ms) >= 2}
