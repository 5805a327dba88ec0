"""Physical-plan shape assertions: the properties that make these queries
viable at 100 TB must be visible in explain() output — filters pushed to
the parquet scan, column pruning, broadcast joins for dims, partial
aggregation, no unexpected cartesian products.  Guards against plan
regressions the same way the oracle guards values.
"""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from mongo_hadoop_spark.operators import relational, windows, dedup, similarity


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def full_plan_of(df) -> str:
    return df._jdf.queryExecution().toString()


def test_q6_filter_pushdown_and_pruning(spark):
    df = relational.tpch_q6(spark, SF_SMOKE)
    plan = full_plan_of(df)
    # predicate reaches the parquet scan
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:400]
    # column pruning: only the needed columns are read
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema


def test_q3_broadcasts_customer_dim(spark):
    plan = plan_of(relational.tpch_q3(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q5_no_cartesian_all_broadcast_dims(spark):
    plan = plan_of(relational.tpch_q5(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    assert "CartesianProduct" not in plan


def test_q1_partial_aggregation(spark):
    plan = plan_of(relational.tpch_q1(spark, SF_SMOKE))
    # map-side partial agg before the shuffle (combiner analog, A4)
    assert "partial_sum" in plan or "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2


def test_window_partitioned_no_global_sort(spark):
    plan = plan_of(windows.window_topn_per_group(spark, SF_SMOKE))
    # ranking runs within o_custkey partitions; no single-partition window
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_minhash_lsh_no_cartesian(spark):
    plan = plan_of(dedup.dedup_minhash_lsh_pairs(spark, SF_SMOKE))
    # candidate generation must be an equi-join on (band, hash)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_knn_broadcasts_queries(spark):
    plan = plan_of(similarity.knn_bruteforce(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_topk_uses_take_ordered(spark):
    plan = plan_of(relational.f3_sort_limit(spark, SF_SMOKE))
    # orderBy().limit() must fuse into TakeOrderedAndProject, not global sort
    assert "TakeOrderedAndProject" in plan


def test_skip_pagination_take_ordered_no_global_window(spark):
    plan = plan_of(relational.f4_skip_pagination(spark, SF_SMOKE))
    # skip+limit must be a TakeOrderedAndProject (per-task top-(skip+n)),
    # never a single-partition global window / sort
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_whole_stage_codegen_on_scan_heavy_query(spark):
    df = relational.tpch_q1(spark, SF_SMOKE)
    df.collect()  # finalize the adaptive plan
    plan = plan_of(df)
    assert "*(" in plan  # WholeStageCodegen spans present


def test_q8_broadcasts_all_dims_no_cartesian(spark):
    from mongo_hadoop_spark.operators import relational4

    plan = plan_of(relational4.tpch_q8_market_share(spark, SF_SMOKE))
    # part, supplier, both nation aliases, region are all broadcast;
    # only the lineitem/orders/customer core may shuffle
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_ivf_nprobe_broadcasts_probe_side(spark):
    plan = plan_of(similarity.ivf_knn_nprobe(spark, SF_SMOKE))
    # probed (query, cell) pairs are tiny → broadcast; inverted lists stream
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_union_window_not_rangejoin(spark):
    from mongo_hadoop_spark.operators import asof

    plan = plan_of(asof.events_asof_last_order(spark, SF_SMOKE))
    # the whole point: NOT a range nest-loop — one shuffle + window
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_q2_window_decorrelation_all_dims_broadcast(spark):
    from mongo_hadoop_spark.operators import relational5

    plan = plan_of(relational5.tpch_q2_min_cost_supplier(spark, SF_SMOKE))
    # part/supplier/nation/region all broadcast; the correlated MIN is a
    # window pass, never a per-part re-scan or a sort-merge self-join
    assert plan.count("BroadcastHashJoin") >= 4
    assert "Window" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # only two shuffles survive: the partsupp distinct and the window key
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q16_not_in_is_broadcast_anti_join(spark):
    from mongo_hadoop_spark.operators import relational5

    plan = plan_of(relational5.tpch_q16_supplier_cnt(spark, SF_SMOKE))
    # NOT IN over the null-free supplier key compiles to a broadcast anti
    # join, not a nested-loop null-aware join
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q20_semi_join_threshold_is_broadcast_scalar(spark):
    from mongo_hadoop_spark.operators import relational5

    plan = plan_of(relational5.tpch_q20_excess_suppliers(spark, SF_SMOKE))
    # qualifying suppliers broadcast into a semi join against supplier; the
    # only nested-loop is the single-row threshold scalar
    assert "LeftSemi" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_pipeline_lookup_is_broadcast_join(spark):
    from mongo_hadoop_spark.operators import mongoagg

    plan = plan_of(mongoagg.pipeline_lookup_segment(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_aqe_splits_skewed_join_partitions(spark):
    """One hot key (90% of rows) must not serialize into one task: with
    skew thresholds scaled to test data, AQE marks the sort-merge join
    skew-split (isSkew=true) and the result matches the plain join."""
    import pyspark.sql.functions as F

    from mongo_hadoop_spark.operators.skew import skewed_join_aqe

    left = spark.range(200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(2_000).select(F.col("id").alias("k"),
                                      (F.col("id") * 2).alias("r"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = skewed_join_aqe(spark, left, right, "k")
        n = len(joined.collect())  # execute THIS plan so AQE finalizes it
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:2000]
        # correctness unchanged: hot key 7 joins once per left row
        assert n == left.join(right.hint("merge"), "k").count()
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_spend_quartiles_no_global_window(spark):
    from mongo_hadoop_spark.operators import windows

    plan = plan_of(windows.window_spend_quartiles(spark, SF_SMOKE))
    # threshold bucketing, never an unpartitioned ntile ranking
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_decontaminate_is_broadcast_shingle_join(spark):
    plan = plan_of(dedup.corpus_decontaminate(spark, SF_SMOKE))
    # benchmark shingles broadcast; training side streams — never all-pairs
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_groupingsets_single_shuffle_expand(spark):
    """GROUPING SETS computes all three marginals in one pass: Catalyst
    expands the sets row-wise (Expand + grouping-id) and aggregates with
    ONE shuffle — never one re-scan/re-shuffle per grouping set."""
    df = relational.groupingsets_agg(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "Expand" in plan                       # grouping-id expansion
    assert plan.count("Exchange") == 1            # one shuffle total
    assert plan.count("Scan parquet") == 1        # one scan of lineitem
    assert plan.count("HashAggregate") >= 2       # partial + final agg


def test_train_split_is_map_only_scan(spark):
    """Deterministic split assignment must stay a shuffle-free scan."""
    from mongo_hadoop_spark.operators import analytics
    plan = plan_of(analytics.documents_train_split(spark, SF_SMOKE))
    assert "Exchange" not in plan
    assert "Scan parquet" in plan


def test_per_user_sample_single_keyed_window(spark):
    """Per-key sample: one hash shuffle on user_id, never a global sort."""
    from mongo_hadoop_spark.operators import analytics
    plan = plan_of(analytics.events_per_user_sample(spark, SF_SMOKE))
    assert "Window" in plan
    assert "SinglePartition" not in plan
    assert plan.count("Exchange") == 1


def test_semantic_survivors_blocked_join_no_cartesian(spark):
    """Pair generation stays label-blocked; survivor filter is an
    equi-anti-join — no cross join anywhere."""
    plan = plan_of(similarity.dedup_semantic_survivors(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_containment_inverted_index_no_cartesian(spark):
    """Rare-shingle candidate join must be an equi-join on the shingle,
    never a cross join; verification joins are equi on doc ids."""
    plan = plan_of(dedup.dedup_containment(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rfm_single_customer_shuffle(spark):
    """RFM: one keyed aggregation over customers; the median cuts arrive
    as a broadcast 1-row side, not a window over all customers."""
    from mongo_hadoop_spark.operators import analytics
    plan = plan_of(analytics.orders_rfm_segments(spark, SF_SMOKE))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_heavy_hitters_candidates_broadcast(spark):
    """MG candidate set and the total-count scalar both arrive broadcast;
    the exact-count groupBy shuffles only candidate rows."""
    from mongo_hadoop_spark.operators import textstats
    plan = plan_of(textstats.text_heavy_hitters(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 1   # candidate semi-join
    assert "BroadcastNestedLoopJoin" in plan or plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_training_manifest_one_plan_broadcast_decontamination(spark):
    """Flagship composition stays one Catalyst plan: dedup shuffle +
    broadcast shingle join + final keyed agg; no cartesian anywhere."""
    from mongo_hadoop_spark.operators import pipeline
    plan = plan_of(pipeline.corpus_training_manifest(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan          # bench shingles broadcast
    assert "Window" in plan                     # keep-first dedup rank


def test_pq_codes_broadcast_codebooks_no_cartesian(spark):
    """PQ assignment: codebooks broadcast, argmin windowed per
    (vec_id, subspace), no cross join of vectors x centroids rows."""
    plan = plan_of(similarity.embedding_pq_codes(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_pq_adc_tables_broadcast_scan_in_code_domain(spark):
    """ADC: the per-query distance tables broadcast; the scan joins code
    ids only — no float payload in the wide side, no cartesian."""
    plan = plan_of(similarity.pq_knn_adc(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2  # codebooks + tables
    assert "CartesianProduct" not in plan


def test_pq_fixed_codebook_size_corpus_independent(spark):
    """The trained codebook is ≤ PQ_K entries per subspace regardless of
    corpus size (the linearity invariant: assignment cost per vector is
    constant), and assignment is ROW-LOCAL (r13): the codebook folds to
    a one-row broadcast map and each vector's 8 codes are array_min
    argmins in a projection — no explode, no per-vector shuffle, no
    window."""
    import re

    import pyspark.sql.functions as F

    cb = similarity._pq_fixed_codebook(spark, SF_SMOKE)
    sizes = {r["cj"]: r["n"] for r in
             cb.groupBy("cj").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == set(range(similarity.PQ_SUBSPACES))
    assert all(1 <= n <= similarity.PQ_K for n in sizes.values())

    plan = plan_of(similarity.embedding_pq_codes_fixed(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan  # one-row codebook map
    assert "CartesianProduct" not in plan
    # the corpus rows are never hash-shuffled: the old shape aggregated
    # N×8 candidate rows by vec_id — row-local argmin deletes it
    assert not re.search(r"hashpartitioning\(vec_id", plan)
    # and the assignment must NOT pay a row_number window either
    assert "row_number" not in plan


def test_pq_adc_fixed_constant_tables_no_cartesian(spark):
    """Row-local ADC (r13): codebook + distance tables fold to one-row
    broadcast maps; the only corpus-row shuffle left is the final
    per-query ranking window — the old (j, cid) join + N×8×Q-row
    groupBy(qid, vec_id) shuffle is gone."""
    import re

    plan = plan_of(similarity.pq_knn_adc_fixed(spark, SF_SMOKE))
    assert plan.count("BroadcastNestedLoopJoin") >= 2  # codebook + tables
    assert "CartesianProduct" not in plan
    assert not re.search(r"hashpartitioning\(qid#\d+L?, vec_id", plan)


def test_ivf_pq_knn_probe_and_tables_broadcast(spark):
    """IVF-PQ compose: probe lists and ADC tables broadcast into the
    code-domain scan; candidates restricted by cell equi-join, no
    cartesian anywhere."""
    plan = plan_of(similarity.ivf_pq_knn(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3  # probes + tables + codebook
    assert "CartesianProduct" not in plan


def test_semantic_survivors_lsh_band_equijoin(spark):
    """The LSH survivors path generates candidates from a (band, value)
    equi-join — no cartesian, no label-sized blocks — and drops
    dominated ids with one left-anti join."""
    plan = plan_of(similarity.dedup_semantic_survivors_lsh(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_semantic_survivors_ivf_cell_equijoin(spark):
    """The scale-path survivors op joins within IVF cells (equi-join on
    centroid_id) — no cartesian, no label-sized blocks."""
    plan = plan_of(similarity.dedup_semantic_survivors_ivf(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Bucketing is the 100 TB co-location lever: two tables bucketed by
    the join key join with ZERO Exchange — the shuffle was paid once at
    write time and amortizes over every later join.  This pins the
    engine-level contract the big fact-fact joins rely on."""
    import pyspark.sql.functions as F
    from mongo_hadoop_spark.session import table

    li = table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS b_li")
    spark.sql("DROP TABLE IF EXISTS b_o")
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a shuffle-family join so bucketing is what's under test
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .mode("overwrite").saveAsTable("b_li"))
        (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable("b_o"))
        joined = (spark.table("b_li")
                  .join(spark.table("b_o"),
                        F.col("l_orderkey") == F.col("o_orderkey"))
                  .groupBy("l_orderkey")
                  .agg(F.sum("l_quantity").alias("q")))
        assert joined.count() > 0  # finalize the adaptive plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # neither join input shuffles: the buckets ARE the partitioning
        # (and the groupBy on the same key rides it too)
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS b_li")
        spark.sql("DROP TABLE IF EXISTS b_o")


def test_vector_search_stage_take_ordered_and_pushdown(spark):
    """$vectorSearch plans as filter-pushed scan → score map →
    TakeOrderedAndProject: no global sort, no exchange, recall 1.0."""
    from mongo_hadoop_spark.operators import mongoagg

    df = mongoagg.pipeline_vector_search(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    full = full_plan_of(df)
    assert "GreaterThanOrEqual(label,1)" in full.split("PushedFilters:")[1][:300]


def test_gram_matrix_partial_aggregation(spark):
    """The d²/2 product explosion aggregates map-side: the plan must show
    a partial HashAggregate below the (i,j)-keyed Exchange, so the
    shuffle carries ≤ d(d+1)/2 rows per partition at any corpus size."""
    from mongo_hadoop_spark.operators import linalg

    df = linalg.embedding_gram_matrix(spark, SF_SMOKE)
    plan = plan_of(df)
    before_exchange = plan.split("Exchange")[-1]  # below the last Exchange
    assert "HashAggregate" in before_exchange
    assert "partial_sum" in plan or "merge_sum" in plan


def test_random_projection_no_shuffle(spark):
    """JL projection is a pure map — orderBy aside, no aggregation or
    join exchange appears anywhere in the plan."""
    from mongo_hadoop_spark.operators import linalg

    df = linalg.embedding_random_projection(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "Join" not in plan and "HashAggregate" not in plan


def test_search_bm25_broadcast_stats_no_cartesian_product(spark):
    """BM25's corpus-stats table joins as a 1-row broadcast (the Lucene-
    index role): the plan must show a broadcast nested-loop over the
    single-row stats side and no CartesianProduct."""
    from mongo_hadoop_spark.operators import mongoagg

    plan = plan_of(mongoagg.pipeline_search_bm25(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rank_fusion_broadcast_score_table(spark):
    """$rankFusion's fused k-row score table must broadcast back to the
    corpus — a shuffled join there would shuffle the whole corpus for a
    ≤k-row dimension."""
    from mongo_hadoop_spark.operators import mongoagg

    plan = plan_of(mongoagg.pipeline_rank_fusion(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_score_fusion_broadcast_stats_and_scores(spark):
    from mongo_hadoop_spark.operators import mongoagg

    plan = plan_of(mongoagg.pipeline_score_fusion(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_lookup_pipeline_single_join_no_nested_loop(spark):
    """The correlated $lookup decorrelates to ONE equi-join against
    per-key foreign arrays; correlated range predicates live in array
    lambdas, not a nested-loop join."""
    from mongo_hadoop_spark.operators import mongoagg

    plan = plan_of(mongoagg.pipeline_lookup_correlated(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan or "BroadcastHashJoin" in plan
            or "ShuffledHashJoin" in plan)


def test_pagerank_supersteps_keyed_no_cartesian(spark):
    from mongo_hadoop_spark.operators import graph

    plan = plan_of(graph.graph_pagerank_neardup(spark, SF_SMOKE))
    # every superstep is a keyed equi-join + keyed agg; nothing may
    # degrade to a cartesian or a single-partition stage
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("HashAggregate") >= 2   # per-round partial+final


def test_survivors_window_is_cluster_partitioned(spark):
    from mongo_hadoop_spark.operators import graph

    plan = plan_of(graph.dedup_survivors_by_authority(spark, SF_SMOKE))
    # the survivor pick is a row_number window PARTITIONED BY cluster —
    # a global (single-partition) window would serialize the corpus
    assert "Window" in plan
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_geo_near_sphere_pushdown_and_kernel_filter(spark):
    """$geoNear spherical: the query pre-filter reaches the parquet scan
    as a pushed filter, the radius bound is a plain Filter on the
    asin-free kernel (no Window, no CartesianProduct), and the ascending
    sort is the only exchange-bearing step."""
    from mongo_hadoop_spark.operators import mongoagg

    df = mongoagg.pipeline_geo_near_sphere(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    full = full_plan_of(df)
    assert "EqualTo(event_type,view)" in full.split("PushedFilters:")[1][:300]


def test_bpe_argmax_is_take_ordered(spark):
    """Each BPE merge round's argmax must be TakeOrderedAndProject
    (per-partition top-1 then merge), never a global sort of the pair
    table."""
    from mongo_hadoop_spark.operators.bpe import _pair_counts, _top_merge, _word_table

    w = _word_table(spark, SF_SMOKE)
    m = _top_merge(_pair_counts(w))
    plan = plan_of(m)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Sort ") == 0   # no standalone global sort operator


def test_geo_polygon_prefilter_guards_the_fold(spark):
    """$geoWithin $geometry: the driver-computed bounding box must sit
    in the SAME Filter as the interpreted parity fold (conjunct
    short-circuit skips the fold for non-candidates — the 4.5× bench
    fix), with no Window/CartesianProduct anywhere."""
    from mongo_hadoop_spark.operators import mongoagg
    from mongo_hadoop_spark.operators.mongoagg import _GEO_POLY_SPHERE
    from mongo_hadoop_spark.plans.trig import polygon_prefilter_bounds

    rings = [r for poly in _GEO_POLY_SPHERE["coordinates"] for r in poly]
    lat_lo, lat_hi, lon_iv = polygon_prefilter_bounds(rings)
    assert lon_iv is not None       # the registry polygon is selective
    df = mongoagg.pipeline_geo_polygon_sphere(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan and "Window" not in plan
    f = plan[plan.index("Filter"):]
    assert repr(lat_lo) in f and "aggregate(" in f
    assert f.index(repr(lat_lo)) < f.index("aggregate(")


def test_chunk_dedup_single_keyed_aggregate(spark):
    """Chunk dedup: map-side fingerprinting into ONE fingerprint-keyed
    aggregation — no window, no join, no second corpus shuffle."""
    from mongo_hadoop_spark.operators import textstats

    df = textstats.corpus_chunk_dedup(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "Window" not in plan and "Join" not in plan
    # exchanges: countDistinct(doc_id) expands to the standard
    # two-phase keyed aggregation ((fingerprint, doc_id) partials then
    # fingerprint merge — both map-side-partial keyed shuffles), plus
    # the range sort on the duplicate-group-sized output
    assert plan.count("Exchange") <= 3


def test_doremi_loop_has_no_corpus_sized_window(spark):
    """DoReMi: the multiplicative-weights rounds run on the checkpointed
    domain table — no Window anywhere, and every join is a broadcast of
    a 1-row scalar aggregate."""
    from mongo_hadoop_spark.operators import lm

    plan = plan_of(lm.corpus_doremi_weights(spark, SF_SMOKE))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_hybrid_corpus_join_is_stats_driven_not_hinted(spark):
    """documents ⋈ embeddings: BOTH sides are corpus-sized, so the join
    must be stats-driven (SMJ at scale, broadcast only when the planner
    measures the side under the threshold).  A broadcast *hint* here
    would force an executor OOM at 100 TB — assert none exists in the
    analyzed plan (r6 verdict item 3)."""
    from mongo_hadoop_spark.operators import mongoagg

    df = mongoagg._hybrid_corpus(spark, SF_SMOKE)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed


def test_priority_sample_topk_is_take_ordered_window_bounded(spark):
    """DLT priority sample: the corpus-wide top-(k+1) must be a
    TakeOrderedAndProject (per-task partial top), with the row_number
    window running on the (k+1)-row limited set — never a
    single-partition window over the corpus (r6 verdict item 5)."""
    from mongo_hadoop_spark.operators import selection

    df = selection.documents_priority_sample(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    # every Window node must sit ABOVE a TakeOrderedAndProject in its
    # subtree (i.e. windows only ever see the k+1-row set)
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if " Window " in ln or ln.lstrip().startswith("Window "):
            below = "\n".join(lines[i:])
            assert "TakeOrderedAndProject" in below


@pytest.mark.spark_upgrade_checklist
def test_geo_intersects_vectors_stay_materialized(spark):
    """pipeline_geo_intersects projects the endpoint unit vectors as
    codegen'd columns and filters over ATTRIBUTE references — if the
    optimizer ever substitutes the polynomials back into the filter's
    ~180 per-edge references (measured 50x slower), the optimized tree
    balloons and the filter consumes raw table columns again.  The
    never-true nondeterministic `__barrier` disjunct is the guard.

    Upgrade-checklist member: the guard exploits the documented-but-
    unpinned rule that PushPredicateThroughNonJoin won't substitute
    through a condition referencing a nondeterministic expression.
    Cleaner barriers were investigated (r8) and rejected:
    - ``localCheckpoint()`` physically blocks pushdown but materializes
      the whole projected-vector table (every row × 14 doubles) to
      block storage — a full-corpus write a 100 TB scan can't afford;
    - Spark has no user-facing no-pushdown hint or plan barrier
      (``Dataset.hint`` only feeds join strategy / rebalance);
    - marking the vector columns themselves nondeterministic trades a
      local never-true disjunct for lying about every consumer.
    If this test fails after a Spark bump, re-measure the substituted
    plan before deleting the barrier — correctness will NOT fail."""
    from mongo_hadoop_spark.operators import mongoagg

    df = mongoagg.pipeline_geo_intersects(spark, SF_SMOKE)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # substituted form measured ~250 KB; materialized form ~25 KB
    assert len(opt) < 100_000, len(opt)
    assert "monotonically_increasing_id" in opt
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


# --- r9: pins for the r8 bench additions (r8 verdict item 3) --------------


def test_text_query_plan_is_single_scan(spark):
    """$text bridge: per-row token expressions riding the scan — the
    only exchange is the final relevance sort.

    r12: the queries wrap their scan in session.spread() (parallelism
    repair for the local single-row-group parquet — an exact no-op on
    splittable cluster input).  The SCALE posture is asserted with
    spread disabled; the local form is allowed exactly one extra
    round-robin exchange and nothing else."""
    import os

    from mongo_hadoop_spark.operators import mongoagg

    for q in (mongoagg.pipeline_text_query,
              mongoagg.pipeline_text_query_diacritics):
        # save/restore rather than pop (r12 advisor): popping deletes a
        # value the user exported and changes later tests' behavior
        prior = os.environ.get("SPARK_GRAFT_SPREAD")
        os.environ["SPARK_GRAFT_SPREAD"] = "0"
        try:
            plan = plan_of(q(spark, SF_SMOKE))
        finally:
            if prior is None:
                os.environ.pop("SPARK_GRAFT_SPREAD", None)
            else:
                os.environ["SPARK_GRAFT_SPREAD"] = prior
        assert plan.count("Exchange") <= 1, q.__name__
        assert "CartesianProduct" not in plan
        assert "Window" not in plan
        local = plan_of(q(spark, SF_SMOKE))
        assert local.count("Exchange") <= 2, q.__name__
        assert local.count("RoundRobinPartitioning") <= 1, q.__name__
        assert "CartesianProduct" not in local
        assert "Window" not in local


def test_split_leakage_plan_is_keyed(spark):
    """Cross-split leakage audit: fingerprint-keyed join + keyed aggs —
    no all-pairs comparison, no cartesian, no single-partition stage
    (the winnowing window is doc_id-partitioned, which is fine)."""
    from mongo_hadoop_spark.operators import spans

    plan = plan_of(spans.corpus_split_leakage(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_epoch_shuffle_plan_never_globalizes(spark):
    """Epoch loader shuffle: hash shard + per-shard windows.  The
    classic mistake is a global row_number (one-task serialization);
    assert no single-partition exchange anywhere."""
    from mongo_hadoop_spark.operators import selection

    plan = plan_of(selection.documents_epoch_shuffle(spark, SF_SMOKE))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_bucket_auto_plans_exact_vs_approx(spark):
    """$bucketAuto: both modes are two scans + one broadcast 1-row cuts
    side (never a global sort / ntile window); the approx mode must
    carry the GK sketch and no exact percentile."""
    from mongo_hadoop_spark.operators import mongoagg

    exact = plan_of(mongoagg.pipeline_bucket_auto_granularity(
        spark, SF_SMOKE))
    approx = plan_of(mongoagg.pipeline_bucket_auto_granularity_approx(
        spark, SF_SMOKE))
    for plan in (exact, approx):
        assert "CartesianProduct" not in plan
        assert "Window" not in plan
        # the 1-row cuts frame joins via broadcast, not shuffle
        assert "BroadcastNestedLoopJoin" in plan
    assert "percentile_disc" in exact and "approx_percentile" not in exact
    assert "approx_percentile" in approx and "percentile_disc" not in approx


def test_no_unlisted_global_windows(spark):
    """Fleet-wide scale invariant (r9): a partition-less Window moves
    every row through ONE task — the classic 100 TB serialization
    mistake.  The only queries allowed to carry one are those whose
    window INPUT is provably bounded:

    - corpus_doremi_quotas / corpus_quota_fill / corpus_token_quotas —
      largest-remainder assignment over the SOURCE-level table
      (domain-sized: one row per source);
    - documents_priority_sample — WindowGroupLimit-capped top-K
      (plan-asserted in its own r6 pin);
    - pipeline_rank_fusion — rank over the input pipelines' already
      $limit-bounded result sets;
    - sketch_ddq_quantiles — the constant-size DDSketch bucket grid.

    Any OTHER registry query growing a global window fails here before
    it ships.  (Scans optimizedPlan of every registered query at
    sf0.001 — plan build only, nothing executes.)
    """
    import re

    from mongo_hadoop_spark import operators

    ALLOWED = {"corpus_doremi_quotas", "corpus_quota_fill",
               "corpus_token_quotas", "documents_priority_sample",
               "pipeline_rank_fusion", "sketch_ddq_quantiles"}
    offenders = []
    for name, fn in operators.all_queries().items():
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution() \
            .executedPlan().toString()
        for line in plan.splitlines():
            if "windowspecdefinition(" not in line:
                continue
            for spec in re.findall(r"windowspecdefinition\(([^)]*)\)",
                                   line):
                first = spec.split(",")[0].strip()
                if (("ASC" in first or "DESC" in first
                     or first.startswith("specifiedwindowframe"))
                        and name not in ALLOWED):
                    offenders.append((name, spec[:60]))
    assert not offenders, offenders
