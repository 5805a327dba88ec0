#!/usr/bin/env python
"""Generate PLANS.md: the formatted physical plan of each headline query
with the scale-critical properties called out (pushed filters, broadcast
joins, exchange count, whole-stage codegen, absence of cartesian
products).  Re-run after plan-affecting changes:

    python tools/plan_report.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    ("tpch_q3", "3-way join + top-k"),
    ("tpch_q8_market_share", "7-way join, all dims broadcast"),
    ("tpch_q18", "agg -> having -> join"),
    ("events_asof_last_order", "as-of join as union + one window"),
    ("f4_skip_pagination", "skip/limit as TakeOrderedAndProject"),
    ("dedup_minhash_lsh_pairs", "LSH banding: equi-join, no cross join"),
    ("dedup_containment", "rare-shingle inverted-index candidates"),
    ("ivf_knn_nprobe", "IVF ANN: broadcast probe side"),
    ("corpus_decontaminate", "benchmark shingles broadcast"),
    ("skew_salted_rollup", "salted two-phase aggregation"),
    ("orders_rfm_segments", "median cuts as broadcast scalars"),
    ("groupingsets_agg", "grouping sets: one Expand, one shuffle"),
    ("text_heavy_hitters", "MG candidate pruning + broadcast threshold"),
    ("embedding_pq_codes_fixed", "fixed codebook broadcast, fused argmin+pivot"),
    ("ivf_pq_knn", "IVF probe x constant ADC tables, code-domain scan"),
    ("dedup_semantic_survivors_lsh", "banded equi-join candidates + anti-join"),
    ("pipeline_vector_search", "$vectorSearch: score + TakeOrderedAndProject"),
    ("embedding_gram_matrix", "row-local products, map-side partial agg"),
    ("embedding_random_projection", "literal sign matrix, pure map"),
    ("pipeline_search_bm25", "BM25: 1-row broadcast corpus stats"),
    ("pipeline_rank_fusion", "RRF: bounded rank windows, broadcast fuse"),
    ("pipeline_lookup_correlated", "correlated $lookup: TakeOrdered pushed below, semi-join prefiltered foreign side"),
    ("pipeline_geo_within", "planar shapes as per-row predicates"),
    ("sketch_ddq_quantiles", "constant-size bucket grid, window over buckets"),
    ("corpus_pretrain_manifest",
     "selection-stack funnel: doc-keyed joins + broadcast threshold cuts"),
    ("embedding_pca_whitened", "frozen literal model, pure map"),
    ("corpus_dsir_selected", "broadcast percentile_disc cut, no Window"),
    ("corpus_perplexity_buckets", "broadcast tertile cuts, no Window"),
    ("text_repetition_flags", "flattened n-gram generator, doc-keyed agg"),
    ("pipeline_search_meta_facets",
     "facet collectors: bounded aggs, broadcast scalar combine"),
    ("pipeline_search_highlights", "boundary-index segmentation, map-only"),
    ("pipeline_exp_moving_avg", "frame-bounded prefix fold per row"),
    ("corpus_crawl_increment", "md5 equi-join + cross-crawl banded LSH"),
    ("corpus_quota_fill", "largest-remainder quotas as broadcast scalars"),
    ("graph_pagerank_neardup",
     "8 integer supersteps: keyed join + keyed agg per round"),
    ("pipeline_geo_near_sphere",
     "spherical $geoNear: pushed query filter, asin-free kernel bound"),
    ("pipeline_geo_center_sphere",
     "$centerSphere: polynomial haversine predicate, keyed count"),
    ("corpus_bpe_compression",
     "BPE apply: token stream joined to trained segmentation table"),
    ("pipeline_geo_polygon_sphere",
     "spherical polygon parity: literal edge-array fold, keyed count"),
    ("corpus_doremi_weights",
     "domain-sized multiplicative-weights rounds, scalar broadcasts"),
    ("documents_chunk_windows", "chunking: explode(sequence), map-only"),
    ("documents_fim_transform", "FIM: md5 pivots + substrings, map-only"),
    ("pipeline_geo_intersects",
     "segment vs polygon: materialized vectors, attribute-ref folds"),
    ("corpus_dup_spans", "positioned winnowing: keyed aggs + fp join"),
    ("corpus_span_excised",
     "span excision: doc-keyed cut lists, per-row HOF filter"),
    ("dedup_span_alignments",
     "alignment runs: star-join pairs, per-(pair,delta) windows"),
    # r8 bench additions (r8 verdict item 3: previously missing here)
    ("pipeline_text_query",
     "$text bridge: per-row token expressions on the scan, one sort"),
    ("pipeline_text_query_diacritics",
     "$text diacritic fold: same shape, translate() in the scan"),
    ("corpus_split_leakage",
     "fingerprint x split join + two keyed aggs, no all-pairs"),
    ("documents_epoch_shuffle",
     "epoch-salted hash shard + per-shard windows, never global"),
    ("pipeline_array_aggregates", "array-accumulator HOFs, map-only"),
    ("pipeline_bucket_auto_granularity",
     "exact percentile_disc boundaries (O(N) buffer — see _approx)"),
    ("multimodal_pack_interleaved",
     "combined text+vision budget, per-shard-window packer"),
    # r9: the approx_percentile production mode + output-bound budget
    ("pipeline_bucket_auto_granularity_approx",
     "GK-sketch boundaries: mergeable bounded state, no O(N) buffer"),
    ("corpus_pretrain_manifest_approx",
     "funnel with approx_percentile threshold cuts"),
    ("corpus_pretrain_token_budget",
     "BPE pricing gated output-bound by broadcast semi-join"),
    ("pipeline_window_percentiles",
     "Mongo-7.0 window $median/$percentile: keyed frames, no global"),
    ("pipeline_window_range_frames",
     "time-bounded RANGE windows: epoch-millis rangeBetween, keyed"),
    # r10: the fixed-K coarse quantizer family + new gates
    ("ivf_assign_fixed",
     "fixed-K coarse assignment: broadcast codebook, fused argmin agg"),
    ("dedup_semantic_survivors_ivf_fixed",
     "SemDeDup on fixed-K cells: collapse + cell equi-join + anti-join"),
    ("ivf_pq_knn_fixed",
     "corpus-independent IVF-PQ: all index state broadcast"),
    ("pipeline_window_percentiles_approx",
     "windowed approx_percentile: bounded GK state per frame"),
    ("pipeline_datediff_weekstarts",
     "week-convention day arithmetic on the join, one keyed agg"),
    ("dedup_semantic_survivors_ivf_capped",
     "hot-cell-capped SemDeDup: per-cell anchors share the cell shuffle"),
    # r12: calendar densify + the SemDeDup overflow signal
    ("pipeline_densify_monthly",
     "calendar $densify: anchored timestampadd axis, null-safe full join"),
    ("pipeline_densify_quarterly",
     "partitioned calendar $densify: per-key axis, one keyed shuffle"),
    ("dedup_semantic_cell_density",
     "overflow signal: collapse + broadcast assignment + one keyed agg"),
    ("pipeline_window_top_orders",
     "window N-accumulators: one keyed window, whole-partition frames"),
    # r12 second half
    ("pipeline_merge_objects_rollup",
     "$mergeObjects accumulator: two keyed aggs, linear map-fold"),
    ("pipeline_lookup_uncorrelated",
     "uncorrelated $lookup: sub-pipeline once, 1-row array broadcast"),
    ("pipeline_dotted_paths",
     "nested writes: per-row struct rebuilds, one keyed agg"),
]


def properties(plan: str) -> list[str]:
    out = []
    n_ex = plan.count("Exchange")
    out.append(f"exchanges: {n_ex}")
    bhj = plan.count("BroadcastHashJoin")
    if bhj:
        out.append(f"broadcast hash joins: {bhj}")
    if "SortMergeJoin" in plan:
        out.append(f"sort-merge joins: {plan.count('SortMergeJoin')}")
    if "TakeOrderedAndProject" in plan:
        out.append("top-k via TakeOrderedAndProject (no global sort)")
    if "Expand" in plan:
        out.append("grouping-id Expand")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    if m and m.group(1).strip():
        out.append(f"pushed filters: [{m.group(1)[:90]}]")
    wsc = len(re.findall(r"WholeStageCodegen", plan))
    if wsc:
        out.append(f"whole-stage codegen spans: {wsc}")
    assert "CartesianProduct" not in plan, "cartesian product in plan!"
    out.append("no CartesianProduct")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md"))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from mongo_hadoop_spark import operators
    from mongo_hadoop_spark.session import get_spark

    spark = get_spark(app_name="plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    queries = operators.all_queries()

    lines = [
        "# PLANS — physical plans of the headline queries (round 13)",
        "",
        "Generated by `python tools/plan_report.py` (re-run after",
        "plan-affecting changes).  The properties line summarizes what",
        "`tests/test_plans.py` asserts; the full formatted plan follows",
        f"for inspection.  Scale factor: `{args.sf_dir}`.",
        "",
    ]
    for name, blurb in HEADLINE:
        df = queries[name](spark, args.sf_dir)
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        full = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        lines.append(f"## {name} — {blurb}")
        lines.append("")
        lines.append("Properties: " + "; ".join(properties(qe.toString())))
        lines.append("")
        lines.append("```")
        lines.append(full.strip())
        lines.append("```")
        lines.append("")
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {args.out} ({len(HEADLINE)} plans)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
