"""Query/operator library.

Each submodule exports:
- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` — named
  operators, each loading tables from an ``sf_dir`` of parquet files and
  returning a DataFrame (never collecting).
- ``ORACLES: dict[str, str]`` — DuckDB ANSI-SQL equivalents over the same
  tables (registered as views by the verification driver).  Keys without an
  oracle are genuinely non-SQL-expressible and get a rows-only check.

Cross-engine determinism rules used throughout (so value-hashes match):
- double aggregations go through exact ``decimal`` sums, cast back to
  ``double`` at the end (bit-identical in Spark and DuckDB);
- dates are emitted as ``yyyy-MM-dd`` strings, timestamps as epoch bigint;
- hashing is md5-based (`functions.md5_long`) — identical in both engines;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mongo_hadoop_spark.operators import (
    analytics, asof, bpe, dedup, graph, linalg, mongoagg, multimodal,
    pipeline, relational, relational2, relational3, relational4, relational5,
    repetition, selection, similarity, sketches, skew, spans, textstats,
    windows, lm,
)

_MODULES = [relational, relational2, relational3, relational4, relational5,
            windows, dedup, graph, spans, lm, selection, similarity, linalg,
            textstats, repetition, multimodal, skew, pipeline, asof,
            mongoagg, analytics, sketches, bpe]

# Registry order is part of the verification contract: external harnesses may
# only sample a prefix of ``queries()``, so the entries that most need a fresh
# cross-engine check come first.  Round-6 rotation (tools/coverage_report.py):
# the never-driver-verified backlog leads (the round-5 verdict's item 3: the
# two queries that fell off the r05 window, plus everything new this round);
# then the queries whose SEMANTICS changed this round (frozen-model PCA
# oracle, the two ntile→threshold rewrites, the JL sort drop) so the driver
# re-hashes them; then every query whose only driver rows date from round 1 —
# the oldest outstanding verdicts — and the round-3-verified set fills the
# rest of the 50-entry prefix.  The fully-green round-5 window rotates to the
# tail.
_HEAD_KEYS = [
    # never driver-verified — rotation backlog + new this round
    "corpus_bpe_merges", "corpus_bpe_symbol_stats",
    "corpus_bpe_compression", "documents_pack_sequences_bpe",
    "corpus_pretrain_token_budget", "corpus_wordpiece_merges",
    "corpus_wordpiece_compression",
    "corpus_doremi_weights", "corpus_doremi_quotas",
    "documents_chunk_windows", "embedding_matryoshka_recall",
    "documents_fim_transform", "corpus_chunk_dedup",
    "pipeline_geo_center_sphere", "pipeline_geo_near_sphere",
    "pipeline_geo_polygon_sphere",
    "graph_pagerank_neardup", "graph_degree_histogram",
    "dedup_survivors_by_authority",
    "corpus_crawl_increment", "corpus_quota_fill",
    "corpus_source_mixture_docs", "embeddings_cluster_sample",
    "corpus_pretrain_manifest",
    "text_repetition_flags", "corpus_repetition_yield",
    "pipeline_search_meta_facets", "pipeline_exp_moving_avg",
    "dedup_connected_clusters", "dedup_cluster_stats",
    "pipeline_search_highlights", "corpus_token_quotas",
    # changed this round — fresh hash rows needed (ntile→threshold
    # rewrites, frozen-model PCA, fusion tiebreak + hybrid-corpus
    # oracle, sf0.1 drift fixes, dec_to_double migration sites)
    "embedding_pca_whitened", "corpus_dsir_selected",
    "corpus_perplexity_buckets", "embedding_random_projection",
    "pipeline_rank_fusion", "pipeline_score_fusion",
    "events_value_anomalies", "embedding_gram_matrix",
    "skew_salted_rollup", "tpch_q11_value_share",
    "ivf_assign_lloyd", "ivf_assign_refined",
    "embedding_pq_codes_trained", "embedding_pq_codes_fixed",
    "pq_knn_adc_fixed", "ivf_pq_knn",
    # r01-verified — oldest outstanding driver verdicts
    "a3_pair_counts", "a5_frequent_short_tokens", "s6_tokenize_stats",
    "s8_multi_union", "hive_pushdown_conjunction", "f3_sort_limit",
    "s2_dotted_key_extract", "tpch_q10", "tpch_q14", "tpch_q18",
    "set_except", "set_intersect", "rollup_agg", "broadcast_dim_join",
    "json_roundtrip", "custom_sort_comparator", "tpch_q4_semijoin",
    "tpch_q22_antijoin",
    # (the r01/r03 refresh overflow — cube_agg, count_distinct_suppliers,
    # treasury_doubled, and the r03-verified set — rotates just below the
    # 50-entry prefix; all hold green driver rows already)
    "cube_agg", "count_distinct_suppliers",
    "treasury_doubled",
    "f4_skip_pagination", "tpch_q12", "events_session_windows",
    "window_spend_quartiles", "dedup_exact", "dedup_minhash_lsh_pairs",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_minhash_verified",
    "corpus_decontaminate", "ivf_assign", "ivf_knn", "ivf_knn_nprobe",
    "knn_bruteforce", "near_dup_pairs_cosine",
    "embedding_quantize_int8", "ivf_recall_report", "lsh_bucket_histogram",
    "text_langid", "text_quality", "text_token_count", "text_fingerprint",
    "documents_pack_sequences", "text_top_distinctive_terms",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = merged.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        merged.update(m.QUERIES)
    missing = [k for k in _HEAD_KEYS if k not in merged]
    if missing:
        raise ValueError(f"unknown head keys: {missing}")
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in _HEAD_KEYS:
        out[k] = merged[k]
    for k, fn in merged.items():
        if k not in out:
            out[k] = fn
    assert len(out) == len(merged)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
