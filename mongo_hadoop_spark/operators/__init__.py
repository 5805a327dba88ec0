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
    analytics, asof, dedup, linalg, mongoagg, multimodal, pipeline,
    relational, relational2, relational3, relational4, relational5,
    selection, similarity, sketches, skew, spans, textstats, windows, lm,
)

_MODULES = [relational, relational2, relational3, relational4, relational5,
            windows, dedup, spans, lm, selection, similarity, linalg,
            textstats, multimodal, skew, pipeline, asof, mongoagg,
            analytics, sketches]

# Registry order is part of the verification contract: external harnesses may
# only sample a prefix of ``queries()``, so the entries that most need a fresh
# cross-engine check come first.  Round-5 rotation (tools/coverage_report.py):
# the four queries new this round lead (never driver-verified); then every
# query whose only driver rows date from round 1 — the oldest outstanding
# verdicts; the rest of the 50-entry prefix is the round-3-verified set in
# report order.  Everything in last round's window (all driver-green in
# CORRECTNESS_r04) rotates to the tail.
_HEAD_KEYS = [
    # new this round — first driver check
    "pipeline_lookup_correlated", "pipeline_search_wildcard",
    "pipeline_geo_within", "pipeline_search_fuzzy",
    "sketch_ddq_buckets", "sketch_ddq_quantiles",
    "pipeline_match_operators",
    "corpus_nb_token_weights", "corpus_nb_confusion",
    "pipeline_search_querystring",
    "pipeline_search_bm25", "pipeline_rank_fusion",
    "pipeline_score_fusion", "pipeline_bitwise_flags",
    "pipeline_vector_search", "pipeline_geo_near",
    "pipeline_regex_type_report", "pipeline_redact_levels",
    "pipeline_text_search", "pipeline_jsonschema_gate",
    "corpus_contamination_report",
    "embedding_gram_matrix", "embedding_random_projection",
    "embedding_pca_whitened",
    "corpus_dsir_weights", "corpus_dsir_selected",
    "documents_priority_sample", "sketch_cms_tokens",
    "sketch_cms_estimates", "text_bigram_surprisal",
    "pipeline_top_orders_per_status", "pipeline_price_percentiles",
    "pipeline_event_calculus", "pipeline_fill_linear",
    "sketch_bloom_tokens", "sketch_bloom_audit",
    "dedup_semantic_survivors_lsh", "embedding_pq_codes_fixed",
    "pq_knn_adc_fixed", "pipeline_object_to_array", "ivf_pq_knn",
    "text_gopher_quality", "events_asof_next_order", "corpus_gopher_yield",
    "dedup_duplicate_spans", "documents_span_stats",
    "documents_span_dedup_survivors", "text_unigram_surprisal",
    "corpus_perplexity_buckets", "corpus_source_mixture",
    "corpus_source_mixture_docs", "embeddings_cluster_sample",
    # r01-verified — oldest outstanding driver verdicts
    "a3_pair_counts", "a5_frequent_short_tokens", "s6_tokenize_stats",
    "s8_multi_union", "hive_pushdown_conjunction", "f3_sort_limit",
    "s2_dotted_key_extract", "tpch_q10", "tpch_q14", "tpch_q18",
    "set_except", "set_intersect", "rollup_agg", "broadcast_dim_join",
    "json_roundtrip", "custom_sort_comparator", "tpch_q4_semijoin",
    "tpch_q22_antijoin", "cube_agg", "count_distinct_suppliers",
    "treasury_doubled",
    # r03-verified — next-oldest, fills the 50-entry prefix
    "f4_skip_pagination", "tpch_q12", "events_session_windows",
    "window_spend_quartiles", "dedup_exact", "dedup_minhash_lsh_pairs",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_minhash_verified",
    "corpus_decontaminate", "ivf_assign", "ivf_knn", "ivf_knn_nprobe",
    "ivf_assign_lloyd", "knn_bruteforce", "near_dup_pairs_cosine",
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
