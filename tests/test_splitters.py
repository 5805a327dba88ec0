"""Splitter math (reference: StandaloneMongoSplitterTest bounds tests,
SampleSplitterTest, MongoPaginatingSplitterTest, ShardChunkMongoSplitterTest)."""

from __future__ import annotations

import pytest

from mongo_hadoop_spark.bsonio import MaxKey, MinKey
from mongo_hadoop_spark.plans.filters import match
from mongo_hadoop_spark.plans.splitters import (
    SplitSpec, boundaries_to_splits, choose_splitter, filter_empty_splits,
    paginating_splitter, range_query, sample_splitter, shard_chunk_splitter,
    single_splitter,
)


def covered_exactly_once(splits, docs):
    """Every doc matches exactly one split's query (disjoint cover)."""
    for d in docs:
        hits = sum(1 for s in splits if match(d, s.query))
        assert hits == 1, (d, [s.query for s in splits])


def test_range_query_edges():
    assert range_query("k", None, None) == {}
    assert range_query("k", 5, None) == {"k": {"$gte": 5}}
    assert range_query("k", None, 9) == {"k": {"$lt": 9}}
    assert range_query("k", 5, 9) == {"k": {"$gte": 5, "$lt": 9}}
    with pytest.raises(ValueError):
        range_query("a,b", 1, 2)


def test_boundaries_disjoint_cover():
    splits = boundaries_to_splits("c", "k", [10, 20, 30])
    assert len(splits) == 4
    docs = [{"k": v} for v in [-5, 10, 15, 20, 29, 30, 1000]]
    covered_exactly_once(splits, docs)


def test_boundaries_merge_user_query():
    splits = boundaries_to_splits("c", "k", [10], query={"s": "A"})
    assert all(not match({"k": 5, "s": "B"}, s.query) for s in splits)
    covered_exactly_once(splits, [{"k": 5, "s": "A"}, {"k": 50, "s": "A"}])


def test_sample_splitter_sizing():
    # small collection → single split regardless of samples
    assert len(sample_splitter({"size": 100}, [1, 2, 3], "c")) == 1
    # 40 MB / 8 MB → 5 splits wanted; 50 samples → every 10th is a boundary
    samples = list(range(50))
    splits = sample_splitter({"size": 40 * 1024 * 1024}, samples, "c", key="k")
    assert len(splits) == 5
    covered_exactly_once(splits, [{"k": v} for v in [-1, 10, 19, 20, 35, 49, 99]])


def test_sample_splitter_dedups_boundaries():
    samples = [1] * 30 + [2] * 10
    splits = sample_splitter({"size": 40 * 1024 * 1024}, samples, "c", key="k")
    covered_exactly_once(splits, [{"k": 0}, {"k": 1}, {"k": 2}, {"k": 3}])


def test_paginating_splitter():
    keys = list(range(100))

    def nth(lower, n):
        remaining = [k for k in keys if lower is None or k >= lower]
        return remaining[n] if n < len(remaining) else None

    splits = paginating_splitter(nth, "c", key="k", min_docs=30)
    assert len(splits) == 4  # boundaries at 30, 60, 90
    covered_exactly_once(splits, [{"k": v} for v in [0, 29, 30, 59, 60, 89, 90, 99]])


def test_shard_chunk_splitter_locality():
    chunks = [
        {"min": MinKey(), "max": 10, "shard": "s0"},
        {"min": 10, "max": 20, "shard": "s1"},
        {"min": 20, "max": MaxKey(), "shard": "s0"},
    ]
    splits = shard_chunk_splitter(
        chunks, "c", key="k",
        shard_locations={"s0": ["hostA"], "s1": ["hostB"]},
    )
    assert [s.preferred_locations for s in splits] == (
        [("hostA",), ("hostB",), ("hostA",)]
    )
    covered_exactly_once(splits, [{"k": v} for v in [-99, 9, 10, 19, 20, 99]])


def test_filter_empty_splits():
    splits = boundaries_to_splits("c", "k", [10, 20])
    docs = [{"k": 5}, {"k": 25}]  # middle range [10,20) is empty

    def probe(s):
        return sum(1 for d in docs if match(d, s.query))

    kept = filter_empty_splits(probe, splits)
    assert len(kept) == 2


def test_choose_splitter():
    assert choose_splitter({"size": 1000}) == "single"
    assert choose_splitter({"size": 10**9}) == "sample"
    assert choose_splitter({"size": 10**9}, sharded=True) == "shard_chunk"


def test_single_splitter():
    s = single_splitter("c", {"a": 1})
    assert len(s) == 1 and s[0].query == {"a": 1}
