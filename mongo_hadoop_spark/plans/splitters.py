"""Partition planning ("splitters") — the reference's scan parallelizer
re-expressed as pure planning logic producing per-partition range queries.

This is the piece Catalyst cannot do for a document collection (SURVEY §4:
"Partition pruning / partitioning — No — core custom work").  Every
splitter emits ``SplitSpec``s whose ``query`` is the user query AND'd with
a ``{key: {$gte: lo, $lt: hi}}`` range — the reference's
``createRangeQuerySplit`` form (core/.../splitter/
MongoCollectionSplitter.java:182-295), which it prefers over $min/$max
cursor hints when ``use_range_queries`` is on; open edges (None) mean
unbounded (MinKey/MaxKey sentinels, SURVEY §1.2).

Splitter inventory (SURVEY §2.2):
- P1 factory       → :func:`choose_splitter`
- P2/P3 sample     → :func:`sample_splitter` (collstats sizing + sample
                     boundaries; SampleSplitter.java:43-106,
                     StandaloneMongoSplitter.java:66-209)
- P4/P5 shard      → :func:`shard_chunk_splitter` (one split per chunk,
                     preferred locations; ShardChunkMongoSplitter.java:59-148)
- P6 single        → :func:`single_splitter`
- P7 paginating    → :func:`paginating_splitter` (≥min_docs *matching*
                     docs per split; MongoPaginatingSplitter.java:44-117)
- P9 empty filter  → :func:`filter_empty_splits` (MongoSplitter.java:54-67)
- P10/P11 bson     → :func:`bson_file_splitter` (byte-range splits at doc
                     boundaries, sidecar reuse; BSONSplitter.java:55-591)
- S8 multi         → :func:`multi_collection_splits`

Defaults follow the reference: 8 MB split size, 10 samples per split,
min_docs 1000 (BASELINE.md).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from mongo_hadoop_spark import bsonio
from mongo_hadoop_spark.plans.filters import and_queries, bson_compare

DEFAULT_SPLIT_SIZE = 8 * 1024 * 1024   # mongo.input.split_size (8 MB)
SAMPLES_PER_SPLIT = 10                  # SampleSplitter.SAMPLES_PER_SPLIT
DEFAULT_MIN_DOCS = 1000                 # mongo.input.splits.min_docs


@dataclass(frozen=True)
class SplitSpec:
    """Serializable scan spec for one partition (MongoInputSplit analog:
    core/.../input/MongoInputSplit.java:45-63)."""
    collection: str
    query: dict = field(default_factory=dict)
    projection: dict | None = None
    sort: tuple | None = None
    limit: int | None = None
    skip: int = 0
    # byte-range scan of a .bson segment (BSONFileInputFormat analog)
    segment_path: str | None = None
    byte_start: int = 0
    byte_length: int | None = None
    preferred_locations: tuple[str, ...] = ()


def range_query(key: str, lo, hi) -> dict:
    """[lo, hi) range predicate; None edge = unbounded (Min/MaxKey)."""
    if "," in key:
        raise ValueError("compound split keys are not supported")  # parity w/ reference
    cond = {}
    if lo is not None:
        cond["$gte"] = lo
    if hi is not None:
        cond["$lt"] = hi
    return {key: cond} if cond else {}


def single_splitter(collection: str, query: dict | None = None) -> list[SplitSpec]:
    return [SplitSpec(collection=collection, query=dict(query or {}))]


def boundaries_to_splits(collection: str, key: str, boundaries: list,
                         query: dict | None = None) -> list[SplitSpec]:
    """[b0, b1, ..bn] → n+1 splits: (-inf,b0), [b0,b1), ..., [bn, +inf)."""
    edges = [None, *boundaries, None]
    out = []
    for lo, hi in zip(edges, edges[1:]):
        rq = range_query(key, lo, hi)
        out.append(SplitSpec(collection=collection, query=and_queries(query or {}, rq)))
    return out


def sample_splitter(
    collection_stats: dict,
    sample_values: list,
    collection: str,
    key: str = "_id",
    split_size: int = DEFAULT_SPLIT_SIZE,
    samples_per_split: int = SAMPLES_PER_SPLIT,
    query: dict | None = None,
) -> list[SplitSpec]:
    """Boundary selection from a random sample, sized by collstats.

    num_splits = ceil(size / split_size); take num_splits*samples_per_split
    samples, sort by the split key, and promote every
    ``samples_per_split``-th sample to a boundary
    (SampleSplitter.java:62-106).
    """
    size = collection_stats.get("size", 0)
    num_splits = max(1, math.ceil(size / split_size))
    if num_splits == 1 or not sample_values:
        return single_splitter(collection, query)
    import functools
    ordered = sorted(sample_values, key=functools.cmp_to_key(bson_compare))
    boundaries = []
    for i in range(samples_per_split, len(ordered), samples_per_split):
        b = ordered[i]
        if not boundaries or bson_compare(b, boundaries[-1]) != 0:
            boundaries.append(b)
    if not boundaries:
        return single_splitter(collection, query)
    return boundaries_to_splits(collection, key, boundaries, query)


def paginating_splitter(
    find_nth_matching_key,
    collection: str,
    key: str = "_id",
    min_docs: int = DEFAULT_MIN_DOCS,
    query: dict | None = None,
) -> list[SplitSpec]:
    """Query-aware boundaries: every split holds ≥ min_docs *matching* docs.

    ``find_nth_matching_key(lower_bound, n)`` must return the key value of
    the n-th matching doc with key ≥ lower_bound (or None past the end) —
    the reference implements it as find(query ∧ key≥min).sort(key)
    .skip(min_docs).limit(1) (MongoPaginatingSplitter.java:60-108).
    """
    boundaries: list = []
    lower = None
    while True:
        nxt = find_nth_matching_key(lower, min_docs)
        if nxt is None:
            break
        if boundaries and bson_compare(nxt, boundaries[-1]) == 0:
            break
        boundaries.append(nxt)
        lower = nxt
    if not boundaries:
        return single_splitter(collection, query)
    return boundaries_to_splits(collection, key, boundaries, query)


def shard_chunk_splitter(
    chunks: list[dict],
    collection: str,
    key: str = "_id",
    shard_locations: dict[str, list[str]] | None = None,
    query: dict | None = None,
) -> list[SplitSpec]:
    """One split per shard chunk, with preferred locations from the
    shard→hosts map (ShardChunkMongoSplitter.java:59-148).  ``chunks`` are
    {min, max, shard} docs as found in config.chunks; Min/MaxKey edges map
    to None (unbounded)."""
    out = []
    for ch in chunks:
        lo, hi = ch.get("min"), ch.get("max")
        lo = None if isinstance(lo, bsonio.MinKey) else lo
        hi = None if isinstance(hi, bsonio.MaxKey) else hi
        hosts = tuple((shard_locations or {}).get(ch.get("shard", ""), ()))
        out.append(SplitSpec(
            collection=collection,
            query=and_queries(query or {}, range_query(key, lo, hi)),
            preferred_locations=hosts,
        ))
    return out


def filter_empty_splits(probe_count, splits: list[SplitSpec]) -> list[SplitSpec]:
    """Drop splits whose probe shows no matching docs
    (MongoSplitter.filterEmptySplits:54-67).  ``probe_count(split)`` should
    be a cheap existence probe (count with limit 1)."""
    return [s for s in splits if probe_count(s) > 0]


def bson_file_splitter(
    path: str,
    collection: str,
    target_size: int | None = None,
    query: dict | None = None,
    use_sidecar: bool = True,
) -> list[SplitSpec]:
    """Byte-range splits of a .bson segment at document boundaries,
    reusing the `.{name}.splits` sidecar when present
    (BSONFileInputFormat.getSplits:92-139)."""
    target = target_size or DEFAULT_SPLIT_SIZE
    ranges = bsonio.read_splits_sidecar(path) if use_sidecar else None
    if ranges is None:
        ranges = bsonio.find_split_points(path, target)
    return [
        SplitSpec(
            collection=collection, query=dict(query or {}),
            segment_path=r.path, byte_start=r.start, byte_length=r.length,
        )
        for r in ranges
    ]


def multi_collection_splits(per_collection_splits: list[list[SplitSpec]]) -> list[SplitSpec]:
    """UNION ALL over several collections' splits
    (MultiMongoCollectionSplitter.java:37-143)."""
    return [s for splits in per_collection_splits for s in splits]


def choose_splitter(stats: dict, sharded: bool = False,
                    server_version: tuple[int, int] = (3, 2)) -> str:
    """Splitter-factory policy (MongoSplitterFactory.java:54-129):
    sharded → 'shard_chunk'; unsharded + server ≥3.2 → 'sample';
    tiny collection → 'single'."""
    if sharded:
        return "shard_chunk"
    if stats.get("size", 0) <= DEFAULT_SPLIT_SIZE:
        return "single"
    if server_version >= (3, 2):
        return "sample"
    return "sample"  # splitVector path collapses to sampled ranges here
