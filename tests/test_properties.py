"""Property-based tests (hypothesis): BSON round-trip over arbitrary
nested documents, total-order laws for the cross-type comparator, and
disjoint-cover invariants for split planning."""

from __future__ import annotations

import datetime as dt
import functools
import string

from hypothesis import given, settings, strategies as st

from mongo_hadoop_spark import bsonio
from mongo_hadoop_spark.plans.filters import bson_compare, match
from mongo_hadoop_spark.plans.splitters import boundaries_to_splits

UTC = dt.timezone.utc

keys = st.text(string.ascii_lowercase, min_size=1, max_size=8)

scalars = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
    st.binary(max_size=32),
    st.none(),
    st.datetimes(
        min_value=dt.datetime(1970, 1, 2), max_value=dt.datetime(2100, 1, 1)
    ).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000, tzinfo=UTC)),
)

documents = st.recursive(
    st.dictionaries(keys, scalars, max_size=5),
    lambda children: st.dictionaries(
        keys,
        st.one_of(scalars, children, st.lists(st.one_of(scalars, children), max_size=4)),
        max_size=5,
    ),
    max_leaves=25,
)


@given(documents)
@settings(max_examples=200, deadline=None)
def test_bson_roundtrip_arbitrary_docs(doc):
    out = bsonio.decode(bsonio.encode(doc))
    assert _normalize(out) == _normalize(doc)


def _normalize(v):
    if isinstance(v, dict):
        return {k: _normalize(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_normalize(x) for x in v]
    if isinstance(v, bytearray):
        return bytes(v)
    return v


hetero_values = st.one_of(
    scalars,
    st.lists(scalars, max_size=3),
    st.dictionaries(keys, scalars, max_size=3),
)


@given(st.lists(hetero_values, min_size=2, max_size=12))
@settings(max_examples=200, deadline=None)
def test_bson_compare_is_total_order(values):
    key = functools.cmp_to_key(bson_compare)
    ordered = sorted(values, key=key)
    # sorted output is internally consistent (no a<b with b before a)
    for x, y in zip(ordered, ordered[1:]):
        assert bson_compare(x, y) <= 0
    # reflexivity / antisymmetry on all pairs
    for x in values:
        assert bson_compare(x, x) == 0
        for y in values:
            assert bson_compare(x, y) == -bson_compare(y, x)


@given(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=8, unique=True),
    st.lists(st.integers(-1500, 1500), min_size=1, max_size=50),
)
@settings(max_examples=200, deadline=None)
def test_range_splits_disjoint_cover(boundaries, doc_keys):
    splits = boundaries_to_splits("c", "k", sorted(boundaries))
    for kv in doc_keys:
        hits = sum(1 for s in splits if match({"k": kv}, s.query))
        assert hits == 1


# ---------------------------------------------------------------------------
# Pushdown translation soundness: for any supported filter set, evaluating
# the translated Mongo query must equal evaluating the filters directly.
# ---------------------------------------------------------------------------

_FIELDS = ["a", "b", "s"]


def _mk_filters():
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull,
        LessThan, LessThanOrEqual, Not, StringStartsWith,
    )

    int_val = st.integers(-5, 5)
    f = st.sampled_from(_FIELDS[:2])
    sf = st.just("s")
    return st.lists(
        st.one_of(
            st.builds(lambda fld, v: EqualTo((fld,), v), f, int_val),
            st.builds(lambda fld, v: GreaterThan((fld,), v), f, int_val),
            st.builds(lambda fld, v: GreaterThanOrEqual((fld,), v), f, int_val),
            st.builds(lambda fld, v: LessThan((fld,), v), f, int_val),
            st.builds(lambda fld, v: LessThanOrEqual((fld,), v), f, int_val),
            st.builds(lambda fld, vs: In((fld,), tuple(vs)), f,
                      st.lists(int_val, min_size=1, max_size=3)),
            st.builds(lambda fld: IsNull((fld,)), f),
            st.builds(lambda fld: IsNotNull((fld,)), f),
            st.builds(lambda fld, v: StringStartsWith((fld,), v), sf,
                      st.text(string.ascii_lowercase, max_size=2)),
            st.builds(lambda fld, v: Not(EqualTo((fld,), v)), f, int_val),
        ),
        min_size=1, max_size=5,
    )


def _eval_filter(flt, doc):
    name = type(flt).__name__
    if name == "Not":
        # Spark's Not(EqualTo) is null-rejecting, like every comparison
        inner = flt.child
        v = doc.get(inner.attribute[0])
        return v is not None and v != inner.value
    field = flt.attribute[0]
    v = doc.get(field)
    if name == "IsNull":
        return v is None
    if name == "IsNotNull":
        return v is not None
    if v is None:
        return False
    if name == "EqualTo":
        return v == flt.value
    if name == "GreaterThan":
        return v > flt.value
    if name == "GreaterThanOrEqual":
        return v >= flt.value
    if name == "LessThan":
        return v < flt.value
    if name == "LessThanOrEqual":
        return v <= flt.value
    if name == "In":
        return v in flt.value
    if name == "StringStartsWith":
        return isinstance(v, str) and v.startswith(flt.value)
    raise AssertionError(name)


docs_for_filters = st.fixed_dictionaries({
    "a": st.one_of(st.none(), st.integers(-6, 6)),
    "b": st.one_of(st.none(), st.integers(-6, 6)),
    "s": st.one_of(st.none(), st.text(string.ascii_lowercase, max_size=3)),
})


@given(_mk_filters(), st.lists(docs_for_filters, min_size=1, max_size=20))
@settings(max_examples=300, deadline=None)
def test_translate_filters_soundness(filters, docs):
    from mongo_hadoop_spark.plans.filters import translate_filters

    query, residual = translate_filters(filters)
    assert residual == []  # all these filter types are supported
    for doc in docs:
        doc = {k: v for k, v in doc.items() if v is not None} | (
            {k: None for k, v in doc.items() if v is None}
        )
        want = all(_eval_filter(f, doc) for f in filters)
        got = match(doc, query)
        assert got == want, (filters, doc, query)


# ---------------------------------------------------------------------------
# Zone-map segment pruning soundness: a pruned segment provably contains
# no matching document, for arbitrary docs (incl. poisoning values) and
# range/eq/$in queries.
# ---------------------------------------------------------------------------

_zm_keys = st.sampled_from(["a", "b", "c"])
_zm_values = st.one_of(
    st.integers(-20, 20),
    st.floats(allow_nan=True, allow_infinity=False, width=64),
    st.text(string.ascii_lowercase, max_size=3),
    st.booleans(),
    st.none(),
    st.lists(st.integers(-5, 5), max_size=2),
)
_zm_docs = st.lists(st.dictionaries(_zm_keys, _zm_values, max_size=3),
                    min_size=0, max_size=12)
_zm_operand = st.one_of(st.integers(-25, 25),
                        st.text(string.ascii_lowercase, max_size=3),
                        st.booleans(), st.none())
_zm_cond = st.one_of(
    _zm_operand,  # bare equality
    st.fixed_dictionaries({}, optional={
        "$eq": _zm_operand, "$gt": _zm_operand, "$gte": _zm_operand,
        "$lt": _zm_operand, "$lte": _zm_operand,
        "$in": st.lists(_zm_operand, max_size=3),
    }).filter(bool),
)
_zm_query = st.dictionaries(_zm_keys, _zm_cond, min_size=1, max_size=2)


@given(_zm_docs, _zm_query)
@settings(max_examples=300, deadline=None)
def test_zone_map_pruning_soundness(docs, query):
    from mongo_hadoop_spark.store import _track_bounds, segment_may_match

    bounds: dict = {}
    for d in docs:
        _track_bounds(bounds, d)
    bounds = {k: b for k, b in bounds.items() if b is not None}
    if not segment_may_match(bounds, query):
        for d in docs:
            assert not match(d, query), (d, query, bounds)


# ---------------------------------------------------------------------------
# Cross-implementation equivalence: the aggregation pipeline's $match
# column compiler (plans/aggpipe.match_to_col) vs the document-store
# query evaluator (plans/filters.match).  Two independent implementations
# of the same query language must agree on scalar documents.
# ---------------------------------------------------------------------------

_mq_fields = ["a", "b", "s"]
_mq_scalar = st.one_of(st.integers(-5, 5), st.none())
_mq_docs = st.lists(
    st.fixed_dictionaries({
        "a": st.one_of(st.none(), st.integers(-6, 6)),
        "b": st.one_of(st.none(), st.integers(-6, 6)),
        "s": st.one_of(st.none(), st.text(string.ascii_lowercase, max_size=2)),
    }),
    min_size=1, max_size=15,
)
_mq_int_cond = st.one_of(
    st.integers(-5, 5),
    st.none(),
    st.fixed_dictionaries({}, optional={
        "$eq": _mq_scalar, "$ne": _mq_scalar,
        "$gt": st.integers(-5, 5), "$gte": st.integers(-5, 5),
        "$lt": st.integers(-5, 5), "$lte": st.integers(-5, 5),
        "$in": st.lists(_mq_scalar, min_size=1, max_size=3),
        "$nin": st.lists(_mq_scalar, min_size=1, max_size=3),
        "$exists": st.booleans(),
    }).filter(bool),
)
_mq_str_cond = st.one_of(
    st.text(string.ascii_lowercase, max_size=2),
    st.none(),
    st.fixed_dictionaries({}, optional={
        "$eq": st.one_of(st.text(string.ascii_lowercase, max_size=2), st.none()),
        "$ne": st.one_of(st.text(string.ascii_lowercase, max_size=2), st.none()),
        "$in": st.lists(st.one_of(st.text(string.ascii_lowercase, max_size=2),
                                  st.none()), min_size=1, max_size=3),
        "$exists": st.booleans(),
    }).filter(bool),
)
_mq_leaf = st.one_of(
    st.dictionaries(st.sampled_from(_mq_fields[:2]), _mq_int_cond,
                    min_size=1, max_size=2),
    st.dictionaries(st.just("s"), _mq_str_cond, min_size=1, max_size=1),
)
_mq_query = st.one_of(
    _mq_leaf,
    st.builds(lambda qs: {"$or": qs}, st.lists(_mq_leaf, min_size=1, max_size=2)),
    st.builds(lambda qs: {"$and": qs}, st.lists(_mq_leaf, min_size=1, max_size=2)),
    st.builds(lambda qs: {"$nor": qs}, st.lists(_mq_leaf, min_size=1, max_size=2)),
)


@given(_mq_docs, _mq_query)
@settings(max_examples=40, deadline=None)
def test_match_compiler_equals_doc_evaluator(docs, query):
    from mongo_hadoop_spark.plans.aggpipe import match_to_col
    from mongo_hadoop_spark.plans.filters import match as doc_match

    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    df = spark.createDataFrame(
        [(i, d["a"], d["b"], d["s"]) for i, d in enumerate(docs)],
        "i long, a long, b long, s string",
    )
    got = sorted(r.i for r in df.where(match_to_col(query)).select("i").collect())
    # the doc evaluator sees missing-vs-null identically for flat columns
    want = sorted(i for i, d in enumerate(docs)
                  if doc_match({k: v for k, v in d.items() if v is not None}, query))
    assert got == want, (query, docs)


# --- word_shingles: zip_with construction ≡ reference sliding window ---

_shingle_texts = st.lists(
    st.text(alphabet=string.ascii_lowercase + "0", min_size=1, max_size=6),
    min_size=0, max_size=30).map(" ".join)


@given(_shingle_texts, st.integers(min_value=1, max_value=6))
@settings(max_examples=60, deadline=None)
def test_word_shingles_matches_reference(spark, text, n):
    """The shifted-slice zip_with construction (the O(tokens·n) rewrite
    of the 55-s-per-doc transform/slice hazard) must emit EXACTLY the
    reference sliding-window shingles — every md5 signature downstream
    depends on these strings."""
    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from mongo_hadoop_spark.functions import word_shingles

    got = (spark.createDataFrame([Row(text=text)])
           .select(word_shingles("text", n).alias("s")).first()["s"])
    toks = [t for t in text.split() if t]
    want = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)] \
        if len(toks) >= n else []
    assert got == want
