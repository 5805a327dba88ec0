"""Mongo query evaluation, BSON cross-type ordering, projection, and
Catalyst filter translation (reference: HiveMongoInputFormatTest,
BSONComparator semantics)."""

from __future__ import annotations

import datetime as dt

import pytest

from mongo_hadoop_spark.bsonio import MaxKey, MinKey, ObjectId
from mongo_hadoop_spark.plans.filters import (
    and_queries, bson_compare, match, project, translate_filters,
)
from mongo_hadoop_spark.plans.paths import get_path


class TestPaths:
    def test_dotted(self):
        doc = {"a": {"b": {"c": 5}}, "arr": [{"x": 1}, {"x": 2}]}
        assert get_path(doc, "a.b.c") == 5
        assert get_path(doc, "arr.1.x") == 2
        assert get_path(doc, "a.z") is None
        assert get_path(doc, "arr.9.x") is None
        assert get_path(doc, "arr.notanum") is None


class TestMatch:
    DOC = {"i": 10, "s": "abc", "tags": ["red", "blue"],
           "nested": {"n": 5}, "f": 1.5, "none": None}

    def test_implicit_eq(self):
        assert match(self.DOC, {"i": 10})
        assert not match(self.DOC, {"i": 11})
        assert match(self.DOC, {"nested.n": 5})

    def test_array_contains(self):
        assert match(self.DOC, {"tags": "red"})
        assert match(self.DOC, {"tags": ["red", "blue"]})
        assert not match(self.DOC, {"tags": "green"})

    def test_comparisons(self):
        assert match(self.DOC, {"i": {"$gt": 5, "$lte": 10}})
        assert not match(self.DOC, {"i": {"$gt": 10}})
        assert match(self.DOC, {"f": {"$gte": 1.5}})
        # range ops don't match across type classes (Mongo semantics)
        assert not match(self.DOC, {"s": {"$gt": 5}})

    def test_in_nin_ne(self):
        assert match(self.DOC, {"i": {"$in": [1, 10]}})
        assert match(self.DOC, {"i": {"$nin": [1, 2]}})
        assert match(self.DOC, {"s": {"$ne": "xyz"}})

    def test_logical(self):
        assert match(self.DOC, {"$or": [{"i": 99}, {"s": "abc"}]})
        assert match(self.DOC, {"$and": [{"i": 10}, {"s": "abc"}]})
        assert match(self.DOC, {"$nor": [{"i": 99}]})

    def test_exists(self):
        assert match(self.DOC, {"nested.n": {"$exists": True}})
        assert match(self.DOC, {"zzz": {"$exists": False}})
        assert not match(self.DOC, {"zzz": {"$exists": True}})

    def test_regex_size_mod_all_elemmatch(self):
        assert match(self.DOC, {"s": {"$regex": "^ab"}})
        assert match(self.DOC, {"tags": {"$size": 2}})
        assert match(self.DOC, {"i": {"$mod": [3, 1]}})
        assert match(self.DOC, {"tags": {"$all": ["blue", "red"]}})
        doc = {"xs": [{"a": 1}, {"a": 7}]}
        assert match(doc, {"xs": {"$elemMatch": {"a": {"$gt": 5}}}})


class TestBsonCompare:
    def test_type_ranking(self):
        # MinKey < Null < Numbers < String < Object < Array < Binary <
        # ObjectId < Boolean < Date < MaxKey  (BSONComparator.java:49-117)
        ordered = [
            MinKey(), None, 3, "s", {"a": 1}, [1], b"\x01",
            ObjectId("0" * 24), True,
            dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc), MaxKey(),
        ]
        for a, b in zip(ordered, ordered[1:]):
            assert bson_compare(a, b) < 0, (a, b)

    def test_numeric_coercion(self):
        assert bson_compare(2, 2.0) == 0
        assert bson_compare(1, 1.5) < 0


class TestProjection:
    def test_include(self):
        doc = {"_id": 1, "a": 2, "b": {"c": 3, "d": 4}}
        assert project(doc, {"a": 1}) == {"_id": 1, "a": 2}
        assert project(doc, {"a": 1, "_id": 0}) == {"a": 2}
        assert project(doc, {"b.c": 1, "_id": 0}) == {"b": {"c": 3}}

    def test_exclude(self):
        doc = {"_id": 1, "a": 2, "b": 3}
        assert project(doc, {"b": 0}) == {"_id": 1, "a": 2}


class TestTranslate:
    def test_translate_supported(self):
        from pyspark.sql.datasource import (
            EqualTo, GreaterThan, In, IsNull, LessThanOrEqual, StringStartsWith,
        )

        filters = [
            EqualTo(("status",), "A"),
            GreaterThan(("qty",), 5),
            LessThanOrEqual(("price",), 9.5),
            In(("cat",), ("a", "b")),
            IsNull(("gone",)),
            StringStartsWith(("name",), "pre"),
        ]
        query, residual = translate_filters(filters)
        assert residual == []
        assert query["status"] == "A"
        assert query["qty"] == {"$gt": 5}
        assert query["price"] == {"$lte": 9.5}
        assert query["cat"] == {"$in": ["a", "b"]}
        assert query["gone"] is None
        assert query["name"] == {"$regex": "^pre"}

    def test_same_field_range(self):
        from pyspark.sql.datasource import GreaterThan, LessThan

        query, residual = translate_filters(
            [GreaterThan(("x",), 1), LessThan(("x",), 9)]
        )
        assert residual == []
        assert match({"x": 5}, query)
        assert not match({"x": 0}, query)
        assert not match({"x": 9}, query)

    def test_and_queries_merge(self):
        merged = and_queries({"a": 1}, {"b": {"$gt": 2}})
        assert match({"a": 1, "b": 3}, merged)
        assert not match({"a": 1, "b": 1}, merged)
        assert and_queries({}, {"a": 1}) == {"a": 1}
        assert and_queries() == {}


class TestUdfHelpers:
    def test_to_object_id_and_dbref(self, spark):
        import pyspark.sql.functions as F

        from mongo_hadoop_spark.functions import to_binary, to_dbref, to_object_id

        df = spark.createDataFrame(
            [("AB" * 12,), ("not-an-oid",)], "oid string"
        ).select(
            to_object_id("oid").alias("oid"),
            to_dbref(F.lit("users"), F.lit(42)).alias("ref"),
            to_binary(F.lit("xyz")).alias("bin"),
        )
        rows = df.collect()
        assert rows[0].oid == "ab" * 12
        assert rows[1].oid is None
        assert rows[0].ref.ref == "users" and rows[0].ref.id == "42"
        assert bytes(rows[0].bin) == b"xyz"


def test_negated_ops_on_arrays_require_all_elements():
    """MongoDB semantics: {$ne: v} matches only when NO element equals v
    (positive ops stay any-element)."""
    from mongo_hadoop_spark.plans.filters import match

    assert not match({"a": [5, 6]}, {"a": {"$ne": 5}})
    assert match({"a": [6, 7]}, {"a": {"$ne": 5}})
    assert not match({"a": [1, 9]}, {"a": {"$nin": [9]}})
    assert match({"a": [1, 2]}, {"a": {"$nin": [9]}})
    assert not match({"a": [3]}, {"a": {"$not": {"$gt": 2}}})
    assert match({"a": [1, 2]}, {"a": {"$not": {"$gt": 2}}})
    # mixed op-doc: each operator evaluated independently over the set
    assert match({"a": [2, 9]}, {"a": {"$gt": 5, "$ne": 3}})
    assert not match({"a": [2, 3, 9]}, {"a": {"$gt": 5, "$ne": 3}})


def test_not_equalto_pushdown_excludes_null_and_missing():
    from pyspark.sql.datasource import EqualTo, Not

    from mongo_hadoop_spark.plans.filters import match, translate_filters

    query, residual = translate_filters([Not(EqualTo(("a",), 5))])
    assert residual == []
    assert not match({"a": 5}, query)
    assert match({"a": 7}, query)
    # Spark's a != 5 drops null/missing rows; the pushed query must too,
    # without relying on an accompanying IsNotNull being pushed
    assert not match({"a": None}, query)
    assert not match({"b": 1}, query)


def test_projection_slice_and_elem_match():
    from mongo_hadoop_spark.plans.filters import project

    doc = {"_id": 7, "tags": [1, 2, 3, 4, 5],
           "items": [{"q": 1}, {"q": 9}, {"q": 12}], "other": "keep"}
    # $slice forms: first-n, last-n, [skip, limit], negative skip
    assert project(doc, {"tags": {"$slice": 2}})["tags"] == [1, 2]
    assert project(doc, {"tags": {"$slice": -2}})["tags"] == [4, 5]
    assert project(doc, {"tags": {"$slice": [1, 2]}})["tags"] == [2, 3]
    assert project(doc, {"tags": {"$slice": [-3, 2]}})["tags"] == [3, 4]
    # $slice alone keeps the rest of the document (server semantics)
    out = project(doc, {"tags": {"$slice": 1}})
    assert out["other"] == "keep" and out["_id"] == 7
    # $elemMatch: first matching element only; include-mode
    out = project(doc, {"items": {"$elemMatch": {"q": {"$gte": 9}}}})
    assert out["items"] == [{"q": 9}] and "other" not in out
    # no matching element → field omitted
    out = project(doc, {"items": {"$elemMatch": {"q": {"$gt": 99}}}})
    assert "items" not in out and out["_id"] == 7
    # operators compose with plain includes
    out = project(doc, {"other": 1, "tags": {"$slice": 1}})
    assert out == {"_id": 7, "other": "keep", "tags": [1]}
    import pytest as _p
    with _p.raises(ValueError, match="limit must be positive"):
        project(doc, {"tags": {"$slice": [1, 0]}})


def test_match_regex_options_python_side():
    """r11: the python-side matcher honors {$regex, $options} like the
    Column compiler (case-insensitive etc.); bad letters refuse."""
    from mongo_hadoop_spark.plans.filters import match

    assert match({"s": "Hello"}, {"s": {"$regex": "^hello",
                                        "$options": "i"}})
    assert not match({"s": "Hello"}, {"s": {"$regex": "^hello"}})
    import pytest as _pt
    with _pt.raises(ValueError, match="unsupported"):
        match({"s": "x"}, {"s": {"$regex": "a", "$options": "g"}})
    with _pt.raises(ValueError, match="only valid"):
        match({"s": "x"}, {"s": {"$options": "i"}})


def test_comment_noop():
    from mongo_hadoop_spark.plans.filters import match
    assert match({"a": 1}, {"a": 1, "$comment": "profiler note"})
    assert not match({"a": 2}, {"a": 1, "$comment": "x"})
