"""BSON codec round-trips (reference: BSONWritableTest, BSONSerDeTest type
matrix) and .bson split planning (BSONSplitterTest analog)."""

from __future__ import annotations

import datetime as dt
import io

import pytest

from mongo_hadoop_spark import bsonio
from mongo_hadoop_spark.bsonio import (
    Binary, BsonTimestamp, MaxKey, MinKey, ObjectId, Regex,
)

UTC = dt.timezone.utc


def roundtrip(doc):
    return bsonio.decode(bsonio.encode(doc))


def test_scalar_roundtrip():
    doc = {
        "d": 3.5, "i": 42, "big": 2**40, "s": "héllo", "b": True,
        "n": None, "bin": b"\x00\x01\xff",
    }
    out = roundtrip(doc)
    assert out == doc
    assert isinstance(out["i"], int) and isinstance(out["d"], float)


def test_nested_roundtrip():
    doc = {"a": {"b": [1, 2, {"c": "x"}]}, "arr": [[1.5], []]}
    assert roundtrip(doc) == doc


def test_special_types_roundtrip():
    oid = ObjectId("5f1d3b3b9d1e2a3b4c5d6e7f")
    ts = dt.datetime(2020, 7, 26, 12, 30, 45, 123000, tzinfo=UTC)
    doc = {
        "_id": oid,
        "when": ts,
        "rx": Regex("^a.*b$", "i"),
        "bts": BsonTimestamp(1595766645, 7),
        "blob": Binary(b"xyz", 4),
    }
    out = roundtrip(doc)
    assert out["_id"] == oid and out["_id"].hex == "5f1d3b3b9d1e2a3b4c5d6e7f"
    assert out["when"] == ts
    assert out["rx"] == Regex("^a.*b$", "i")
    assert out["bts"] == BsonTimestamp(1595766645, 7)
    assert out["blob"] == Binary(b"xyz", 4)


def test_objectid_generation_time():
    oid = ObjectId(bytes.fromhex("5f1d3b3b") + b"\x00" * 8)
    expected = dt.datetime.fromtimestamp(int("5f1d3b3b", 16), tz=UTC)
    assert oid.generation_time() == expected


def test_minmax_keys():
    out = roundtrip({"lo": MinKey(), "hi": MaxKey()})
    assert isinstance(out["lo"], MinKey) and isinstance(out["hi"], MaxKey)


def test_bool_not_confused_with_int():
    out = roundtrip({"t": True, "one": 1})
    assert out["t"] is True and out["one"] == 1 and not isinstance(out["one"], bool)


def test_decode_file_iter_and_ranges(tmp_path):
    docs = [{"i": i, "pad": "x" * 50} for i in range(100)]
    p = str(tmp_path / "c.bson")
    assert bsonio.write_bson_file(p, docs) == 100
    with open(p, "rb") as f:
        assert [d["i"] for d in bsonio.decode_file_iter(f)] == list(range(100))

    splits = bsonio.find_split_points(p, target_size=1000)
    assert len(splits) > 1
    # splits tile the file exactly
    assert splits[0].start == 0
    for a, b in zip(splits, splits[1:]):
        assert a.start + a.length == b.start
    # reading every split yields every doc exactly once
    seen = []
    with open(p, "rb") as f:
        for s in splits:
            seen.extend(d["i"] for d in bsonio.decode_file_iter(f, s.start, s.length))
    assert seen == list(range(100))


def test_splits_sidecar(tmp_path):
    p = str(tmp_path / "c.bson")
    bsonio.write_bson_file(p, ({"i": i} for i in range(50)))
    splits = bsonio.find_split_points(p, target_size=200)
    bsonio.write_splits_sidecar(p, splits)
    assert bsonio.read_splits_sidecar(p) == splits


def test_truncated_doc_raises(tmp_path):
    p = str(tmp_path / "bad.bson")
    good = bsonio.encode({"a": 1})
    with open(p, "wb") as f:
        f.write(good + good[: len(good) // 2])
    with open(p, "rb") as f:
        it = bsonio.decode_file_iter(f)
        assert next(it) == {"a": 1}
        with pytest.raises(ValueError):
            next(it)


# ---------------------------------------------------------------------------
# Compressed .bson (gzip/bz2) — unsplittable whole-file reads
# ---------------------------------------------------------------------------

def test_compression_codec_detection():
    assert bsonio.compression_codec("a/b.bson.gz") == "gzip"
    assert bsonio.compression_codec("a/b.bson.bz2") == "bz2"
    assert bsonio.compression_codec("a/b.bson") is None


@pytest.mark.parametrize("ext", [".gz", ".bz2"])
def test_compressed_roundtrip_matches_plain(tmp_path, ext):
    docs = [{"i": i, "s": f"doc-{i}"} for i in range(100)]
    plain = str(tmp_path / "c.bson")
    comp = str(tmp_path / ("c.bson" + ext))
    bsonio.write_bson_file(plain, docs)
    bsonio.write_bson_file(comp, docs)
    with open(plain, "rb") as f:
        expect = list(bsonio.decode_file_iter(f))
    with bsonio.open_bson(comp) as f:
        got = list(bsonio.decode_file_iter(f))
    assert got == expect == docs


@pytest.mark.parametrize("ext", [".gz", ".bz2"])
def test_compressed_file_is_one_split(tmp_path, ext):
    p = str(tmp_path / ("c.bson" + ext))
    bsonio.write_bson_file(p, ({"i": i, "pad": "x" * 64} for i in range(200)))
    # tiny target size would produce many splits for a plain file; the
    # codec makes the file unsplittable -> exactly one whole-file split
    splits = bsonio.find_split_points(p, target_size=128)
    assert splits == [bsonio.FileSplit(p, 0, None)]
