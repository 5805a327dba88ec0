"""File-backed document store — the engine's stand-in for a live MongoDB
deployment (no server/driver exists in this environment).

Layout: a *store* is a directory; a *collection* is a subdirectory of
``*.bson`` segment files (mongorestore-compatible, SURVEY §2.10 W4).
Writers emit one segment per Spark task through a temp-file + atomic
rename commit protocol — the analog of MongoRecordWriter's temp-file
spool + MongoOutputCommitter's commit-time replay
(core/.../output/MongoRecordWriter.java:41-130,
core/.../output/MongoOutputCommitter.java:91-186).

A GridFS analog stores large binaries as chunk documents
({files_id, n, data}) beside a files-metadata collection
(core/.../GridFSInputFormat.java:40-343, input/GridFSSplit.java:18-111).

If a real MongoDB is available, the same reader/writer surfaces would sit
on pymongo bulk ops — the import is gated so this module works without it.
"""

from __future__ import annotations

import glob
import os
import random
import uuid

from mongo_hadoop_spark import bsonio
from mongo_hadoop_spark.plans import filters as qf
from mongo_hadoop_spark.plans.paths import get_path

DEFAULT_CHUNK_SIZE = 255 * 1024  # GridFS default chunk size
META_SUFFIX = ".meta.json"


def _write_segment_meta(seg_path: str, count: int) -> None:
    import json

    meta = {"count": count, "bytes": os.path.getsize(seg_path)}
    tmp = seg_path + META_SUFFIX + ".inprogress"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.rename(tmp, seg_path + META_SUFFIX)


def _read_segment_meta(seg_path: str) -> dict | None:
    import json

    p = seg_path + META_SUFFIX
    if not os.path.exists(p):
        return None  # pre-stats segment (or foreign .bson file): caller scans
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


class DocumentCollection:
    """A directory of .bson segments acting as one collection."""

    def __init__(self, path: str):
        self.path = path

    @property
    def name(self) -> str:
        return os.path.basename(self.path.rstrip("/"))

    def segments(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.path, "*.bson")))

    def exists(self) -> bool:
        return os.path.isdir(self.path)

    # --- read side ---------------------------------------------------------

    def find(self, query: dict | None = None, projection: dict | None = None,
             sort=None, skip: int = 0, limit: int | None = None):
        """Cursor-style scan: filter → sort → skip → limit → project.
        Mirrors MongoInputSplit.getCursor option application order
        (core/.../input/MongoInputSplit.java:272-299)."""
        docs = self._scan(query)
        if sort:
            for key, direction in reversed(list(sort)):
                docs = sorted(
                    docs,
                    key=_SortKey.factory(key),
                    reverse=direction < 0,
                )
        out = []
        n_skipped = 0
        for d in docs:
            if n_skipped < skip:
                n_skipped += 1
                continue
            out.append(qf.project(d, projection))
            if limit is not None and len(out) >= limit:
                break
        return out

    def _scan(self, query: dict | None = None):
        for seg in self.segments():
            with open(seg, "rb") as f:
                for doc in bsonio.decode_file_iter(f):
                    if qf.match(doc, query):
                        yield doc

    def _segment_count(self, seg: str) -> int:
        """Doc count of one segment: sidecar stats if present (O(1)), else a
        decode scan — the aggregate-pushdown analog of answering collstats
        from metadata instead of the data (at 100 TB, planning must never
        read the collection)."""
        meta = _read_segment_meta(seg)
        if meta is not None and "count" in meta:
            return int(meta["count"])
        with open(seg, "rb") as f:
            return sum(1 for _ in bsonio.decode_file_iter(f))

    def count(self, query: dict | None = None, limit: int | None = None) -> int:
        if not query:  # unfiltered count: sum per-segment sidecar stats
            n = 0
            for seg in self.segments():
                n += self._segment_count(seg)
                if limit is not None and n >= limit:
                    return limit
            return n
        n = 0
        for _ in self._scan(query):
            n += 1
            if limit is not None and n >= limit:
                break
        return n

    def stats(self) -> dict:
        size = sum(os.path.getsize(s) for s in self.segments())
        count = self.count()
        return {
            "count": count,
            "size": size,
            "avgObjSize": (size // count) if count else 0,
        }

    def sample_values(self, key: str, n: int, seed: int = 42) -> list:
        """Reservoir-sample ``n`` values of ``key`` — the $sample stage of
        SampleSplitter (core/.../splitter/SampleSplitter.java:43-106)."""
        rng = random.Random(seed)
        reservoir: list = []
        for i, doc in enumerate(self._scan(None)):
            v = get_path(doc, key)
            if v is None:
                continue
            if len(reservoir) < n:
                reservoir.append(v)
            else:
                j = rng.randint(0, i)
                if j < n:
                    reservoir[j] = v
        return reservoir

    # --- write side --------------------------------------------------------

    def insert_many(self, docs, segment_hint: str | None = None) -> int:
        """Bulk insert as one committed segment (temp file + rename).
        A ``.meta.json`` stats sidecar (count/bytes) is committed alongside
        so later collstats/count calls are metadata-only."""
        os.makedirs(self.path, exist_ok=True)
        name = segment_hint or uuid.uuid4().hex[:12]
        tmp = os.path.join(self.path, f"_tmp_{name}.bson.inprogress")
        final = os.path.join(self.path, f"{name}.bson")
        n = bsonio.write_bson_file(tmp, docs)
        _write_segment_meta(tmp, n)
        os.rename(tmp + META_SUFFIX, final + META_SUFFIX)
        os.rename(tmp, final)  # commit
        return n

    def rewrite(self, docs) -> int:
        """Replace collection contents atomically-ish (compaction/merge)."""
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, "_tmp_rewrite.bson.inprogress")
        n = bsonio.write_bson_file(tmp, docs)
        _write_segment_meta(tmp, n)
        for seg in self.segments():
            os.remove(seg)
            if os.path.exists(seg + META_SUFFIX):
                os.remove(seg + META_SUFFIX)
        final = os.path.join(self.path, "seg-000000.bson")
        os.rename(tmp + META_SUFFIX, final + META_SUFFIX)
        os.rename(tmp, final)
        return n

    def create_index(self, keys, **options) -> str:
        """ensureIndex analog (pig/.../MongoStorage.java:237-238, W7/W10):
        the file store has no indexes; record the intent in a sidecar so
        tests can assert the writer requested it."""
        os.makedirs(self.path, exist_ok=True)
        idx_name = "_".join(f"{k}_{d}" for k, d in keys)
        with open(os.path.join(self.path, ".indexes"), "a") as f:
            f.write(f"{idx_name} {options!r}\n")
        return idx_name

    def requested_indexes(self) -> list[str]:
        p = os.path.join(self.path, ".indexes")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [line.split(" ", 1)[0] for line in f if line.strip()]


class _SortKey:
    """Cross-type sort key using BSON ordering (BSONComparator analog)."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __lt__(self, other):
        return qf.bson_compare(self.value, other.value) < 0

    @staticmethod
    def factory(key: str):
        return lambda d: _SortKey(get_path(d, key))


class DocumentStore:
    """A directory of collections (a 'database')."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def collection(self, name: str) -> DocumentCollection:
        return DocumentCollection(os.path.join(self.path, name))

    def list_collections(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.path)
            if os.path.isdir(os.path.join(self.path, d))
        )

    def drop(self, name: str) -> None:
        coll = self.collection(name)
        for seg in coll.segments():
            os.remove(seg)
            if os.path.exists(seg + META_SUFFIX):
                os.remove(seg + META_SUFFIX)
        for extra in (".indexes",):
            p = os.path.join(coll.path, extra)
            if os.path.exists(p):
                os.remove(p)
        if os.path.isdir(coll.path):
            os.rmdir(coll.path)

    # --- GridFS analog -----------------------------------------------------

    def gridfs_put(self, filename: str, data: bytes,
                   chunk_size: int = DEFAULT_CHUNK_SIZE,
                   metadata: dict | None = None) -> str:
        file_id = uuid.uuid4().hex[:24]
        chunks = [
            {"files_id": file_id, "n": i, "data": data[off : off + chunk_size]}
            for i, off in enumerate(range(0, max(len(data), 1), chunk_size))
        ]
        self.collection("fs.chunks").insert_many(chunks, segment_hint=f"f{file_id}")
        self.collection("fs.files").insert_many(
            [{
                "_id": file_id, "filename": filename, "length": len(data),
                "chunkSize": chunk_size, "numChunks": len(chunks),
                "metadata": metadata or {},
            }],
            segment_hint=f"f{file_id}",
        )
        return file_id

    def gridfs_get(self, file_id: str) -> bytes:
        chunks = self.collection("fs.chunks").find(
            {"files_id": file_id}, sort=[("n", 1)]
        )
        return b"".join(c["data"] for c in chunks)
