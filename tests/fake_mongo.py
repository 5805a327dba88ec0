"""In-process fake of pymongo's Collection protocol (mongomock-style).

Implements exactly the surface `sinks.live` drives — ``insert_many``,
``bulk_write``, ``find``, ``create_index`` — over a plain list of dicts,
recording every call so tests can assert the committer's batching and
ordered semantics (batch 1000, ordered bulk replay:
core/.../output/MongoOutputCommitter.java:91-186).

Matching/update semantics reuse the engine's `plans.filters.match` /
`plans.updates.apply_update` (themselves property-tested against the
reference's behavior), so a bulk_write replayed here must land on the
same final state as the file-store merge pass in
`sinks.writers.apply_pending_updates` — which is precisely what the
end-to-end tests compare.
"""

from __future__ import annotations

import copy

from mongo_hadoop_spark.plans.filters import match
from mongo_hadoop_spark.plans.updates import apply_update, init_upsert_doc
from mongo_hadoop_spark.sinks.live import (InsertOne, ReplaceOne, UpdateMany,
                                           UpdateOne)


class FakeBulkWriteError(Exception):
    def __init__(self, msg: str, n_done: int):
        super().__init__(msg)
        self.n_done = n_done


class _BulkResult:
    def __init__(self, matched: int, modified: int, upserted: int,
                 inserted: int):
        self.matched_count = matched
        self.modified_count = modified
        self.upserted_count = upserted
        self.inserted_count = inserted


class FakeCursor(list):
    """pymongo read-cursor protocol (sort/skip/limit chaining) over an
    eager result list.  Subclasses list so legacy call sites that index
    or iterate ``find()`` results keep working."""

    def sort(self, keys) -> "FakeCursor":
        from functools import cmp_to_key

        from mongo_hadoop_spark.plans.filters import bson_compare
        from mongo_hadoop_spark.plans.paths import get_path

        pairs = [(keys, 1)] if isinstance(keys, str) else list(keys)
        docs = list(self)
        for key, direction in reversed(pairs):
            docs = sorted(
                docs,
                key=cmp_to_key(
                    lambda a, b, k=key: bson_compare(get_path(a, k),
                                                     get_path(b, k))),
                reverse=direction < 0,
            )
        return FakeCursor(docs)

    def skip(self, n: int) -> "FakeCursor":
        return FakeCursor(list(self)[n:])

    def limit(self, n: int) -> "FakeCursor":
        return FakeCursor(list(self)[:n]) if n else self


class FakeCollection:
    """One collection on the fake server."""

    def __init__(self, name: str = "c"):
        self.name = name
        self.docs: list[dict] = []
        self.indexes: list = []
        #: (method, n_ops, ordered) per API call, for batching assertions
        self.calls: list[tuple[str, int, bool]] = []
        #: raise on the Nth bulk_write call (1-based) to test ordered-abort
        self.fail_on_call: int | None = None

    # -- pymongo surface -------------------------------------------------
    def insert_many(self, docs, ordered: bool = True):
        docs = [copy.deepcopy(d) for d in docs]
        self.calls.append(("insert_many", len(docs), ordered))
        self.docs.extend(docs)
        return _BulkResult(0, 0, 0, len(docs))

    def bulk_write(self, ops, ordered: bool = True):
        self.calls.append(("bulk_write", len(ops), ordered))
        n_bulk_calls = sum(1 for c in self.calls if c[0] == "bulk_write")
        if self.fail_on_call is not None and n_bulk_calls == self.fail_on_call:
            raise FakeBulkWriteError("injected server failure", 0)
        matched = modified = upserted = inserted = 0
        for op in ops:
            if isinstance(op, InsertOne):
                self.docs.append(copy.deepcopy(op._doc))
                inserted += 1
                continue
            hits = [d for d in self.docs if match(d, op._filter)]
            if not isinstance(op, UpdateMany):
                hits = hits[:1]
            if hits:
                for d in hits:
                    matched += 1
                    if isinstance(op, ReplaceOne):
                        d.clear()
                        d.update(copy.deepcopy(op._doc))
                    else:
                        apply_update(d, op._doc,
                                     getattr(op, "_array_filters", None))
                    modified += 1
            elif op._upsert:
                if isinstance(op, ReplaceOne):
                    doc = copy.deepcopy(op._doc)
                    for k, v in op._filter.items():
                        doc.setdefault(k, v)
                    self.docs.append(doc)
                else:
                    self.docs.append(init_upsert_doc(op._filter, op._doc))
                upserted += 1
        return _BulkResult(matched, modified, upserted, inserted)

    def find(self, filter: dict | None = None, projection=None):
        docs = [copy.deepcopy(d) for d in self.docs
                if match(d, filter or {})]
        if projection:
            from mongo_hadoop_spark.plans.filters import project

            docs = [project(d, projection) for d in docs]
        return FakeCursor(docs)

    def count_documents(self, filter: dict | None = None) -> int:
        return len(self.find(filter))

    def create_index(self, keys, **options) -> str:
        self.indexes.append((keys, options))
        return "idx"
