"""Live-backend *read* half: per-split cursors against a pymongo-protocol
server.

Mirrors the reference's MongoRecordReader cursor setup
(core/src/main/java/com/mongodb/hadoop/input/MongoInputSplit.java:272-299):
each split opens its own ``find`` cursor with the split's query ∧ range
bounds, projection (fields), sort, skip and limit — limit/skip/sort are
PER-SPLIT options, exactly as in the reference (a global orderBy/limit
belongs to Spark, above the scan).

This completes the connector loop that ``sinks/live.py`` opened for the
write half: the datasource reads with ``option("backend", "live")`` and a
``mongodb://`` URI, resolving the client on each executor from the URI
alone.  The client factory is an importable ``module:callable`` string
(``option("client_factory", ...)``) so tests — and driverless
environments — can serve the protocol without a mongod; the default is
``pymongo.MongoClient`` where pymongo is installed.

``store_client`` is the built-in factory: a read-only pymongo-protocol
adapter over the file-backed :class:`~mongo_hadoop_spark.store.DocumentStore`
(directory named by the URI's ``?storePath=`` option).  It is both the
test double and a legitimate local backend — every live-path component
can be driven end-to-end against it with no server.
"""

from __future__ import annotations

import importlib

from mongo_hadoop_spark.sources.uri import InvalidMongoURI, MongoURI


def resolve_client_factory(spec: str | None):
    """``"module:callable"`` → the callable; default pymongo.MongoClient."""
    if not spec:  # pragma: no cover - needs pymongo
        from pymongo import MongoClient

        return MongoClient
    mod, sep, attr = spec.partition(":")
    if not sep or not attr:
        raise ValueError(
            f"client_factory must be 'module:callable', got {spec!r}")
    return getattr(importlib.import_module(mod), attr)


def collection_from_uri(uri: str, factory_spec: str | None = None):
    """Resolve the pymongo-protocol collection a ``mongodb://`` URI names.

    The read-side twin of ``sinks.live.target_from_uri`` — same
    db.collection namespace contract (MongoConfigUtil.getInputURI).
    """
    parsed = MongoURI.parse(uri)
    if not (parsed.database and parsed.collection):
        raise InvalidMongoURI(
            f"input URI needs a db.collection namespace: {uri!r}")
    client = resolve_client_factory(factory_spec)(parsed.build())
    return client[parsed.database][parsed.collection]


def split_cursor(coll, spec):
    """Open one split's cursor with the reference's option order
    (MongoInputSplit.java:272-299): find(query, fields) → sort → skip →
    limit.  ``coll`` is any pymongo-protocol collection; ``spec`` a
    :class:`~mongo_hadoop_spark.plans.splitters.SplitSpec`.
    """
    cur = coll.find(spec.query or {}, spec.projection)
    if spec.sort:
        cur = cur.sort(list(spec.sort))
    if spec.skip:
        cur = cur.skip(spec.skip)
    if spec.limit is not None:
        cur = cur.limit(spec.limit)
    return cur


# ---------------------------------------------------------------------------
# Store-backed pymongo-protocol client (read surface)
# ---------------------------------------------------------------------------

class StoreCursor:
    """Lazy cursor over a DocumentStore collection: accumulates
    sort/skip/limit (pymongo chaining protocol), executes on iteration
    via the store's own cursor-option engine."""

    def __init__(self, coll, query, projection):
        self._coll = coll
        self._query = query or {}
        self._projection = projection
        self._sort = None
        self._skip = 0
        self._limit = None

    def sort(self, keys):
        self._sort = [(keys, 1)] if isinstance(keys, str) else list(keys)
        return self

    def skip(self, n: int):
        self._skip = n
        return self

    def limit(self, n: int):
        # pymongo protocol: limit(0) means "no limit"
        self._limit = n or None
        return self

    def __iter__(self):
        return iter(self._coll.find(
            self._query, projection=self._projection, sort=self._sort,
            skip=self._skip, limit=self._limit))


class StoreBackedCollection:
    def __init__(self, store_path: str, name: str):
        from mongo_hadoop_spark.store import DocumentStore

        self.name = name
        self._store_path = store_path
        self._coll = DocumentStore(store_path).collection(name)

    def find(self, filter: dict | None = None, projection=None) -> StoreCursor:
        return StoreCursor(self._coll, filter, projection)

    def find_one(self, filter: dict | None = None, projection=None):
        """pymongo parity: first matching document or None (used by the
        shard_chunk splitter's config.collections uuid resolution)."""
        for doc in self.find(filter, projection):
            return doc
        return None

    def count_documents(self, filter: dict | None = None) -> int:
        return self._coll.count(filter)

    def insert_many(self, docs, ordered: bool = True):
        """pymongo write surface (segment-per-call, concurrency-safe)."""
        n = self._coll.insert_many(list(docs))

        class _Result:  # structural stand-in for pymongo's InsertManyResult
            inserted_ids = list(range(n))

        return _Result()

    def drop(self) -> None:
        from mongo_hadoop_spark.store import DocumentStore

        DocumentStore(self._store_path).drop(self.name)

    def bulk_write(self, ops, ordered: bool = True):
        """pymongo bulk surface: replay Insert/Update/Replace ops with
        server update-operator semantics against the store (single-writer
        read-modify-rewrite — the committer's merge pass, not concurrent)."""
        from mongo_hadoop_spark.plans.filters import match
        from mongo_hadoop_spark.plans.updates import apply_update, init_upsert_doc
        from mongo_hadoop_spark.sinks.live import InsertOne, ReplaceOne, UpdateMany

        docs = list(self._coll.find())
        matched = modified = upserted = 0
        for op in ops:
            if isinstance(op, InsertOne):
                docs.append(dict(op._doc))
                continue
            hits = [d for d in docs if match(d, op._filter)]
            if not isinstance(op, UpdateMany):
                hits = hits[:1]
            if hits:
                for d in hits:
                    matched += 1
                    if isinstance(op, ReplaceOne):
                        kept = d.get("_id")
                        d.clear()
                        d.update(dict(op._doc))
                        if kept is not None and "_id" not in d:
                            d["_id"] = kept
                    else:
                        apply_update(d, op._doc,
                                     getattr(op, "_array_filters", None))
                    modified += 1
            elif op._upsert:
                if isinstance(op, ReplaceOne):
                    nd = dict(op._doc)
                    for k, v in (op._filter or {}).items():
                        if not k.startswith("$") and k not in nd:
                            nd[k] = v
                else:
                    nd = init_upsert_doc(op._filter, op._doc)
                docs.append(nd)
                upserted += 1
        self._coll.rewrite(docs)

        class _Result:  # structural stand-in for pymongo's BulkWriteResult
            matched_count = matched
            modified_count = modified
            upserted_count = upserted

        return _Result()


class StoreBackedClient:
    """``client[db][coll]`` over a DocumentStore directory.  The db level
    is a namespace formality (the store is flat), kept so the object is
    drop-in for pymongo's MongoClient in every live-path callsite."""

    def __init__(self, store_path: str):
        self.store_path = store_path

    def __getitem__(self, db: str) -> "_StoreBackedDatabase":
        return _StoreBackedDatabase(self.store_path)


class _StoreBackedDatabase:
    def __init__(self, store_path: str):
        self.store_path = store_path

    def __getitem__(self, coll: str) -> StoreBackedCollection:
        return StoreBackedCollection(self.store_path, coll)


def store_client(uri: str) -> StoreBackedClient:
    """Client factory serving collections from the DocumentStore directory
    named by the URI's ``?storePath=`` option — executors 'connect' with
    nothing but the URI string, exactly like a real driver would."""
    path = MongoURI.parse(uri).param("storePath")
    if not path:
        raise InvalidMongoURI(
            f"store_client needs a ?storePath= option in the URI: {uri!r}")
    return StoreBackedClient(path)
