"""MongoDB update-operator semantics ($set/$inc/$push/...).

Reference: the write side emits mutations, not just inserts —
MongoUpdateWritable's (query, modifiers, upsert, multi, replace) 5-tuple
(core/.../io/MongoUpdateWritable.java:43-47) applied by the output
committer's bulk replay (core/.../output/MongoOutputCommitter.java:91-186);
the treasury example's `$set {count,avg,sum}` + `$push calculatedAt` +
`$inc numCalculations` upsert (TreasuryYieldUpdateReducer.java:46-80) and
the sensors `$inc logs_count` reducer are the canonical uses.

``apply_update(doc, spec)`` mutates a document per the spec; used by the
file-store writers to implement update/upsert modes without a server.
"""

from __future__ import annotations

from mongo_hadoop_spark.plans.paths import get_path, set_path, unset_path

_NUM = (int, float)


def _ensure_list(doc, path):
    cur = get_path(doc, path)
    if cur is None:
        cur = []
        set_path(doc, path, cur)
    if not isinstance(cur, list):
        raise ValueError(f"$push target {path} is not an array")
    return cur


def apply_update(doc: dict, spec: dict) -> dict:
    """Apply an update document; returns the (mutated) doc.

    Supported operators: $set, $unset, $inc, $mul, $min, $max, $rename,
    $push (incl. $each), $addToSet (incl. $each), $pull, $pop,
    $setOnInsert (ignored here — handled by the upsert path), $currentDate
    is unsupported (non-deterministic).
    If ``spec`` has no $-operators it is a full-document replacement
    (Mongo replace semantics: _id preserved).
    """
    if not any(k.startswith("$") for k in spec):
        new_doc = dict(spec)
        if "_id" in doc and "_id" not in new_doc:
            new_doc["_id"] = doc["_id"]
        doc.clear()
        doc.update(new_doc)
        return doc

    for op, args in spec.items():
        if op == "$setOnInsert":
            continue
        if op == "$set":
            for path, v in args.items():
                set_path(doc, path, v)
        elif op == "$unset":
            for path in args:
                unset_path(doc, path)
        elif op == "$inc":
            for path, v in args.items():
                cur = get_path(doc, path)
                if cur is None:
                    cur = 0
                if not isinstance(cur, _NUM) or isinstance(cur, bool):
                    raise ValueError(f"$inc target {path} is not numeric")
                set_path(doc, path, cur + v)
        elif op == "$mul":
            for path, v in args.items():
                cur = get_path(doc, path)
                set_path(doc, path, (cur if isinstance(cur, _NUM) else 0) * v)
        elif op == "$min":
            for path, v in args.items():
                cur = get_path(doc, path)
                if cur is None or v < cur:
                    set_path(doc, path, v)
        elif op == "$max":
            for path, v in args.items():
                cur = get_path(doc, path)
                if cur is None or v > cur:
                    set_path(doc, path, v)
        elif op == "$rename":
            for old, new in args.items():
                v = get_path(doc, old)
                if v is not None:
                    unset_path(doc, old)
                    set_path(doc, new, v)
        elif op == "$push":
            for path, v in args.items():
                arr = _ensure_list(doc, path)
                if isinstance(v, dict) and "$each" in v:
                    arr.extend(v["$each"])
                else:
                    arr.append(v)
        elif op == "$addToSet":
            for path, v in args.items():
                arr = _ensure_list(doc, path)
                items = v["$each"] if isinstance(v, dict) and "$each" in v else [v]
                for item in items:
                    if item not in arr:
                        arr.append(item)
        elif op == "$pull":
            for path, v in args.items():
                cur = get_path(doc, path)
                if isinstance(cur, list):
                    set_path(doc, path, [x for x in cur if x != v])
        elif op == "$pop":
            for path, v in args.items():
                cur = get_path(doc, path)
                if isinstance(cur, list) and cur:
                    set_path(doc, path, cur[1:] if v == -1 else cur[:-1])
        else:
            raise ValueError(f"unsupported update operator {op}")
    return doc


def init_upsert_doc(query: dict, spec: dict) -> dict:
    """Seed document for an upsert miss: equality fields from the query
    (Mongo semantics) + $setOnInsert, then the update applied."""
    doc: dict = {}
    for k, v in (query or {}).items():
        if k.startswith("$"):
            continue
        if isinstance(v, dict) and any(x.startswith("$") for x in v):
            if "$eq" in v:
                set_path(doc, k, v["$eq"])
            continue
        set_path(doc, k, v)
    for path, v in spec.get("$setOnInsert", {}).items():
        set_path(doc, path, v)
    return apply_update(doc, spec)
