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


def _filter_for(ident: str, array_filters):
    """The arrayFilters document whose every top-level key roots at
    ``ident`` (the server's one-filter-per-identifier contract)."""
    for f in array_filters or []:
        roots = {k.split(".")[0] for k in f}
        if roots == {ident}:
            return f
    raise ValueError(
        f"no arrayFilters entry found for identifier {ident!r}")


def _elem_matches(el, fdoc: dict, ident: str) -> bool:
    from mongo_hadoop_spark.plans.filters import match

    for k, cond in fdoc.items():
        rest = k[len(ident):].lstrip(".")
        if rest:
            if not (isinstance(el, dict) and match(el, {rest: cond})):
                return False
        else:
            if not match({"x": el}, {"x": cond}):
                return False
    return True


def _targets(doc: dict, path: str, array_filters) -> list:
    """Resolve a path that may contain positional segments (``$[]`` /
    ``$[ident]``) to concrete (container, key) write targets — a dict
    plus a plain dotted remainder, or a list plus an element index."""
    segs = path.split(".")
    for i, s in enumerate(segs):
        if s.startswith("$[") and s.endswith("]"):
            head, ident, tail = ".".join(segs[:i]), s[2:-1], segs[i + 1:]
            if not head:
                raise ValueError(f"positional segment needs an array path "
                                 f"prefix: {path!r}")
            arr = get_path(doc, head)
            if not isinstance(arr, list):
                raise ValueError(f"positional target {head!r} is not an "
                                 f"array")
            fdoc = _filter_for(ident, array_filters) if ident else None
            out = []
            for idx, el in enumerate(arr):
                if fdoc is not None and not _elem_matches(el, fdoc, ident):
                    continue
                if not tail:
                    out.append((arr, idx))
                elif isinstance(el, dict):
                    out.extend(_targets(el, ".".join(tail), array_filters))
                else:
                    raise ValueError(
                        f"cannot descend into non-document array element "
                        f"at {head!r}")
            return out
        if s == "$":
            raise ValueError(
                "the single positional operator $ needs the matched index "
                "from the query — use $[] / $[ident] with arrayFilters")
    return [(doc, path)]


def _t_get(container, key):
    return container[key] if isinstance(container, list) else get_path(container, key)


def _t_set(container, key, v) -> None:
    if isinstance(container, list):
        container[key] = v
    else:
        set_path(container, key, v)


def apply_update(doc: dict, spec: dict, array_filters=None) -> dict:
    """Apply an update document; returns the (mutated) doc.

    Supported operators: $set, $unset, $inc, $mul, $min, $max, $bit,
    $rename, $push (incl. $each), $addToSet (incl. $each), $pull, $pop,
    $setOnInsert (ignored here — handled by the upsert path), $currentDate
    is unsupported (non-deterministic).  Paths in $set/$unset/$inc/$mul/
    $min/$max/$bit may contain the all-positional ``$[]`` and filtered
    ``$[ident]`` segments (``array_filters`` carries the server's
    arrayFilters list).
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
                for c, k in _targets(doc, path, array_filters):
                    _t_set(c, k, v)
        elif op == "$unset":
            for path in args:
                for c, k in _targets(doc, path, array_filters):
                    if isinstance(c, list):
                        c[k] = None  # server: positional unset nulls, not removes
                    else:
                        unset_path(c, k)
        elif op == "$inc":
            for path, v in args.items():
                for c, k in _targets(doc, path, array_filters):
                    cur = _t_get(c, k)
                    if cur is None:
                        cur = 0
                    if not isinstance(cur, _NUM) or isinstance(cur, bool):
                        raise ValueError(f"$inc target {path} is not numeric")
                    _t_set(c, k, cur + v)
        elif op == "$mul":
            for path, v in args.items():
                for c, k in _targets(doc, path, array_filters):
                    cur = _t_get(c, k)
                    _t_set(c, k, (cur if isinstance(cur, _NUM) else 0) * v)
        elif op == "$min":
            for path, v in args.items():
                for c, k in _targets(doc, path, array_filters):
                    cur = _t_get(c, k)
                    if cur is None or v < cur:
                        _t_set(c, k, v)
        elif op == "$max":
            for path, v in args.items():
                for c, k in _targets(doc, path, array_filters):
                    cur = _t_get(c, k)
                    if cur is None or v > cur:
                        _t_set(c, k, v)
        elif op == "$bit":
            for path, how in args.items():
                if (not isinstance(how, dict) or len(how) != 1
                        or next(iter(how)) not in ("and", "or", "xor")):
                    raise ValueError(
                        f"$bit takes exactly one of and/or/xor: {how!r}")
                (kind, operand), = how.items()
                for c, k in _targets(doc, path, array_filters):
                    cur = _t_get(c, k)
                    if cur is None:
                        cur = 0
                    if not isinstance(cur, int) or isinstance(cur, bool):
                        raise ValueError(f"$bit target {path} is not an "
                                         f"integer")
                    _t_set(c, k, {"and": cur & operand, "or": cur | operand,
                                  "xor": cur ^ operand}[kind])
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
