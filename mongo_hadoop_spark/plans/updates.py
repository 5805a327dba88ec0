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

import copy

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


_PIPELINE_NUM = (int, float)


class _RemoveSentinel:
    """``$$REMOVE`` — assigning it in $set/$addFields deletes the field
    (server semantics)."""

    def __repr__(self) -> str:  # pragma: no cover
        return "$$REMOVE"


REMOVE = _RemoveSentinel()


def eval_update_expr(expr, doc: dict):
    """Dict-level aggregation-expression evaluator for pipeline-form
    updates (Mongo 4.2): field paths, literals, and the operator subset
    that update pipelines actually use ($literal, arithmetic, $min/$max,
    $cond, $ifNull, $concat, comparisons, $and/$or/$not).  Runs at
    mutation-replay time against the stored document — the counterpart
    of plans.aggpipe.expr_to_col for the store's Python side.
    Unsupported operators raise (fail-loud, like the column compiler).
    """
    if isinstance(expr, str) and expr.startswith("$$"):
        name, _, rest = expr[2:].partition(".")
        if name in ("ROOT", "CURRENT"):
            # system variables the server resolves per document
            return get_path(doc, rest) if rest else dict(doc)
        if name == "REMOVE":
            return REMOVE
        raise ValueError(
            f"unbound pipeline variable {expr} (merge binds $$new/let at "
            "build time; $$ROOT/$$CURRENT/$$REMOVE resolve here; $$NOW "
            "is non-deterministic and unsupported)")
    if isinstance(expr, str) and expr.startswith("$"):
        return get_path(doc, expr[1:])
    if isinstance(expr, list):
        return [eval_update_expr(e, doc) for e in expr]
    if not isinstance(expr, dict):
        return expr
    if len(expr) != 1 or not next(iter(expr)).startswith("$"):
        return {k: eval_update_expr(v, doc) for k, v in expr.items()}
    (op, operand), = expr.items()
    if op == "$literal":
        return operand

    def ev(x):
        return eval_update_expr(x, doc)

    if op in ("$add", "$subtract", "$multiply", "$divide"):
        vals = [ev(x) for x in operand]
        if any(v is None for v in vals):
            return None
        for v in vals:
            if not isinstance(v, _PIPELINE_NUM) or isinstance(v, bool):
                raise ValueError(f"{op} operand is not numeric: {v!r}")
        out = vals[0]
        for v in vals[1:]:
            out = (out + v if op == "$add" else out - v
                   if op == "$subtract" else out * v
                   if op == "$multiply" else out / v)
        return out
    if op in ("$min", "$max"):
        vals = [v for v in (ev(x) for x in operand) if v is not None]
        if not vals:
            return None
        return min(vals) if op == "$min" else max(vals)
    if op == "$cond":
        if isinstance(operand, dict):
            c, t, f = operand["if"], operand["then"], operand["else"]
        else:
            c, t, f = operand
        cv = ev(c)
        return ev(t) if (cv is not None and cv is not False and cv != 0) \
            else ev(f)
    if op == "$ifNull":
        for x in operand:
            v = ev(x)
            if v is not None:
                return v
        return None
    if op == "$concat":
        vals = [ev(x) for x in operand]
        if any(v is None for v in vals):
            return None
        return "".join(str(v) for v in vals)
    if op in ("$eq", "$ne", "$gt", "$gte", "$lt", "$lte"):
        a, b = ev(operand[0]), ev(operand[1])
        if op == "$eq":
            return a == b
        if op == "$ne":
            return a != b
        if a is None or b is None:
            # aggregation comparisons order null lowest (total BSON order)
            an, bn = a is None, b is None
            return {"$gt": bn and not an, "$gte": bn,
                    "$lt": an and not bn, "$lte": an}[op]
        return {"$gt": a > b, "$gte": a >= b,
                "$lt": a < b, "$lte": a <= b}[op]
    if op == "$and":
        return all(ev(x) not in (None, False, 0) for x in operand)
    if op == "$or":
        return any(ev(x) not in (None, False, 0) for x in operand)
    if op == "$not":
        x = operand[0] if isinstance(operand, list) else operand
        return ev(x) in (None, False, 0)
    raise ValueError(f"unsupported pipeline-update expression {op}")


def _has_path(doc, path: str) -> bool:
    """Presence test along a dotted path (a field holding null IS
    present — get_path cannot distinguish the two)."""
    cur = doc
    parts = path.split(".")
    for p in parts[:-1]:
        if not isinstance(cur, dict) or p not in cur:
            return False
        cur = cur[p]
    return isinstance(cur, dict) and parts[-1] in cur


def apply_update_pipeline(doc: dict, stages: list) -> dict:
    """Pipeline-form update (Mongo 4.2; also $merge whenMatched
    pipelines): $set/$addFields, $unset, $project (inclusion/computed),
    $replaceRoot/$replaceWith applied in order to ONE stored document.
    Each stage evaluates its expressions against the pre-stage document
    (server semantics), then mutates it."""
    for stage in stages:
        if not isinstance(stage, dict) or len(stage) != 1:
            raise ValueError(f"bad pipeline-update stage {stage!r}")
        (op, spec), = stage.items()
        if op in ("$set", "$addFields"):
            snapshot = copy.deepcopy(doc)
            for path, expr in spec.items():
                value = eval_update_expr(expr, snapshot)
                if value is REMOVE:
                    unset_path(doc, path)
                else:
                    set_path(doc, path, value)
        elif op == "$unset":
            for path in ([spec] if isinstance(spec, str) else spec):
                unset_path(doc, path)
        elif op == "$project":
            snapshot = copy.deepcopy(doc)
            keep_id = spec.get("_id", 1) not in (0, False)
            out: dict = {}
            if keep_id and "_id" in snapshot:
                out["_id"] = snapshot["_id"]
            for path, v in spec.items():
                if path == "_id":
                    continue
                if v in (1, True):
                    # a PRESENT field is kept even when its value is
                    # null (server semantics) — presence, not value
                    if _has_path(snapshot, path):
                        set_path(out, path, get_path(snapshot, path))
                elif v in (0, False):
                    raise ValueError(
                        "$project exclusion form is not supported in "
                        "pipeline updates (use $unset)")
                else:
                    set_path(out, path, eval_update_expr(v, snapshot))
            doc.clear()
            doc.update(out)
        elif op in ("$replaceRoot", "$replaceWith"):
            root = spec["newRoot"] if op == "$replaceRoot" else spec
            new_doc = eval_update_expr(root, doc)
            if not isinstance(new_doc, dict):
                raise ValueError(f"{op} must evaluate to a document")
            preserved = doc.get("_id")
            doc.clear()
            doc.update(new_doc)
            if preserved is not None and "_id" not in doc:
                doc["_id"] = preserved
        else:
            raise ValueError(
                f"unsupported pipeline-update stage {op} (supported: "
                "$set/$addFields, $unset, $project, "
                "$replaceRoot/$replaceWith)")
    return doc


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
    (Mongo replace semantics: _id preserved).  A LIST spec is the Mongo
    4.2 pipeline form → :func:`apply_update_pipeline`.
    """
    if isinstance(spec, list):
        return apply_update_pipeline(doc, spec)
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
    (Mongo semantics) + $setOnInsert, then the update applied.  Pipeline
    (list) specs run the pipeline over the equality seed — the update
    command's pipeline-upsert semantics, which a pymongo replay of the
    same journal reproduces on a real server."""
    doc: dict = {}
    for k, v in (query or {}).items():
        if k.startswith("$"):
            continue
        if isinstance(v, dict) and any(x.startswith("$") for x in v):
            if "$eq" in v:
                set_path(doc, k, v["$eq"])
            continue
        set_path(doc, k, v)
    if isinstance(spec, list):
        return apply_update_pipeline(doc, spec)
    for path, v in spec.get("$setOnInsert", {}).items():
        set_path(doc, path, v)
    return apply_update(doc, spec)
