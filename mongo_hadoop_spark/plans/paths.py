"""Dotted-path navigation into nested documents/arrays.

Reference: MongoPathRetriever
(core/src/main/java/com/mongodb/hadoop/util/MongoPathRetriever.java:23-50) —
walks ``a.b.0.c`` through dicts and lists (numeric segments index arrays),
returning None when any hop is missing or out of range.
"""

from __future__ import annotations


def get_path(doc, path: str):
    cur = doc
    for seg in path.split("."):
        if isinstance(cur, dict):
            if seg not in cur:
                return None
            cur = cur[seg]
        elif isinstance(cur, (list, tuple)):
            try:
                idx = int(seg)
            except ValueError:
                return None
            if not (0 <= idx < len(cur)):
                return None
            cur = cur[idx]
        else:
            return None
    return cur


def set_path(doc: dict, path: str, value) -> None:
    """Create intermediate documents as needed (used by update operators)."""
    parts = path.split(".")
    cur = doc
    for seg in parts[:-1]:
        nxt = cur.get(seg) if isinstance(cur, dict) else None
        if not isinstance(nxt, (dict, list)):
            nxt = {}
            cur[seg] = nxt
        cur = nxt
    cur[parts[-1]] = value


def unset_path(doc: dict, path: str) -> None:
    parts = path.split(".")
    cur = doc
    for seg in parts[:-1]:
        if not isinstance(cur, dict) or seg not in cur:
            return
        cur = cur[seg]
    if isinstance(cur, dict):
        cur.pop(parts[-1], None)
