"""Input-size guards for quadratic-by-design baseline operators.

Some operators are kept deliberately exhaustive as *exactness baselines*
(``dedup_ngram_jaccard``: blocked all-pairs Jaccard; ``knn_bruteforce``:
query-set × full-corpus cosine).  Their cost grows quadratically with
input size (measured in SCALE.md: 27× / 3.7× at 8× data), so running them
on a production-scale corpus is always a mistake — the bucketed
equivalents (``dedup_minhash_verified``, ``ivf_knn``) compute the same
answers at linear-ish cost.

``guard_quadratic`` refuses inputs above a configurable row bound instead
of silently launching an O(n²) job.  The row probe is ``limit(n+1).count()``
— a bounded scan that stops as soon as the limit is exceeded, so the guard
itself stays cheap on arbitrarily large inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: default maximum input rows for a quadratic baseline; override with the
#: ``SPARK_GRAFT_QUADRATIC_MAX_ROWS`` environment variable.
DEFAULT_QUADRATIC_MAX_ROWS = 200_000

_ENV_VAR = "SPARK_GRAFT_QUADRATIC_MAX_ROWS"


class QuadraticInputError(ValueError):
    """Raised when a quadratic baseline operator gets a too-large input."""


def quadratic_max_rows() -> int:
    """Current row bound (env override read per call, so tests and callers
    can adjust it without re-importing)."""
    return int(os.environ.get(_ENV_VAR, DEFAULT_QUADRATIC_MAX_ROWS))


#: (resolved source identity, bound) → probed row indicator; a table's size
#: does not change between repeated guard checks in one session, so the
#: bounded scan runs once per (source, bound) instead of once per query
#: build.  The identity includes the file's mtime and size, so regenerating
#: the testdata in place invalidates the cached probe automatically.
_PROBE_CACHE: dict[tuple, int] = {}


def _source_identity(cache_key: str) -> tuple:
    """Resolve a caller-supplied source path to a staleness-proof identity.

    ``cache_key`` is a filesystem path (a parquet file, or a directory/stem
    like ``{sf_dir}/documents``).  Whichever of ``path`` / ``path.parquet``
    exists contributes (realpath, mtime_ns, size); if neither resolves the
    raw string is used alone (no staleness protection possible).
    """
    for candidate in (cache_key, cache_key + ".parquet"):
        try:
            st = os.stat(candidate)
        except OSError:
            continue
        return (os.path.realpath(candidate), st.st_mtime_ns, st.st_size)
    return (cache_key,)


def guard_quadratic(
    df: DataFrame,
    op: str,
    alternative: str,
    max_rows: int | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """Raise :class:`QuadraticInputError` if ``df`` has more than the
    configured number of rows; otherwise return ``df`` unchanged.

    ``df.limit(bound + 1).count()`` scans only until ``bound + 1`` rows are
    found — it never materializes the full input, so the check is safe to
    run even on an input that would be catastrophically large to join.
    """
    bound = quadratic_max_rows() if max_rows is None else max_rows
    key = (_source_identity(cache_key), bound) if cache_key else None
    if key is not None and key in _PROBE_CACHE:
        probe = _PROBE_CACHE[key]
    else:
        probe = df.limit(bound + 1).count()
        if key is not None:
            _PROBE_CACHE[key] = probe
    if probe > bound:
        raise QuadraticInputError(
            f"{op} is a quadratic exactness baseline and refuses inputs over "
            f"{bound} rows (got >{bound}). Use {alternative} — it computes "
            f"the same result with bucketed candidate generation and holds "
            f"at production scale. Override with {_ENV_VAR} if you really "
            f"mean to run the exhaustive version."
        )
    return df
