"""Timestamp-encoding robustness: NTZ vs LTZ parquet must be equivalent.

The driver's testdata generator has already changed `events.ts` physical
encoding once (tz-aware `timestamp[us, UTC]` → tz-less `timestamp[us]`,
which Spark reads as TIMESTAMP_NTZ) and that silently broke the as-of
join in round 3 (`unix_micros` rejects NTZ input).  This test pins the
contract: every events-consuming operator must produce IDENTICAL results
whether the parquet stores naive or UTC-tagged microsecond timestamps —
`session.table()` is responsible for normalizing (session tz is pinned
to UTC, so the reinterpretation is exact).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

# every registry query that consumes the events table's timestamp column
EVENTS_QUERIES = [
    "events_asof_last_order",
    "events_asof_last_order_tolerance",
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_windows",
    "events_funnel",
    "events_cohort_retention",
    "events_value_anomalies",
    "window_topn_per_group",
    "window_running_sum",
    "window_event_gaps",
    "grouped_reducer_stats",
    "user_activity_histogram",
]


def _variant_dir(tmp_path, tag: str, ts_type: pa.DataType) -> str:
    """sf dir whose events.parquet stores `ts` with the given arrow type."""
    d = tmp_path / tag
    d.mkdir()
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f != "events.parquet":
            os.symlink(os.path.join(SF_SMOKE, f), d / f)
    t = pq.read_table(os.path.join(SF_SMOKE, "events.parquet"))
    i = t.schema.get_field_index("ts")
    t = t.set_column(i, pa.field("ts", ts_type), t.column(i).cast(ts_type))
    pq.write_table(t, d / "events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def ntz_ltz_dirs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ts_variants")
    ntz = _variant_dir(tmp, "ntz", pa.timestamp("us"))
    ltz = _variant_dir(tmp, "ltz", pa.timestamp("us", tz="UTC"))
    yield ntz, ltz
    shutil.rmtree(tmp, ignore_errors=True)


def test_table_normalizes_ntz_to_timestamp(spark, ntz_ltz_dirs):
    from mongo_hadoop_spark.session import table

    ntz, ltz = ntz_ltz_dirs
    assert dict(table(spark, ntz, "events").dtypes)["ts"] == "timestamp"
    assert dict(table(spark, ltz, "events").dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize("name", EVENTS_QUERIES)
def test_events_query_ntz_ltz_equivalent(spark, ntz_ltz_dirs, name):
    from mongo_hadoop_spark import operators

    ntz, ltz = ntz_ltz_dirs
    fn = operators.all_queries()[name]
    a = sorted(map(tuple, fn(spark, ntz).collect()))
    b = sorted(map(tuple, fn(spark, ltz).collect()))
    assert len(a) > 0, f"{name} returned no rows on the NTZ variant"
    assert a == b, f"{name} diverges between NTZ and LTZ parquet encodings"


def test_table_cache_invalidates_on_regeneration(spark, tmp_path):
    """session.table() memoizes DataFrames per file identity; rewriting
    the file in place (new mtime/size) must serve the new contents."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mongo_hadoop_spark.session import table

    p = tmp_path / "events.parquet"
    pq.write_table(pa.table({"event_id": [1, 2, 3]}), p)
    assert table(spark, str(tmp_path), "events").count() == 3
    # same path, regenerated contents
    pq.write_table(pa.table({"event_id": [1, 2, 3, 4, 5]}), p)
    assert table(spark, str(tmp_path), "events").count() == 5
    # repeated load of unchanged file returns the identical plan object
    d1 = table(spark, str(tmp_path), "events")
    d2 = table(spark, str(tmp_path), "events")
    assert d1 is d2


def test_table_cache_does_not_collapse_symlinked_paths(spark, tmp_path):
    """A symlinked sf dir must get its own cache entry: collapsing it
    with its target (realpath) would serve a DataFrame bound to
    whichever access path populated the cache first — which may since
    have been deleted (regression: ntz test fixtures symlink the small
    tables and rmtree the fixture dir at teardown)."""
    from mongo_hadoop_spark.session import table

    d = tmp_path / "real"
    d.mkdir()
    pq.write_table(pa.table({"event_id": [1, 2, 3]}), d / "events.parquet")
    link_dir = tmp_path / "alias"
    link_dir.mkdir()
    os.symlink(d / "events.parquet", link_dir / "events.parquet")

    via_link = table(spark, str(link_dir), "events")
    assert via_link.count() == 3
    # delete the symlink; the real path must still be readable afresh
    os.remove(link_dir / "events.parquet")
    assert table(spark, str(d), "events").count() == 3
