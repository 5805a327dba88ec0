"""Every queries() entry must match its DuckDB oracle bit-for-bit at the
smoke scale factor — the local replica of the driver's t2 correctness gate.
"""

from __future__ import annotations

import pytest

from mongo_hadoop_spark import operators
from mongo_hadoop_spark.oracle import duck_connection, compare

from conftest import SF_SMOKE

ALL_KEYS = sorted(operators.all_queries().keys())


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ALL_KEYS)
def test_query_matches_oracle(spark, duck, name):
    queries = operators.all_queries()
    oracles = operators.all_oracles()
    df = queries[name](spark, SF_SMOKE)
    if name not in oracles:
        assert df.count() >= 0
        return
    oracle_df = duck.execute(oracles[name]).fetchdf()
    res = compare(name, df, oracle_df)
    assert res.ok, str(res)
