"""Pin: dec_to_double / dec_to_double_sql are bit-identical across engines.

A plain decimal->double CAST diverges between Spark (single correctly-
rounded BigDecimal conversion) and DuckDB (int128->double then /10^scale,
two roundings) once the unscaled value exceeds 2^53 — measured ~25% of
random such values drift by 1 ulp.  The split recipe must agree bit-for-
bit at every magnitude the package's decimal accumulators can produce.
"""

from __future__ import annotations

import random
from decimal import Decimal

import duckdb
import pyspark.sql.functions as F

from mongo_hadoop_spark.functions import dec_to_double, dec_to_double_sql


def _cases(n: int = 400, seed: int = 7):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        s = rng.choice([2, 6, 10])
        intpart = rng.getrandbits(rng.randint(30, 59)) % 10**18
        fracpart = rng.getrandbits(64) % 10**s
        u = intpart * 10**s + fracpart
        if rng.random() < 0.3:
            u = -u
        out.append((str(Decimal(u).scaleb(-s)), s, min(38, 18 + s)))
    return out


def test_dec_to_double_bit_exact_vs_duckdb(spark):
    cases = _cases()
    con = duckdb.connect()

    # One batched query per engine (one collect, one fetchall).
    rows = [(i, v, s, p) for i, (v, s, p) in enumerate(cases)]
    by_scale = {}
    for i, v, s, p in rows:
        by_scale.setdefault((s, p), []).append((i, v))

    mism = []
    for (s, p), group in by_scale.items():
        ids = [i for i, _ in group]
        vals = [v for _, v in group]
        df = spark.createDataFrame(
            [(i, Decimal(v)) for i, v in zip(ids, vals)],
            f"id int, x decimal({p},{s})",
        )
        got = {
            r["id"]: r["y"]
            for r in df.select("id", dec_to_double(F.col("x"), s).alias("y")).collect()
        }
        frag = dec_to_double_sql("x", s)
        sql = (
            f"select id, {frag} as y from (select "
            + " union all select ".join(
                f"{i} as id, '{v}'::decimal({p},{s}) as x" for i, v in zip(ids, vals)
            )
            + ")"
        )
        want = dict(con.execute(sql).fetchall())
        for i in ids:
            if got[i] != want[i]:
                mism.append((i, got[i].hex(), want[i].hex()))
    assert not mism, f"{len(mism)} bit mismatches, first: {mism[:3]}"


def test_scale_agnostic_default(spark):
    """dec_to_double(col) with the default scale 15 must equal the
    scale-exact form AND DuckDB's default-scale fragment, bit for bit —
    this is what licenses using the helper without per-site scale
    bookkeeping across the package."""
    cases = _cases(n=150, seed=23)
    con = duckdb.connect()
    for v, s, p in cases:
        frag = dec_to_double_sql("x")  # default scale 15
        want = con.execute(
            f"select {frag} from (select '{v}'::decimal({p},{s}) as x)"
        ).fetchone()[0]
        frag_s = dec_to_double_sql("x", s)
        want_s = con.execute(
            f"select {frag_s} from (select '{v}'::decimal({p},{s}) as x)"
        ).fetchone()[0]
        assert want == want_s, (v, s)
    # Spark side, batched: default-scale == scale-exact == DuckDB default
    by = {}
    for i, (v, s, p) in enumerate(cases):
        by.setdefault((s, p), []).append((i, v))
    for (s, p), group in by.items():
        df = spark.createDataFrame(
            [(i, Decimal(v)) for i, v in group], f"id int, x decimal({p},{s})"
        )
        rows = df.select(
            "id",
            dec_to_double(F.col("x")).alias("d15"),
            dec_to_double(F.col("x"), s).alias("ds"),
        ).collect()
        ids = {i: v for i, v in group}
        for r in rows:
            assert r["d15"] == r["ds"], (ids[r["id"]], s)
            want = con.execute(
                f"select {dec_to_double_sql('x')} from "
                f"(select '{ids[r['id']]}'::decimal({p},{s}) as x)"
            ).fetchone()[0]
            assert r["d15"] == want, (ids[r["id"]], s)


def test_plain_cast_would_fail(spark):
    """Control: the plain cast DOES drift on >2^53 unscaled values.

    Guards against the pin silently passing because the environment's
    DuckDB started matching — if this control ever fails, the helper can
    be retired in favor of the plain cast.
    """
    con = duckdb.connect()
    rng = random.Random(11)
    diffs = 0
    exprs = []
    for _ in range(200):
        u = rng.getrandbits(rng.randint(54, 80))
        v = str(Decimal(u).scaleb(-10))
        exprs.append(f"('{v}'::decimal(38,10))::double")
        if float(Decimal(v)) != con.execute(f"select {exprs[-1]}").fetchone()[0]:
            diffs += 1
    assert diffs > 10, "DuckDB decimal cast became correctly rounded?"
