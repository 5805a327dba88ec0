"""End-to-end reference job flows against the document store — the
engine-side equivalents of the reference's golden-output integration tests
(SURVEY §5.2: TreasuryTest, enron, sensors), run through the full
read → transform → write → read-back loop.
"""

from __future__ import annotations

import datetime as dt

import pytest
import pyspark.sql.functions as F

from mongo_hadoop_spark.sinks import UpdateSpec, write_documents
from mongo_hadoop_spark.store import DocumentStore

UTC = dt.timezone.utc


@pytest.fixture()
def registered(spark):
    from mongo_hadoop_spark.sources import register

    register(spark)
    return spark


def test_treasury_update_job_flow(registered, tmp_path):
    """TreasuryYieldUpdateReducer (A2): groupBy year → avg/count/sum →
    upsert with $set + $push calculatedAt + $inc numCalculations; running
    the job twice must keep aggregates identical and bump the counter
    (TreasuryTest golden behavior + TreasuryYieldUpdateReducer.java:46-80)."""
    store = DocumentStore(str(tmp_path / "db"))
    docs = [
        {"_id": dt.datetime(1990 + (i % 3), 1 + (i % 12), 1, tzinfo=UTC),
         "bc10Year": 5.0 + (i % 7) * 0.25}
        for i in range(300)
    ]
    store.collection("yield_historical_in").insert_many(docs)

    def run_job():
        src = (registered.read.format("mongodoc")
               .option("path", store.path)
               .option("collection", "yield_historical_in").load())
        agg = src.groupBy(F.year("_id").alias("year")).agg(
            F.count(F.lit(1)).alias("count"),
            F.sum(F.col("bc10Year").cast("decimal(12,4)")).cast("double").alias("sum"),
            (F.sum(F.col("bc10Year").cast("decimal(12,4)")).cast("double")
             / F.count(F.lit(1))).alias("avg"),
        )

        def build(doc):
            return UpdateSpec(
                {"_id": doc["year"]},
                {"$set": {"count": doc["count"], "sum": doc["sum"], "avg": doc["avg"]},
                 "$push": {"calculatedAt": "run"},
                 "$inc": {"numCalculations": 1}},
                upsert=True,
            )

        write_documents(agg, store.path, "yield_historical_out",
                        mode="update", update_builder=build)

    run_job()
    run_job()
    out = {d["_id"]: d for d in store.collection("yield_historical_out").find()}
    assert set(out) == {1990, 1991, 1992}
    for year, d in out.items():
        assert d["numCalculations"] == 2
        assert d["calculatedAt"] == ["run", "run"]
        assert d["count"] == 100
        assert abs(d["avg"] - d["sum"] / d["count"]) < 1e-12


def test_enron_pair_count_flow(registered, tmp_path):
    """Enron pair counting (A3): split To on commas, trim, drop empties,
    count (from, to) pairs (EnronMailMapper.java:26-62)."""
    store = DocumentStore(str(tmp_path / "db"))
    store.collection("messages").insert_many([
        {"_id": 1, "headers": {"From": "a@x.com", "To": "b@x.com, c@x.com"}},
        {"_id": 2, "headers": {"From": "a@x.com", "To": "b@x.com,,  "}},
        {"_id": 3, "headers": {"From": "b@x.com", "To": "a@x.com"}},
        {"_id": 4, "headers": {"From": "c@x.com"}},  # no To → dropped
    ])
    src = (registered.read.format("mongodoc")
           .option("path", store.path).option("collection", "messages").load())
    pairs = (
        src.select(
            F.col("headers.From").alias("from"),
            F.explode(
                F.filter(
                    F.transform(
                        F.split(F.coalesce(F.col("headers.To"), F.lit("")), ","),
                        lambda t: F.trim(t),
                    ),
                    lambda t: t != "",
                )
            ).alias("to"),
        )
        .groupBy("from", "to").agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r["from"], r.to): r.n for r in pairs.collect()}
    assert got == {
        ("a@x.com", "b@x.com"): 2,
        ("a@x.com", "c@x.com"): 1,
        ("b@x.com", "a@x.com"): 1,
    }
    # write back as MessagePair docs (insert mode) and read again
    write_documents(pairs, store.path, "message_pairs", mode="insert")
    assert store.collection("message_pairs").count() == 3


def test_sensors_rollup_flow(registered, tmp_path):
    """Sensors (A4): device docs + log stream; count logs per device and
    $inc logs_count on the owning device docs (LogReducer semantics)."""
    store = DocumentStore(str(tmp_path / "db"))
    store.collection("devices").insert_many(
        [{"_id": f"d{i}", "type": "temp", "logs_count": 0} for i in range(4)]
    )
    store.collection("logs").insert_many(
        [{"_id": i, "d_id": f"d{i % 4}", "v": i} for i in range(100)]
    )
    logs = (registered.read.format("mongodoc")
            .option("path", store.path).option("collection", "logs").load())
    counts = logs.groupBy("d_id").agg(F.count(F.lit(1)).alias("n"))

    write_documents(
        counts, store.path, "devices", mode="update",
        update_builder=lambda doc: UpdateSpec(
            {"_id": doc["d_id"]}, {"$inc": {"logs_count": doc["n"]}}, upsert=False
        ),
    )
    devices = {d["_id"]: d for d in store.collection("devices").find()}
    assert all(d["logs_count"] == 25 for d in devices.values())
    assert all(d["type"] == "temp" for d in devices.values())


def test_path_filter_option(registered, tmp_path):
    """F10: segment glob filter restricts which files are scanned
    (BSONPathFilter analog)."""
    store = DocumentStore(str(tmp_path / "db"))
    c = store.collection("logs")
    c.insert_many([{"_id": i, "day": "d1"} for i in range(10)], segment_hint="day1")
    c.insert_many([{"_id": 10 + i, "day": "d2"} for i in range(10)], segment_hint="day2")

    def load(pat):
        return (registered.read.format("mongodoc")
                .option("path", store.path).option("collection", "logs")
                .option("splitter", "bson_file")
                .option("path_filter", pat)
                .schema("_id long, day string").load())

    assert load("day1*").count() == 10
    assert load("day*").count() == 20
    assert load("nomatch*").count() == 0


def test_per_split_cursor_options(registered, tmp_path):
    """F3/F4 per-split semantics: sort/limit/skip apply per split, so
    limit yields ≤ limit × numSplits rows (MongoInputSplit.java:281-296)."""
    store = DocumentStore(str(tmp_path / "db"))
    c = store.collection("items")
    c.insert_many([{"_id": i, "v": 1000 - i} for i in range(100)], segment_hint="a")
    c.insert_many([{"_id": 100 + i, "v": 500 - i} for i in range(100)], segment_hint="b")

    df = (registered.read.format("mongodoc")
          .option("path", store.path).option("collection", "items")
          .option("splitter", "bson_file")
          .option("sort", '{"v": -1}')
          .option("limit", "5").load())
    rows = df.collect()
    assert len(rows) == 10  # 5 per segment-split × 2 splits
    # each split contributed its own top-5 by v desc
    top_a = sorted((r.v for r in rows if r._id < 100), reverse=True)
    assert top_a == [1000, 999, 998, 997, 996]

    skipped = (registered.read.format("mongodoc")
               .option("path", store.path).option("collection", "items")
               .option("splitter", "single")
               .option("sort", '{"_id": 1}')
               .option("skip", "190").load())
    assert [r._id for r in skipped.collect()] == list(range(190, 200))

    projected = (registered.read.format("mongodoc")
                 .option("path", store.path).option("collection", "items")
                 .option("fields", '{"_id": 1}').load())
    assert projected.where(F.col("v").isNotNull()).count() == 0
    assert projected.count() == 200


def test_streaming_reducer_matches_grouped_map(spark):
    """T2: the mapInPandas streaming reducer (sorted-stream groupby, the
    reference's reducer.py protocol) and the applyInPandas grouped-map
    variant must produce identical per-key stats."""
    from conftest import SF_CORRECT
    from mongo_hadoop_spark.operators.relational2 import (
        grouped_reducer_stats,
        grouped_reducer_stats_grouped_map,
    )

    a = {r["user_id"]: r for r in grouped_reducer_stats(spark, SF_CORRECT).collect()}
    b = {r["user_id"]: r
         for r in grouped_reducer_stats_grouped_map(spark, SF_CORRECT).collect()}
    assert a.keys() == b.keys()
    for uid in a:
        assert a[uid]["n"] == b[uid]["n"]
        assert a[uid]["median_value"] == b[uid]["median_value"]
        assert a[uid]["iqr"] == b[uid]["iqr"]


def test_ivf_nprobe_recall_dominates(spark):
    """nprobe=2 probes a superset of cells, so its retrieved neighbor set —
    scored by TRUE cosine — must be at least as similar as nprobe=1's,
    query by query."""
    import numpy as np

    from conftest import SF_CORRECT
    from mongo_hadoop_spark.operators.similarity import ivf_knn, ivf_knn_nprobe
    from mongo_hadoop_spark.session import table

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in table(spark, SF_CORRECT, "embeddings").collect()}

    def cos(a, b):
        return float(vecs[a] @ vecs[b]) / (
            np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))

    def by_query(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], []).append(r["neighbor_id"])
        return out

    one = by_query(ivf_knn(spark, SF_CORRECT))
    two = by_query(ivf_knn_nprobe(spark, SF_CORRECT))
    assert set(two) >= set(one)
    for qid, n1 in one.items():
        s1 = sum(cos(qid, n) for n in n1)
        s2 = sum(cos(qid, n) for n in two[qid])
        assert s2 >= s1 - 1e-12, (qid, s1, s2)


def test_ml_minhash_backend_matches_dataframe_pipeline(spark):
    """spark.ml MinHashLSH backend and the pure-DataFrame banding pipeline
    must agree on the exact-verified duplicate pair set (candidates may
    differ; post-verification they must not)."""
    from conftest import SF_CORRECT
    from mongo_hadoop_spark.operators.dedup import (
        dedup_minhash_ml_pairs,
        dedup_minhash_verified,
    )

    ml = {(r.doc_a, r.doc_b)
          for r in dedup_minhash_ml_pairs(spark, SF_CORRECT).collect()}
    own = {(r.doc_a, r.doc_b)
           for r in dedup_minhash_verified(spark, SF_CORRECT).collect()}
    assert ml == own
