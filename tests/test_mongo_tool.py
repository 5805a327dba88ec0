"""MongoTool CLI parity (tools/mongo_tool.py): the -D config surface
drives read → pipeline → write end-to-end on the Spark engine."""

from __future__ import annotations

import json
import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import mongo_tool  # noqa: E402


@pytest.fixture()
def seeded_store(spark, tmp_path):
    from mongo_hadoop_spark.sinks.writers import write_documents

    src = spark.createDataFrame(
        [(i, "A" if i % 2 else "B", float(i * 10)) for i in range(1, 11)],
        "id long, status string, amount double")
    store = str(tmp_path / "tooldb")
    write_documents(src, store, "orders", mode="insert")
    return store


def test_mongo_tool_query_pipeline_write(spark, seeded_store, tmp_path,
                                         capsys):
    out = str(tmp_path / "toolout")
    props = {
        "mongo.input.path": seeded_store,
        "mongo.input.collection": "orders",
        "mongo.input.query": '{"status": "A"}',
        "mongo.job.pipeline": json.dumps([
            {"$group": {"_id": "$status",
                        "total": {"$sum": "$amount"}}}]),
        "mongo.output.path": out,
        "mongo.output.collection": "rollup",
    }
    assert mongo_tool.run(props, show=5, spark=spark) == 0
    back = (spark.read.format("mongodoc").option("path", out)
            .option("collection", "rollup").load()).collect()
    assert [(r["_id"], r["total"]) for r in back] == [("A", 250.0)]


def test_mongo_tool_uri_roundtrip_and_show(spark, tmp_path, capsys):
    from mongo_hadoop_spark.sinks.writers import write_documents

    store = str(tmp_path / "livetool")
    src = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    write_documents(src, store, "c", mode="insert")
    uri = f"mongodb://localhost/db.c?storePath={store}"
    props = {"mongo.input.uri": uri,
             "mongo.input.sort": '{"id": -1}',
             "mongo.input.limit": "1"}
    assert mongo_tool.run(props, show=5, spark=spark) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["rows_shown"] == 1
    assert lines[0]["id"] == 2


def test_mongo_tool_prop_parsing_errors(spark):
    with pytest.raises(SystemExit, match="key=value"):
        mongo_tool.parse_props(["mongo.input.uri"])
    with pytest.raises(SystemExit, match="mongo.input.uri"):
        mongo_tool.run({}, show=1, spark=spark)
    with pytest.raises(SystemExit, match="mongo.output.collection"):
        mongo_tool.run({"mongo.input.path": "/nope",
                        "mongo.input.collection": "c",
                        "mongo.output.path": "/nope2"}, show=1, spark=spark)
