#!/usr/bin/env python
"""mongo_tool.py — the reference's ``MongoTool`` job entry point
re-expressed for Spark.

The reference launches jobs as ``hadoop jar mongo-hadoop.jar MongoTool
-D mongo.input.uri=... -D mongo.input.query=... -D mongo.job.mapper=X``
(core/src/main/java/com/mongodb/hadoop/util/MongoTool.java:81-231;
key names core/.../util/MongoConfigUtil.java).  This CLI keeps the
``-D key=value`` configuration surface, with the Hadoop class hooks
(``mongo.job.mapper``/``reducer``/…) replaced by their Spark-native
equivalent: an aggregation **pipeline document** (``mongo.job.pipeline``
— the language a MongoDB user already writes), compiled by
plans/aggpipe.py onto one Catalyst plan.

Supported keys (reference names where they exist):

  mongo.input.uri           mongodb:// URI (``?storePath=DIR`` serves it
                            from a file-backed store — no mongod needed)
  mongo.input.path          file-backed store directory   (engine form)
  mongo.input.collection    collection name               (engine form)
  mongo.input.query         extended-JSON query document    (F1)
  mongo.input.fields        projection document             (F2)
  mongo.input.sort          per-split sort document         (F3)
  mongo.input.limit / mongo.input.skip                      (F4)
  mongo.input.split_size    split size hint (bytes)         (P2)
  mongo.job.pipeline        aggregation pipeline JSON (replaces
                            mongo.job.mapper/combiner/reducer)
  mongo.output.uri | mongo.output.path + mongo.output.collection
  mongo.output.mode         append | overwrite (default append)
  mongo.client.factory      importable module:callable resolving a
                            pymongo-protocol client from a URI

With no output configured, ``--show N`` prints the first N result rows
as JSON lines (driver-side; for inspection only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STORE_FACTORY = "mongo_hadoop_spark.sources.live_read:store_client"


def parse_props(dees: list[str]) -> dict[str, str]:
    props = {}
    for d in dees:
        if "=" not in d:
            raise SystemExit(f"-D expects key=value, got {d!r}")
        k, _, v = d.partition("=")
        props[k] = v
    return props


def build_reader(spark, props: dict[str, str]):
    reader = spark.read.format("mongodoc")
    uri = props.get("mongo.input.uri")
    if uri:
        reader = (reader.option("backend", "live").option("uri", uri)
                  .option("client_factory",
                          props.get("mongo.client.factory", STORE_FACTORY)))
    else:
        if "mongo.input.path" not in props or \
                "mongo.input.collection" not in props:
            raise SystemExit("need mongo.input.uri, or mongo.input.path "
                             "+ mongo.input.collection")
        reader = (reader.option("path", props["mongo.input.path"])
                  .option("collection", props["mongo.input.collection"]))
    passthrough = {"mongo.input.query": "query",
                   "mongo.input.fields": "fields",
                   "mongo.input.sort": "sort",
                   "mongo.input.limit": "limit",
                   "mongo.input.skip": "skip",
                   "mongo.input.split_size": "split_size"}
    for key, opt in passthrough.items():
        if key in props:
            reader = reader.option(opt, props[key])
    return reader


def run(props: dict[str, str], show: int, spark=None) -> int:
    own_session = spark is None
    if own_session:
        from mongo_hadoop_spark.session import get_spark
        spark = get_spark(app_name="mongo-tool")
        spark.sparkContext.setLogLevel("ERROR")
    from mongo_hadoop_spark.sources import register
    register(spark)

    if props.get("mongo.output.path") and \
            "mongo.output.collection" not in props:
        raise SystemExit("mongo.output.path needs mongo.output.collection")
    df = build_reader(spark, props).load()
    if "mongo.job.pipeline" in props:
        from mongo_hadoop_spark.plans.aggpipe import aggregate
        pipeline = json.loads(props["mongo.job.pipeline"])
        df = aggregate(df, pipeline)

    out_uri = props.get("mongo.output.uri")
    out_path = props.get("mongo.output.path")
    mode = props.get("mongo.output.mode", "append")
    n = None
    if out_uri:
        writer = (df.write.format("mongodoc")
                  .option("backend", "live").option("uri", out_uri)
                  .option("client_factory",
                          props.get("mongo.client.factory", STORE_FACTORY)))
        writer.mode(mode).save()
    elif out_path:
        (df.write.format("mongodoc").option("path", out_path)
         .option("collection", props["mongo.output.collection"])
         .mode(mode).save())
    else:
        rows = df.limit(show).collect()
        n = len(rows)
        for r in rows:
            print(json.dumps(r.asDict(recursive=True), default=str))
    print(json.dumps({"tool": "mongo_tool", "rows_shown": n,
                      "output": out_uri or out_path or None}))
    if own_session:
        spark.stop()
    return 0


def main() -> int:  # pragma: no cover - thin CLI shell
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-D", action="append", default=[], metavar="key=value",
                    help="job property (repeatable, MongoConfigUtil names)")
    ap.add_argument("--show", type=int, default=20,
                    help="rows to print when no output is configured")
    args = ap.parse_args()
    return run(parse_props(args.D), args.show)


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
