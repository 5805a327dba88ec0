"""Hive-style SQL surface over document collections (SURVEY §3.2).

Reference: ``CREATE EXTERNAL TABLE ... STORED BY MongoStorageHandler``
with a column-name remapping ``mongo.columns.mapping``
(hive/.../MongoStorageHandler.java:210-284; BSONSerDe.java:108-115) —
the idiom that let ``SELECT * FROM querytest WHERE i > 20`` run over a
live collection.

Spark-native shape: register the collection as a temp view with optional
field renames (e.g. ``{"id": "_id"}`` maps view column ``id`` to document
field ``_id``, the HiveQueryTest convention), then query with
``spark.sql`` — Catalyst handles predicate decomposition natively.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def register_collection_view(
    spark: SparkSession,
    store_path: str,
    collection: str,
    view_name: str,
    columns_mapping: dict[str, str] | None = None,
    query: str | None = None,
    **reader_options: str,
) -> DataFrame:
    """Expose a collection as a SQL temp view; returns the DataFrame.

    ``columns_mapping``: {view_column: document_field} renames, incl.
    dotted document paths (``{"city": "address.city"}``).
    """
    reader = (
        spark.read.format("mongodoc")
        .option("path", store_path)
        .option("collection", collection)
    )
    if query:
        reader = reader.option("query", query)
    for k, v in reader_options.items():
        reader = reader.option(k, v)
    df = reader.load()
    if columns_mapping:
        mapped = [
            F.col(field.replace(".", ".")).alias(view_col)
            for view_col, field in columns_mapping.items()
        ]
        unmapped = [
            F.col(c) for c in df.columns
            if c not in set(columns_mapping.values())
        ]
        df = df.select(*mapped, *unmapped)
    df.createOrReplaceTempView(view_name)
    return df
