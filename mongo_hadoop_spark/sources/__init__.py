"""Spark-facing sources: the ``mongodoc`` Python DataSource (partitioned
reads with filter pushdown over the document store), schema inference,
and extended-JSON bridging.
"""

from mongo_hadoop_spark.sources.mongo_datasource import DocumentDataSource  # noqa: F401


def register(spark) -> None:
    """Register the mongodoc datasource on a session."""
    spark.dataSource.register(DocumentDataSource)
