"""Physical-layout helpers for cluster-scale tables: bucketing + partitioning.

At 100 TB the dominant costs are shuffles and full scans; both are layout
problems, solved at *write* time:

- **Bucketing** (`write_bucketed`) pre-hash-partitions a table by its join
  key into N buckets.  Two tables bucketed the same way join with ZERO
  exchange on either side — the classic fact-to-fact co-located join
  (e.g. orders ⋈ lineitem on orderkey) that would otherwise shuffle
  terabytes per query.  Plan-asserted in tests: no ``Exchange`` above
  either scan.
- **Date partitioning** (`write_date_partitioned`) lays events out as
  ``dt=YYYY-MM-DD/`` directories so time-ranged queries prune whole
  partitions at *planning* time — the scan's ``PartitionFilters`` carries
  the predicate and unmatched directories are never opened.

Reference parity note: the reference's analog is shard-chunk locality
(ShardChunkMongoSplitter.java:98-119) — placing computation at the data.
Spark inverts it: place the *data* for the computation; bucketing is the
durable form of that placement.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, key: str, buckets: int,
                   path: str | None = None) -> None:
    """Persist ``df`` as a bucketed table registered in the metastore.

    ``sortBy(key)`` inside each bucket additionally enables merge-join
    without a sort step.  Bucket count is a capacity decision: aim for
    bucket files of 100-500 MB at target scale (e.g. 100 TB / 256 MB
    ≈ 400k files / 4096 buckets × date partitions).
    """
    writer = (df.write.format("parquet")
              .bucketBy(buckets, key).sortBy(key)
              .mode("overwrite"))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def cobucketed_join(spark: SparkSession, left: str, right: str,
                    key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    Exchange on either side (verified by tests/test_layout.py)."""
    return spark.table(left).join(spark.table(right), key)


def write_date_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Lay a timestamped table out as dt=YYYY-MM-DD partitions."""
    (df.withColumn("dt", F.date_format(ts_col, "yyyy-MM-dd"))
     .write.partitionBy("dt").mode("overwrite").parquet(path))


def read_date_range(spark: SparkSession, path: str,
                    start: str, end: str) -> DataFrame:
    """Time-ranged read whose predicate lands in PartitionFilters — only
    matching dt= directories are listed and scanned."""
    return (spark.read.parquet(path)
            .where((F.col("dt") >= start) & (F.col("dt") < end)))
