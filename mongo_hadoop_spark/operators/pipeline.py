"""Composed training-data pipeline: the end-to-end flow a 100 TB corpus
run executes, as one declarative plan.

    documents
      → quality gate   (length + stopword-ratio features, textstats)
      → exact dedup    (keep lowest doc_id per text)
      → yield report   (per lang × source: surviving docs, tokens kept,
                        rejection/duplication accounting)

Everything stays in one Catalyst plan: the quality features are pure
column math, dedup is one shuffle on md5(text), the report is one more
keyed aggregation.  No Python, no collect; at scale the only wide ops are
the two group-bys.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mongo_hadoop_spark.session import table
from mongo_hadoop_spark.functions import tokenize

MIN_TOKENS = 20
MAX_CHARS_PER_TOKEN = 8.0


def corpus_yield_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    words = tokenize("text")
    feats = d.select(
        "doc_id", "lang", "source", "text", "n_chars",
        F.size(words).alias("n_tokens"),
    ).withColumn(
        "chars_per_token",
        F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"),
    )
    passed = feats.where(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("chars_per_token") <= MAX_CHARS_PER_TOKEN)
    )
    # exact dedup among survivors: rank within text-hash, keep first
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    survivors = (
        passed.withColumn("rn", F.row_number().over(w))
        .withColumn("is_kept", (F.col("rn") == 1).cast("int"))
    )
    return (
        survivors.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("docs_passed_quality"),
            F.sum("is_kept").alias("docs_kept"),
            F.sum(F.when(F.col("is_kept") == 1, F.col("n_tokens"))
                  .otherwise(0)).alias("tokens_kept"),
            (F.count(F.lit(1)) - F.sum("is_kept")).alias("docs_deduped_away"),
        )
    )


YIELD_SQL = rf"""
WITH feats AS (
  SELECT doc_id, lang, source, text, n_chars,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
  FROM documents
), passed AS (
  SELECT *, n_chars::double / n_tokens::double AS chars_per_token
  FROM feats
  WHERE n_tokens >= {MIN_TOKENS}
    AND n_chars::double / n_tokens::double <= {MAX_CHARS_PER_TOKEN}
), survivors AS (
  SELECT *, CASE WHEN row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
                 THEN 1 ELSE 0 END AS is_kept
  FROM passed
)
SELECT lang, source,
       count(*) AS docs_passed_quality,
       sum(is_kept)::bigint AS docs_kept,
       sum(CASE WHEN is_kept = 1 THEN n_tokens ELSE 0 END)::bigint AS tokens_kept,
       (count(*) - sum(is_kept))::bigint AS docs_deduped_away
FROM survivors GROUP BY 1, 2
"""


QUERIES = {"corpus_yield_report": corpus_yield_report}
ORACLES = {"corpus_yield_report": YIELD_SQL}
