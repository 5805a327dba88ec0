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


def corpus_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE corpus-preparation flow as one declarative plan:

        documents
          → quality gate      (token count + chars/token, as above)
          → exact dedup       (keep lowest doc_id per text)
          → decontaminate     (drop anything sharing a word-shingle with
                               the benchmark slice — broadcast join,
                               dedup.corpus_decontaminate semantics)
          → train/valid/test  (content-hash 98/1/1, leak-proof —
                               analytics.documents_train_split rule)
          → manifest          (per split × lang: docs, tokens)

    One Catalyst plan end to end; wide ops are the dedup shuffle, the
    broadcast contamination join, and the final keyed aggregation —
    the quality gate, split assignment, and shingle explode are all
    map-side.  This is the "would it run the real 100 TB job" flagship:
    every stage is the oracle-verified operator, composed.
    """
    from mongo_hadoop_spark.operators.analytics import (SPLIT_SALT,
                                                        TRAIN_PCT, VALID_PCT)
    from mongo_hadoop_spark.operators.dedup import BENCH_MOD, SHINGLE_N
    from mongo_hadoop_spark.functions import md5_long, word_shingles

    d = table(spark, sf_dir, "documents")
    words = tokenize("text")
    feats = d.select(
        "doc_id", "lang", "text",
        F.size(words).alias("n_tokens"),
        (F.col("n_chars").cast("double")
         / F.size(words).cast("double")).alias("cpt"),
    )
    passed = feats.where(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("cpt") <= MAX_CHARS_PER_TOKEN)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (passed.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn"))

    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles("text", SHINGLE_N))).alias("s"))
    bench_shingles = (sh.where(F.col("doc_id") % BENCH_MOD == 0)
                      .select("s").distinct())
    contaminated = (sh.where(F.col("doc_id") % BENCH_MOD != 0)
                    .join(F.broadcast(bench_shingles), "s")
                    .select("doc_id").distinct())
    clean = (kept.where(F.col("doc_id") % BENCH_MOD != 0)
             .join(contaminated, "doc_id", "left_anti"))

    bucket = md5_long(F.col("text"), salt=SPLIT_SALT) % 100
    split = (F.when(bucket < TRAIN_PCT, F.lit("train"))
             .when(bucket < TRAIN_PCT + VALID_PCT, F.lit("valid"))
             .otherwise(F.lit("test")))
    return (
        clean.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("docs"),
             F.sum("n_tokens").alias("tokens"))
    )


def _manifest_sql() -> str:
    from mongo_hadoop_spark.functions import md5_long_sql
    from mongo_hadoop_spark.operators.analytics import (SPLIT_SALT,
                                                        TRAIN_PCT, VALID_PCT)
    from mongo_hadoop_spark.operators.dedup import (_SHINGLES_SQL, BENCH_MOD)

    return rf"""
WITH feats AS (
  SELECT doc_id, lang, text,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
         n_chars::double
           / len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::double
           AS cpt
  FROM documents
), passed AS (
  SELECT * FROM feats
  WHERE n_tokens >= {MIN_TOKENS} AND cpt <= {MAX_CHARS_PER_TOKEN}
), kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM passed) WHERE rn = 1
), sh AS (
  SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS s FROM documents
), bench AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} = 0
), contaminated AS (
  SELECT DISTINCT doc_id FROM sh JOIN bench USING (s)
  WHERE doc_id % {BENCH_MOD} <> 0
), clean AS (
  SELECT k.* FROM kept k
  WHERE k.doc_id % {BENCH_MOD} <> 0
    AND k.doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT CASE WHEN ({md5_long_sql('text', salt=SPLIT_SALT)}) % 100 < {TRAIN_PCT}
              THEN 'train'
            WHEN ({md5_long_sql('text', salt=SPLIT_SALT)}) % 100
                 < {TRAIN_PCT + VALID_PCT}
              THEN 'valid'
            ELSE 'test' END AS split,
       lang, count(*) AS docs, sum(n_tokens)::bigint AS tokens
FROM clean GROUP BY 1, 2
"""


QUERIES = {"corpus_yield_report": corpus_yield_report,
           "corpus_training_manifest": corpus_training_manifest}
ORACLES = {"corpus_yield_report": YIELD_SQL,
           "corpus_training_manifest": _manifest_sql()}
