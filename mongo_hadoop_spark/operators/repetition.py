"""Gopher repetition-removal rules — the second half of the published
Gopher quality filter (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Table A1).

``textstats.text_gopher_quality`` implements the *document-statistics*
rules (word count, mean word length, symbol ratio, stopwords); this
module adds the *repetition* rules, the half that actually catches the
dominant failure mode of crawled corpora — boilerplate and templated
spam.  Per document:

- **top n-gram character fraction** (n = 2, 3, 4): characters covered
  by the occurrences of the single most frequent word n-gram, divided
  by the document's character count.  Thresholds 0.20 / 0.18 / 0.16.
- **duplicated n-gram character fraction** (n = 5 … 10): the
  occurrence-weighted character mass of every n-gram that occurs at
  least twice, divided by the document's character count.  Thresholds
  0.15 / 0.14 / 0.13 / 0.12 / 0.11 / 0.10.

Definition note (documented deviation): the paper counts *distinct
characters covered* by duplicated n-grams, which requires interval
arithmetic over overlapping spans — a sequential per-document scan.
The distributed formulation here uses the occurrence-weighted mass
``Σ count(g)·len(g)`` instead (it can exceed the character count for
pathologically repetitive text); the statistic is monotone in
repetition and the published thresholds keep their gating role.  The
line/paragraph duplicate rules are omitted: the synthetic corpus is
single-line (no ``\\n``), so they would be vacuously satisfied —
they'd be one more groupBy on md5(line) in this same shape.

Cross-engine exactness: every fraction is one bigint/bigint IEEE
division (character counts are integers; n-gram text and lengths are
byte-identical across engines); the top gram is selected by
``max(struct(cnt, len, gram))`` — integer-then-string ordering,
engine-stable.

Scale shape (100 TB): n-gram generation is one generator expression per
document (row-local, ~9·len grams); the only shuffle is the
(doc_id)-keyed aggregation — the (doc_id, n, gram) counting happens
map-side under partial aggregation.  Nothing is corpus-global; the
filter is embarrassingly parallel, exactly like the paper's pipeline.

Reference context: the connector has no text-quality surface; this is
a driver-mandated training-data-pipeline extension (BASELINE.json).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mongo_hadoop_spark.functions import tokenize
from mongo_hadoop_spark.session import table

TOP_NGRAM_LIMITS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_LIMITS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}

_WORDS_SQL = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"


def _grams_duck(n: int) -> str:
    return (f"list_transform(generate_series(1,"
            f" greatest(len({_WORDS_SQL}) - {n - 1}, 0)),"
            f" i -> array_to_string(({_WORDS_SQL})[i:i+{n - 1}], ' '))")


def text_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition fractions + per-rule flags + composite
    keep — the Gopher repetition gate.

    Columns: doc_id, top{2,3,4}_frac, dup{5..10}_frac, keep.
    """
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ns = sorted(TOP_NGRAM_LIMITS) + sorted(DUP_NGRAM_LIMITS)
    # Explode (n, start-position) pairs FIRST, carrying the token array
    # through the Generate, then build each gram by slicing the
    # materialized column — hashing the gram text inside the generator
    # lambda would re-evaluate the tokenize subtree once PER GRAM
    # (Catalyst does no CSE in lambda bodies: O(tokens²) per document on
    # long docs — the pipeline_search_highlights lesson, SCALE.md wave 6;
    # same shape as spans._fingerprints).
    sz = "size(ws)"
    pos_pairs = ", ".join(
        f"CASE WHEN {sz} < {n} THEN array()"
        f" ELSE transform(sequence(1, {sz} - {n - 1}),"
        f" i -> struct({n} AS n, i AS i)) END"
        for n in ns)
    base = d.select("doc_id", "n_chars", tokenize("text").alias("ws"))
    grams = base.select(
        "doc_id", "n_chars", "ws",
        F.explode(F.expr(f"flatten(array({pos_pairs}))")).alias("p"),
    ).select(
        "doc_id", "n_chars", F.col("p.n").alias("n"),
        F.array_join(F.slice(F.col("ws"), F.col("p.i"), F.col("p.n")), " ")
        .alias("g"))
    counted = (grams.groupBy("doc_id", "n_chars", "n", "g")
               .agg(F.count(F.lit(1)).alias("cnt")))
    per_n = (counted.groupBy("doc_id", "n_chars", "n").agg(
        # top gram: max by (count, gram length, gram) — deterministic
        F.max(F.struct(F.col("cnt"), F.length("g").alias("len"),
                       F.col("g"))).alias("top"),
        F.sum(F.when(F.col("cnt") >= 2,
                     F.col("cnt") * F.length("g")).otherwise(0))
        .alias("dup_chars"),
    ).select(
        "doc_id", "n_chars", "n",
        ((F.col("top.cnt") * F.col("top.len")).cast("double")
         / F.col("n_chars").cast("double")).alias("top_frac"),
        (F.col("dup_chars").cast("double")
         / F.col("n_chars").cast("double")).alias("dup_frac"),
    ))
    aggs = []
    for n in sorted(TOP_NGRAM_LIMITS):
        aggs.append(F.max(F.when(F.col("n") == n, F.col("top_frac")))
                    .alias(f"top{n}_frac"))
    for n in sorted(DUP_NGRAM_LIMITS):
        aggs.append(F.max(F.when(F.col("n") == n, F.col("dup_frac")))
                    .alias(f"dup{n}_frac"))
    wide = per_n.groupBy("doc_id").agg(*aggs)
    # a doc too short for n-grams of size n has no row → no repetition
    keep = F.lit(True)
    cols = [F.col("doc_id")]
    for n, lim in sorted(TOP_NGRAM_LIMITS.items()):
        c = F.coalesce(F.col(f"top{n}_frac"), F.lit(0.0))
        cols.append(c.alias(f"top{n}_frac"))
        keep = keep & (c <= lim)
    for n, lim in sorted(DUP_NGRAM_LIMITS.items()):
        c = F.coalesce(F.col(f"dup{n}_frac"), F.lit(0.0))
        cols.append(c.alias(f"dup{n}_frac"))
        keep = keep & (c <= lim)
    d_all = table(spark, sf_dir, "documents").select("doc_id")
    return (d_all.join(wide, "doc_id", "left")
            .select(*cols, keep.alias("keep")))


def _repetition_sql() -> str:
    ns = sorted(TOP_NGRAM_LIMITS) + sorted(DUP_NGRAM_LIMITS)
    gram_lists = " || ".join(
        f"list_transform({_grams_duck(n)}, g -> {{'n': {n}, 'g': g}})"
        for n in ns)
    top_cols, dup_cols, out_cols, keep_terms = [], [], [], []
    for n, lim in sorted(TOP_NGRAM_LIMITS.items()):
        top_cols.append(
            f"max(CASE WHEN n = {n} THEN top_frac END) AS top{n}_frac")
        out_cols.append(f"coalesce(top{n}_frac, 0.0::double) AS top{n}_frac")
        keep_terms.append(f"coalesce(top{n}_frac, 0.0::double) <= {lim}")
    for n, lim in sorted(DUP_NGRAM_LIMITS.items()):
        dup_cols.append(
            f"max(CASE WHEN n = {n} THEN dup_frac END) AS dup{n}_frac")
        out_cols.append(f"coalesce(dup{n}_frac, 0.0::double) AS dup{n}_frac")
        keep_terms.append(f"coalesce(dup{n}_frac, 0.0::double) <= {lim}")
    return f"""
WITH grams AS (
  SELECT doc_id, n_chars, p.n AS n, p.g AS g
  FROM (SELECT doc_id, n_chars, unnest({gram_lists}) AS p FROM documents)
),
counted AS (
  SELECT doc_id, n_chars, n, g, count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3, 4
),
per_n AS (
  SELECT doc_id, n_chars, n,
         (max(struct_pack(cnt := cnt, len := length(g)::bigint, g := g)))
           AS top,
         sum(CASE WHEN cnt >= 2 THEN cnt * length(g) ELSE 0 END)::bigint
           AS dup_chars
  FROM counted GROUP BY 1, 2, 3
),
fracs AS (
  SELECT doc_id, n,
         (top.cnt * top.len)::double / n_chars::double AS top_frac,
         dup_chars::double / n_chars::double AS dup_frac
  FROM per_n
),
wide AS (
  SELECT doc_id, {", ".join(top_cols + dup_cols)}
  FROM fracs GROUP BY doc_id
)
SELECT d.doc_id, {", ".join(out_cols)},
       ({" AND ".join(keep_terms)}) AS keep
FROM documents d LEFT JOIN wide ON d.doc_id = wide.doc_id
"""


REPETITION_SQL = _repetition_sql()


def corpus_repetition_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source repetition-gate yield — n_docs, per-bucket worst-rule
    failure counts, keep count and exact keep rate (the crawl-source
    diagnostic, same shape as corpus_gopher_yield)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    flags = text_repetition_flags(spark, sf_dir)
    cnt = F.count(F.lit(1))
    top_fail = None
    for n, lim in sorted(TOP_NGRAM_LIMITS.items()):
        t = F.col(f"top{n}_frac") > lim
        top_fail = t if top_fail is None else (top_fail | t)
    dup_fail = None
    for n, lim in sorted(DUP_NGRAM_LIMITS.items()):
        t = F.col(f"dup{n}_frac") > lim
        dup_fail = t if dup_fail is None else (dup_fail | t)
    return (
        d.join(flags, "doc_id")
        .groupBy("source")
        .agg(
            cnt.alias("n_docs"),
            F.sum(top_fail.cast("long")).alias("n_top_ngram_fail"),
            F.sum(dup_fail.cast("long")).alias("n_dup_ngram_fail"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            (F.sum(F.col("keep").cast("decimal(27,10)")) / cnt)
            .cast("double").alias("keep_rate"),
        )
    )


def _yield_sql() -> str:
    top_fail = " OR ".join(
        f"top{n}_frac > {lim}" for n, lim in sorted(TOP_NGRAM_LIMITS.items()))
    dup_fail = " OR ".join(
        f"dup{n}_frac > {lim}" for n, lim in sorted(DUP_NGRAM_LIMITS.items()))
    return f"""
WITH flags AS ({REPETITION_SQL}),
j AS (
  SELECT d.source, f.* FROM documents d JOIN flags f ON d.doc_id = f.doc_id
)
SELECT source, count(*) AS n_docs,
       sum(({top_fail})::bigint)::bigint AS n_top_ngram_fail,
       sum(({dup_fail})::bigint)::bigint AS n_dup_ngram_fail,
       sum(keep::bigint)::bigint AS n_keep,
       (sum(keep::int::decimal(27,10)) / count(*))::double AS keep_rate
FROM j GROUP BY 1
"""


QUERIES = {
    "text_repetition_flags": text_repetition_flags,
    "corpus_repetition_yield": corpus_repetition_yield,
}

ORACLES = {
    "text_repetition_flags": REPETITION_SQL,
    "corpus_repetition_yield": _yield_sql(),
}
