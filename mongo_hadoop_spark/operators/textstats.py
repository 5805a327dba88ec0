"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All pure built-in column expressions (codegen'd, no Python UDFs) with
deterministic arithmetic → full DuckDB oracles.  At 100 TB these are
embarrassingly parallel map-only transforms: no shuffle at all, pushed
projections read only (doc_id, text).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from mongo_hadoop_spark.functions import md5_long, md5_long_sql, tokenize
from mongo_hadoop_spark.session import table

_WORDS_SQL = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"

# Tiny stopword inventories for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein"],
}


def _stop_count(words, lang: str):
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words, lambda t: F.array_contains(arr, t)))


def _stop_count_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(ws, x -> list_contains([{lst}], x)))"


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID with deterministic tie-break (en≥es≥de)."""
    d = table(spark, sf_dir, "documents")
    words = tokenize("text")
    d = d.select("doc_id", words.alias("ws"))
    s_en = _stop_count(F.col("ws"), "en")
    s_es = _stop_count(F.col("ws"), "es")
    s_de = _stop_count(F.col("ws"), "de")
    pred = (
        F.when((s_en >= s_es) & (s_en >= s_de), "en")
        .when(s_es >= s_de, "es")
        .otherwise("de")
    )
    return d.select(
        "doc_id", s_en.alias("score_en"), s_es.alias("score_es"),
        s_de.alias("score_de"), pred.alias("predicted_lang"),
    )


LANGID_SQL = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents)
SELECT doc_id,
       {_stop_count_sql('en')} AS score_en,
       {_stop_count_sql('es')} AS score_es,
       {_stop_count_sql('de')} AS score_de,
       CASE WHEN {_stop_count_sql('en')} >= {_stop_count_sql('es')}
             AND {_stop_count_sql('en')} >= {_stop_count_sql('de')} THEN 'en'
            WHEN {_stop_count_sql('es')} >= {_stop_count_sql('de')} THEN 'es'
            ELSE 'de' END AS predicted_lang
FROM w
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / mean-token-length / stopword-ratio quality features."""
    d = table(spark, sf_dir, "documents")
    d = d.select("doc_id", "n_chars", tokenize("text").alias("ws"))
    n_tokens = F.size("ws")
    mean_len = (
        F.aggregate("ws", F.lit(0).cast("long"), lambda a, w: a + F.length(w)).cast("double")
        / n_tokens.cast("double")
    )
    stop_ratio = _stop_count(F.col("ws"), "en").cast("double") / n_tokens.cast("double")
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        (F.col("n_chars").cast("double") / n_tokens.cast("double")).alias("chars_per_token"),
    )


QUALITY_SQL = f"""
WITH w AS (SELECT doc_id, n_chars, {_WORDS_SQL} AS ws FROM documents)
SELECT doc_id,
       len(ws) AS n_tokens,
       list_reduce(list_prepend(0::bigint, list_transform(ws, x -> length(x)::bigint)),
                   (a, b) -> a + b)::double / len(ws)::double AS mean_token_len,
       {_stop_count_sql('en')}::double / len(ws)::double AS stopword_ratio,
       n_chars::double / len(ws)::double AS chars_per_token
FROM w
"""


GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MEAN_LEN_LO, GOPHER_MEAN_LEN_HI = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2


def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (the published rule set of
    Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1 —
    public literature): per-document rule flags + the composite keep
    decision.

    Rules: word count ∈ [50, 100k]; mean word length ∈ [3, 10];
    symbol-to-word ratio (# and ellipsis) ≤ 0.1; ≥80% of words contain
    an alphabetic character; ≥2 distinct stopwords present (inventory
    corpus-adapted to the synthetic vocabulary — the rule's spirit is
    "has common function words").

    Emitting the individual flags (not just the verdict) is deliberate:
    at 100 TB the per-rule failure histogram is the dataset diagnostic a
    pipeline owner actually reads.  Map-only scan — every rule is a
    JVM-side expression over one tokenize; no shuffle, no Python.
    """
    return gopher_flags(table(spark, sf_dir, "documents"))


def gopher_nsym(text_col: str = "text"):
    """The Gopher symbol-count scalar (# occurrences + ellipsis thirds)
    as a column expression over raw text — factored out so the manifest
    can precompute it before checkpointing and drop the text column."""
    t = F.col(text_col)
    return (
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
        + (F.length(t)
           - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    )


def gopher_flags(d: DataFrame) -> DataFrame:
    """Column-level core of :func:`text_gopher_quality` over any
    (doc_id, text) DataFrame — stateless map, so it runs unchanged on a
    Structured Streaming document source (streaming/jobs.py
    stream_quality_gate; stream ≡ batch by construction).

    A pre-tokenized ``ws`` column is reused when present, so callers that
    checkpoint the tokenized stream once (pipeline.corpus_pretrain_manifest)
    don't pay a second tokenize; likewise a precomputed ``nsym`` column
    (the symbol-count scalar, :func:`gopher_nsym`) — together they make
    the raw ``text`` column unnecessary, so the manifest's checkpoint
    can drop it and halve its materialized bytes."""
    has_nsym = "nsym" in d.columns
    cols = ["doc_id"] + (["nsym"] if has_nsym else ["text"])
    if "ws" in d.columns:
        d = d.select(*cols, "ws")
    else:
        d = d.select(*cols, tokenize("text").alias("ws"))
    n_words = F.size("ws")
    mean_len = (
        F.aggregate("ws", F.lit(0).cast("long"),
                    lambda a, w: a + F.length(w)).cast("double")
        / n_words.cast("double")
    )
    n_symbols = F.col("nsym") if has_nsym else gopher_nsym()
    alpha_frac = (
        F.size(F.filter(F.col("ws"), lambda w: w.rlike("[a-zA-Z]")))
        .cast("double") / n_words.cast("double")
    )
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stops = F.size(F.array_intersect(F.array_distinct("ws"), stop_arr))
    wc_ok = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    len_ok = (mean_len >= GOPHER_MEAN_LEN_LO) & (mean_len <= GOPHER_MEAN_LEN_HI)
    sym_ok = (n_symbols / n_words.cast("double")) <= GOPHER_MAX_SYMBOL_RATIO
    alpha_ok = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    stop_ok = n_stops >= GOPHER_MIN_STOPWORDS
    return d.select(
        "doc_id", n_words.alias("n_words"),
        wc_ok.alias("wc_ok"), len_ok.alias("len_ok"), sym_ok.alias("sym_ok"),
        alpha_ok.alias("alpha_ok"), stop_ok.alias("stop_ok"),
        (wc_ok & len_ok & sym_ok & alpha_ok & stop_ok).alias("keep"),
    )


def corpus_gopher_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher yield report: documents scanned, per-rule pass
    counts, and keep rate — the dataset diagnostic a pipeline owner
    reads before deciding which crawl sources to keep ingesting.

    One map-only rule scan (:func:`text_gopher_quality`) joined back to
    its source column, then a single source-keyed aggregation; keep
    rate goes through an exact decimal ratio for cross-engine hashes.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    flags = text_gopher_quality(spark, sf_dir)
    j = d.join(flags, "doc_id")
    cnt = F.count(F.lit(1))
    return (
        j.groupBy("source").agg(
            cnt.alias("n_docs"),
            F.sum(F.col("wc_ok").cast("long")).alias("n_wc_ok"),
            F.sum(F.col("len_ok").cast("long")).alias("n_len_ok"),
            F.sum(F.col("sym_ok").cast("long")).alias("n_sym_ok"),
            F.sum(F.col("alpha_ok").cast("long")).alias("n_alpha_ok"),
            F.sum(F.col("stop_ok").cast("long")).alias("n_stop_ok"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            (F.sum(F.col("keep").cast("decimal(27,10)"))
             / cnt).cast("double").alias("keep_rate"),
        )
        .orderBy("source")
    )


GOPHER_YIELD_SQL = f"""
WITH flags AS ({{GOPHER}}),
j AS (
  SELECT d.source, f.* FROM documents d JOIN flags f ON d.doc_id = f.doc_id
)
SELECT source,
       count(*) AS n_docs,
       sum(wc_ok::bigint)::bigint AS n_wc_ok,
       sum(len_ok::bigint)::bigint AS n_len_ok,
       sum(sym_ok::bigint)::bigint AS n_sym_ok,
       sum(alpha_ok::bigint)::bigint AS n_alpha_ok,
       sum(stop_ok::bigint)::bigint AS n_stop_ok,
       sum(keep::bigint)::bigint AS n_keep,
       (sum(keep::int::decimal(27,10)) / count(*))::double AS keep_rate
FROM j GROUP BY 1 ORDER BY 1
"""


_GOPHER_STOPS = ", ".join(f"'{w}'" for w in STOPWORDS["en"])

GOPHER_SQL = f"""
WITH w AS (SELECT doc_id, text, {_WORDS_SQL} AS ws FROM documents),
m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         list_reduce(list_prepend(0::bigint,
                     list_transform(ws, x -> length(x)::bigint)),
                     (a, b) -> a + b)::double / len(ws)::double AS mean_len,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) / 3 AS n_symbols,
         len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))::double
           / len(ws)::double AS alpha_frac,
         len(list_intersect(list_distinct(ws), [{_GOPHER_STOPS}])) AS n_stops
  FROM w
)
SELECT doc_id, n_words,
       n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS} AS wc_ok,
       mean_len >= {GOPHER_MEAN_LEN_LO} AND mean_len <= {GOPHER_MEAN_LEN_HI} AS len_ok,
       n_symbols / n_words::double <= {GOPHER_MAX_SYMBOL_RATIO} AS sym_ok,
       alpha_frac >= {GOPHER_MIN_ALPHA_FRAC} AS alpha_ok,
       n_stops >= {GOPHER_MIN_STOPWORDS} AS stop_ok,
       (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
         AND (mean_len >= {GOPHER_MEAN_LEN_LO} AND mean_len <= {GOPHER_MEAN_LEN_HI})
         AND (n_symbols / n_words::double <= {GOPHER_MAX_SYMBOL_RATIO})
         AND (alpha_frac >= {GOPHER_MIN_ALPHA_FRAC})
         AND (n_stops >= {GOPHER_MIN_STOPWORDS}) AS keep
FROM m
"""

GOPHER_YIELD_SQL = GOPHER_YIELD_SQL.format(GOPHER=GOPHER_SQL)



def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish sub-token count (letter runs / digit runs /
    single other chars) per document, and corpus totals per source."""
    d = table(spark, sf_dir, "documents")
    ws_count = F.size(tokenize("text"))
    bpe_count = F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
    per_doc = d.select("source", ws_count.alias("n_ws"), bpe_count.alias("n_bpe"))
    return per_doc.groupBy("source").agg(
        F.sum("n_ws").alias("total_ws_tokens"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


TOKEN_COUNT_SQL = rf"""
SELECT source,
       sum(len({_WORDS_SQL}))::bigint AS total_ws_tokens,
       sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')))::bigint AS total_bpe_tokens,
       count(*) AS n_docs
FROM documents GROUP BY 1
"""


FP_MOD = 1_000_000_007


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling polynomial fingerprint over word hashes:
    acc = (acc * 31 + md5_long(word)) mod 1e9+7 — identical fold in DuckDB
    via list_reduce with a prepended zero accumulator."""
    d = table(spark, sf_dir, "documents")
    words = tokenize("text")
    fp = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + md5_long(w)) % FP_MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::bigint, list_transform({_WORDS_SQL}, w -> {md5_long_sql('w')})),
         (a, b) -> (a * 31 + b) % {FP_MOD}
       ) AS fingerprint
FROM documents
"""




# ---------------------------------------------------------------------------
# Sequence packing: greedy fixed-budget token windows
# ---------------------------------------------------------------------------

PACK_TOKENS = 2048


def documents_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to fixed-budget training sequences (packing).

    The pre-tokenization step of every LLM training pipeline: concatenate
    documents in a deterministic order until the token budget is reached,
    then start the next sequence.  Formulated as one ordered window over a
    cumulative token count — ``bin = floor((cum - n_tok) / budget)`` is
    the sequence each document *starts* in (greedy concatenation with
    budget-boundary splits, the standard packed-dataset layout).  One
    sort-shuffle total, partitioned by ``source`` (the shard key): each
    shard packs independently, so there is no global single-task sort at
    any scale — the same layout a sharded dataset loader expects.

    Output: per sequence-bin, the doc count and token sum — the packing
    manifest a loader would consume.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", "doc_id",
        F.size(tokenize("text")).cast("long").alias("n_tok"),
    )
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    binned = toks.select(
        "source", "doc_id", "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / PACK_TOKENS)
        .alias("seq_bin"),
    )
    return binned.groupBy("source", "seq_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


PACK_SQL = f"""
WITH toks AS (
  SELECT source, doc_id, len({_WORDS_SQL})::bigint AS n_tok FROM documents
),
binned AS (
  SELECT source, doc_id, n_tok,
         floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
               / {PACK_TOKENS})::bigint AS seq_bin
  FROM toks
)
SELECT source, seq_bin, count(*) AS n_docs, sum(n_tok)::bigint AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM binned GROUP BY 1, 2
"""



# ---------------------------------------------------------------------------
# Distinctive terms (TF-IDF shape with integer-exact ranking)
# ---------------------------------------------------------------------------

TOP_TERMS = 3


def text_top_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top distinctive terms per document — the TF-IDF shape with an
    integer-exact ranking: order by (tf DESC, df ASC, term ASC) instead of
    tf·log(N/df).  The float logarithm adds nothing to the *order* for a
    fixed document (log is monotone in df), and dropping it keeps every
    compared value an integer — no last-ulp ln() divergence between
    engines.

    Plan shape: one explode → two hash aggregations (term-per-doc tf,
    term df) → broadcast-sized df table joined back → per-doc top-k
    window.  At 100 TB the df table is the only global state (vocabulary-
    sized); everything else partitions by doc.
    """
    d = table(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id", F.explode(F.array_distinct(tokenize("text"))).alias("term")
    ).where(F.col("term") != "")
    tf_terms = d.select(
        "doc_id", F.explode(tokenize("text")).alias("term")
    ).where(F.col("term") != "")
    tf = tf_terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    return (
        tf.join(df_, "term")
        .select("doc_id", "term", "tf", "df", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= TOP_TERMS)
    )


DISTINCTIVE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term <> '' GROUP BY 1, 2
),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term <> '' GROUP BY 1
)
SELECT doc_id, term, tf, df, rank FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
  FROM tf JOIN df USING (term)
)
WHERE rank <= {TOP_TERMS}
"""



# ---------------------------------------------------------------------------
# PII redaction (scrub pass)
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub pass: redact email/phone shapes and account the removals.

    The hygiene step every training corpus runs before packing.  Pure
    ``regexp_replace``/``regexp_count`` column work — map-only, no
    shuffle, pushdown-friendly; at 100 TB this is a streaming scan.
    The redacted text itself is emitted (hash-checked by the oracle), so
    the gate verifies the actual scrub output, not just the counts.
    """
    d = table(spark, sf_dir, "documents")
    n_email = F.regexp_count("text", F.lit(_EMAIL_RE))
    cleaned1 = F.regexp_replace("text", _EMAIL_RE, "<EMAIL>")
    n_phone = F.regexp_count(cleaned1, F.lit(_PHONE_RE))
    cleaned = F.regexp_replace(cleaned1, _PHONE_RE, "<PHONE>")
    return d.select(
        "doc_id",
        n_email.cast("long").alias("n_emails"),
        n_phone.cast("long").alias("n_phones"),
        F.md5(cleaned).alias("redacted_md5"),
    )


REDACT_SQL = rf"""
WITH pass1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
         regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM documents
)
SELECT doc_id,
       n_emails::bigint AS n_emails,
       len(regexp_extract_all(t1, '{_PHONE_RE}'))::bigint AS n_phones,
       md5(regexp_replace(t1, '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM pass1
"""


# ---------------------------------------------------------------------------
# Repetition detection (quality filter)
# ---------------------------------------------------------------------------

REP_N = 3


def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent-3-gram share per document — the degenerate-text
    detector (boilerplate, keyboard mash, template spam score high).

    Integer counts only: (top 3-gram occurrences, total 3-grams); the
    consumer divides.  One explode + one two-key aggregation, partitioned
    by doc — no global state at any scale.
    """
    from mongo_hadoop_spark.functions import word_shingles

    d = table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(word_shingles("text", REP_N)).alias("g"))
    per_gram = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.max("c").alias("top_gram_count"),
        F.sum("c").alias("total_grams"),
    )


REPETITION_SQL = f"""
WITH grams AS (
  SELECT doc_id, unnest(list_transform(
    generate_series(1, greatest(len({_WORDS_SQL}) - {REP_N - 1}, 0)),
    i -> array_to_string(({_WORDS_SQL})[i:i+{REP_N - 1}], ' '))) AS g
  FROM documents
),
per_gram AS (
  SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
)
SELECT doc_id, max(c) AS top_gram_count, sum(c)::bigint AS total_grams
FROM per_gram GROUP BY 1
"""

# ---------------------------------------------------------------------------
# Exact distributed heavy hitters (Misra–Gries candidate pruning)
# ---------------------------------------------------------------------------

HH_PHI = 0.002   # heavy hitter = token with frequency >= 0.2% of all tokens
HH_M = 1000      # per-partition Misra–Gries counters; must exceed 1/HH_PHI


def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens with corpus frequency ≥ HH_PHI, computed EXACTLY without a
    full-vocabulary groupBy.

    Two passes, the shape that survives a key domain of billions:

    1. Per-partition Misra–Gries summaries (``mapInPandas``: per-Arrow-
       batch ``value_counts`` merged under the MG truncation rule, state
       bounded at HH_M counters regardless of vocabulary size).  MG
       undercounts by at most n_p/(HH_M+1); any token with global share
       ≥ φ has, by weighted-average pigeonhole, some partition where its
       share is ≥ φ > 1/(HH_M+1) — so the candidate UNION is a superset
       of every true heavy hitter.  False positives are fine; false
       negatives are impossible, which is what makes the result exact.
    2. Exact counts for candidates only: semi-join the token stream to
       the (tiny, broadcast) candidate set, one groupBy over candidate
       rows, threshold against the broadcast total.

    The final shuffle carries only candidate tokens — at 100 TB the
    full-vocabulary groupBy this replaces would shuffle the entire token
    stream's distinct domain.  The oracle is the straightforward
    HAVING-threshold query: exactness of the pruning IS the property
    under test.
    """
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    words = d.select(F.explode(tokenize("text")).alias("w"))

    def mg_partition(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        for pdf in batches:
            for w, c in pdf["w"].value_counts().items():
                counts[w] = counts.get(w, 0) + int(c)
            if len(counts) > HH_M:
                # MG truncation: subtract the (HH_M+1)-th largest count,
                # drop non-positive — classic mergeable-summary step
                kth = sorted(counts.values(), reverse=True)[HH_M]
                counts = {w: c - kth for w, c in counts.items() if c > kth}
        yield pd.DataFrame({"w": list(counts.keys())})

    candidates = words.mapInPandas(mg_partition, "w string").distinct()
    totals = words.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        words.join(F.broadcast(candidates), "w")
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.join(F.broadcast(totals))
        .where(F.col("cnt").cast("double")
               >= F.col("n_total").cast("double") * HH_PHI)
        .select("w", "cnt")
    )


HEAVY_HITTERS_SQL = f"""
WITH w AS (SELECT unnest({_WORDS_SQL}) AS w FROM documents),
tot AS (SELECT count(*) AS n_total FROM w)
SELECT w, count(*) AS cnt
FROM w CROSS JOIN tot
GROUP BY w, n_total
HAVING count(*)::double >= n_total::double * {HH_PHI}
"""


# --- retrieval-ingestion chunking --------------------------------------

CHUNK_CHARS = 512      #: window size (chars)
CHUNK_STRIDE = 384     #: stride; overlap = CHUNK_CHARS - CHUNK_STRIDE


def documents_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping character windows per document — the
    chunking step of a RAG / embedding-ingestion pipeline (split each
    document into CHUNK_CHARS-char windows every CHUNK_STRIDE chars so
    retrieval context never falls across a hard boundary).

    Chunk count is closed-form (no iteration): one extra chunk per full
    stride beyond the first window, last chunk may be short, and every
    document yields at least one chunk (empty docs produce one empty
    chunk — a deliberate, deterministic convention so ingestion counts
    reconcile with document counts).  Pure integer/substring arithmetic:
    a map-side ``explode(sequence(...))`` with zero shuffles — at
    100 TB the chunker is scan-bound and embarrassingly parallel, and
    the 1-based offsets make every chunk independently addressable for
    the embedding join downstream."""
    return chunk_windows(table(spark, sf_dir, "documents")) \
        .orderBy("doc_id", "chunk_idx")


def chunk_windows(d: DataFrame) -> DataFrame:
    """The chunker core over any documents frame — batch and streaming
    share this verbatim (stateless per-doc map, so stream ≡ batch by
    construction)."""
    chunks = d.select(
        "doc_id", "source",
        F.explode(F.sequence(
            F.lit(0).cast("long"),
            F.expr(f"CAST(greatest(length(text) - {CHUNK_CHARS}, 0)"
                   f" + {CHUNK_STRIDE - 1} AS BIGINT)"
                   f" div {CHUNK_STRIDE}"))).alias("chunk_idx"),
        F.col("text"))
    return (chunks.select(
        "doc_id", "source", "chunk_idx",
        (F.col("chunk_idx") * F.lit(CHUNK_STRIDE) + F.lit(1))
        .alias("chunk_off"),
        F.expr(f"substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 "
               f"AS INT), {CHUNK_CHARS})").alias("chunk_text"))
        .withColumn("n_chunk_chars", F.length("chunk_text")))


CHUNK_WINDOWS_SQL = f"""
WITH idx AS (
  SELECT doc_id, source, text,
         unnest(generate_series(
           0, (greatest(length(text) - {CHUNK_CHARS}, 0)
               + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE})) AS chunk_idx
  FROM documents
)
SELECT doc_id, source, chunk_idx,
       chunk_idx * {CHUNK_STRIDE} + 1 AS chunk_off,
       substr(text, (chunk_idx * {CHUNK_STRIDE} + 1)::int, {CHUNK_CHARS})
         AS chunk_text,
       length(substr(text, (chunk_idx * {CHUNK_STRIDE} + 1)::int,
                     {CHUNK_CHARS}))::int AS n_chunk_chars
FROM idx
ORDER BY doc_id, chunk_idx
"""


# --- fill-in-the-middle transform ---------------------------------------

FIM_RATE_MOD = 2   #: 1-in-2 docs get the FIM rearrangement
FIM_PRE, FIM_SUF, FIM_MID = "<PRE>", "<SUF>", "<MID>"


def documents_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle pretraining transform (Bavarian et al. 2022,
    PSM mode): for a deterministic 1-in-FIM_RATE_MOD subset of
    documents, cut the text at two pseudo-random pivots and emit
    ``<PRE>prefix<SUF>suffix<MID>middle``; the rest pass through
    unchanged (the paper's mixed-rate recipe).

    Determinism in place of RNG: the two pivots derive from the 60-bit
    md5 hash of the doc_id under two salts, reduced mod (len+1) — the
    per-key deterministic sampling pattern (``events_per_user_sample``),
    so both engines — and any re-run over re-partitioned data — cut
    every document identically.  Pure per-row integer/substring
    arithmetic, zero shuffles at any corpus size."""
    return fim_transform(table(spark, sf_dir, "documents")) \
        .orderBy("doc_id")


def fim_transform(d: DataFrame) -> DataFrame:
    """The FIM core over any documents frame — batch and streaming
    share this verbatim (row-local md5 pivots + substrings)."""
    key = F.col("doc_id").cast("string")
    L = F.length("text")
    a = md5_long(key, "fim-a") % (L + F.lit(1))
    b = md5_long(key, "fim-b") % (L + F.lit(1))
    lo, hi = F.least(a, b), F.greatest(a, b)
    fim = F.concat(
        F.lit(FIM_PRE), F.expr("substring(text, 1, CAST(__lo AS INT))"),
        F.lit(FIM_SUF),
        F.expr("substring(text, CAST(__hi + 1 AS INT), length(text))"),
        F.lit(FIM_MID),
        F.expr("substring(text, CAST(__lo + 1 AS INT), "
               "CAST(__hi - __lo AS INT))"))
    picked = md5_long(key, "fim-pick") % FIM_RATE_MOD == 0
    return (d.withColumn("__lo", lo).withColumn("__hi", hi)
            .select("doc_id", "source",
                    picked.alias("fim_applied"),
                    F.col("__lo").alias("cut_lo"),
                    F.col("__hi").alias("cut_hi"),
                    F.when(picked, fim).otherwise(F.col("text"))
                    .alias("train_text")))


FIM_TRANSFORM_SQL = f"""
WITH cuts AS (
  SELECT doc_id, source, text,
         {md5_long_sql("doc_id::varchar", "fim-a")} % (length(text) + 1)
           AS ca,
         {md5_long_sql("doc_id::varchar", "fim-b")} % (length(text) + 1)
           AS cb,
         {md5_long_sql("doc_id::varchar", "fim-pick")} % {FIM_RATE_MOD} = 0
           AS fim_applied
  FROM documents
),
lohi AS (
  SELECT doc_id, source, text, fim_applied,
         least(ca, cb) AS cut_lo, greatest(ca, cb) AS cut_hi
  FROM cuts
)
SELECT doc_id, source, fim_applied, cut_lo, cut_hi,
       CASE WHEN fim_applied THEN
         '{FIM_PRE}' || substr(text, 1, cut_lo::int)
         || '{FIM_SUF}' || substr(text, (cut_hi + 1)::int, length(text))
         || '{FIM_MID}' || substr(text, (cut_lo + 1)::int,
                                  (cut_hi - cut_lo)::int)
       ELSE text END AS train_text
FROM lohi
ORDER BY doc_id
"""



def corpus_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup: duplicated CHUNK_CHARS windows across
    the corpus (boilerplate headers, license blocks, mirrored passages
    — duplication that document-level dedup can't see because the
    surrounding documents differ).  The step that runs before paying
    for chunk embeddings in a RAG ingest.

    Composition of :func:`documents_chunk_windows` with the exact-dedup
    shape: md5 fingerprint per chunk (the 60-bit cross-engine hash),
    one keyed aggregate, survivors = lexicographically-first
    (doc_id, chunk_idx) copy.  Only duplicated fingerprints are
    reported.  Scale: fingerprinting is map-side; the aggregate
    shuffles fingerprint-keyed (uniform by construction); output is
    duplicate-group-sized."""
    chunks = documents_chunk_windows(spark, sf_dir) \
        .where(F.length("chunk_text") > 0)
    fp = chunks.select(
        md5_long(F.col("chunk_text")).alias("fingerprint"),
        "doc_id", "chunk_idx")
    # canonical copy via a packed key: chunk_idx < 2^20 at any sane
    # document length, so (doc_id << 20) + chunk_idx orders exactly
    # like (doc_id, chunk_idx) — min() then decomposes, and the same
    # integer trick runs verbatim in the oracle.  The packing range is
    # ENFORCED, not assumed: a pathological row (a >400 MB document, or
    # a doc_id at/above 2^43 where the product would overflow int64 or
    # break the ordering) fails the job loudly instead of silently
    # electing a wrong canonical copy.  assert_true returns NULL when
    # the condition holds, so the coalesce'd add is a no-op on every
    # valid row and stays inside codegen.
    valid = F.assert_true(
        (F.col("chunk_idx") < F.lit(1048576))
        & (F.col("doc_id") >= F.lit(0))
        & (F.col("doc_id") < F.lit(1 << 43).cast("long")),
        F.lit("corpus_chunk_dedup: packed canonical key needs "
              "0 <= doc_id < 2^43 and chunk_idx < 2^20"))
    key = (F.col("doc_id") * F.lit(1048576).cast("long")
           + F.col("chunk_idx") + F.coalesce(valid.cast("long"), F.lit(0)))
    return (fp.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("n_copies"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.min(key).alias("__k"))
            .where(F.col("n_copies") > 1)
            .select("fingerprint", "n_copies", "n_docs",
                    F.expr("__k div 1048576").alias("canonical_doc"),
                    (F.col("__k") % 1048576).alias("canonical_chunk"))
            .orderBy("fingerprint"))


CHUNK_DEDUP_SQL = f"""
WITH idx AS (
  SELECT doc_id, text,
         unnest(generate_series(
           0, (greatest(length(text) - {CHUNK_CHARS}, 0)
               + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE})) AS chunk_idx
  FROM documents
),
fp AS (
  SELECT {md5_long_sql(f"substr(text, (chunk_idx * {CHUNK_STRIDE} + 1)::int, {CHUNK_CHARS})")}
           AS fingerprint,
         doc_id, chunk_idx
  FROM idx
  WHERE length(substr(text, (chunk_idx * {CHUNK_STRIDE} + 1)::int,
               {CHUNK_CHARS})) > 0
)
SELECT fingerprint, count(*)::bigint AS n_copies,
       count(DISTINCT doc_id)::bigint AS n_docs,
       min(doc_id * 1048576 + chunk_idx) // 1048576 AS canonical_doc,
       min(doc_id * 1048576 + chunk_idx) % 1048576 AS canonical_chunk
FROM fp GROUP BY fingerprint HAVING count(*) > 1
ORDER BY fingerprint
"""


QUERIES = {
    "text_heavy_hitters": text_heavy_hitters,
    "text_langid": text_langid,
    "text_quality": text_quality,
    "text_gopher_quality": text_gopher_quality,
    "corpus_gopher_yield": corpus_gopher_yield,
    "text_token_count": text_token_count,
    "text_fingerprint": text_fingerprint,
    "documents_pack_sequences": documents_pack_sequences,
    "text_top_distinctive_terms": text_top_distinctive_terms,
    "text_redact_pii": text_redact_pii,
    "text_repetition_ratio": text_repetition_ratio,
    "documents_chunk_windows": documents_chunk_windows,
    "documents_fim_transform": documents_fim_transform,
    "corpus_chunk_dedup": corpus_chunk_dedup,
}

ORACLES = {
    "text_heavy_hitters": HEAVY_HITTERS_SQL,
    "text_langid": LANGID_SQL,
    "text_quality": QUALITY_SQL,
    "text_gopher_quality": GOPHER_SQL,
    "corpus_gopher_yield": GOPHER_YIELD_SQL,
    "text_token_count": TOKEN_COUNT_SQL,
    "text_fingerprint": FINGERPRINT_SQL,
    "documents_pack_sequences": PACK_SQL,
    "text_top_distinctive_terms": DISTINCTIVE_SQL,
    "text_redact_pii": REDACT_SQL,
    "text_repetition_ratio": REPETITION_SQL,
    "documents_chunk_windows": CHUNK_WINDOWS_SQL,
    "documents_fim_transform": FIM_TRANSFORM_SQL,
    "corpus_chunk_dedup": CHUNK_DEDUP_SQL,
}
