"""Unigram surprisal scoring (CCNet-style perplexity filter) semantics."""

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from mongo_hadoop_spark.operators import lm


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_rare_tokens_score_higher(spark, tmp_path):
    """A doc of corpus-rare tokens must out-surprise a doc of the
    corpus-dominant token: the ordering CCNet's filter relies on."""
    texts = [
        "the the the the the the the the the the",   # doc 0: dominant token
        "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10",  # doc 1: ten singletons
        "the the the the the zq11 zq12 zq13 zq14 zq15",  # doc 2: mixed
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = {r["doc_id"]: r for r in
            lm.text_unigram_surprisal(spark, sf).collect()}
    assert rows[0]["surprisal_bits"] < rows[2]["surprisal_bits"] \
        < rows[1]["surprisal_bits"]
    # exactness: sum_bits/n_tokens reproduces the double
    for r in rows.values():
        assert r["surprisal_bits"] == r["sum_bits"] / r["n_tokens"]


def test_surprisal_is_bitlen_exact(spark, tmp_path):
    """Hand-check the whole-bits quantization: N=4 total tokens,
    c('a')=3, c('b')=1 → bits are bitlen(4)-bitlen(3)=1 and
    bitlen(4)-bitlen(1)=2."""
    sf = _write_docs(spark, tmp_path, ["a a a b"])
    r = lm.text_unigram_surprisal(spark, sf).collect()[0]
    assert r["n_tokens"] == 4
    assert r["sum_bits"] == 3 * 1 + 1 * 2
    assert r["surprisal_bits"] == 5 / 4


def test_buckets_partition_corpus(spark):
    """Buckets cover every doc exactly once with monotone average
    surprisal.  Threshold (quantile) semantics: docs tied at a cut share
    the lower bucket, so a tie-dominated corpus (sf0.001 has 475/500
    docs at exactly 5.0 bits) may legitimately leave 'middle' empty —
    the distribution-correct behavior, unlike ntile's remainder split."""
    b = {r["bucket"]: r for r in
         lm.corpus_perplexity_buckets(spark, SF_SMOKE).collect()}
    assert set(b) <= {"head", "middle", "tail"}
    assert "head" in b
    total = sum(r["n_docs"] for r in b.values())
    n_docs = lm.text_unigram_surprisal(spark, SF_SMOKE).count()
    assert total == n_docs
    order = [b[k]["avg_surprisal_bits"] for k in ("head", "middle", "tail")
             if k in b]
    assert order == sorted(order)


def test_lm_plan_vocab_broadcast(spark):
    """The vocabulary and total-count sides arrive broadcast; no
    cartesian beyond the broadcast 1-row scalar."""
    plan = lm.text_unigram_surprisal(spark, SF_SMOKE)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2


def test_bigram_surprisal_bits_nonnegative_and_bounded(spark):
    """bits = bitlen(c1) - bitlen(c12) with c12 <= c1, so 0 <= bits and
    per-doc average is bounded by bitlen(total bigrams)."""
    from mongo_hadoop_spark.operators.lm import text_bigram_surprisal

    rows = text_bigram_surprisal(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams >= 1
        assert 0 <= r.sum_bits
        assert 0 <= r.surprisal_bits < 64


def test_bigram_mean_surprisal_in_information_range(spark):
    """Corpus-level sanity: mean bigram surprisal is strictly positive
    (bigrams are not all unique-prefix) and below log2 of the bigram
    vocabulary size — the information-theoretic ceiling."""
    import pyspark.sql.functions as F
    from mongo_hadoop_spark.operators.lm import text_bigram_surprisal
    from mongo_hadoop_spark.functions import tokenize
    from mongo_hadoop_spark.session import table

    d = table(spark, SF_SMOKE, "documents")
    scores = {r.doc_id: r.surprisal_bits
              for r in text_bigram_surprisal(spark, SF_SMOKE).collect()}
    n_bi = (
        d.select("doc_id", tokenize("text").alias("t"))
        .select(F.explode(F.expr(
            "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1),"
            " (a, b) -> struct(a, b))")).alias("z"))
        .distinct().count()
    )
    mean = sum(scores.values()) / len(scores)
    assert 0 < mean < n_bi.bit_length() + 1


def test_nb_model_mixed_case_matches_oracle(spark, tmp_path):
    """Regression (round-6 advice): the Spark NB model must lower() text
    before tokenizing exactly like the _NB_SQL oracle — on a mixed-case
    corpus a case-sensitive model silently diverges (the synthetic
    corpus is all-lowercase, so only this pin catches it)."""
    import duckdb

    from mongo_hadoop_spark.oracle import compare
    from mongo_hadoop_spark.operators.lm import (
        corpus_nb_token_weights, NB_TOKEN_WEIGHTS_SQL,
        corpus_nb_confusion, NB_CONFUSION_SQL)

    texts = [
        "Window SCAN window merge",          # mixed case on purpose
        "WINDOW scan MERGE batch slow",
        "the The THE stream Stream row",
        "Batch BATCH batch scan window",
    ]
    # two docs in the positive length band need >= 150 chars
    texts = [t + " pad" * 40 for t in texts[:2]] + texts[2:]
    sf = _write_docs(spark, tmp_path, texts)
    duck = duckdb.connect()
    duck.execute("CREATE VIEW documents AS SELECT * FROM "
                 f"read_parquet('{sf}/documents.parquet/*.parquet')")
    try:
        for fn, sql in [(corpus_nb_token_weights, NB_TOKEN_WEIGHTS_SQL),
                        (corpus_nb_confusion, NB_CONFUSION_SQL)]:
            res = compare(fn.__name__, fn(spark, sf),
                          duck.execute(sql).fetchdf())
            assert res.ok, str(res)
    finally:
        duck.close()


def _ref_doremi(doc_rows, rounds=None):
    """Plain-Python integer reference of the DoReMi recurrence —
    same millibit losses, clamped rational update, and renorm."""
    from collections import Counter

    from mongo_hadoop_spark.operators.lm import (
        DOREMI_CLAMP, DOREMI_GAIN, DOREMI_RENORM, DOREMI_ROUNDS,
        DOREMI_SCALE)

    rounds = DOREMI_ROUNDS if rounds is None else rounds
    vocab = Counter(t for _, text in doc_rows for t in text.split())
    n_total = sum(vocab.values())
    per = {}
    for src, text in doc_rows:
        toks = text.split()
        n, s = per.get(src, (0, 0))
        bits = sum(n_total.bit_length() - vocab[t].bit_length()
                   for t in toks)
        per[src] = (n + len(toks), s + bits)
    loss = {s: (1000 * b) // n for s, (n, b) in per.items()}
    w = {s: DOREMI_SCALE for s in per}
    hist = []
    for _ in range(rounds):
        ref = sum(w[s] * loss[s] for s in w) // sum(w.values())
        for s in w:
            ex = min(max(loss[s] - ref, 0), DOREMI_CLAMP)
            w[s] = (w[s] * (DOREMI_SCALE + DOREMI_GAIN * ex)) // DOREMI_SCALE
        wt = sum(w.values())
        w = {s: (v * DOREMI_RENORM) // wt for s, v in w.items()}
        hist.append(dict(w))
    wtot = sum(w.values())
    return ({s: (per[s][0], loss[s], w[s], (w[s] * 1_000_000) // wtot)
             for s in per}, hist)


def test_doremi_shifts_mass_to_hard_domains(spark, tmp_path):
    """Hand-built three-domain corpus with a genuinely hard domain
    (all-singleton tokens): the Spark plan must equal the plain-Python
    integer recurrence exactly, and the hard domain's weight must grow
    monotonically across rounds while the easy domain's share ends
    below uniform."""
    easy = "the the the the the the the the"
    mid = "the scan window the merge batch the row"
    hard = " ".join(f"zq{i}" for i in range(8))
    rows = [("easy", easy)] * 4 + [("mid", mid)] * 3 + \
        [("hard", hard + " extra")] * 2
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))

    from mongo_hadoop_spark.operators.lm import corpus_doremi_weights
    want, hist = _ref_doremi(rows)
    got = corpus_doremi_weights(spark, str(tmp_path)).collect()
    assert {r.source: (r.n_tokens, r.loss_millibits, r.weight,
                       r.share_ppm) for r in got} == want
    # monotone shift toward the hard domain round over round
    hard_w = [h["hard"] for h in hist]
    assert all(a <= b for a, b in zip(hard_w, hard_w[1:]))
    assert want["hard"][3] > 333_333 > want["easy"][3]


def test_doremi_quotas_sum_to_budget(spark, tmp_path):
    """Hamilton apportionment of the epoch budget by DoReMi weight:
    quotas sum EXACTLY to TOKEN_BUDGET and respect weight ordering
    within one unit (the quota monotonicity Hamilton guarantees at
    equal weights is tie-broken by source)."""
    from mongo_hadoop_spark.operators.lm import corpus_doremi_quotas
    from mongo_hadoop_spark.operators.selection import TOKEN_BUDGET

    easy = "the the the the the the the the"
    hard = " ".join(f"zq{i}" for i in range(8))
    rows = [("easy", easy)] * 4 + [("hard", hard)] * 2 + \
        [("mid", "the scan window merge the batch")] * 3
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))
    got = corpus_doremi_quotas(spark, str(tmp_path)).collect()
    assert sum(r.quota for r in got) == TOKEN_BUDGET
    by = {r.source: r for r in got}
    assert by["hard"].weight > by["mid"].weight > by["easy"].weight
    assert by["hard"].quota > by["mid"].quota > by["easy"].quota
