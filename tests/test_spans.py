"""Winnowed exact-substring (duplicated-span) dedup: semantics and plans."""

import pyspark.sql.functions as F
import pytest

from conftest import SF_SMOKE

from mongo_hadoop_spark.operators import spans


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def _tokens(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


GUARANTEE = spans.SPAN_W + spans.WINNOW_K - 1


def test_winnowing_guarantee_any_alignment(spark, tmp_path):
    """The winnowing guarantee: a shared verbatim run of W + K - 1 tokens
    yields a shared fingerprint regardless of where the run sits in each
    document — the property naive strided sampling lacks."""
    shared = _tokens("dup", GUARANTEE)
    for off_a, off_b in [(0, 0), (0, 3), (1, 7), (5, 2), (11, 4)]:
        texts = [
            (_tokens(f"a{off_a}_", off_a) + " " + shared).strip(),
            (_tokens(f"b{off_b}_", off_b) + " " + shared).strip(),
        ]
        sf = _write_docs(spark, tmp_path / f"{off_a}_{off_b}", texts)
        dup = spans.dedup_duplicate_spans(spark, sf)
        assert dup.count() >= 1, (off_a, off_b)


def test_span_stats_fractions(spark, tmp_path):
    """A verbatim copy scores 1.0; an original with a shared tail scores
    in (0, 1); an unrelated doc scores 0."""
    base = _tokens("x", 40)
    texts = [
        base,                       # doc 0: original
        base,                       # doc 1: verbatim copy → frac 1.0
        _tokens("z", 40),           # doc 2: unrelated → frac 0.0
        _tokens("w", 30) + " " + _tokens("x", 20),  # doc 3: shares a tail
    ]
    sf = _write_docs(spark, tmp_path, texts)
    stats = {r["doc_id"]: r.asDict()
             for r in spans.documents_span_stats(spark, sf).collect()}
    assert stats[0]["dup_frac"] == 1.0
    assert stats[1]["dup_frac"] == 1.0
    assert stats[2]["dup_frac"] == 0.0
    assert 0.0 < stats[3]["dup_frac"] < 1.0
    for r in stats.values():
        assert r["n_dup_fps"] <= r["n_fps"]

    survivors = {r["doc_id"] for r in
                 spans.documents_span_dedup_survivors(spark, sf).collect()}
    assert 2 in survivors          # unrelated doc survives
    assert 0 not in survivors and 1 not in survivors  # full dups dropped


def test_short_docs_have_zero_fingerprints(spark, tmp_path):
    """Docs shorter than SPAN_W tokens appear in stats with 0 fingerprints
    and survive (nothing to judge them on); docs with fewer than K windows
    still get their global-min fingerprint."""
    sf = _write_docs(spark, tmp_path, [_tokens("s", spans.SPAN_W - 1)])
    row = spans.documents_span_stats(spark, sf).collect()[0]
    assert row["n_fps"] == 0 and row["dup_frac"] == 0.0
    assert spans.documents_span_dedup_survivors(spark, sf).count() == 1

    sf2 = _write_docs(spark, tmp_path / "k", [_tokens("t", spans.SPAN_W)])
    row2 = spans.documents_span_stats(spark, sf2).collect()[0]
    assert row2["n_fps"] == 1


def test_fingerprint_density_sublinear(spark, tmp_path):
    """Winnowing selects far fewer fingerprints than positions — the whole
    point of the selection window (expected density 2/(K+1))."""
    sf = _write_docs(spark, tmp_path, [_tokens("d", 200)])
    n_windows = 200 - spans.SPAN_W + 1
    n_fps = spans._fingerprints(spark, sf).count()
    assert 0 < n_fps < n_windows / 2


def test_span_plans_no_cartesian(spark):
    """Span queries: hash-equi joins only; the dup-fingerprint side is
    broadcast or shuffled-equi, never a nested loop."""
    for fn in (spans.dedup_duplicate_spans, spans.documents_span_stats,
               spans.documents_span_dedup_survivors):
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_dup_span_report_offsets_and_policy(spark, tmp_path):
    """corpus_dup_spans: the positioned report finds the shared run at
    the RIGHT token offsets in each holder, counts holders, and keeps
    only the lowest-doc_id copy."""
    shared = _tokens("dup", GUARANTEE)
    texts = [
        shared,                                   # doc 0 at offset 1
        _tokens("pre", 5) + " " + shared,         # doc 1 at offset 6
        _tokens("other", 30),                     # doc 2: unrelated
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = spans.corpus_dup_spans(spark, sf).collect()
    assert rows, "shared run must be reported"
    docs = {r["doc_id"] for r in rows}
    assert docs == {0, 1}
    for r in rows:
        assert r["n_docs"] == 2
        assert r["keep"] == (r["doc_id"] == 0)
        # same fingerprint sits 5 tokens later in doc 1 than in doc 0
    by_fp = {}
    for r in rows:
        by_fp.setdefault(r["fp"], {})[r["doc_id"]] = r["first_off"]
    for fp, offs in by_fp.items():
        assert offs[1] - offs[0] == 5, (fp, offs)


def test_dup_span_report_intra_doc_occurrences(spark, tmp_path):
    """A span repeated twice inside one holder reports n_occ = 2 with
    the FIRST offset."""
    shared = _tokens("dup", GUARANTEE)
    texts = [
        shared + " " + _tokens("mid", 8) + " " + shared,   # twice
        shared,                                            # once
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = spans.corpus_dup_spans(spark, sf).collect()
    d0 = [r for r in rows if r["doc_id"] == 0]
    assert d0 and all(r["n_occ"] >= 1 for r in d0)
    # at least one fingerprint occurs at both copies
    assert any(r["n_occ"] == 2 for r in d0)


def test_span_alignments_runs_and_lengths(spark, tmp_path):
    """dedup_span_alignments: a copied passage shows up as ONE run at
    the displacement delta with the right estimated token length; two
    disjoint copied passages at different displacements stay separate
    runs."""
    run1 = _tokens("p", 30)             # 30-token passage
    run2 = _tokens("q", GUARANTEE)      # minimal-guarantee passage
    texts = [
        run1 + " " + _tokens("fill", 10) + " " + run2,   # doc 0 (canonical)
        _tokens("pre", 4) + " " + run1,                  # doc 1: run1 shifted +4
        run2,                                            # doc 2: run2 only
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = {(r["a"], r["b"]): r.asDict()
            for r in spans.dedup_span_alignments(spark, sf).collect()}
    assert set(rows) == {(0, 1), (0, 2)}
    r01 = rows[(0, 1)]
    # the 30-token copy: estimated length within [SPAN_W, 30]
    assert spans.SPAN_W <= r01["longest_run_tokens"] <= 30
    assert r01["longest_run_fps"] >= 2
    r02 = rows[(0, 2)]
    assert r02["longest_run_tokens"] <= len(run2.split())
    assert r02["n_shared_fps"] >= 1


def test_span_excision_handles_empty_and_clean_docs(spark, tmp_path):
    """corpus_span_excised: zero-token documents pass through with
    n_cut = 0 (Spark's descending sequence(1, 0) hazard), clean docs
    keep their token-normalized text, and full duplicates lose their
    flagged windows only in the non-canonical holder."""
    shared = _tokens("dup", GUARANTEE)
    texts = [
        "",                              # zero tokens
        "  ",                            # whitespace only -> zero tokens
        shared,                          # canonical holder (doc 2)
        shared,                          # duplicate holder  (doc 3)
        _tokens("solo", 20),             # untouched original
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = {r["doc_id"]: r.asDict()
            for r in spans.corpus_span_excised(spark, sf).collect()}
    assert rows[0]["n_tokens"] == 0 and rows[0]["n_cut"] == 0
    assert rows[0]["clean_text"] == ""
    assert rows[1]["n_tokens"] == 0 and rows[1]["n_cut"] == 0
    assert rows[2]["n_cut"] == 0            # canonical keeps the span
    assert rows[2]["clean_text"] == shared
    assert rows[3]["n_cut"] > 0             # duplicate holder loses it
    assert rows[4]["n_cut"] == 0
    assert rows[4]["clean_text"] == texts[4]
