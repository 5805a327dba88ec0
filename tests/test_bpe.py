"""BPE trainer (operators/bpe.py): the Spark loop must reproduce a
plain-Python reference implementation exactly on a hand-built corpus —
merge choices, tiebreaks, greedy left-to-right application, and the
final symbol inventory."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mongo_hadoop_spark.operators.bpe import (
    BPE_MERGES, BPE_TOP_SYMBOLS, corpus_bpe_compression, corpus_bpe_merges,
    corpus_bpe_symbol_stats,
)


def _canon_apply(seg: str, pair: str) -> str:
    """Canonical (Sennrich) merge apply: lookaround regex, every
    occurrence merged in one leftmost non-overlapping pass — the
    INDEPENDENT rendering the engine's owned-space replace must equal
    ('a a a a' under (a, a) -> 'aa aa')."""
    a, b = pair.split(" ")
    return re.sub(r"(?<!\S)" + re.escape(a) + r"\ " + re.escape(b)
                  + r"(?!\S)", a + b, seg)


def _ref_bpe(texts: list[str], k: int):
    """Reference BPE: Sennrich-style word-frequency training with
    canonical lookaround-regex merge application and the engine's
    (count DESC, pair ASC) argmax."""
    words = Counter(w for t in texts for w in t.lower().split())
    segs = {w: " ".join(w) for w in words}
    merges = []
    for _ in range(k):
        pc = Counter()
        for w, f in words.items():
            syms = segs[w].split(" ")
            for a, b in zip(syms, syms[1:]):
                pc[a + " " + b] += f
        if not pc:
            break
        pair = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((pair, pc[pair]))
        for w in segs:
            segs[w] = _canon_apply(segs[w], pair)
    stats = Counter()
    types = Counter()
    for w, f in words.items():
        for s in segs[w].split(" "):
            stats[s] += f
            types[s] += 1
    top = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))
    return merges, [(s, c, types[s]) for s, c in top], segs


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    # repeats, ties, single-char words, a merge cascade (l+o, lo+w),
    # and an adjacent-run case (aaaa) exercising non-overlapping replace
    texts = [
        "low low low lower lowest",
        "new newer newest news news",
        "aaaa aa a baaab",
        "slow slower slowest low new",
        "x yz yz",
    ]
    langs = ["en", "en", "xx", "en", "xx"]
    d = tmp_path_factory.mktemp("bpecorpus")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": range(len(texts)), "lang": langs, "text": texts})),
        str(d / "documents.parquet"))
    return str(d), texts, langs


def test_merges_match_reference(spark, corpus_dir):
    sf_dir, texts, _ = corpus_dir
    want, _, _ = _ref_bpe(texts, BPE_MERGES)
    got = corpus_bpe_merges(spark, sf_dir).collect()
    assert [(r.merge_rank, r.pair, r.cnt) for r in got] == \
        [(i + 1, p, c) for i, (p, c) in enumerate(want)]


def test_symbol_stats_match_reference(spark, corpus_dir):
    sf_dir, texts, _ = corpus_dir
    _, want, _ = _ref_bpe(texts, BPE_MERGES)
    got = corpus_bpe_symbol_stats(spark, sf_dir).collect()
    assert [(r.symbol, r.n_occurrences, r.n_word_types) for r in got] == \
        want[:BPE_TOP_SYMBOLS]


def test_compression_matches_reference(spark, corpus_dir):
    sf_dir, texts, langs = corpus_dir
    _, _, segs = _ref_bpe(texts, BPE_MERGES)
    want = {}
    for lang, t in zip(langs, texts):
        for w in t.lower().split():
            n_words, n_toks, n_chars = want.get(lang, (0, 0, 0))
            want[lang] = (n_words + 1, n_toks + len(segs[w].split(" ")),
                          n_chars + len(w))
    got = corpus_bpe_compression(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        nw, nt, nc = want[r.lang]
        assert (r.n_words, r.n_bpe_tokens, r.n_chars) == (nw, nt, nc)
        assert r.chars_per_token == nc / nt


def test_degenerate_corpus_drains_consistently(spark, tmp_path):
    """All-single-char words: no adjacent pairs exist, so the merge
    table is empty rather than erroring — and the oracle agrees."""
    import duckdb
    from mongo_hadoop_spark.operators.bpe import BPE_MERGES_SQL

    d = tmp_path / "deg"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "lang": ["en", "en"], "text": ["a b c", "a c"]})),
        str(d / "documents.parquet"))
    got = corpus_bpe_merges(spark, str(d)).collect()
    assert got == []
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{d}/documents.parquet'")
        assert con.execute(BPE_MERGES_SQL).fetchall() == []
    finally:
        con.close()


def test_repetitive_text_merges_canonically(spark, tmp_path):
    """The r7-verdict deviation case: on runs of a repeated symbol the
    old delimiter-consuming replace under-merged ('a a a a' -> 'aa a a').
    Canonical apply must yield 'aa aa' — three-way pinned: Spark engine,
    DuckDB oracle, and the independent lookaround-regex reference."""
    import duckdb

    from mongo_hadoop_spark.operators.bpe import (
        BPE_SYMBOL_STATS_SQL, corpus_bpe_symbol_stats)

    texts = ["aaaa aaaaa aa", "aaaa aaaa b", "ababab aaab"]
    d = tmp_path / "rep"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": range(len(texts)), "lang": ["xx"] * len(texts),
        "text": texts})), str(d / "documents.parquet"))
    _, want, _ = _ref_bpe(texts, BPE_MERGES)
    got = corpus_bpe_symbol_stats(spark, str(d)).collect()
    assert [(r.symbol, r.n_occurrences, r.n_word_types) for r in got] == \
        want[:BPE_TOP_SYMBOLS]
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{d}/documents.parquet'")
        oracle = con.execute(BPE_SYMBOL_STATS_SQL).fetchall()
    finally:
        con.close()
    assert [(s, int(n), int(t)) for s, n, t in oracle] == \
        want[:BPE_TOP_SYMBOLS]
    # final per-word segmentations must equal the regex reference's
    # exactly — this is where the old under-merge showed ('aaaa' kept
    # 'aa a a' instead of canonical 'aa aa' after merge (a, a))
    from mongo_hadoop_spark.operators import bpe as bpe_mod

    ref_segs = _ref_bpe(texts, BPE_MERGES)[2]
    got_segs = {r.word: r.seg
                for r in bpe_mod._train(spark, str(d))[1].collect()}
    assert got_segs == ref_segs


def _ref_wordpiece(texts: list[str], k: int):
    """Reference WordPiece: same loop as _ref_bpe but the argmax is the
    likelihood score count(ab)/(count(a)*count(b)) (Schuster & Nakajima
    2012), score DESC then pair ASC."""
    words = Counter(w for t in texts for w in t.lower().split())
    segs = {w: " ".join(w) for w in words}
    merges = []
    for _ in range(k):
        pc = Counter()
        sc = Counter()
        for w, f in words.items():
            syms = segs[w].split(" ")
            for s in syms:
                sc[s] += f
            for a, b in zip(syms, syms[1:]):
                pc[a + " " + b] += f
        if not pc:
            break
        def score(pair):
            a, b = pair.split(" ")
            return pc[pair] / (sc[a] * sc[b])
        pair = min(pc, key=lambda p: (-score(p), p))
        merges.append((pair, pc[pair], score(pair)))
        for w in segs:
            segs[w] = _canon_apply(segs[w], pair)
    return merges


def test_wordpiece_merges_match_reference(spark, corpus_dir):
    from mongo_hadoop_spark.operators.bpe import corpus_wordpiece_merges

    sf_dir, texts, _ = corpus_dir
    want = _ref_wordpiece(texts, BPE_MERGES)
    got = corpus_wordpiece_merges(spark, sf_dir).collect()
    assert [(r.merge_rank, r.pair, r.cnt, r.score) for r in got] == \
        [(i + 1, p, c, s) for i, (p, c, s) in enumerate(want)]


@pytest.mark.parametrize("seed", [13, 31])
def test_wordpiece_random_corpora_match_reference(spark, tmp_path, seed):
    """Seeded random corpora with a tiny alphabet: heavy score ties and
    cascades must still reproduce the reference WordPiece exactly,
    including the double score values."""
    import random

    from mongo_hadoop_spark.operators.bpe import corpus_wordpiece_merges

    rng = random.Random(seed)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
             for _ in range(rng.randint(30, 60))]
    texts = [" ".join(rng.choice(words)
                      for _ in range(rng.randint(3, 12)))
             for _ in range(12)]
    d = tmp_path / f"wprand{seed}"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": range(len(texts)),
        "lang": ["en"] * len(texts), "text": texts})),
        str(d / "documents.parquet"))
    want = _ref_wordpiece(texts, BPE_MERGES)
    got = corpus_wordpiece_merges(spark, str(d)).collect()
    assert [(r.merge_rank, r.pair, r.cnt, r.score) for r in got] == \
        [(i + 1, p, c, s) for i, (p, c, s) in enumerate(want)]


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_random_corpora_match_reference(spark, tmp_path, seed):
    """Seeded random corpora (small alphabet => heavy pair ties and
    merge cascades) must reproduce the reference BPE exactly."""
    import random

    rng = random.Random(seed)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
             for _ in range(rng.randint(30, 60))]
    texts = [" ".join(rng.choice(words)
                      for _ in range(rng.randint(3, 12)))
             for _ in range(12)]
    d = tmp_path / f"rand{seed}"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": range(len(texts)),
        "lang": ["en"] * len(texts), "text": texts})),
        str(d / "documents.parquet"))
    want, _, _ = _ref_bpe(texts, BPE_MERGES)
    got = corpus_bpe_merges(spark, str(d)).collect()
    assert [(r.merge_rank, r.pair, r.cnt) for r in got] == \
        [(i + 1, p, c) for i, (p, c) in enumerate(want)]


def test_wordpiece_compression_matches_reference(spark, corpus_dir):
    """WordPiece apply side: per-lang token counts under the
    likelihood-trained merges must equal the plain-Python reference's
    segmentations applied to every word occurrence."""
    from collections import Counter

    from mongo_hadoop_spark.operators.bpe import (
        corpus_wordpiece_compression)

    sf_dir, texts, langs = corpus_dir
    # reference segmentations: rerun _ref_wordpiece's loop keeping segs
    words = Counter(w for t in texts for w in t.lower().split())
    segs = {w: " ".join(w) for w in words}
    for _ in range(BPE_MERGES):
        pc, sc = Counter(), Counter()
        for w, f in words.items():
            syms = segs[w].split(" ")
            for s_ in syms:
                sc[s_] += f
            for a, b in zip(syms, syms[1:]):
                pc[a + " " + b] += f
        if not pc:
            break
        pair = min(pc, key=lambda p: (-pc[p] / (sc[p.split(" ")[0]]
                                                * sc[p.split(" ")[1]]), p))
        for w in segs:
            segs[w] = _canon_apply(segs[w], pair)
    want = {}
    for lang, t in zip(langs, texts):
        for w in t.lower().split():
            nw, nt, nc = want.get(lang, (0, 0, 0))
            want[lang] = (nw + 1, nt + len(segs[w].split(" ")),
                          nc + len(w))
    got = corpus_wordpiece_compression(spark, sf_dir).collect()
    assert {r.lang: (r.n_words, r.n_wp_tokens, r.n_chars)
            for r in got} == want
