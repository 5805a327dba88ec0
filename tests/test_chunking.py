"""documents_chunk_windows: the RAG chunker must reproduce a plain-
Python reference exactly (offsets, texts, short last chunk) and satisfy
the reconstruction invariant on boundary-length documents."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mongo_hadoop_spark.operators.textstats import (
    CHUNK_CHARS, CHUNK_STRIDE, documents_chunk_windows)


def _ref_chunks(text: str):
    n_extra = (max(len(text) - CHUNK_CHARS, 0) + CHUNK_STRIDE - 1) \
        // CHUNK_STRIDE
    out = []
    for i in range(n_extra + 1):
        off = i * CHUNK_STRIDE
        out.append((i, off + 1, text[off:off + CHUNK_CHARS]))
    return out


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    texts = [
        "",                                  # empty -> one empty chunk
        "x" * (CHUNK_CHARS - 1),             # under one window
        "y" * CHUNK_CHARS,                   # exactly one window
        "z" * (CHUNK_CHARS + 1),             # one char spills -> 2 chunks
        "a" * (CHUNK_CHARS + CHUNK_STRIDE),  # exact stride boundary
        "".join(chr(97 + i % 26) for i in range(3 * CHUNK_CHARS + 7)),
    ]
    d = tmp_path_factory.mktemp("chunks")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": range(len(texts)), "lang": ["en"] * len(texts),
        "source": ["s0"] * len(texts), "text": texts})),
        str(d / "documents.parquet"))
    return str(d), texts


def test_chunks_match_reference(spark, chunk_dir):
    sf_dir, texts = chunk_dir
    got = documents_chunk_windows(spark, sf_dir).collect()
    want = [(i, idx, off, t)
            for i, text in enumerate(texts)
            for idx, off, t in _ref_chunks(text)]
    assert [(r.doc_id, r.chunk_idx, r.chunk_off, r.chunk_text)
            for r in got] == want
    for r in got:
        assert r.n_chunk_chars == len(r.chunk_text) <= CHUNK_CHARS


def test_chunks_reconstruct_documents(spark, chunk_dir):
    sf_dir, texts = chunk_dir
    got = documents_chunk_windows(spark, sf_dir).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in enumerate(texts):
        rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        rebuilt = "".join(r.chunk_text[:CHUNK_STRIDE] for r in rows[:-1])
        rebuilt += rows[-1].chunk_text
        assert rebuilt == text, doc_id
        # consecutive chunks overlap by CHUNK_CHARS - CHUNK_STRIDE
        for a, b in zip(rows, rows[1:]):
            if len(a.chunk_text) == CHUNK_CHARS:
                assert a.chunk_text[CHUNK_STRIDE:] == \
                    b.chunk_text[:CHUNK_CHARS - CHUNK_STRIDE]


def test_fim_transform_invariants(spark, chunk_dir):
    """FIM rearrangement: markers + piece reconstruction equal the
    original text for applied docs; untouched pass-through otherwise;
    pivots match the md5 reference exactly."""
    import hashlib

    from mongo_hadoop_spark.operators.textstats import (
        FIM_MID, FIM_PRE, FIM_RATE_MOD, FIM_SUF, documents_fim_transform)

    def h60(key: str, salt: str) -> int:
        return int(hashlib.md5((salt + key).encode()).hexdigest()[:15], 16)

    sf_dir, texts = chunk_dir
    got = documents_fim_transform(spark, sf_dir).collect()
    assert len(got) == len(texts)
    applied = 0
    for r in got:
        text = texts[r.doc_id]
        L = len(text)
        a = h60(str(r.doc_id), "fim-a") % (L + 1)
        b = h60(str(r.doc_id), "fim-b") % (L + 1)
        assert (r.cut_lo, r.cut_hi) == (min(a, b), max(a, b))
        assert r.fim_applied == (h60(str(r.doc_id), "fim-pick")
                                 % FIM_RATE_MOD == 0)
        if r.fim_applied:
            applied += 1
            want = (FIM_PRE + text[:r.cut_lo] + FIM_SUF
                    + text[r.cut_hi:] + FIM_MID
                    + text[r.cut_lo:r.cut_hi])
            assert r.train_text == want
        else:
            assert r.train_text == text
    assert 0 < applied < len(texts) or len(texts) < 4


def test_chunk_dedup_finds_planted_boilerplate(spark, tmp_path):
    """Identical CHUNK_CHARS-aligned boilerplate planted in documents
    whose remainders differ: document-level dedup sees distinct docs,
    chunk dedup must group the shared window and pick the
    lexicographically-first (doc_id, chunk_idx) copy."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mongo_hadoop_spark.operators.textstats import (
        CHUNK_CHARS, corpus_chunk_dedup)

    header = "L" * CHUNK_CHARS          # exactly one aligned window
    texts = [header + f" unique tail {i} " + chr(97 + i) * 40
             for i in range(3)]
    texts.append("totally different document with no boilerplate")
    d = tmp_path / "cd"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": range(len(texts)), "lang": ["en"] * len(texts),
        "source": ["s0"] * len(texts), "text": texts})),
        str(d / "documents.parquet"))
    got = corpus_chunk_dedup(spark, str(d)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_copies, r.n_docs) == (3, 3)
    assert (r.canonical_doc, r.canonical_chunk) == (0, 0)
