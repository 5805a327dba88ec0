"""Hadoop-Streaming BSON protocol: framing codec + subprocess transform
(reference streaming/io/MongoInputWriter/MongoOutputReader + the python
binding's stdin/stdout loop)."""

from __future__ import annotations

import io
import os
import stat
import sys
import textwrap

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mongo_hadoop_spark.streaming.protocol import (iter_frames, pipe_through,
                                                   transform_with_script,
                                                   write_frames)

DOCS = st.lists(
    st.dictionaries(
        st.text(alphabet="abcxyz_", min_size=1, max_size=8),
        st.one_of(st.integers(min_value=-2**31, max_value=2**31 - 1),
                  st.text(max_size=12), st.booleans(), st.none(),
                  st.floats(allow_nan=False, allow_infinity=False)),
        max_size=5),
    max_size=8)


@settings(max_examples=60, deadline=None)
@given(DOCS)
def test_frame_roundtrip(docs):
    buf = io.BytesIO()
    assert write_frames(docs, buf) == len(docs)
    buf.seek(0)
    assert list(iter_frames(buf)) == docs


def test_truncated_frame_detected():
    buf = io.BytesIO()
    write_frames([{"a": 1}], buf)
    data = buf.getvalue()
    with pytest.raises(EOFError):
        list(iter_frames(io.BytesIO(data[:-3])))


def _mapper_script(tmp_path, body: str) -> str:
    """A standalone mongo-hadoop-style streaming mapper: reads BSON docs
    on stdin, writes BSON docs on stdout — imports only this repo's
    framing, the way a user script would import pymongo_hadoop."""
    p = tmp_path / "mapper.py"
    body_lines = textwrap.dedent(body).strip("\n").splitlines()
    indented = "\n".join("    " + ln for ln in body_lines)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p.write_text(
        "import sys, os\n"
        f"sys.path.insert(0, {repo!r})\n"
        "from mongo_hadoop_spark.streaming.protocol import iter_frames, write_frames\n"
        "def mapper(docs):\n"
        f"{indented}\n"
        "write_frames(mapper(iter_frames(sys.stdin.buffer)), sys.stdout.buffer)\n")
    p.chmod(p.stat().st_mode | stat.S_IXUSR)
    return str(p)


def test_pipe_through_uppercase_mapper(tmp_path):
    script = _mapper_script(tmp_path, """\
            for d in docs:
                yield {"k": d["k"], "v": d["v"].upper()}
        """)
    out = pipe_through([sys.executable, script],
                       [{"k": 1, "v": "ab"}, {"k": 2, "v": "cd"}])
    assert out == [{"k": 1, "v": "AB"}, {"k": 2, "v": "CD"}]


def test_pipe_through_surfaces_script_failure(tmp_path):
    script = _mapper_script(tmp_path, """\
            raise SystemExit("boom from mapper")
        """)
    with pytest.raises(RuntimeError, match="boom from mapper"):
        pipe_through([sys.executable, script], [{"k": 1}])


def test_transform_with_script_dataframe(spark, tmp_path):
    """The operator half: a DataFrame partition-piped through a mapper
    that re-shapes rows (emits a different schema + drops some)."""
    script = _mapper_script(tmp_path, """\
            for d in docs:
                if d["n"] % 2 == 0:
                    yield {"n2": d["n"] * 10, "tag": d["s"] + "!"}
        """)
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(20)], "n long, s string").repartition(4)
    out = transform_with_script(
        df, [sys.executable, script], "n2 long, tag string")
    rows = sorted((r.n2, r.tag) for r in out.collect())
    assert rows == [(i * 10, f"s{i}!") for i in range(0, 20, 2)]
