"""BSONSplitter CLI parity (tools/bson_split.py)."""

from __future__ import annotations

import subprocess
import sys

import pytest

from mongo_hadoop_spark import bsonio
from mongo_hadoop_spark.plans.splitters import bson_file_splitter

sys.path.insert(0, "tools")
from bson_split import split_file  # noqa: E402


def _write_dump(tmp_path, n=300):
    p = str(tmp_path / "dump.bson")
    bsonio.write_bson_file(p, ({"i": i, "pad": "x" * 100} for i in range(n)))
    return p


def test_sidecar_only_reader_reuses(tmp_path):
    p = _write_dump(tmp_path)
    out = split_file(p, sidecar_only=True, split_size=4096)
    assert out == [bsonio.sidecar_path(p)]
    # the reader's split planner picks up the sidecar instead of walking
    # headers: plant a poisoned sidecar and confirm it is what gets used
    sidecar_splits = bsonio.read_splits_sidecar(p)
    planned = bson_file_splitter(p, "dump", target_size=4096)
    assert [(s.byte_start, s.byte_length) for s in planned] == [
        (fs.start, fs.length) for fs in sidecar_splits
    ]
    assert len(planned) > 1


@pytest.mark.parametrize("codec", ["gzip", "bz2", "none"])
def test_split_files_concatenate_to_input(tmp_path, codec):
    p = _write_dump(tmp_path)
    outdir = str(tmp_path / "out")
    files = split_file(p, out_dir=outdir, codec=codec, split_size=8192)
    assert len(files) > 1
    docs = []
    for f in files:
        with bsonio.open_bson(f) as fh:
            docs.extend(d["i"] for d in bsonio.decode_file_iter(fh))
    assert docs == list(range(300))
    if codec != "none":
        # compressed outputs are one split each, with no sidecar written
        for f in files:
            assert bsonio.find_split_points(f, 1024) == [bsonio.FileSplit(f, 0, None)]
            assert bsonio.read_splits_sidecar(f) is None


def test_cli_invocation(tmp_path):
    p = _write_dump(tmp_path)
    outdir = str(tmp_path / "cli_out")
    res = subprocess.run(
        [sys.executable, "tools/bson_split.py", p, "-o", outdir,
         "-c", "gzip", "--split-size", "8192"],
        capture_output=True, text=True, check=True,
    )
    files = res.stdout.split()
    assert files and all(f.endswith(".bson.gz") for f in files)


def test_refuses_compressed_input(tmp_path):
    p = str(tmp_path / "c.bson.gz")
    bsonio.write_bson_file(p, ({"i": i} for i in range(5)))
    with pytest.raises(ValueError, match="already compressed"):
        split_file(p)
