#!/usr/bin/env python
"""Pre-split (and optionally compress) a .bson dump — BSONSplitter CLI parity.

Reference: the Hadoop connector ships BSONSplitter as a runnable tool
(core/.../splitter/BSONSplitter.java:477-585): given a dump it computes
document-boundary splits, then either (a) writes each split out as its own
codec-compressed file — each compressed file becomes exactly one input
split downstream — or (b) persists the split table as a `.{name}.splits`
sidecar that getSplits() reuses instead of re-walking length headers
(BSONSplitter.java:291-323, P10/P11).

This CLI mirrors both modes on the pure-Python codec:

  # write the sidecar so readers skip split planning (P11)
  python tools/bson_split.py dump.bson --sidecar-only

  # pre-split into one gzip file per split (each is one task downstream)
  python tools/bson_split.py dump.bson -o outdir/ -c gzip

Deviation from the reference, on purpose: output names are
``{stem}-{i}.bson[.gz|.bz2]`` (reference: ``{name}-{i}{ext}``) so the
files keep matching the engine's ``*.bson*`` segment globs.  Like the
reference, compressed mode writes NO sidecar — a compressed file is
unsplittable and is its own split.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo_hadoop_spark import bsonio  # noqa: E402
from mongo_hadoop_spark.plans.splitters import DEFAULT_SPLIT_SIZE  # noqa: E402

_EXT = {"gzip": ".gz", "bz2": ".bz2", "none": ""}


def split_file(
    path: str,
    out_dir: str | None = None,
    codec: str = "gzip",
    split_size: int = DEFAULT_SPLIT_SIZE,
    sidecar_only: bool = False,
) -> list[str]:
    """Split ``path`` at document boundaries; returns written file paths.

    ``sidecar_only`` writes the `.{name}.splits` sidecar next to the input
    and copies nothing.  Otherwise each split's bytes are copied verbatim
    (boundaries are doc-aligned, so every output is a valid .bson) into
    ``out_dir``, compressed per ``codec``.
    """
    if bsonio.compression_codec(path):
        raise ValueError(
            f"{path} is already compressed (one split by definition); "
            "decompress before re-splitting"
        )
    splits = bsonio.find_split_points(path, split_size)

    if sidecar_only:
        return [bsonio.write_splits_sidecar(path, splits)]

    out_dir = out_dir or os.path.dirname(os.path.abspath(path))
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.basename(path)
    if stem.endswith(".bson"):
        stem = stem[: -len(".bson")]
    ext = _EXT[codec]

    written: list[str] = []
    with open(path, "rb") as src:
        for i, s in enumerate(splits):
            out_path = os.path.join(out_dir, f"{stem}-{i}.bson{ext}")
            src.seek(s.start)
            with bsonio.open_bson(out_path, "wb") as dst:
                remaining = s.length
                while remaining > 0:
                    chunk = src.read(min(1 << 20, remaining))
                    if not chunk:
                        raise ValueError(f"unexpected EOF copying split {i}")
                    dst.write(chunk)
                    remaining -= len(chunk)
            written.append(out_path)
    return written


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("input", help=".bson file to split")
    ap.add_argument("-o", "--out-dir", default=None,
                    help="output directory (default: input's directory)")
    ap.add_argument("-c", "--codec", choices=sorted(_EXT), default="gzip",
                    help="compression for split files (default: gzip)")
    ap.add_argument("--split-size", type=int, default=DEFAULT_SPLIT_SIZE,
                    help=f"target split bytes (default {DEFAULT_SPLIT_SIZE})")
    ap.add_argument("--sidecar-only", action="store_true",
                    help="only write the .splits sidecar for the input file")
    args = ap.parse_args(argv)

    written = split_file(args.input, args.out_dir, args.codec,
                         args.split_size, args.sidecar_only)
    for p in written:
        print(p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
