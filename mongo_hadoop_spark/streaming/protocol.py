"""Hadoop-Streaming-compatible BSON subprocess transform (T1/T2).

The reference's streaming mode pipes BSON documents between the Hadoop
framework and a user script over stdin/stdout — the stream is simply
concatenated BSON documents, each self-delimiting via its leading
int32 length (streaming/src/main/java/com/mongodb/hadoop/streaming/io/
MongoInputWriter.java:28-41, MongoOutputReader.java:36-60; python
binding streaming/language_support/python/pymongo_hadoop/mapper.py).

Spark-native formulation: the *framework half* of that protocol is an
operator — :func:`transform_with_script` pipes every partition through a
user executable as a BSON frame stream and reads BSON frames back, so
any existing mongo-hadoop streaming mapper script runs unmodified under
this engine.  The subprocess spawns once per PARTITION (not per row or
batch), so script startup amortizes exactly like a Hadoop Streaming
task's did; partitions run in parallel across executor cores, and at
cluster scale each task owns its child process — no driver involvement.

The in-Spark path (`streaming/jobs.py` mapInPandas/applyInPandas) stays
the fast path: Arrow beats byte-piping for native transforms.  This
module exists for parity with user-owned streaming scripts.
"""

from __future__ import annotations

import io
import struct
import subprocess
from typing import Iterable, Iterator

from mongo_hadoop_spark import bsonio


def write_frames(docs: Iterable[dict], fh) -> int:
    """Encode ``docs`` as the concatenated-BSON stream; returns count."""
    n = 0
    for d in docs:
        fh.write(bsonio.encode(d))
        n += 1
    return n


def iter_frames(fh) -> Iterator[dict]:
    """Decode concatenated BSON documents from a binary stream.

    Each document starts with its little-endian int32 total length
    (including the length field itself) — the same self-delimiting
    framing the reference streams over the subprocess pipe.
    """
    while True:
        head = fh.read(4)
        if not head:
            return
        if len(head) < 4:
            raise EOFError("truncated BSON frame header")
        (length,) = struct.unpack("<i", head)
        if length < 5:
            raise ValueError(f"invalid BSON frame length {length}")
        body = fh.read(length - 4)
        if len(body) != length - 4:
            raise EOFError("truncated BSON frame body")
        yield bsonio.decode(head + body)


def pipe_through(argv: list[str], docs: Iterable[dict],
                 timeout: float | None = None) -> list[dict]:
    """Run one subprocess over a finite doc stream: write all input
    frames, close stdin, read all output frames (communicate() — no
    interleaving deadlock; buffering is bounded by the partition size,
    which Spark already bounds via ``maxPartitionBytes``)."""
    buf = io.BytesIO()
    write_frames(docs, buf)
    proc = subprocess.run(
        argv, input=buf.getvalue(), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, timeout=timeout, check=False,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"streaming script {argv} failed rc={proc.returncode}: "
            f"{proc.stderr[-500:].decode(errors='replace')}"
        )
    return list(iter_frames(io.BytesIO(proc.stdout)))


def transform_with_script(df, argv: list[str], output_schema: str):
    """Pipe a DataFrame through a mongo-hadoop streaming script.

    Each partition's rows are sent to one subprocess invocation as BSON
    frames on stdin; its stdout frames become the output rows (shape may
    differ — the script is a general mapper).  ``output_schema`` is the
    DDL schema of the script's output documents; fields missing from an
    output document become null, exactly like the BSON→Writable bridge.
    """
    fields = [f.strip().split()[0] for f in output_schema.split(",")]

    def run_partition(batches):
        import pandas as pd

        rows: list[dict] = []
        for pdf in batches:
            rows.extend(pdf.to_dict("records"))
        if not rows:
            return
        out = pipe_through(argv, rows)
        yield pd.DataFrame(
            [{k: d.get(k) for k in fields} for d in out], columns=fields)

    return df.mapInPandas(run_partition, output_schema)
