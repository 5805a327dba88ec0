"""Multimodal (binary) column plumbing.

Pattern (GridFS analog, SURVEY §2.1 S6/S7): media lives in an opaque
``binary`` column beside a typed metadata struct; decode / feature-extract
steps run as Arrow-batched Python over ``mapInPandas``.  The actual
image/audio decode is STUBBED (libs not in this container — see
``decode_image_stub``) but the Spark-side plumbing — schema, batch shape,
partition flow — is real and oracle-tested with a deterministic fake
payload (md5-derived bytes standing in for media bytes).

Reference parity: GridFS whole-binary reads
(core/.../GridFSInputFormat.java:95-154) and chunk splits
(core/.../input/GridFSSplit.java:18-111) map to (file_id, chunk_idx,
bytes) rows; chunking keeps any single row under the executor page size
regardless of media size — that is what makes 100 TB of video tractable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

from mongo_hadoop_spark.session import table

CHUNK_SIZE = 8  # bytes per chunk of the fake 16-byte payload


def _with_payload(d: DataFrame) -> DataFrame:
    """Attach the deterministic fake media payload + metadata struct."""
    payload = F.unhex(F.md5("text"))
    meta = F.struct(
        F.length(payload).alias("n_bytes"),
        F.lit("application/x-fake").alias("mime"),
        F.col("source").alias("origin"),
    )
    return d.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary columns, no decode: the cheap path that
    must never touch payload bytes at scale (column pruning keeps the
    binary column out of the scan when only metadata is selected)."""
    d = _with_payload(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.substring(F.hex("payload"), 1, 8).alias("head_hex"),
    )


METADATA_SQL = """
SELECT doc_id,
       octet_length(unhex(md5(text))) AS n_bytes,
       'application/x-fake' AS mime,
       substr(upper(md5(text)), 1, 8) AS head_hex
FROM documents
"""


def multimodal_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode payloads into fixed-size chunks — the GridFSSplit pattern:
    (doc_id, chunk_idx, chunk_hex).  Pure built-ins via substr on hex."""
    d = _with_payload(table(spark, sf_dir, "documents"))
    hexed = d.select("doc_id", F.hex("payload").alias("ph"))
    n_chunks = F.ceil(F.length("ph") / (CHUNK_SIZE * 2)).cast("int")
    return (
        hexed.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
            F.col("ph"),
        )
        .select(
            "doc_id", "chunk_idx",
            F.substring(
                F.col("ph"), F.col("chunk_idx") * (CHUNK_SIZE * 2) + 1, CHUNK_SIZE * 2
            ).alias("chunk_hex"),
        )
    )


CHUNKS_SQL = f"""
WITH p AS (SELECT doc_id, upper(md5(text)) AS ph FROM documents),
     c AS (
       SELECT doc_id, ph, unnest(generate_series(0, ceil(length(ph) / {CHUNK_SIZE * 2}.0)::int - 1)) AS chunk_idx
       FROM p
     )
SELECT doc_id, chunk_idx, substr(ph, chunk_idx * {CHUNK_SIZE * 2} + 1, {CHUNK_SIZE * 2}) AS chunk_hex
FROM c
"""


_DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("feat_head", LongType()),
    StructField("feat_sum", LongType()),
])


def decode_image_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode' over binary payloads (mapInPandas body).

    Real deployments would call PIL/torchaudio/ffmpeg here; those libs are
    unavailable in this container, so the feature extraction is a
    deterministic fake: big-endian int of the first 4 bytes + byte sum.
    The batch shape, schema, and partition flow are the real thing.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": payloads.map(len).astype("int32"),
            "feat_head": payloads.map(lambda b: int.from_bytes(b[:4], "big")),
            "feat_sum": payloads.map(lambda b: sum(b)),
        })


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode pipeline: binary column → per-doc features.
    Repartition first: media decode is the CPU hot spot, so every core (or
    executor) must get a batch even when the upstream is one small file."""
    d = _with_payload(
        table(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
    )
    return d.select("doc_id", "payload").mapInPandas(decode_image_stub, _DECODE_SCHEMA)


# byte sum of a 16-byte blob in SQL: sum of hex-pair values
_BYTE_SUM = " + ".join(
    f"('0x' || substr(md5(text), {i * 2 + 1}, 2))::bigint" for i in range(16)
)

DECODE_SQL = f"""
SELECT doc_id,
       octet_length(unhex(md5(text)))::int AS n_bytes,
       ('0x' || substr(md5(text), 1, 8))::bigint AS feat_head,
       ({_BYTE_SUM})::bigint AS feat_sum
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for 'video' payloads: every Nth frame index
    from a deterministic fake frame count (n_chars as duration proxy)."""
    d = table(spark, sf_dir, "documents")
    n_frames = (F.col("n_chars") / 10).cast("int") + 1
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(5))).alias("frame_idx"),
    )


FRAME_SAMPLE_SQL = """
SELECT doc_id, unnest(range(0, (n_chars // 10)::int + 1, 5)) AS frame_idx
FROM documents
"""




# ---------------------------------------------------------------------------
# Resize plumbing (stubbed transform, real Spark shape)
# ---------------------------------------------------------------------------

RESIZE_W, RESIZE_H = 64, 64

_RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("out_w", IntegerType()),
    StructField("out_h", IntegerType()),
    StructField("resized_head", LongType()),
])


def resize_image_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'resize' (mapInPandas body).

    A real deployment would decode, resample to (RESIZE_W, RESIZE_H), and
    re-encode (PIL/opencv — unavailable here); the stub derives the
    'resized' bytes deterministically as md5(payload_hex | WxH), so the
    batch shape, schema, and partition flow are real and oracle-checkable
    while the pixel math is a documented fake.
    """
    import hashlib

    tag = f"|{RESIZE_W}x{RESIZE_H}".encode()
    for pdf in batches:
        resized = pdf["payload"].map(
            lambda b: hashlib.md5(b.hex().encode() + tag).digest())
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "out_w": RESIZE_W,
            "out_h": RESIZE_H,
            "resized_head": resized.map(lambda b: int.from_bytes(b[:4], "big")),
        })


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline: binary payload → fixed-target 'resized' artifact
    head.  Same repartition-then-mapInPandas shape as the decode stage —
    at 100 TB the resize is the bandwidth/CPU hot spot, and this plumbing
    (Arrow batches, per-core fan-out, narrow output schema) is what makes
    it saturate a cluster."""
    d = _with_payload(
        table(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
    )
    return d.select("doc_id", "payload").mapInPandas(resize_image_stub, _RESIZE_SCHEMA)


RESIZE_SQL = f"""
SELECT doc_id,
       {RESIZE_W} AS out_w,
       {RESIZE_H} AS out_h,
       ('0x' || substr(md5(md5(text) || '|{RESIZE_W}x{RESIZE_H}'), 1, 8))::bigint
         AS resized_head
FROM documents
"""

#: vision tokens emitted per image patch (ViT-style: each patch costs
#: a fixed number of model context positions)
VISION_TOKENS_PER_PATCH = 4
#: combined text+vision context budget per packed sequence
PACK_MM_TOKENS = 6144


def multimodal_pack_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved multimodal sequence packing: greedy budget bins over
    the COMBINED text + vision token cost per document — what a
    vision-language training loader actually packs by, since an image's
    patches occupy model context positions exactly like text tokens.

    Per document: text tokens = whitespace count; vision tokens =
    (patch count derived deterministically from the fake payload's
    first byte: 4–16 patches) × :data:`VISION_TOKENS_PER_PATCH`.  The
    packer is the textstats.documents_pack_sequences shape — one window
    per source shard ordered by doc_id, running combined-cost sum,
    ``floor((cum - cost) / budget)`` bin ids — so it inherits that
    operator's scale story: never a global sort, one shuffle on the
    shard key.  Output per (source, seq_bin): docs, text tokens, vision
    tokens, and the budget utilization fraction (exact integer ratio,
    one IEEE division).
    """
    from pyspark.sql import Window

    from mongo_hadoop_spark.functions import tokenize

    d = table(spark, sf_dir, "documents")
    n_text = F.size(tokenize("text"))
    patches = (F.conv(F.substring(F.md5("text"), 1, 2), 16, 10)
               .cast("int") % 13 + 4)
    cost = (n_text + patches * VISION_TOKENS_PER_PATCH).cast("long")
    doc = d.select("source", "doc_id",
                   n_text.cast("long").alias("n_text"),
                   (patches * VISION_TOKENS_PER_PATCH).cast("long")
                   .alias("n_vision"),
                   cost.alias("cost"))
    win = (Window.partitionBy("source").orderBy("doc_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    binned = doc.select(
        "source", "doc_id", "n_text", "n_vision", "cost",
        F.floor((F.sum("cost").over(win) - F.col("cost"))
                / PACK_MM_TOKENS).alias("seq_bin"))
    return (binned.groupBy("source", "seq_bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_text").alias("text_tokens"),
                 F.sum("n_vision").alias("vision_tokens"),
                 F.sum("cost").alias("total_tokens"))
            .select("source", "seq_bin", "n_docs", "text_tokens",
                    "vision_tokens", "total_tokens",
                    (F.col("total_tokens").cast("double")
                     / F.lit(float(PACK_MM_TOKENS))).alias("utilization")))


PACK_INTERLEAVED_SQL = rf"""
WITH doc AS (
  SELECT source, doc_id,
         len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
           ::bigint AS n_text,
         ((('0x' || substr(md5(text), 1, 2))::bigint % 13 + 4)
          * {VISION_TOKENS_PER_PATCH})::bigint AS n_vision
  FROM documents
),
binned AS (
  SELECT source, doc_id, n_text, n_vision, n_text + n_vision AS cost,
         floor((sum(n_text + n_vision)
                  OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - (n_text + n_vision)) / {PACK_MM_TOKENS})::bigint
           AS seq_bin
  FROM doc
)
SELECT source, seq_bin, count(*) AS n_docs,
       sum(n_text)::bigint AS text_tokens,
       sum(n_vision)::bigint AS vision_tokens,
       sum(cost)::bigint AS total_tokens,
       sum(cost)::bigint::double / {float(PACK_MM_TOKENS)} AS utilization
FROM binned GROUP BY 1, 2
"""


QUERIES = {
    "multimodal_pack_interleaved": multimodal_pack_interleaved,
    "multimodal_metadata": multimodal_metadata,
    "multimodal_chunks": multimodal_chunks,
    "multimodal_decode_features": multimodal_decode_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize": multimodal_resize,
}

ORACLES = {
    "multimodal_pack_interleaved": PACK_INTERLEAVED_SQL,
    "multimodal_metadata": METADATA_SQL,
    "multimodal_chunks": CHUNKS_SQL,
    "multimodal_decode_features": DECODE_SQL,
    "multimodal_frame_sample": FRAME_SAMPLE_SQL,
    "multimodal_resize": RESIZE_SQL,
}
