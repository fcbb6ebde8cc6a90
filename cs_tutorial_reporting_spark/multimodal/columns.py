"""[EXT] Multimodal columns: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (deterministic fake features / NotImplementedError
for real codecs). Everything Spark-side — schema, partition-preserving
mapInPandas plumbing, batch shapes, metadata struct — is real and
tested; swapping the stub body for PIL/ffmpeg is a one-function change.

Scale notes: media bytes ride in the same rows as metadata (parquet
binary columns chunk fine at 100 TB); decode parallelism is row-group
parallelism; `spark.sql.execution.arrow.maxRecordsPerBatch` bounds the
pandas batch memory (set it low for large blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every media blob
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def fan_out_compute(df: DataFrame, key_col: str) -> DataFrame:
    """Fan a compute-bound Arrow pass out of the small-file trap:
    harness-scale parquet arrives as 1-2 partitions, and mapInPandas
    inherits input partitioning — the whole Python decode would run
    on 1-2 cores regardless of cluster width (the round-8 single-task
    class; measured 8.5 s single-core for the MJPEG scene pass at
    sf0.1). Keyed repartition to 2× the session parallelism when the
    input is narrower; at real scale the input is already wide and
    this is a no-op (same guard, same rationale as
    operators/dedup.py::minhash_lsh_pairs). The ×2 keeps the count ≠
    spark.sql.shuffle.partitions so CollapseRepartition cannot
    silently remove it (round-8 lesson)."""
    target = df.sparkSession.sparkContext.defaultParallelism * 2
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key_col)
    return df


def attach_media(df: DataFrame, payload_col, media_type: str, fmt: str) -> DataFrame:
    """Wrap a binary payload column into (content binary, meta struct) —
    the canonical multimodal column pair."""
    return df.withColumn("content", payload_col.cast("binary")).withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def decode_image_stub(content: bytes) -> dict:
    """Formerly the compressed-image stub — every image format in the
    family now decodes for REAL: baseline JPEG (multimodal/jpeg.py —
    full DCT + Annex-K Huffman entropy decode), PNG (multimodal/png.py
    — stdlib-zlib DEFLATE + all five scanline filters), GIF
    (multimodal/gif.py — full variable-width LZW), and the uncompressed
    BMP/WAV/AVI containers. This entry point survives only for callers
    wanting deterministic fakes via ``extract_features``; real decodes
    should call the per-format modules."""
    raise NotImplementedError(
        "use the real per-format decoders: multimodal/jpeg.py (baseline "
        "DCT+Huffman), multimodal/png.py, multimodal/gif.py, bmp/wav/avi; "
        "extract_features remains the deterministic fake path"
    )


def frame_sample_stub(content: bytes, every_ms: int) -> list[bytes]:
    """STUB only for INTER-FRAME video codecs (h264/mp4 need motion
    compensation — genuinely out of pure-Python scope). Compressed
    intra-frame video IS decoded for real: Motion-JPEG via
    ``multimodal.mjpeg.decode_mjpeg`` (full per-frame DCT+Huffman
    decode inside the RIFF walk), and uncompressed AVI via
    ``multimodal.avi.decode_avi`` — same mapInPandas plumbing."""
    raise NotImplementedError(
        "inter-frame codecs (h264) require motion compensation; see "
        "multimodal/mjpeg.py for real compressed (MJPEG) video sampling "
        "and multimodal/avi.py for the uncompressed path"
    )


FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_md5 string, head_byte int"
)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic feature extraction over the binary content column
    via mapInPandas (Arrow batches — the exact plumbing a real decoder
    uses): byte length, md5 checksum, first byte (-1 when empty). Pure
    function of the bytes ⇒ oracle-checkable in SQL (octet_length / md5 /
    hex-prefix of the encoded blob)."""
    import hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "head_byte": content.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                }
            )

    return df.select(F.col(id_col), "content").mapInPandas(op, FEATURE_SCHEMA)
