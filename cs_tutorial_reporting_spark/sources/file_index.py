"""File-level Bloom sidecar index — scan skipping where min/max can't.

Partition pruning and sorted/Z-ordered footer stats (maintenance.py)
prune by VALUE RANGES; a hash-clustered layout (each key hashed to one
file, file key-ranges overlapping by construction) defeats both. The
Bloom sidecar covers exactly that niche: after writing, one
``input_file_name()`` pass builds a portable md5-Bloom (operators/
sketches.py primitives — same bits any engine can recompute) PER FILE
and stores them in a ``_bloom_index.json`` sidecar; a point lookup
tests the key against each file's bitmap ON THE DRIVER (n_files × 128
ints — catalog-sized, the Iceberg/Delta file-stats analog) and reads
only the surviving files.

At 100 TB: the index is O(files) driver state probed in microseconds;
a false positive costs one extra file scan and never wrongness (Bloom
has no false negatives); building rides a single post-write pass that
a real ingest would fold into the writer. The layout keeps ONE
physical copy — the same economics as the Z-order story, for point
lookups instead of ranges.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import BLOOM_K, BLOOM_M_BITS, _bloom_pos

_WORD_BITS = 32
SIDECAR = "_bloom_index.json"


def _positions_py(key: str) -> list[int]:
    """Driver-side twin of sketches._bloom_pos — same md5-prefix hash,
    so the probe and the build can never disagree."""
    out = []
    for i in range(BLOOM_K):
        h = hashlib.md5(f"{key}#{i}".encode()).hexdigest()[:15]
        out.append(int(h, 16) % BLOOM_M_BITS)
    return out


def write_bloom_indexed(
    df: DataFrame, path: str, key_col: str, n_files: int = 8
) -> None:
    """Hash-cluster ``df`` into ``n_files`` by ``key_col`` (every key
    lands in exactly one file) and build the per-file Bloom sidecar."""
    df.repartition(n_files, F.col(key_col)).write.mode("overwrite").parquet(
        path
    )
    spark = df.sparkSession
    back = spark.read.parquet(path).select(
        F.col(key_col).alias("__k"),
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("__f"),
    )
    key = F.col("__k")
    words = (
        back.select(
            "__f",
            F.explode(
                F.array(*[_bloom_pos(key, i) for i in range(BLOOM_K)])
            ).alias("pos"),
        )
        .distinct()
        .select(
            "__f",
            (F.col("pos") / _WORD_BITS).cast("int").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))"
            ).alias("bit_value"),
        )
        .groupBy("__f", "word_idx")
        .agg(F.sum_distinct("bit_value").alias("word"))
    )
    index: dict[str, list[int]] = {}
    for r in words.collect():  # bounded: n_files × ≤128 rows
        fname = r["__f"]  # Row.__f attribute access rejects dunder names
        index.setdefault(fname, [0] * (BLOOM_M_BITS // _WORD_BITS))[
            r.word_idx
        ] = int(r.word)
    with open(os.path.join(path, SIDECAR), "w") as f:
        json.dump(index, f)


def read_bloom_pruned(
    spark: SparkSession, path: str, key_col: str, key_value
) -> tuple[DataFrame, int, int]:
    """Point-lookup read: probe the sidecar, read ONLY surviving files.

    Returns (filtered df, n_files_total, n_files_read). A key absent
    from every file's bitmap reads ZERO files (the empty frame keeps
    the stored schema)."""
    with open(os.path.join(path, SIDECAR)) as f:
        index = json.load(f)
    pos = _positions_py(str(key_value))
    keep = []
    for fname, words in index.items():
        if all(
            words[p // _WORD_BITS] & (1 << (p % _WORD_BITS)) for p in pos
        ):
            keep.append(fname)
    schema = spark.read.parquet(path).schema
    if not keep:
        return (
            spark.createDataFrame([], schema),
            len(index),
            0,
        )
    df = spark.read.schema(schema).parquet(
        *[os.path.join(path, f) for f in keep]
    )
    return (
        df.filter(F.col(key_col) == F.lit(key_value)),
        len(index),
        len(keep),
    )
