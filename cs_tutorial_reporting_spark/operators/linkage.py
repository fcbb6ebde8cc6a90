"""[EXT] Blocked record linkage (entity resolution): near-identical
records found by edit distance WITHIN blocking-key groups — the
classic dedup-adjacent shape for dirty dimension data (misspelled
names, transposed digits) where token/shingle methods are too coarse.

Blocking is the scale move: the quadratic comparison runs only inside
each block (one equi-join on the blocking key), and pathological
blocks are dropped BEFORE the pair expansion (the minhash
``max_bucket`` rule — rule 2 of SCALE.md). Edit distance itself is
``F.levenshtein`` — JVM whole-stage codegen, integer-exact, and
bit-identical to DuckDB's ``levenshtein``, so linkage results
hash-match a SQL oracle with no float caveat anywhere.

At 100 TB: pick blocking keys so blocks stay bounded (nation, zip
prefix, phonetic code); the pair count is Σ_b |b|²/2, controlled by
``max_block``; everything after the block join is a row-local
expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    max_dist: int = 2,
    max_block: int = 1000,
) -> DataFrame:
    """(block, id_a, id_b, dist) for same-block record pairs with
    ``levenshtein(name_a, name_b) <= max_dist``, id_a < id_b; blocks
    larger than ``max_block`` are excluded before any pair expands."""
    sizes = (
        df.groupBy(block_col)
        .agg(F.count("*").alias("__bn"))
        .filter(F.col("__bn") <= max_block)
        .select(block_col)
    )
    base = df.join(sizes, block_col).select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("__na"),
    )
    other = df.join(sizes, block_col).select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("__nb"),
    )
    # the threshold form early-exits the DP once distance must exceed
    # max_dist (returns -1) — O(d·n) per pair instead of O(n²)
    dist = F.levenshtein("__na", "__nb", max_dist)
    return (
        base.join(other, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select(F.col("__blk").alias(block_col), "id_a", "id_b", "dist")
    )
