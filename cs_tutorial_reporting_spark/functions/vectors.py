"""Vector math over ``array<float>`` embedding columns ([EXT]).

Built-in higher-order functions only (``zip_with`` + ``aggregate``) —
JVM-side, no Python boundary, no UDF. Computation is promoted to double
before accumulating so results match DuckDB's ``list_cosine_similarity``
over ``DOUBLE[]`` to ~1e-15.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with double accumulation (sequential left fold — same
    association order as DuckDB's list accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
