"""Embedding int8 quantization ([EXT] training-data pipeline: shrink an
``array<float>`` embedding column 4× for ANN index storage, with a
per-vector reconstruction-error audit — the go/no-go metric for
switching a similarity pipeline to quantized vectors).

Symmetric per-vector scheme (the FAISS/SQ8-style baseline): scale =
max|v| / 127, q_i = round(v_i / scale) ∈ [-127, 127]. Everything is a
pure array expression over the vector column — no shuffle, no Python;
at 100 TB this pipelines into the parquet scan like any map.

Cross-engine determinism: max|v| is a selection, /127 one IEEE op;
rounding uses explicit ``floor(x + 0.5)`` (identical in Spark and
DuckDB, unlike round()'s half-even vs half-away ambiguity); the int
self-dot is exact in double (|q|≤127, d=64 ⇒ < 2³¹); only the float
self-dot depends on summation order, and it uses the same sequential
fold both engines already hash-match at round-6 in the similarity
queries (operators/similarity.py:179).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import bind_once

_D = "CAST(0.0 AS DOUBLE)"


def _fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum — fixed association order."""
    return F.aggregate(arr, F.expr(_D), lambda a, x: a + x)


def quantization_report(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector audit: (vec_id, scale, n_sat, int_dot, max_abs_err,
    rel_err) where ``n_sat`` counts saturated lanes (|q| = 127),
    ``int_dot`` is the exact quantized self-dot, ``max_abs_err`` the
    worst per-lane reconstruction error and ``rel_err`` the relative
    self-dot error — all rounded at 6 dp. Zero vectors quantize to
    all-zero with zero error (guarded identically in the oracle)."""

    def _report(v: Column) -> Column:
        dv = F.transform(v, lambda x: x.cast("double"))

        def _with_scale(scale: Column) -> Column:
            q = F.transform(
                dv, lambda x: F.floor(x / scale + F.lit(0.5)).cast("bigint")
            )

            def _with_q(qa: Column) -> Column:
                recon_err = F.zip_with(
                    qa, dv, lambda qi, xi: F.abs(qi * scale - xi)
                )
                int_dot = F.aggregate(
                    F.zip_with(qa, qa, lambda a, b: a * b),
                    F.lit(0).cast("bigint"),
                    lambda a, x: a + x,
                )
                float_dot = _fold_sum(F.zip_with(dv, dv, lambda a, b: a * b))
                rel_err = F.when(float_dot == 0, F.lit(0.0)).otherwise(
                    F.abs(int_dot * scale * scale - float_dot) / float_dot
                )
                return F.struct(
                    F.round(scale, 6).alias("scale"),
                    F.size(F.filter(qa, lambda x: F.abs(x) >= 127)).alias(
                        "n_sat"
                    ),
                    int_dot.alias("int_dot"),
                    F.round(F.array_max(recon_err), 6).alias("max_abs_err"),
                    F.round(rel_err, 6).alias("rel_err"),
                )

            return bind_once(q, _with_q)

        # zero vector ⇒ divisor 1 (quantizes to all-zero, zero error)
        # instead of 0/0 = NaN inside the transform
        amax = F.array_max(F.transform(dv, F.abs))
        scale = F.when(amax == 0, F.lit(1.0)).otherwise(amax / 127)
        return bind_once(scale, _with_scale)

    rep = emb.select(F.col(id_col), bind_once(F.col(vec_col), _report).alias("r"))
    return rep.select(
        id_col,
        F.col("r.scale").alias("scale"),
        F.col("r.n_sat").cast("bigint").alias("n_sat"),
        F.col("r.int_dot").alias("int_dot"),
        F.col("r.max_abs_err").alias("max_abs_err"),
        F.col("r.rel_err").alias("rel_err"),
    )
