"""Projection / type-coercion operators (SURVEY.md §2.2 P1-P3).

The reference projects twice: extract-side row-dict building
(airflow_to_gcs.py:141-152,183-203,242-251) and load-side
``row[field] for field in schema_fields`` (gcs_to_postgres.py:169-172,
KeyError on missing). Typing is late — everything rides as strings until
Postgres COPY coerces to DDL types, with ``NULL AS ''``
(gcs_to_postgres.py:179) and a ``str(bool)`` stringification quirk
(airflow_to_gcs.py:143).

The engine does it once, eagerly and explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def project_cast(
    df: DataFrame, schema: T.StructType, strict: bool = True
) -> DataFrame:
    """P1+P2+P3 — project to exactly the catalog columns, in catalog
    order, cast to catalog types. Extra input columns are dropped;
    missing ones raise (``strict=True``, the reference's KeyError
    semantics) or materialize as typed NULLs (``strict=False``).

    Boolean-through-string round-trips (the reference's ``str(is_paused)``
    → Postgres bool coercion) are honored by Spark's string→boolean cast
    ('true'/'false'/'t'/'f'/'1'/'0'); 'True'/'False' handled explicitly.
    """
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing and strict:
        raise ValueError(f"projection missing required columns: {missing}")
    cols = []
    for f in schema.fields:
        if f.name in df.columns:
            src = F.col(f.name)
            if isinstance(f.dataType, T.BooleanType):
                src = F.when(
                    src.cast("string").isin("True", "False"),
                    F.lower(src.cast("string")),
                ).otherwise(src.cast("string"))
            cols.append(src.cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def null_if_empty(df: DataFrame, *columns: str) -> DataFrame:
    """P3 — ``NULL AS ''``: map empty strings to NULL on the given string
    columns (all string columns when none given), matching the COPY
    option at gcs_to_postgres.py:179. The reference consequently cannot
    round-trip a true empty string; the engine preserves '' everywhere
    except through this explicit operator (SURVEY §7.4).
    """
    targets = list(columns) or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    out = df
    for c in targets:
        out = out.withColumn(c, F.when(F.col(c) == "", None).otherwise(F.col(c)))
    return out
