"""Recursive struct flatten (SURVEY.md §2.3 T1).

Reference: ``/root/reference/dags/utils/utils.py:1-20`` — a recursive
Python dict walk concatenating key paths with ``_``, applied row by row
(``users_etl.py:109``).

Spark-first restatement: walk ``df.schema`` ONCE on the driver and emit
one ``select`` of ``F.col('a.b.c').alias('a_b_c')`` expressions — a pure
projection. No shuffle, no UDF, fully column-pruned: flattening 3 of
300 nested fields reads 3 columns off parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["flattened_columns", "flatten_struct"]


def _walk(schema: T.StructType, path: tuple[str, ...]) -> list[tuple[str, ...]]:
    out: list[tuple[str, ...]] = []
    for field in schema.fields:
        p = path + (field.name,)
        if isinstance(field.dataType, T.StructType):
            out.extend(_walk(field.dataType, p))
        else:
            # Arrays/maps left opaque — the reference never nests under them.
            out.append(p)
    return out


def flattened_columns(schema: T.StructType, sep: str = "_") -> list[Column]:
    """Column expressions flattening every nested StructType field; key
    paths concatenate with ``sep`` exactly like the reference's
    ``flatten_dict`` (``utils.py:12-15``)."""
    paths = _walk(schema, ())
    names = [sep.join(p) for p in paths]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"flatten: flattened paths collide on {sorted(dupes)} — "
            "pass a different sep or rename the nested fields (a "
            "duplicate-name frame fails downstream as ambiguous)"
        )
    return [
        F.col(".".join(f"`{part}`" for part in path)).alias(name)
        for path, name in zip(paths, names)
    ]


def flatten_struct(df: DataFrame, sep: str = "_") -> DataFrame:
    """Flatten all nested structs of ``df`` into top-level columns."""
    return df.select(*flattened_columns(df.schema, sep=sep))
