"""Projection-shaped per-row transforms (SURVEY.md §2.3 T4-T6).

Reference: key renames ``userId→user_id`` (``posts_etl.py:92-95``,
``comments_etl.py:92-95``), ``float()`` casts (``users_etl.py:110-111``),
and implicit column-set alignment from the first row's dict keys
(``users_etl.py:143``). All become metadata-only projections here —
zero data movement, fully codegen'd.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["rename_columns", "to_snake_case", "cast_columns", "select_aligned"]

_CAMEL = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Rename columns by explicit mapping (T4)."""
    return df.withColumnsRenamed(dict(mapping))


def to_snake_case(df: DataFrame) -> DataFrame:
    """Rename every camelCase column to snake_case (the reference's
    API-to-warehouse naming convention, generalized). Raises if two
    columns would collide on one snake_case name (or onto an existing
    column) — a silent duplicate-name frame fails far from the cause
    with AMBIGUOUS_REFERENCE (r8 review)."""
    mapping = {
        c: _CAMEL.sub("_", c).lower() for c in df.columns if _CAMEL.search(c)
    }
    out_names = [mapping.get(c, c) for c in df.columns]
    dupes = {n for n in out_names if out_names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"to_snake_case: renames collide on {sorted(dupes)} — rename "
            "the conflicting columns explicitly first"
        )
    return df.withColumnsRenamed(mapping)


def cast_columns(
    df: DataFrame,
    casts: Mapping[str, str | T.DataType],
    strict: bool = False,
) -> DataFrame:
    """Cast columns (T5). Policy per SURVEY §5.2: invalid input → NULL
    (``try_cast``) by default; ``strict=True`` raises on any value the
    cast cannot represent — the reference's ``float('bad')`` would
    raise (``users_etl.py:110``). Strict mode is enforced IN-PLAN
    (non-NULL input that casts to NULL raises), not via ANSI cast:
    the project session pins spark.sql.ansi.enabled=false, under which
    Column.cast silently nulls exactly like try_cast (r8 review — the
    old strict mode never raised)."""
    def _one(name, t):
        if not strict:
            return F.col(name).try_cast(t)
        casted = F.col(name).cast(t)
        return F.when(
            F.col(name).isNotNull() & casted.isNull(),
            F.raise_error(
                F.concat(
                    F.lit(f"cast_columns: strict cast of column '{name}' "),
                    F.lit("failed for value '"),
                    F.col(name).cast("string"),
                    F.lit("'"),
                )
            ).cast(t),
        ).otherwise(casted)

    return df.withColumns({name: _one(name, t) for name, t in casts.items()})


def select_aligned(df: DataFrame, target_cols: Sequence[str]) -> DataFrame:
    """Project to the sink's column set/order (T6): the reference derives
    INSERT columns from ``rows[0].keys()`` and crashes on empty input
    (``users_etl.py:143``); here the schema is static — empty input is a
    valid empty result."""
    return df.select(*target_cols)
