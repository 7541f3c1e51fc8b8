"""Operator library (SURVEY.md §2).

Each module implements one operator family as composable DataFrame
functions — declarative plans only, so Catalyst keeps pushdown/pruning
and picks physical strategies (broadcast vs sort-merge, partial aggs).
"""

from social_media_etl_spark.operators.argmax import argmax_with_ties
from social_media_etl_spark.operators.flatten import flatten_struct, flattened_columns
from social_media_etl_spark.operators.normalize import normalize
from social_media_etl_spark.operators.transforms import (
    cast_columns,
    rename_columns,
    select_aligned,
    to_snake_case,
)

__all__ = [
    "argmax_with_ties",
    "flatten_struct",
    "flattened_columns",
    "normalize",
    "cast_columns",
    "rename_columns",
    "select_aligned",
    "to_snake_case",
]
