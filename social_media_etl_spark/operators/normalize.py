"""Document normalization: vertical split with surrogate keys
(SURVEY.md §2.3 T2+T3).

Reference: ``users_etl.py:99-118`` pops ``address``/``company`` structs
off each user row, generates ``uuid.uuid4()`` per child row, and embeds
the same value in the parent as an FK.

Spark-first restatement: each output table is a PROJECTION of the same
scan (column-pruned — the child scan reads only its struct's columns).
Surrogate keys are **deterministic** hashes of (parent key, child name):
``F.expr('uuid()')`` is nondeterministic under lazy re-evaluation, so
parent FK and child PK could disagree across recomputations (SURVEY §7
risk #1); ``sha2`` keys are stable across retries, recomputations, and
engines (an external SQL oracle can reproduce them).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


__all__ = ["surrogate_key", "normalize"]

_SEP = "\x1f"


def surrogate_key(child_name: str, key_cols: Sequence[str]) -> Column:
    """Deterministic surrogate key: sha256 over (child name, parent
    natural-key columns). One child row per parent row, like the
    reference's per-row ``uuid4()`` (``users_etl.py:103,107``), but
    reproducible."""
    # concat_ws SKIPS NULL arguments, which would let distinct key
    # tuples containing NULLs collide (("ann", NULL) vs (NULL, "ann"));
    # NULL parts hash an explicit marker instead (r8 review)
    parts = [F.lit(child_name)] + [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
        for c in key_cols
    ]
    return F.sha2(F.concat_ws(_SEP, *parts), 256)


def normalize(
    df: DataFrame,
    nested: Mapping[str, str],
    key_cols: Sequence[str],
    root_name: str = "root",
) -> dict[str, DataFrame]:
    """Split struct columns into child tables linked by surrogate keys.

    ``nested`` maps struct-column name → child table name. Returns
    ``{root_name: parent_without_structs_plus_fks, child...: child}``.
    Child tables carry ``uuid`` + the struct's fields flattened.
    """
    out: dict[str, DataFrame] = {}
    fk_cols: list[Column] = []
    for col_name, child_name in nested.items():
        field = df.schema[col_name]
        if not isinstance(field.dataType, T.StructType):
            raise TypeError(f"column {col_name!r} is not a struct")
        key = surrogate_key(child_name, key_cols)
        # flatten the struct's fields relative to the struct column
        flat = [
            F.col(".".join([f"`{col_name}`"] + [f"`{p}`" for p in path])).alias(
                "_".join(path)
            )
            for path in _paths(field.dataType, ())
        ]
        out[child_name] = df.select(key.alias("uuid"), *flat)
        fk_cols.append(key.alias(f"{child_name}_uuid"))
    scalars = [c for c in df.columns if c not in nested]
    out[root_name] = df.select(*scalars, *fk_cols)
    return out


def _paths(schema: T.StructType, path: tuple[str, ...]) -> list[tuple[str, ...]]:
    out: list[tuple[str, ...]] = []
    for field in schema.fields:
        p = path + (field.name,)
        if isinstance(field.dataType, T.StructType):
            out.extend(_paths(field.dataType, p))
        else:
            out.append(p)
    return out
