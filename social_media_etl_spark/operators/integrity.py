"""Integrity constraints as validation operators (SURVEY.md §2.8).

The reference delegates PK/FK/NOT-NULL enforcement to Postgres DDL
(``/root/reference/sql/blog_post_definitions.sql:15-81``); Spark does
not enforce constraints, so each becomes a declarative check returning
the VIOLATING rows (empty result = constraint holds).

Scale notes: PK check is one hash aggregate; FK check is a left-anti
join where the parent key set either broadcasts (dims) or sort-merges
on the key (facts) — all linear, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pk_violations", "fk_violations", "null_violations", "CheckResult", "validate"]


def pk_violations(df: DataFrame, pk_cols: Sequence[str]) -> DataFrame:
    """Duplicated primary keys with their multiplicities."""
    return (
        df.groupBy(*pk_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_violations(
    child: DataFrame, fk_cols: Sequence[str], parent: DataFrame, pk_cols: Sequence[str]
) -> DataFrame:
    """Child rows whose FK has no matching parent (NULL FKs pass, as in
    SQL FK semantics). Left-anti join — Catalyst broadcasts small
    parents automatically."""
    if len(fk_cols) != len(pk_cols):
        raise ValueError(
            f"fk_violations: fk_cols {list(fk_cols)} and pk_cols "
            f"{list(pk_cols)} differ in length — zip would silently "
            "truncate the join condition and miss violations"
        )
    cond = None
    for fk, pk in zip(fk_cols, pk_cols):
        c = child[fk] == parent[pk]
        cond = c if cond is None else (cond & c)
    non_null = None
    for fk in fk_cols:
        c = child[fk].isNotNull()
        non_null = c if non_null is None else (non_null & c)
    return child.filter(non_null).join(
        parent.select(*pk_cols).dropDuplicates(), cond, "left_anti"
    )


def null_violations(df: DataFrame, not_null_cols: Sequence[str]) -> DataFrame:
    """Rows violating NOT NULL on any listed column."""
    cond = None
    for c in not_null_cols:
        x = F.col(c).isNull()
        cond = x if cond is None else (cond | x)
    return df.filter(cond)


@dataclass
class CheckResult:
    name: str
    violations: int

    @property
    def ok(self) -> bool:
        return self.violations == 0


def validate(checks: dict[str, DataFrame], fail_fast: bool = False) -> list[CheckResult]:
    """Run named violation frames; returns per-check results.

    ``fail_fast=True`` raises on the first failing check — the analog of
    Postgres rejecting the load transaction (``users_etl.py:157``).
    """
    results = []
    for name, frame in checks.items():
        n = frame.limit(1).count() if fail_fast else frame.count()
        results.append(CheckResult(name, n))
        if fail_fast and n:
            raise ValueError(f"integrity check failed: {name}")
    return results
