"""The reference's three analytical queries (SURVEY.md §2.4).

Reference SQL: ``/root/reference/sql/blog_post_queries.sql:1-38``.
Two surfaces per query:

- a generic DataFrame form over reference-shaped tables
  (users/posts/comments — used by tests with FIXTURES.md §A schemas),
- a testdata analog over the star schema (FIXTURES.md §B mapping:
  customer ≙ users, orders ≙ posts, lineitem ≙ comments) — these are
  the graded `queries()` entries.

Tie semantics are preserved exactly: argmax via scalar-max equality,
never LIMIT 1 (``blog_post_queries.sql:13-16,35-38``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from social_media_etl_spark.operators.argmax import argmax_with_ties

__all__ = [
    "most_comments_by_attribute",
    "counts_per_key",
    "longest_text",
]


def most_comments_by_attribute(
    child: DataFrame,
    attr: str,
    parent: DataFrame,
    parent_attr: str,
    parent_id: str,
    count_alias: str = "comment_count",
) -> DataFrame:
    """Query (a): attribute value(s) with the most child rows, right-joined
    back to the parent on that (non-key) attribute.

    Reference: ``blog_post_queries.sql:2-21`` — group-by count on
    ``comments.email``, HAVING count = scalar max (ties kept), RIGHT JOIN
    ``users`` on email (unmatched emails produce NULL user ids).

    Physical strategy: a plain right outer join cannot broadcast its
    preserved (small) side — Spark would shuffle the WHOLE parent on the
    join attribute. Instead the right join decomposes into
    ``broadcast-inner-join ∪ unmatched-winners``: two column-pruned
    parent scans, zero shuffles of the big side — the plan that survives
    a 100 TB parent.
    """
    counts = child.groupBy(attr).agg(F.count(F.lit(1)).alias(count_alias))
    winners = argmax_with_ties(counts, count_alias)
    id_alias = f"parent_{parent_id}"
    matched = parent.join(
        F.broadcast(winners), parent[parent_attr] == winners[attr], "inner"
    ).select(
        parent[parent_id].alias(id_alias), winners[attr], winners[count_alias]
    )
    id_type = parent.schema[parent_id].dataType
    unmatched = winners.join(
        F.broadcast(matched.select(attr).distinct()), attr, "left_anti"
    ).select(
        F.lit(None).cast(id_type).alias(id_alias), F.col(attr), F.col(count_alias)
    )
    return matched.unionByName(unmatched)


def counts_per_key(child: DataFrame, key: str, alias: str = "n") -> DataFrame:
    """Query (b): child rows per key, ordered by key.

    Reference: ``blog_post_queries.sql:24-29`` (comments per post).
    Partial+final hash aggregation; the ORDER BY is a range-partitioned
    sort — both scale linearly.
    """
    return (
        child.groupBy(key)
        .agg(F.count(F.lit(1)).alias(alias))
        .orderBy(key)
    )


def longest_text(df: DataFrame, text_col: str, *keep: str) -> DataFrame:
    """Query (c): row(s) whose text has the maximum length, ties kept.

    Reference: ``blog_post_queries.sql:31-38`` —
    ``WHERE length(body) = (SELECT max(length(body)) ...)``.
    """
    with_len = df.withColumn("text_len", F.length(F.col(text_col)).cast("long"))
    out = argmax_with_ties(with_len, "text_len")
    cols = list(keep) if keep else [c for c in df.columns]
    return out.select(*cols, "text_len")
