"""Reference query semantics on reference-shaped fixtures (FIXTURES.md §A).

Edge cases per SURVEY.md §5.2: argmax ties kept, right-join NULL
production for unmatched attributes, empty inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from social_media_etl_spark.plans import blog

USERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("email", T.StringType()),
    ]
)
COMMENTS_SCHEMA = T.StructType(
    [
        T.StructField("post_id", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("email", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def users(spark):
    return spark.createDataFrame(
        [(1, "a@x.com"), (2, "b@x.com"), (3, "c@x.com")], USERS_SCHEMA
    )


@pytest.fixture(scope="module")
def comments(spark):
    rows = [
        # a@x.com: 2 comments, b@x.com: 2 comments (tie), ghost@x.com: 1
        (10, 1, "a@x.com", "short"),
        (10, 2, "a@x.com", "longest body!"),
        (11, 3, "b@x.com", "also-longest!"),  # same length as above → tie
        (11, 4, "b@x.com", "mid"),
        (12, 5, "ghost@x.com", "x"),
    ]
    return spark.createDataFrame(rows, COMMENTS_SCHEMA)


@pytest.mark.slow
def test_query_a_ties_kept(spark, users, comments):
    out = blog.most_comments_by_attribute(
        comments, "email", users, "email", "id"
    ).collect()
    assert {(r["email"], r["comment_count"]) for r in out} == {
        ("a@x.com", 2),
        ("b@x.com", 2),
    }
    assert {r["parent_id"] for r in out} == {1, 2}


def test_query_a_null_production_on_unmatched(spark, users, comments):
    """Winner email absent from users → right join keeps it with NULL id
    (reference: comments.email has no FK, blog_post_queries.sql:18-21)."""
    ghost_heavy = comments.union(
        spark.createDataFrame(
            [(12, 6, "ghost@x.com", "y"), (12, 7, "ghost@x.com", "z")],
            COMMENTS_SCHEMA,
        )
    )
    out = blog.most_comments_by_attribute(
        ghost_heavy, "email", users, "email", "id"
    ).collect()
    assert len(out) == 1
    assert out[0]["email"] == "ghost@x.com"
    assert out[0]["parent_id"] is None
    assert out[0]["comment_count"] == 3


def test_query_b_counts_ordered(spark, comments):
    out = blog.counts_per_key(comments, "post_id").collect()
    assert [(r["post_id"], r["n"]) for r in out] == [(10, 2), (11, 2), (12, 1)]


def test_query_c_longest_with_ties(spark, comments):
    out = blog.longest_text(comments, "body").collect()
    assert {r["body"] for r in out} == {"longest body!", "also-longest!"}
    assert all(r["text_len"] == 13 for r in out)


def test_empty_input_does_not_crash(spark):
    """Reference crashes on empty input (users_etl.py:143); we must not."""
    empty = spark.createDataFrame([], COMMENTS_SCHEMA)
    assert blog.counts_per_key(empty, "post_id").count() == 0
    assert blog.longest_text(empty, "body").count() == 0
