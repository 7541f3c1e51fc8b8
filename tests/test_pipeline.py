"""End-to-end reference-pipeline parity: extract → normalize →
integrity → warehouse → the three blog queries, driven offline from
JSON fixtures shaped exactly like the reference's API payloads."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from social_media_etl_spark import pipeline
from social_media_etl_spark.plans import blog


def _user(i: int) -> dict:
    return {
        "id": i,
        "name": f"User {i}",
        "username": f"u{i}",
        "email": f"u{i}@example.com",
        "phone": "1-555",
        "website": f"u{i}.example.com",
        "address": {
            "street": f"{i} Main",
            "suite": "Apt 1",
            "city": "Springfield",
            "zipcode": "12345",
            "geo": {"lat": f"{i}.5", "lng": f"-{i}.25"},
        },
        "company": {"name": f"Co{i}", "catchPhrase": "synergy", "bs": "webscale"},
    }


USERS = [_user(i) for i in range(1, 4)]
POSTS = [
    {"userId": 1, "id": 10, "title": "t10", "body": "b10"},
    {"userId": 1, "id": 11, "title": "t11", "body": "b11"},
    {"userId": 2, "id": 20, "title": "t20", "body": "b20"},
]
# u1, u2, and ghost@ tie with 2 comments each; ghost@ has no user row
COMMENTS = [
    {"postId": 10, "id": 100, "name": "c", "email": "u1@example.com", "body": "aa"},
    {"postId": 10, "id": 101, "name": "c", "email": "u1@example.com", "body": "bbbb"},
    {"postId": 11, "id": 102, "name": "c", "email": "u2@example.com", "body": "cccc"},
    {"postId": 20, "id": 103, "name": "c", "email": "u2@example.com", "body": "dd"},
    {"postId": 20, "id": 104, "name": "c", "email": "ghost@example.com", "body": "e"},
    {"postId": 11, "id": 105, "name": "c", "email": "ghost@example.com", "body": "f"},
]


@pytest.fixture(scope="module")
def api_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("api")
    (d / "users.json").write_text(json.dumps(USERS))
    (d / "posts.json").write_text(json.dumps(POSTS))
    (d / "comments.json").write_text(json.dumps(COMMENTS))
    return d


@pytest.fixture(scope="module")
def warehouse(spark, api_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    return pipeline.blog_etl(
        spark,
        str(api_dir / "users.json"),
        str(api_dir / "posts.json"),
        str(api_dir / "comments.json"),
        str(wh),
        landing_dir=str(tmp_path_factory.mktemp("landing")),
    )


def test_warehouse_tables_and_normalization(warehouse):
    assert set(warehouse) == {"addresses", "companies", "users", "posts", "comments"}
    users = warehouse["users"]
    addresses = warehouse["addresses"]
    # surrogate FK joins back to the child PK, geo cast to double
    joined = users.join(
        addresses, users["addresses_uuid"] == addresses["uuid"]
    ).select("id", "geo_lat")
    got = {r["id"]: r["geo_lat"] for r in joined.collect()}
    assert got == {1: 1.5, 2: 2.5, 3: 3.5}
    assert dict(addresses.dtypes)["geo_lat"] == "double"
    # posts/comments got the camelCase → snake_case rename
    assert "user_id" in warehouse["posts"].columns
    assert "post_id" in warehouse["comments"].columns


@pytest.mark.slow
def test_pipeline_idempotent_rerun(spark, api_dir, warehouse, tmp_path_factory):
    wh2 = tmp_path_factory.mktemp("warehouse2")
    again = pipeline.blog_etl(
        spark,
        str(api_dir / "users.json"),
        str(api_dir / "posts.json"),
        str(api_dir / "comments.json"),
        str(wh2),
    )
    for name in warehouse:
        a = sorted(map(str, warehouse[name].collect()))
        b = sorted(map(str, again[name].collect()))
        assert a == b, name  # deterministic surrogate keys ⇒ equal state


@pytest.mark.slow
def test_pipeline_via_python_datasource(spark, api_dir, warehouse, tmp_path_factory):
    """The same pipeline with extraction through the rest_json Python
    DataSource scan produces an identical warehouse."""
    wh = tmp_path_factory.mktemp("warehouse_ds")
    via_ds = pipeline.blog_etl(
        spark,
        str(api_dir / "users.json"),
        str(api_dir / "posts.json"),
        str(api_dir / "comments.json"),
        str(wh),
        use_datasource=True,
    )
    for name in warehouse:
        a = sorted(map(str, warehouse[name].collect()))
        b = sorted(map(str, via_ds[name].collect()))
        assert a == b, name


def test_gate_blocks_missing_source(spark, api_dir, tmp_path):
    with pytest.raises(pipeline.StageFailed) as err:
        pipeline.blog_etl(
            spark,
            str(api_dir / "nope.json"),
            str(api_dir / "posts.json"),
            str(api_dir / "comments.json"),
            str(tmp_path / "wh"),
        )
    assert err.value.stage == "extract_users"


def test_blog_query_a_ties_and_right_join_null(warehouse):
    """Query (a) on pipeline output: u1/u2 tie at 2 comments; ghost
    email keeps a row with NULL user id (right-join semantics)."""
    out = blog.most_comments_by_attribute(
        warehouse["comments"], "email", warehouse["users"], "email", "id"
    ).collect()
    by_email = {r["email"]: (r["parent_id"], r["comment_count"]) for r in out}
    assert by_email == {
        "u1@example.com": (1, 2),
        "u2@example.com": (2, 2),
        "ghost@example.com": (None, 2),  # preserved winner, NULL user id
    }


def test_blog_query_b_counts_per_post(warehouse):
    out = blog.counts_per_key(warehouse["comments"], "post_id", alias="n")
    assert [(r["post_id"], r["n"]) for r in out.collect()] == [
        (10, 2),
        (11, 2),
        (20, 2),
    ]


def test_blog_query_c_longest_comment_ties(warehouse):
    out = blog.longest_text(warehouse["comments"], "body").collect()
    assert sorted(r["body"] for r in out) == ["bbbb", "cccc"]
    assert all(r["text_len"] == 4 for r in out)


def test_stage_retry_then_success():
    calls = {"n": 0}

    def flaky(ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    p = pipeline.Pipeline([pipeline.Stage("flaky", flaky, retries=2)])
    assert p.run()["flaky"] == "ok"
    assert calls["n"] == 3


def test_same_group_stages_run_concurrently():
    """Consecutive same-group stages fan out in threads (the reference
    DAG's parallel branches): a 2-party barrier inside both stage fns
    only passes if they overlap in time."""
    import threading

    from social_media_etl_spark.pipeline import Pipeline, Stage

    barrier = threading.Barrier(2, timeout=10)

    def stage_fn(name):
        def _fn(ctx):
            barrier.wait()  # deadlocks (→ BrokenBarrier) if sequential
            return name

        return _fn

    ctx = Pipeline(
        [
            Stage("a", stage_fn("a"), group="extract"),
            Stage("b", stage_fn("b"), group="extract"),
            Stage("after", lambda ctx: (ctx["a"], ctx["b"])),
        ]
    ).run()
    assert ctx["after"] == ("a", "b")


def test_group_failure_propagates():
    import pytest

    from social_media_etl_spark.pipeline import Pipeline, Stage, StageFailed

    def boom(ctx):
        raise ValueError("nope")

    pipe = Pipeline(
        [
            Stage("ok", lambda ctx: 1, group="g"),
            Stage("bad", boom, retries=0, group="g"),
            Stage("never", lambda ctx: 2),
        ]
    )
    with pytest.raises(StageFailed):
        pipe.run()
    assert "never" not in pipe.context
