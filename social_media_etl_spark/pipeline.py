"""Pipeline driver: the reference's Airflow orchestration semantics
(SURVEY.md §2.5 O1-O5, §7 step 3) as a plain-Python runner.

Airflow feature → engine mapping:
- DAG dependency chain (O1)  → ordered ``Stage`` list; cross-pipeline
  parents-before-children ordering is explicit stage order.
- retry policy (O2)          → per-stage ``retries``/``retry_delay``.
- HttpSensor gate (S4)       → stage ``gate`` callable, polled with
  the same retry budget before the stage body runs.
- error wrap + re-raise (O5) → stage failures carry stage name and
  abort the run (later stages don't execute on a broken parent).
- truncate-and-load (K4)     → ``overwrite_parquet``: idempotent full
  refresh; a re-run converges to the same warehouse state.

The concrete ``blog_etl`` below is the whole reference pipeline
(users/posts/comments) end-to-end on this engine.
"""

from __future__ import annotations

import logging
import os
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from social_media_etl_spark.operators import integrity
from social_media_etl_spark.operators.normalize import normalize
from social_media_etl_spark.operators.transforms import cast_columns, to_snake_case
from social_media_etl_spark.sources import rest_api

__all__ = ["Stage", "Pipeline", "StageFailed", "overwrite_parquet", "blog_etl"]

log = logging.getLogger("smetl.pipeline")


class StageFailed(RuntimeError):
    def __init__(self, stage: str, cause: Exception):
        super().__init__(f"stage {stage!r} failed after retries: {cause}")
        self.stage = stage
        self.cause = cause


@dataclass
class Stage:
    name: str
    fn: Callable[[dict], object]
    retries: int = 1          # reference default_args: retries=1
    retry_delay: float = 0.0  # reference: 5 min; tests use 0
    gate: Callable[[], bool] | None = None
    group: str | None = None  # consecutive stages sharing a group fan out


@dataclass
class Pipeline:
    """Ordered stages sharing a mutable context dict. ``run`` executes
    each stage with its retry budget and returns the context.

    CONSECUTIVE stages with the same non-None ``group`` run
    concurrently (thread fan-out — Spark job submission is
    thread-safe, and the scheduler interleaves their jobs), mirroring
    the reference DAG's parallel upload branches
    (``dags/users_etl.py:220-229``). Ordering across groups is
    unchanged: a group is a barrier, later stages see every group
    member's context entry."""

    stages: Sequence[Stage]
    context: dict = field(default_factory=dict)

    def run(self) -> dict:
        from concurrent.futures import ThreadPoolExecutor

        i, stages = 0, list(self.stages)
        while i < len(stages):
            stage = stages[i]
            batch = [stage]
            if stage.group is not None:
                while (
                    i + len(batch) < len(stages)
                    and stages[i + len(batch)].group == stage.group
                ):
                    batch.append(stages[i + len(batch)])
            if len(batch) == 1:
                self._run_stage(stage)
            else:
                with ThreadPoolExecutor(max_workers=len(batch)) as pool:
                    futures = [pool.submit(self._run_stage, s) for s in batch]
                    # surface the FIRST failure; cancel nothing (running
                    # stages finish — same as Airflow branch semantics)
                    for f in futures:
                        f.result()
            i += len(batch)
        return self.context

    def _run_stage(self, stage: Stage) -> None:
        attempts = stage.retries + 1
        for attempt in range(1, attempts + 1):
            try:
                if stage.gate is not None and not stage.gate():
                    raise RuntimeError("gate not satisfied")
                out = stage.fn(self.context)
                if out is not None:
                    self.context[stage.name] = out
                log.info("stage %s ok (attempt %d)", stage.name, attempt)
                return
            except Exception as exc:  # noqa: BLE001 — O5: wrap + surface
                log.warning("stage %s attempt %d failed: %s", stage.name, attempt, exc)
                if attempt == attempts:
                    raise StageFailed(stage.name, exc) from exc
                time.sleep(stage.retry_delay)


def source_available(url: str) -> bool:
    """S4 gate: the source answers (HTTP 200 / readable file). Like
    the reference's HttpSensor this is a STATUS probe — it opens the
    source and reads one byte, never downloading or parsing the whole
    payload (r8 review: the gate used to do a full fetch+parse that
    the stage body immediately repeated, doubling every extract's IO
    and leaving a TOCTOU gap either way)."""
    from urllib.parse import urlparse
    from urllib.request import urlopen

    try:
        if urlparse(url).scheme in ("http", "https"):
            with urlopen(url, timeout=10.0) as resp:  # noqa: S310
                resp.read(1)
        else:
            path = url[len("file://"):] if url.startswith("file://") else url
            with open(path, "rb") as fh:
                fh.read(1)
        return True
    except Exception:  # noqa: BLE001
        return False


def overwrite_parquet(df: DataFrame, path: str) -> None:
    """K4: idempotent full refresh — overwrite is atomic-per-run and a
    replay converges to identical state (vs. the reference's separate
    DELETE + INSERT tasks). Routed through formats.write_table so the
    warehouse tables get the repo's parquet+zstd default instead of a
    divergent snappy write (r8 review)."""
    from social_media_etl_spark.sources.formats import write_table

    write_table(df, path)


# ---------------------------------------------------------------------------
# The reference pipeline end-to-end (users + posts + comments)
# ---------------------------------------------------------------------------

USERS_SCHEMA = (
    "id long, name string, username string, email string, phone string, "
    "website string, "
    "address struct<street:string, suite:string, city:string, zipcode:string, "
    "geo:struct<lat:string, lng:string>>, "
    "company struct<name:string, catchPhrase:string, bs:string>"
)
POSTS_SCHEMA = "userId long, id long, title string, body string"
COMMENTS_SCHEMA = "postId long, id long, name string, email string, body string"


def blog_etl(
    spark: SparkSession,
    users_url: str,
    posts_url: str,
    comments_url: str,
    warehouse_dir: str,
    landing_dir: str | None = None,
    use_datasource: bool = False,
) -> dict[str, DataFrame]:
    """The full reference lifecycle on this engine: gate → extract →
    (optional NDJSON landing) → normalize/rename/cast → integrity
    checks → idempotent parquet warehouse. Load order is
    parents-before-children (addresses/companies → users → posts →
    comments), mirroring the DAG + FK ordering the reference leaves
    implicit (SURVEY §3 entry point 2).

    Reference trace: users_etl.py:171-229 (extract/normalize/load),
    posts_etl.py:85-130 & comments_etl.py:85-130 (rename+load),
    blog_post_definitions.sql (constraints → integrity ops).
    """

    if use_datasource:
        rest_api.register_rest_json_source(spark)

    def extract(url: str, schema: str, name: str):
        def _fn(ctx: dict) -> DataFrame:
            if use_datasource:  # S1 as a native scan (Python DataSource)
                df = (
                    spark.read.format("rest_json")
                    .schema(schema)
                    .option("url", url)
                    .load()
                )
            else:  # driver-side fetch (reference's actual scale)
                df = rest_api.json_records_to_df(
                    spark, rest_api.fetch_json_records(url), schema
                )
            if landing_dir:  # K2 landing zone, then re-read (S3) like the ref
                path = os.path.join(landing_dir, name)
                rest_api.write_ndjson(df, path)
                df = rest_api.read_json_landing(spark, path, schema)
            return df

        return _fn

    def transform_users(ctx: dict) -> dict[str, DataFrame]:
        tables = normalize(
            ctx["extract_users"],
            nested={"address": "addresses", "company": "companies"},
            key_cols=["id"],
            root_name="users",
        )
        tables["addresses"] = cast_columns(
            tables["addresses"], {"geo_lat": "double", "geo_lng": "double"}
        )
        return tables

    def transform_posts(ctx: dict) -> DataFrame:
        return to_snake_case(ctx["extract_posts"])

    def transform_comments(ctx: dict) -> DataFrame:
        return to_snake_case(ctx["extract_comments"])

    def check(ctx: dict) -> list[integrity.CheckResult]:
        users = ctx["transform_users"]["users"]
        addresses = ctx["transform_users"]["addresses"]
        companies = ctx["transform_users"]["companies"]
        posts = ctx["transform_posts"]
        comments = ctx["transform_comments"]
        return integrity.validate(
            {
                "users_pk": integrity.pk_violations(users, ["id"]),
                "addresses_pk": integrity.pk_violations(addresses, ["uuid"]),
                "companies_pk": integrity.pk_violations(companies, ["uuid"]),
                "posts_pk": integrity.pk_violations(posts, ["id"]),
                "comments_pk": integrity.pk_violations(comments, ["id"]),
                "users_address_fk": integrity.fk_violations(
                    users, ["addresses_uuid"], addresses, ["uuid"]
                ),
                "users_company_fk": integrity.fk_violations(
                    users, ["companies_uuid"], companies, ["uuid"]
                ),
                "posts_user_fk": integrity.fk_violations(
                    posts, ["user_id"], users, ["id"]
                ),
                "comments_post_fk": integrity.fk_violations(
                    comments, ["post_id"], posts, ["id"]
                ),
                "users_not_null": integrity.null_violations(
                    users, ["id", "name", "username", "email"]
                ),
            },
            fail_fast=True,
        )

    def load(ctx: dict) -> dict[str, str]:
        out: dict[str, str] = {}
        ordered = [  # parents before children (FK load order)
            ("addresses", ctx["transform_users"]["addresses"]),
            ("companies", ctx["transform_users"]["companies"]),
            ("users", ctx["transform_users"]["users"]),
            ("posts", ctx["transform_posts"]),
            ("comments", ctx["transform_comments"]),
        ]
        for name, df in ordered:
            path = os.path.join(warehouse_dir, name)
            overwrite_parquet(df, path)
            out[name] = path
        return out

    pipe = Pipeline(
        [
            Stage(
                "extract_users",
                extract(users_url, USERS_SCHEMA, "users"),
                gate=lambda: source_available(users_url),
                group="extract",  # parallel branches like the ref DAG
            ),
            Stage(
                "extract_posts",
                extract(posts_url, POSTS_SCHEMA, "posts"),
                gate=lambda: source_available(posts_url),
                group="extract",
            ),
            Stage(
                "extract_comments",
                extract(comments_url, COMMENTS_SCHEMA, "comments"),
                gate=lambda: source_available(comments_url),
                group="extract",
            ),
            Stage("transform_users", transform_users),
            Stage("transform_posts", transform_posts),
            Stage("transform_comments", transform_comments),
            Stage("integrity", check),
            Stage("load", load),
        ]
    )
    ctx = pipe.run()
    return {
        name: spark.read.parquet(path) for name, path in ctx["load"].items()
    }
