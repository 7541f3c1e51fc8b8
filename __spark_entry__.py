"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — smoke: flagship query at sf0.001.
``queries()`` — named (spark, sf_dir) -> DataFrame callables, one per
implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key (tables
region nation customer supplier part orders lineitem events documents
embeddings are pre-registered views).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from social_media_etl_spark.catalog import load_table, load_tables
from social_media_etl_spark.plans import analytics, blog

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference query (b) analog — counts per key,
    SURVEY.md §2.4 Q6+Q7) on sf0.001; driver checks rows>0."""
    lineitem = load_table(spark, SF0001, "lineitem")
    return blog.counts_per_key(lineitem, "l_orderkey", alias="n_items")


# ---------------------------------------------------------------------------
# queries(): one entry per implemented operator (SURVEY.md §2)
# ---------------------------------------------------------------------------


def _blog_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query (a) analog: supplier(s) with most lineitems, ties kept,
    right-joined back (SURVEY §2.4 Q1-Q5)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    out = blog.most_comments_by_attribute(
        lineitem, "l_suppkey", supplier, "s_suppkey", "s_suppkey"
    )
    return out.withColumnRenamed("parent_s_suppkey", "supplier_id")


def _blog_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query (b) analog: lineitems per order, ordered (Q6+Q7)."""
    return blog.counts_per_key(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey", alias="n_items"
    )


def _blog_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query (c) analog: longest document(s), ties kept (Q8-Q10)."""
    return blog.longest_text(load_table(spark, sf_dir, "documents"), "text")


def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.pricing_summary(load_table(spark, sf_dir, "lineitem"))


def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.top_revenue_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.regional_revenue(load_tables(spark, sf_dir))


def _topk_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.top_orders_per_customer(load_table(spark, sf_dir, "orders"))


def _distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.distinct_parts_per_flag(load_table(spark, sf_dir, "lineitem"))


def _events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_windowed_agg(load_table(spark, sf_dir, "events"))


def _events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_sessionize(load_table(spark, sf_dir, "events"))


def _events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_json_extract(load_table(spark, sf_dir, "events"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "blog_a_most_active": _blog_a,
        "blog_b_counts_per_key": _blog_b,
        "blog_c_longest_text": _blog_c,
        "q1_pricing_summary": _q1,
        "q3_top_revenue_orders": _q3,
        "q5_regional_revenue": _q5,
        "topk_orders_per_customer": _topk_per_cust,
        "distinct_parts_per_flag": _distinct,
        "events_windowed_agg": _events_window,
        "events_sessionize": _events_sessions,
        "events_json_extract": _events_json,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "blog_a_most_active": """
            WITH count_by_supp AS (
                SELECT l_suppkey, count(*) AS comment_count
                FROM lineitem GROUP BY l_suppkey
            ),
            winners AS (
                SELECT l_suppkey, comment_count FROM count_by_supp
                WHERE comment_count = (SELECT max(comment_count) FROM count_by_supp)
            )
            SELECT s.s_suppkey AS supplier_id, w.l_suppkey, w.comment_count
            FROM supplier s RIGHT JOIN winners w ON s.s_suppkey = w.l_suppkey
        """,
        "blog_b_counts_per_key": """
            SELECT l_orderkey, count(*) AS n_items
            FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
        """,
        "blog_c_longest_text": """
            SELECT doc_id, text, lang, source, n_chars, length(text) AS text_len
            FROM documents
            WHERE length(text) = (SELECT max(length(text)) FROM documents)
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_top_revenue_orders": """
            SELECT o_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "q5_regional_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """,
        "topk_orders_per_customer": """
            SELECT o_custkey, o_orderkey, totalprice, rk FROM (
                SELECT o_custkey, o_orderkey,
                       round(o_totalprice, 2) AS totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS rk
                FROM orders
            ) WHERE rk <= 3
        """,
        "distinct_parts_per_flag": """
            SELECT l_returnflag,
                   count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_suppkey) AS n_supps,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "events_windowed_agg": """
            SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY window_start, event_type
            ORDER BY window_start, event_type
        """,
        "events_sessionize": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR CAST(floor(extract(epoch FROM ts)) AS BIGINT)
                                    - CAST(floor(extract(epoch FROM lag(ts) OVER w)) AS BIGINT)
                                    > 1800
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sessions AS (
                SELECT user_id, ts,
                       sum(new_sess) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING
                       ) AS session_no
                FROM flagged
            )
            SELECT user_id, session_no,
                   count(*) AS n_events,
                   min(ts) AS session_start,
                   max(ts) AS session_end
            FROM sessions
            GROUP BY user_id, session_no
            ORDER BY user_id, session_no
        """,
        "events_json_extract": """
            SELECT event_type,
                   count(*) AS n,
                   min(k) AS min_k,
                   max(k) AS max_k,
                   CAST(sum(k) AS BIGINT) AS sum_k
            FROM (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                FROM events
            )
            GROUP BY event_type ORDER BY event_type
        """,
    }
