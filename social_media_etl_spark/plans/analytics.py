"""Headline analytics queries over the testdata star schema.

These exercise the full relational operator surface (scan → filter →
multi-join → agg → window → sort) the way a warehouse workload would.
Plans are declarative DataFrame programs: Catalyst pushes filters into
the parquet scans, prunes columns, broadcasts small dimensions, and AQE
re-plans shuffles at runtime.

Floating-point note: monetary aggregates are rounded (2 decimals) at
the output boundary so results are stable across summation orders —
required for bit-exact oracle comparison and for deterministic results
at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pricing_summary",
    "top_revenue_orders",
    "regional_revenue",
    "top_orders_per_customer",
    "distinct_parts_per_flag",
    "events_windowed_agg",
    "events_sessionize",
    "events_json_extract",
    "events_pivot_counts",
    "events_unpivot_counts",
    "events_rolling_avg",
    "forecast_revenue_change",
    "promo_revenue_share",
    "priority_share_by_year",
    "small_quantity_revenue",
    "large_volume_customers",
    "late_shipment_priority",
    "returned_item_customers",
    "brand_supplier_counts",
    "banded_disjunctive_revenue",
    "idle_rich_customers",
]


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: big scan → 2-key groupBy → many aggregates.

    Whole-stage-codegen'd partial+final HashAggregate; the filter is
    pushed to the parquet scan (row-group stats on l_shipdate).
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_before).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_revenue_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → agg → top-k.

    customer(filtered) is small → broadcast into orders; the
    orders⨝lineitem join shuffles on orderkey. Deterministic top-k:
    revenue rounded before ordering, orderkey tiebreak.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    revenue = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
    ).alias("revenue")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue)
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(k)
    )


def regional_revenue(tables: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q5 shape: snowflake join through region→nation→customer/
    supplier→orders→lineitem, revenue per nation.

    All dimensions broadcast; the only large shuffles are the two fact
    joins on orderkey, then the final small agg.
    """
    t = tables
    revenue = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
    ).alias("revenue")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(revenue)
        .orderBy(F.desc("revenue"), "n_name")
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-k per group via ranking window — partitions by customer so it
    parallelizes; deterministic tiebreak on orderkey."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rk",
        )
    )


def distinct_parts_per_flag(lineitem: DataFrame) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg in Spark)."""
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


def events_windowed_agg(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Tumbling event-time window aggregation (batch form).

    The identical plan runs under Structured Streaming with a watermark
    (streaming/ingest.py); in batch it's a plain groupBy on the bucketed
    timestamp so the oracle can reproduce it.
    """
    win = F.window("ts", width)
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def events_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user lag + gap cumsum window → session ids,
    then per-session stats. Partitions by user_id → parallel at scale."""
    by_user = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    sess = (
        events.withColumn("new_sess", new_sess)
        .withColumn(
            "session_no",
            F.sum("new_sess").over(
                by_user.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_no")
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    year: int = 1996,
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-sum, no joins, no groups — the
    predicate (year + discount band + quantity cap) pushes into the
    parquet scan and the single global aggregate is one partial+final
    pass. The query every columnar engine should do at I/O speed."""
    return (
        lineitem.filter(
            (F.year("l_shipdate") == year)
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def promo_revenue_share(
    lineitem: DataFrame, part: DataFrame, year: int = 1996
) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a fact⨝dim join —
    CASE WHEN inside sum() computes the promo share in the same pass
    as the total (no second scan, no self-join)."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc_price).otherwise(
        F.lit(0.0)
    )
    return (
        lineitem.filter(F.year("l_shipdate") == year)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc_price), 4).alias(
                "promo_share_pct"
            ),
            F.round(F.sum(disc_price), 2).alias("total_revenue"),
        )
    )


def priority_share_by_year(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Conditional-aggregation report: per order-year, the revenue
    share of urgent/high-priority orders (CASE WHEN inside the
    aggregate — one pass, no pivot, no second join)."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(F.sum(F.when(urgent, revenue).otherwise(0.0)), 2).alias(
                "urgent_revenue"
            ),
            F.round(F.sum(revenue), 2).alias("total_revenue"),
            F.round(
                F.sum(F.when(urgent, revenue).otherwise(0.0)) / F.sum(revenue), 6
            ).alias("urgent_share"),
        )
        .orderBy("order_year")
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1"
) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery ("quantity below
    20% of this part's average"), written in its DECORRELATED form —
    pre-aggregate per partkey once, broadcast-join the thresholds back,
    filter. This is the plan Catalyst rewrites the correlated SQL into;
    stating it directly keeps the per-part scan single-pass."""
    thresholds = lineitem.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    brand_parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    return (
        lineitem.join(
            F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a large aggregation — orders whose
    total quantity exceeds the threshold, joined back to customer. The
    HAVING filter runs on the aggregate BEFORE the dimension joins, so
    only qualifying orders (rare) reach the join."""
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        big_orders.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.desc("total_qty"), "o_orderkey")
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_counts(events: DataFrame) -> DataFrame:
    """Pivot: one row per user, one column per event type. Explicit
    pivot values skip the extra distinct-values job AND make the output
    schema static — required at scale (and for SQL parity, where pivot
    is conditional aggregation)."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("user_id")
    )


def events_unpivot_counts(events: DataFrame) -> DataFrame:
    """Unpivot/melt the pivoted frame back to long form — the
    wide↔long roundtrip (rows with zero count dropped to match the
    original aggregation)."""
    wide = events_pivot_counts(events)
    return (
        wide.unpivot(
            "user_id", list(EVENT_TYPES), "event_type", "n_events"
        )
        .filter(F.col("n_events") > 0)
        .orderBy("user_id", "event_type")
    )


def events_rolling_avg(events: DataFrame, window_sec: int = 3600) -> DataFrame:
    """Per-user rolling mean of ``value`` over a trailing event-time
    range window (RANGE BETWEEN on epoch seconds — peers by time, not
    row count). Partitions by user → parallel at scale."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-window_sec, 0)
    )
    return (
        events.select(
            "user_id",
            "ts",
            "value",
            F.round(F.avg("value").over(w), 4).alias("rolling_avg"),
            F.count(F.lit(1)).over(w).alias("n_in_window"),
        )
        .orderBy("user_id", "ts")
    )


def events_json_extract(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: pull a typed field out of the JSON
    ``props`` column and aggregate on it (reference's JSON-document
    heritage, SURVEY §1.1, done columnar instead of row-at-a-time)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


def late_shipment_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: order counts per priority where EXISTS a
    late-shipped item (l_shipdate > o_orderdate + 30 days). The EXISTS
    is a left-semi join — no row multiplication, the item table never
    appears in the output, and the semi join build side carries only
    the join key after column pruning."""
    late = lineitem.select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(late, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def returned_item_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 20
) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top-k. Fact-fact join on orderkey, then broadcast of the customer
    dimension; deterministic top-k via (revenue desc, custkey)."""
    returned = lineitem.filter(F.col("l_returnflag") == "R")
    rev = (
        returned.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return (
        rev.join(F.broadcast(customer), rev["o_custkey"] == customer["c_custkey"])
        .select("c_custkey", "c_name", "c_acctbal", "revenue", "n_items")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def brand_supplier_counts(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, size band)
    for parts OUTSIDE an excluded brand — NOT-IN as an anti filter that
    stays in the scan, count(distinct) per group."""
    eligible = part.filter(~F.col("p_brand").isin("Brand#4", "Brand#5"))
    joined = lineitem.join(
        F.broadcast(eligible), F.col("l_partkey") == F.col("p_partkey")
    )
    size_band = (F.col("p_size") / 10).cast("int").alias("size_band")
    return (
        joined.groupBy("p_brand", size_band)
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "size_band")
    )


def banded_disjunctive_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate (brand ∧
    quantity-band ∧ size-band disjuncts). States the whole disjunction
    declaratively so Catalyst can push the common l_quantity bounds
    into the scan and evaluate the rest as one codegen'd filter."""
    joined = lineitem.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    disjunction = (
        ((br == "Brand#1") & q.between(1, 11) & sz.between(1, 5))
        | ((br == "Brand#2") & q.between(10, 20) & sz.between(1, 10))
        | ((br == "Brand#3") & q.between(20, 30) & sz.between(1, 15))
    )
    return joined.filter(disjunction).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def idle_rich_customers(
    customer: DataFrame, orders: DataFrame, premium: float = 300_000.0
) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive account
    balance but NO premium order (none above ``premium``) — scalar-
    subquery average + anti join, grouped by nation. The average is
    computed once (broadcast scalar); the NOT-EXISTS is a left-anti
    join whose price filter is pushed into the orders scan."""
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    rich = customer.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg")
    )
    premium_orders = orders.filter(F.col("o_totalprice") > premium)
    idle = rich.join(
        premium_orders, rich["c_custkey"] == premium_orders["o_custkey"], "left_anti"
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )
