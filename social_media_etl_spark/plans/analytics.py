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
    "full_outer_balance_bands",
    "events_value_histogram",
    "fuzzy_name_match",
    "customer_priority_profile",
    "nation_trade_volume",
    "market_share",
    "product_profit",
    "order_count_distribution",
    "top_supplier",
    "important_parts",
    "customer_value_deciles",
    "funnel_conversion",
    "ks_drift",
]


# -- exact money arithmetic (VERDICT r10 #3) --------------------------------
# Monetary sums certified against the oracle use DECIMAL operands:
# double sums are order-dependent (±noise ~ √n·ε·|S|), and one r10
# group landed 1.8e-4 cents from the round-half boundary, flipping the
# certified cent with accumulation order. The casts below use tight
# precisions chosen so BOTH Spark's and DuckDB's decimal result-type
# rules keep every product EXACT (scale-6 operands, products ≤ (30,18)
# → no scale adjustment under either engine's 38-digit cap); decimal
# sums are associative, so the rounded cent replays identically at any
# parallelism. Scale 6 (not 2) also keeps the cast itself effectively
# collision-free: the testdata's money columns carry sub-cent noise,
# and a cent-scale cast would let a single cross-engine cast
# disagreement shift a whole group's sum by 0.01.
_DEC_PRICE = "decimal(12,6)"  # prices / costs (< 1e6)
_DEC_FRAC = "decimal(7,6)"  # discounts / taxes in [0, 1)
_DEC_QTY = "decimal(8,6)"  # quantities (< 100)


def dec_price(name: str):
    return F.col(name).cast(_DEC_PRICE)


def dec_frac(name: str):
    return F.col(name).cast(_DEC_FRAC)


def dec_qty(name: str):
    return F.col(name).cast(_DEC_QTY)


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: big scan → 2-key groupBy → many aggregates.

    Whole-stage-codegen'd partial+final HashAggregate; the filter is
    pushed to the parquet scan (row-group stats on l_shipdate).
    """
    disc_price = dec_price("l_extendedprice") * (1 - dec_frac("l_discount"))
    charge = disc_price * (1 + dec_frac("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_before).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(dec_price("l_extendedprice")), 2)
            .cast("double")
            .alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
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
    disc_price = dec_price("l_extendedprice") * (1 - dec_frac("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc_price).otherwise(
        F.lit(0)
    )
    return (
        lineitem.filter(F.year("l_shipdate") == year)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            # the ratio divides the two EXACT decimal sums as doubles
            # (identical inputs → identical quotient on both engines);
            # decimal division would hit engine-specific scale rules
            F.round(
                100.0
                * F.sum(promo).cast("double")
                / F.sum(disc_price).cast("double"),
                4,
            ).alias("promo_share_pct"),
            F.round(F.sum(disc_price), 2).cast("double").alias("total_revenue"),
        )
    )


def priority_share_by_year(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Conditional-aggregation report: per order-year, the revenue
    share of urgent/high-priority orders (CASE WHEN inside the
    aggregate — one pass, no pivot, no second join)."""
    revenue = dec_price("l_extendedprice") * (1 - dec_frac("l_discount"))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    urgent_rev = F.sum(F.when(urgent, revenue).otherwise(F.lit(0)))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(urgent_rev, 2).cast("double").alias("urgent_revenue"),
            F.round(F.sum(revenue), 2).cast("double").alias("total_revenue"),
            # exact decimal sums divided as doubles (see promo share)
            F.round(
                urgent_rev.cast("double") / F.sum(revenue).cast("double"), 6
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


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — the supplier's nation on one side of each line item,
    the ordering customer's nation on the other.

    The nation dimension is joined twice under different aliases (the
    classic self-join-free double-dimension pattern); both copies and
    the customer/supplier dims broadcast, so the only big shuffle is
    lineitem⨝orders on orderkey. Filtering each nation copy to the two
    names BEFORE the join turns the pair predicate into two tiny
    broadcast hash joins instead of a post-join filter."""
    n1 = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_3",
    target_region: str = "EUROPE",
    part_type: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8 shape: the target nation's share of revenue for one
    part type sold into one region, by order year.

    share = conditional-sum / sum over the same rows — one aggregate
    pass, no second scan and no join back. The customer→nation→region
    chain restricts the market; the supplier→nation copy labels each
    row with the selling nation, and the share numerator is a CASE
    expression, the standard way to avoid a self-join for
    "fraction of total" questions."""
    mkt_nation = nation.select(
        F.col("n_nationkey").alias("mkt_nkey"), "n_regionkey"
    ).join(
        F.broadcast(region.filter(F.col("r_name") == target_region)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == part_type)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(mkt_nation), F.col("c_nationkey") == F.col("mkt_nkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("supp_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == target_nation, volume).otherwise(
                        0.0
                    )
                )
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_token: str = "widget",
    cost_factor: float = 0.6,
) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) for
    parts whose name contains a token.

    The testdata has no partsupp table, so unit cost is modeled as
    ``cost_factor * p_retailprice`` (deterministic, documented) — the
    plan shape is Q9's: a contains-filter on the part dimension that
    cannot be pushed to row-group stats but IS applied before the
    broadcast, a five-way join, and a two-key aggregate."""
    amount = dec_price("l_extendedprice") * (
        1 - dec_frac("l_discount")
    ) - F.lit(cost_factor).cast(_DEC_FRAC) * dec_price(
        "p_retailprice"
    ) * dec_qty("l_quantity")
    return (
        lineitem.join(
            F.broadcast(
                part.filter(F.col("p_name").contains(name_token)).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def order_count_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by how many qualifying
    orders they placed — INCLUDING zero-order customers.

    The zero bucket forces a left outer join (inner join would drop
    those customers); the priority exclusion lives in the join
    condition, not a WHERE, so excluded-only customers still appear
    with count 0. Two aggregates: per-customer count (shuffle on
    custkey), then the tiny histogram aggregate."""
    qualifying = orders.filter(F.col("o_orderpriority") != exclude_priority).select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(qualifying, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum revenue over
    a quarter — the CREATE VIEW + scalar-max-subquery query, ties kept.

    The revenue "view" is a DataFrame binding computed once; the max is
    a one-row aggregate cross-joined (broadcast) as a filter, so the
    view is evaluated a single time per branch and no window over the
    full table is needed."""
    in_window = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    )
    revenue = in_window.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def important_parts(
    lineitem: DataFrame, fraction: float = 0.0005
) -> DataFrame:
    """TPC-H Q11 shape: parts whose line-item value exceeds a fraction
    of GLOBAL value — a HAVING threshold that is itself a scalar
    subquery over the same fact table.

    Spark evaluates the per-part aggregate and the global aggregate as
    two branches of one scan (the global side is one row, broadcast
    into the filter); no partsupp table exists in the testdata so value
    is extended price, keeping Q11's group-vs-global plan shape."""
    value = F.round(F.sum("l_extendedprice"), 2).alias("part_value")
    per_part = lineitem.groupBy("l_partkey").agg(value)
    threshold = lineitem.agg(
        (F.sum("l_extendedprice") * F.lit(fraction)).alias("__threshold")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("__threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def full_outer_balance_bands(
    customer: DataFrame, supplier: DataFrame, band_width: float = 1000.0
) -> DataFrame:
    """Full outer join on a composite key with one-sided groups: per
    (nation, account-balance band), customer and supplier counts —
    bands present on only one side survive with a zero on the other.

    Both inputs aggregate BEFORE the join (tiny relations), so the
    full outer join — which cannot broadcast (both sides must retain
    unmatched rows) — runs over two already-reduced frames. Keys come
    back via coalesce, the full-outer idiom."""
    c = (
        customer.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.floor(F.col("c_acctbal") / band_width).cast("long").alias("band"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        supplier.groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.floor(F.col("s_acctbal") / band_width).cast("long").alias("band"),
        )
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, ["nationkey", "band"], "full_outer")
        .select(
            "nationkey",
            "band",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey", "band")
    )


def events_value_histogram(events: DataFrame, bin_width: float = 10.0) -> DataFrame:
    """Equi-width histogram of the event value distribution: one
    groupBy on the computed bin — the single-pass binning every
    profiler/monitoring pipeline runs; bins stay sorted by range, and
    min/max per bin expose boundary handling (floor semantics for
    negatives)."""
    b = F.floor(F.col("value") / bin_width).cast("long")
    return (
        events.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .withColumn("bin_lo", F.round(F.col("bin") * bin_width, 2))
        .select("bin", "bin_lo", "n_events", "min_value", "max_value")
        .orderBy("bin")
    )


def fuzzy_name_match(
    customer: DataFrame, supplier: DataFrame, max_dist: int = 1
) -> DataFrame:
    """Entity-resolution-style fuzzy join: candidate (customer,
    supplier) pairs whose entity ids (the numeric name suffix) are
    within ``max_dist`` Levenshtein edits, BLOCKED on nation.

    The scale shape of every fuzzy matcher: an expensive string metric
    never runs all-pairs — an equi-join on a blocking key (here
    nationkey) bounds the comparison set, the metric filters within
    blocks, and the small side broadcasts so the big side never
    shuffles. Aggregated to per-nation match counts."""
    c = customer.select(
        F.col("c_nationkey").alias("nationkey"),
        F.substring("c_name", 10, 9).alias("c_ent"),
    )
    s = supplier.select(
        F.col("s_nationkey").alias("nationkey"),
        F.substring("s_name", 10, 9).alias("s_ent"),
    )
    dist = F.levenshtein(F.col("c_ent"), F.col("s_ent"))
    return (
        c.join(F.broadcast(s), "nationkey")
        .filter(dist <= max_dist)
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((dist == 0).cast("long")).alias("n_exact"),
        )
        .orderBy("nationkey")
    )


def customer_priority_profile(orders: DataFrame) -> DataFrame:
    """Per-customer order-priority profile with a SORTED DISTINCT
    collected set rendered as a string: collection aggregates are only
    deterministic (and cross-engine comparable) once canonicalized —
    ``sort_array(collect_set(...))`` then join — the idiom for any
    array_agg that must be reproducible at any parallelism."""
    return (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.concat_ws(
                "|", F.sort_array(F.collect_set("o_orderpriority"))
            ).alias("priorities"),
        )
        .orderBy("custkey")
    )


def customer_value_deciles(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Distribution-analytics window pack: per-customer lifetime spend
    ranked with ntile / percent_rank / cume_dist in ONE window pass.

    All three functions share a single (global-order) window so Spark
    sorts once; spend ties are broken by custkey inside the window
    order to keep every rank function deterministic. The global window
    is a deliberate single-partition sort — the input is one row per
    customer (already aggregated), which is the one cardinality class
    where a global window is the right plan even at scale."""
    spend = (
        customer.select("c_custkey")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"))
    )
    w = Window.orderBy(F.desc("spend"), F.col("c_custkey"))
    return spend.select(
        "c_custkey",
        "spend",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("c_custkey")


def funnel_conversion(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-step funnel over an event stream: a user counts for step
    i only with a step-i event STRICTLY AFTER their first qualifying
    step-(i-1) event. Returns (step_no, step, n_users, conv_rate) —
    conv_rate is the fraction converted from the previous step.

    Plan shape: every per-step first-timestamp is a windowed min over
    the SAME user partition, so the chain of ``len(steps)`` window
    passes plus the per-user collapse all ride ONE shuffle on user_id;
    the final counts are a scalar aggregate exploded to ``len(steps)``
    rows. No joins, no second shuffle — at 100 TB the cost is the one
    user-keyed exchange the sessionization queries already pay."""
    w = Window.partitionBy(user_col)
    cur, prev = events, None
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"__s{i}"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
    per_user = cur.groupBy(user_col).agg(
        *[F.first(f"__s{i}").alias(f"s{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[F.count(f"s{i}").alias(f"n{i}") for i in range(len(steps))]
    )
    entries = [
        F.struct(
            F.lit(i + 1).cast("long").alias("step_no"),
            F.lit(s).alias("step"),
            F.col(f"n{i}").alias("n_users"),
            (
                F.when(
                    F.col(f"n{i-1}") > 0,
                    F.round(F.col(f"n{i}") / F.col(f"n{i-1}"), 6),
                )
                if i > 0
                else F.lit(None).cast("double")
            ).alias("conv_rate"),
        )
        for i, s in enumerate(steps)
    ]
    return (
        counts.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.step_no", "e.step", "e.n_users", "e.conv_rate")
        .orderBy("step_no")
    )


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the
    ``value_col`` distributions of two groups — the data-quality
    monitor for "did this feed's distribution move?".

    KS = max over values v of |F_a(v) − F_b(v)| needs a global
    cumulative count, but a single global-order window dies at 100 TB.
    This runs the TWO-LEVEL ECDF instead:

    1. values are range-bucketed (fixed-width over [min, max] — the
       bucket id is monotone in the value, so per-bucket order is
       global order);
    2. per-bucket per-group totals collapse to ``n_buckets`` rows
       whose cumulative offsets are a window over that TINY frame
       (the only single-partition step — bounded by n_buckets, never
       by data);
    3. within-bucket running counts are a window PARTITIONED by
       bucket — fully parallel;
    4. offset + running count = the exact global cumulative count at
       every distinct value; one scalar max finishes.

    Exactness: ECDF numerators/denominators are integers, so the
    statistic is bit-identical across engines and parallelism.
    Returns one row: (ks_stat, n_a, n_b).
    """
    vals = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    ).select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    rng = vals.agg(
        F.min("v").alias("__lo"), F.max("v").alias("__hi")
    )
    bucketed = vals.crossJoin(F.broadcast(rng)).withColumn(
        "__b",
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.least(
                F.floor(
                    (F.col("v") - F.col("__lo"))
                    / ((F.col("__hi") - F.col("__lo")) / n_buckets)
                ),
                F.lit(n_buckets - 1),
            )
        ),
    )
    per_value = bucketed.groupBy("__b", "v").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"),
    )
    bucket_totals = per_value.groupBy("__b").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_totals.select(
        "__b",
        F.coalesce(F.sum("ta").over(w_off), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("tb").over(w_off), F.lit(0)).alias("ob"),
    )
    w_run = (
        Window.partitionBy("__b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = per_value.select(
        "__b",
        "v",
        F.sum("ca").over(w_run).alias("ra"),
        F.sum("cb").over(w_run).alias("rb"),
    )
    totals = per_value.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    diffs = (
        running.join(F.broadcast(offsets), "__b")
        .crossJoin(F.broadcast(totals))
        .select(
            F.abs(
                (F.col("oa") + F.col("ra")) / F.col("na").cast("double")
                - (F.col("ob") + F.col("rb")) / F.col("nb").cast("double")
            ).alias("d"),
            "na",
            "nb",
        )
    )
    return diffs.agg(
        F.round(F.max("d"), 6).alias("ks_stat"),
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
    )
