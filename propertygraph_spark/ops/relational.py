"""Relational analytics over the TPC-H-ish testdata star schema + events.

These exercise the engine's relational shell — the operators SURVEY.md
§2.8 lists as "free Catalyst territory" — and double as the oracle-checked
headline queries: aggregation with map-side partials, broadcast vs shuffle
joins, window functions, sessionization, top-k (TakeOrderedAndProject).

Scale notes per query are in the docstrings; every small dimension
(region, nation, supplier, customer at these SFs) is broadcast explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 flavor: one wide scan, group on two low-cardinality keys.
    Fully partial-aggregated map-side; the shuffle carries ~8 rows."""
    li = _t(spark, sf_dir, "lineitem")
    # double sums rounded to cents: partial-agg summation order differs
    # from the oracle's sequential fold in the last float bits
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 flavor: customer (broadcast) x orders x lineitem, top-10 by
    revenue — TakeOrderedAndProject caps the driver-side result."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10))


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 flavor: five-way join; all dims broadcast, the only big
    shuffle is lineitem x orders."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dims = (nation.join(F.broadcast(region),
                        nation.n_regionkey == region.r_regionkey))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(cust),
                  (orders.o_custkey == cust.c_custkey)
                  & (cust.c_nationkey == supp.s_nationkey))
            .join(F.broadcast(dims), supp.s_nationkey == dims.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count("*").alias("n_items"))
            .orderBy(F.desc("revenue")))


def part_type_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window over aggregates: revenue share of each brand within its part
    type (two-level shuffle: groupBy then window repartition on p_type)."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    rev = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
           .groupBy("p_type", "p_brand")
           .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("brand_revenue")))
    w = Window.partitionBy("p_type")
    return (rev.withColumn(
        "share_pm",
        F.floor(F.col("brand_revenue") * 1000 / F.sum("brand_revenue").over(w))
        .cast("long"))
        .select("p_type", "p_brand", "share_pm")
        .orderBy("p_type", "p_brand"))


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 flavor via semi join: orders that have at least one
    lineitem shipped late. Left-semi avoids materializing the match."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


def events_minutely(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the events stream table (batch
    twin of streaming/events.py): per (minute, event_type) counts+sums."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.date_trunc("minute", "ts").alias("minute"),
                       "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.floor(F.sum("value") * 1000).cast("long")
                 .alias("sum_value_x1000"))
            .orderBy("minute", "event_type"))


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a session breaks after a >30 min gap per user.
    lag() + conditional sum over a per-user window — the standard
    shuffle-once pattern (single partitionBy(user_id) exchange feeds both
    windows thanks to matching partitioning)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic on TIMESTAMP_NTZ: session-timezone-independent
    # (an ltz hop would silently shift epochs under a non-UTC session)
    gap = F.col("ts") - F.lag("ts").over(w)
    with_break = ev.withColumn(
        "is_break",
        F.when(gap.isNull() | (gap > F.expr("INTERVAL 1800 SECONDS")), 1)
        .otherwise(0))
    sess = with_break.withColumn(
        "session_seq", F.sum("is_break").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"))
            .orderBy("user_id", "session_seq"))


def event_type_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type + overall share — exercises distinct
    aggregation (two-phase hash expand)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_users"),
                 F.count("*").alias("n_events"))
            .orderBy("event_type"))


def asof_view_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed as a single-shuffle window: for every 'click'
    event, the user's most recent 'view' value at or before the click.

    Spark has no ASOF JOIN operator; the classic scalable formulation is
    union-the-streams + per-key ordered window with last(..., ignorenulls)
    — ONE hashpartitioning(user_id) exchange, no range join explosion.
    (DuckDB's native ASOF JOIN is the oracle twin.)

    ASOF matches view_ts <= click_ts INCLUSIVE, so a view sharing the
    click's timestamp must sort BEFORE the click in the window: order by
    (ts, view-first flag, event_id) — (ts, event_id) alone would hide an
    equal-ts view whose event_id exceeds the click's."""
    ev = _t(spark, sf_dir, "events")
    view_first = F.when(F.col("event_type") == "view", 0).otherwise(1)
    w = (Window.partitionBy("user_id").orderBy("ts", view_first, "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    view_val = F.when(F.col("event_type") == "view", F.col("value"))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    out = (ev.withColumn("last_view_value",
                         F.last(view_val, ignorenulls=True).over(w))
           .withColumn("last_view_ts",
                       F.last(view_ts, ignorenulls=True).over(w))
           .filter(F.col("event_type") == "click")
           .select("event_id", "user_id", "ts",
                   F.col("value").alias("click_value"),
                   "last_view_value", "last_view_ts"))
    return out.orderBy("event_id")


def revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 flavor: pure filter + global aggregate — the canonical
    pushdown showcase (every predicate reaches the parquet scan; the
    'shuffle' carries one partial row per partition)."""
    li = _t(spark, sf_dir, "lineitem")
    out = (li.filter((F.col("l_discount") >= 0.05)
                     & (F.col("l_discount") <= 0.07)
                     & (F.col("l_quantity") < 24))
           .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")),
                        2).alias("revenue"),
                F.count("*").alias("n_items")))
    return out


def priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 flavor: conditional aggregation — counts of high/low
    priority orders per return flag (CASE inside SUM, single shuffle)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1) \
            .otherwise(0)
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.sum(high).alias("high_priority_count"),
                 F.sum(1 - high).alias("low_priority_count"))
            .orderBy("l_returnflag"))


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 flavor: revenue flows between two nations per ship year.
    Both nation legs broadcast; the only big shuffle is lineitem x orders
    (the same join every order-grain query rides)."""
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
            .filter(((F.col("supp_nation") == "NATION_0")
                     & (F.col("cust_nation") == "NATION_1"))
                    | ((F.col("supp_nation") == "NATION_1")
                       & (F.col("cust_nation") == "NATION_0")))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count("*").alias("n_items"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 flavor: top-20 customers by revenue lost to returns in
    1997 — grouped join + TakeOrderedAndProject."""
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders") \
        .filter((F.col("o_orderdate") >= F.lit("1997-01-01"))
                & (F.col("o_orderdate") < F.lit("1998-01-01")))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 flavor: promo vs total revenue for one ship month —
    conditional aggregation over a broadcast part join. Components are
    reported as rounded sums (the cross-engine-stable form; a floored
    double ratio could flip on the last ulp)."""
    part = _t(spark, sf_dir, "part")
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate") >= F.lit("1997-09-01"))
                  & (F.col("l_shipdate") < F.lit("1997-10-01"))))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .agg(F.round(F.sum(promo), 2).alias("promo_revenue"),
                 F.round(F.sum(rev), 2).alias("total_revenue"),
                 F.count("*").alias("n_items")))


def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 flavor: disjunctive multi-attribute predicates across the
    part join — the plan must stay an equi-join on partkey with the OR
    block as a post-join filter (no cartesian)."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10))
         & (F.col("l_quantity").between(1, 15)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(11, 25))
           & (F.col("l_quantity").between(10, 25)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(26, 50))
           & (F.col("l_quantity").between(20, 35))))
    return (j.filter(cond)
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count("*").alias("n_items")))


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 flavor: customers with above-average (cent-rounded)
    positive balance and NO orders since 2000 — scalar-subquery threshold
    + left-anti join against the recent-order set, grouped by market
    segment (every testdata customer has SOME order, so the classic
    no-orders-ever predicate would be vacuous)."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders") \
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    # cent-rounded threshold: a last-ulp cross-engine difference in the
    # raw avg cannot move the comparison
    threshold = (cust.filter(F.col("c_acctbal") > 0)
                 .agg(F.round(F.avg("c_acctbal"), 2).alias("t"))
                 .collect()[0]["t"])
    return (cust.filter(F.col("c_acctbal") > threshold)
            .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"))
            .orderBy("c_mktsegment"))


def events_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the hour level is computed
    FROM the minute level (not from raw rows) — the rollup-reuse pattern
    of time-series stores. Minute partials carry integer-scaled sums, so
    the second-level aggregation is exact integer arithmetic (and the
    oracle mirrors the same two-level computation)."""
    minute = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value") * 1000).cast("long")
             .alias("sum_value_x1000")))
    return (minute
            .groupBy(F.date_trunc("hour", "minute").alias("hour"))
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_value_x1000").alias("sum_value_x1000"),
                 F.count("*").alias("n_minutes"))
            .orderBy("hour"))


def events_range_join(spark: SparkSession, sf_dir: str,
                      window_sec: int = 60) -> DataFrame:
    """Range join: pairs of same-user events within window_sec of each
    other. The scalable formulation bands timestamps into window-sized
    bins and joins on (user, bin±1) before the exact filter — candidate
    count is O(events x density), never the O(n^2) cross join a naive
    inequality join plans. timestampdiff on TIMESTAMP_NTZ keeps the
    arithmetic session-timezone-independent."""
    # whole-second timestamps before diffing: engines disagree on
    # sub-second diff semantics (elapsed-truncation vs boundary count)
    ev = (_t(spark, sf_dir, "events")
          .select("event_id", F.date_trunc("second", "ts").alias("ts"),
                  "user_id"))
    # bin width = window_sec (NOT a fixed minute): floor(x+1) = floor(x)+1
    # guarantees |ts_a - ts_b| <= window_sec  =>  |bin_a - bin_b| <= 1 for
    # ANY window_sec, so bin±1 candidates are complete. Epoch seconds come
    # from pure NTZ arithmetic against an NTZ literal — never a
    # session-timezone-dependent ltz/unix hop.
    sec = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    binned = ev.withColumn("bin", F.floor(sec / F.lit(window_sec)))
    # The bin MUST be an equi-join key, not a post-match predicate: a
    # user_id-only join materializes every same-user pair (O(n_user^2)
    # per user — one never-finishing join group for a 10^6-event user at
    # corpus scale) and filters after the fact. Instead explode the probe
    # side to its three candidate bins and equi-join on (user_id, bin).
    # The exploded values {bin-1, bin, bin+1} are pairwise distinct and
    # the build side's bin is a single value, so each candidate pair
    # matches EXACTLY once — no double-count, no dedup pass needed.
    a = (binned
         .withColumn("bin", F.explode(F.array(
             F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)))
         .alias("a"))
    b = binned.alias("b")
    diff = F.expr("timestampdiff(SECOND, a.ts, b.ts)")
    return (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                   & (F.col("a.bin") == F.col("b.bin"))
                   & (F.col("a.event_id") < F.col("b.event_id")))
            .withColumn("gap_sec", diff)
            .filter(F.abs(F.col("gap_sec")) <= window_sec)
            .select(F.col("a.user_id").alias("user_id"),
                    F.col("a.event_id").alias("event_a"),
                    F.col("b.event_id").alias("event_b"),
                    F.col("gap_sec").cast("long").alias("gap_sec")))


def nation_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 flavor (no partsupp table in this corpus, so revenue
    stands in for profit): revenue per supplier nation per order year.
    Dims broadcast; the one big shuffle is lineitem x orders."""
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # per-ITEM integer scaling (not round(sum, 2)): each item's revenue
    # double is bit-identical on both engines, so its rounding is too,
    # and the integer sum is then exact in ANY aggregation order — a
    # round(sum) would sit one ulp from a boundary when partial-agg
    # order differs (observed at sf0.001: ...590.075 flipping .07/.08)
    rev_item = F.round((F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))) * 10000).cast("long")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nation),
                  supp.s_nationkey == nation.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(rev_item).alias("revenue_x10000"),
                 F.count("*").alias("n_items"))
            .orderBy("nation", "o_year"))


def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 flavor: distribution of per-customer order counts,
    INCLUDING zero-order customers (left join; count(o_orderkey) counts
    matches only). The priority filter stands in for Q13's comment
    exclusion."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders") \
        .filter(F.col("o_orderpriority") != "1-URGENT")
    counts = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
              .groupBy("c_custkey")
              .agg(F.count("o_orderkey").alias("c_count")))
    return (counts.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


def supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 flavor: distinct suppliers per (brand, type, size) over
    the observed lineitem part-supplier pairs (no partsupp table),
    excluding negative-balance suppliers via LEFT ANTI join (the NOT IN
    complaints-subquery stand-in)."""
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (pairs.join(F.broadcast(part),
                       pairs.l_partkey == part.p_partkey)
            .filter(F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
            .join(F.broadcast(bad),
                  pairs.l_suppkey == bad.s_suppkey, "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


def large_quantity_orders(spark: SparkSession, sf_dir: str,
                          min_qty: int = 150) -> DataFrame:
    """TPC-H Q18 flavor: orders whose total quantity exceeds min_qty —
    the HAVING subquery becomes a pre-aggregated semi side joined back to
    orders/customer; TakeOrdered caps the result. Quantities are integral
    doubles, so the sum is exact in any order (cast to long)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.round(F.sum("l_quantity")).cast("long").alias("total_qty"))
           .filter(F.col("total_qty") > min_qty))
    return (big.join(orders, big.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .select("c_name", "c_custkey", "o_orderkey",
                    F.col("o_totalprice"), "total_qty")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(100))


def important_part_values(spark: SparkSession, sf_dir: str,
                          threshold_ppm: int = 1000) -> DataFrame:
    """TPC-H Q11 flavor (no partsupp: lineitem revenue stands in for
    stock value): parts whose revenue exceeds threshold_ppm parts-per-
    million of the corpus total. Values are integer CENTS (round(x*100))
    so the scalar threshold comparison is exact-integer on both engines —
    a floored double share could flip on the last ulp."""
    li = _t(spark, sf_dir, "lineitem")
    # per-item cent rounding BEFORE the sum: identical per-item doubles
    # round identically on both engines; the integer sum is then exact
    # in any aggregation order (round-after-sum flips on ulp boundaries)
    rev_item = F.round((F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))) * 100).cast("long")
    per_part = (li.groupBy("l_partkey")
                .agg(F.sum(rev_item).alias("value_cents")))
    total = per_part.agg(F.sum("value_cents").alias("t")) \
                    .collect()[0]["t"] or 0
    cutoff = total * threshold_ppm // 1_000_000
    return (per_part.filter(F.col("value_cents") > cutoff)
            .orderBy(F.desc("value_cents"), F.asc("l_partkey")))


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of value per event_type — EXACT percentile with
    linear interpolation (identical definition in DuckDB quantile_cont),
    reported in integer millis so cross-engine float tails can't flip
    the hash. Exact percentiles shuffle each group's values once; at
    corpus scale the approx path is approx_percentile (same plan shape,
    no oracle twin — deliberately not the checked query)."""
    ev = _t(spark, sf_dir, "events")
    pcts = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9),
                                         F.lit(0.99)))
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.floor(F.element_at(pcts, 1) * 1000).cast("long")
                 .alias("p50_milli"),
                 F.floor(F.element_at(pcts, 2) * 1000).cast("long")
                 .alias("p90_milli"),
                 F.floor(F.element_at(pcts, 3) * 1000).cast("long")
                 .alias("p99_milli"))
            .orderBy("event_type"))


def event_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user sketch per event_type: Flajolet-Martin style with
    md5 — estimate = 2^(1 + max leading-zero-bits of md5(user_id)) —
    computed DETERMINISTICALLY so the DuckDB twin matches bit-for-bit
    (unlike HLL/approx_count_distinct whose registers are
    implementation-defined). One max-aggregation per group — the sketch
    costs O(1) state per (event_type) at any scale; the exact distinct
    count is reported alongside as the quality reference (itself a
    shuffle — the thing the sketch avoids at 10^12 rows)."""
    ev = _t(spark, sf_dir, "events")
    # 48-bit hash: first 12 hex chars of md5. 48 bits fits a signed long
    # (no ANSI overflow). significant_bits is computed with EXACT integer
    # arithmetic — a sum of 48 threshold indicators (hl >= 2^i) — because
    # floor(log2(hl)) in floating point is not guaranteed correctly
    # rounded across engines (JVM vs libm; ADVICE r3): a value within an
    # ulp of a power of two could flip the floor.
    h_long = F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                                1, 12), 16, 10).cast("long")
    d = ev.select("event_type", h_long.alias("hl"), "user_id")
    sig_bits = sum((F.col("hl") >= F.lit(1 << i)).cast("int")
                   for i in range(48))
    per = d.withColumn("lead_zeros", (F.lit(48) - sig_bits).cast("long"))
    return (per.groupBy("event_type")
            .agg(F.max("lead_zeros").alias("max_lead_zeros"),
                 F.countDistinct("user_id").alias("exact_distinct"))
            .withColumn(
                "fm_estimate",
                F.expr("shiftleft(1L, cast(max_lead_zeros + 1 as int))")
                .cast("long"))
            .select("event_type", "max_lead_zeros", "fm_estimate",
                    "exact_distinct")
            .orderBy("event_type"))


def nation_market_share(spark: SparkSession, sf_dir: str,
                        target_nation: str = "NATION_7",
                        p_type: str = "PROMO") -> DataFrame:
    """TPC-H Q8 flavor: the target supplier-nation's per-mille share of
    yearly revenue for one part type. Dims broadcast; revenue is summed
    as per-ITEM integer cents (the q9/q11 pattern) so the share ratio is
    exact-integer on both engines. One big shuffle (lineitem x orders);
    the year x nation rollup then fits a second tiny agg."""
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == p_type)
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev_item = F.round((F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))) * 100).cast("long")
    per = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
           .join(orders, li.l_orderkey == orders.o_orderkey)
           .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
           .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
           .groupBy(F.year("o_orderdate").alias("o_year"))
           .agg(F.sum(rev_item).alias("total_cents"),
                F.sum(F.when(F.col("n_name") == target_nation, rev_item)
                      .otherwise(F.lit(0))).alias("target_cents")))
    return (per.select(
        "o_year", "total_cents", "target_cents",
        F.floor(F.col("target_cents") * 1000 / F.col("total_cents"))
        .cast("long").alias("share_pm"))
        .orderBy("o_year"))


def top_revenue_suppliers(spark: SparkSession, sf_dir: str,
                          start: str = "1996-01-01",
                          end: str = "1996-04-01") -> DataFrame:
    """TPC-H Q15 flavor: supplier(s) achieving the MAX quarterly revenue
    (the view + scalar-subquery pair becomes agg -> scalar -> filter).
    Integer-cent revenue makes the max comparison exact; the scalar max
    is collected driver-side (one long — the q11 fast-path pattern)."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    rev_item = F.round((F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))) * 100).cast("long")
    per = (li.filter((F.col("l_shipdate") >= F.lit(start))
                     & (F.col("l_shipdate") < F.lit(end)))
           .groupBy("l_suppkey")
           .agg(F.sum(rev_item).alias("total_revenue_cents")))
    best = per.agg(F.max("total_revenue_cents").alias("m")) \
              .collect()[0]["m"] or 0
    return (per.filter(F.col("total_revenue_cents") == best)
            .join(F.broadcast(supp), per.l_suppkey == supp.s_suppkey)
            .select(F.col("s_suppkey"), F.col("s_name"),
                    "total_revenue_cents")
            .orderBy("s_suppkey"))


def small_quantity_revenue(spark: SparkSession, sf_dir: str,
                           brand: str = "Brand#3") -> DataFrame:
    """TPC-H Q17 flavor: revenue locked in small-quantity orders of one
    brand — items whose quantity is below 20% of their part's average.
    The correlated avg subquery becomes a per-part agg joined back.
    Quantities are integral doubles, so the 20% test is EXACT integer
    arithmetic: 5 * qty * n_items < sum_qty (no double avg compare)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    li = _t(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    stats = (branded.groupBy(F.col("l_partkey").alias("sp_partkey"))
             .agg(F.round(F.sum("l_quantity")).cast("long").alias("sum_qty"),
                  F.count("*").alias("n_items")))
    rev_item = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (branded.join(stats, branded.l_partkey == stats.sp_partkey)
            .filter(F.round(F.col("l_quantity") * 5).cast("long")
                    * F.col("n_items") < F.col("sum_qty"))
            .groupBy()
            .agg(F.sum(rev_item).alias("small_qty_revenue_cents"),
                 F.count("*").alias("n_small_items")))


def last_shipper_suppliers(spark: SparkSession, sf_dir: str,
                           top_n: int = 20) -> DataFrame:
    """TPC-H Q21 flavor (no receipt/commit dates in this corpus): in
    every MULTI-supplier order, find the sole supplier whose latest
    shipment is the order's latest shipment — the one who kept the
    order waiting (q21's exists / not-exists pair becomes two window
    comparisons over one shuffle on l_orderkey). A supplier counts for
    an order only when NO other supplier ties the max ship date."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    per_os = (li.groupBy("l_orderkey", "l_suppkey")
              .agg(F.max("l_shipdate").alias("s_last")))
    w = Window.partitionBy("l_orderkey")
    flagged = (per_os
               .withColumn("n_supp", F.count("*").over(w))
               .withColumn("o_last", F.max("s_last").over(w))
               .withColumn("n_last", F.sum(
                   (F.col("s_last") == F.col("o_last")).cast("int")).over(w)))
    lone_last = flagged.filter(
        (F.col("n_supp") > 1) & (F.col("n_last") == 1)
        & (F.col("s_last") == F.col("o_last")))
    return (lone_last.join(F.broadcast(supp),
                           lone_last.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(top_n))


def min_cost_supplier(spark: SparkSession, sf_dir: str,
                      region: str = "ASIA", p_size: int = 10,
                      top_n: int = 100) -> DataFrame:
    """TPC-H Q2 flavor (no partsupp in this corpus): the cheapest
    supplier(s) for every part of one size sold out of one region, where
    "supply cost" is the best unit price the supplier ever charged —
    min(extendedprice / quantity) over lineitem, floored to integer
    cents so the min/equality compares are exact on both engines.

    Q2's correlated min subquery becomes one (part, supplier) agg and a
    per-part window min: two shuffles on l_partkey, dims broadcast.
    Scale: the agg collapses lineitem to (part x supplier-in-region)
    rows before the window; no driver collect."""
    region_df = _t(spark, sf_dir, "region").filter(F.col("r_name") == region)
    nation = _t(spark, sf_dir, "nation")
    supp = (_t(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region_df),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == p_size) \
        .select("p_partkey", "p_name")
    li = _t(spark, sf_dir, "lineitem")
    unit_cents = F.floor(F.col("l_extendedprice") / F.col("l_quantity")
                         * 100).cast("long")
    costs = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
             .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
             .groupBy("p_partkey", "p_name", "s_suppkey", "s_name",
                      "s_acctbal", "n_name")
             .agg(F.min(unit_cents).alias("cost_cents")))
    w = Window.partitionBy("p_partkey")
    return (costs.withColumn("best", F.min("cost_cents").over(w))
            .filter(F.col("cost_cents") == F.col("best"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "p_name", "cost_cents")
            .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
                     F.asc("p_partkey"))
            .limit(top_n))


def dominant_part_suppliers(spark: SparkSession, sf_dir: str,
                            name_prefix: str = "small ",
                            year: int = 1995) -> DataFrame:
    """TPC-H Q20 flavor (availqty has no twin here): suppliers holding a
    DOMINANT share of some filtered part's shipped volume in one year —
    strictly more than half: 2 * supplier_qty > part_total_qty, exact
    integer arithmetic on rounded quantities (Q20's half-of-demand
    threshold against availqty, re-expressed over shipments).

    One shuffle on (l_partkey) for the per-(part, supplier) agg; the
    part-total is a window over the SAME key so AQE coalesces both into
    one exchange; supplier/nation broadcast for the name rollup."""
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part") \
        .filter(F.col("p_name").startswith(name_prefix)) \
        .select("p_partkey")
    li = _t(spark, sf_dir, "lineitem") \
        .filter(F.year("l_shipdate") == year)
    qty = F.round(F.col("l_quantity")).cast("long")
    per = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
           .groupBy("l_partkey", "l_suppkey")
           .agg(F.sum(qty).alias("supp_qty")))
    w = Window.partitionBy("l_partkey")
    dominant = (per.withColumn("part_qty", F.sum("supp_qty").over(w))
                .filter(F.col("supp_qty") * 2 > F.col("part_qty")))
    return (dominant.groupBy("l_suppkey")
            .agg(F.count("*").alias("n_dominated_parts"),
                 F.sum("supp_qty").alias("dominated_qty"))
            .join(F.broadcast(supp),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_name", "n_name", "n_dominated_parts",
                    "dominated_qty")
            .orderBy("s_name"))


def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: of the users active in week w, how many were
    active again in week w+1 (the growth-analytics staple). One distinct
    agg to (user, week), then a self-equi-join on (user, week+7d) —
    hashes on user_id both sides, so the join co-partitions with the
    agg and no pair blowup is possible (rows are distinct by key).
    Week boundaries via date_trunc('week') — NTZ arithmetic, session-TZ
    independent."""
    ev = _t(spark, sf_dir, "events")
    uw = (ev.select("user_id",
                    F.date_trunc("week", "ts").alias("week"))
          .distinct())
    nxt = uw.select("user_id",
                    (F.col("week") - F.expr("INTERVAL 7 DAYS"))
                    .alias("week"))
    return (uw.join(nxt.withColumn("retained", F.lit(1)),
                    ["user_id", "week"], "left")
            .groupBy("week")
            .agg(F.count("*").alias("n_active"),
                 F.sum(F.coalesce(F.col("retained"), F.lit(0)))
                 .alias("n_retained_next_week"))
            .orderBy("week"))


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload analytics: the events table carries a
    JSON string column (`props`) — parse it JVM-side with
    ``get_json_object`` (whole-stage codegen, no Python) and aggregate
    the extracted integer field per event type. The standard pattern
    for log/telemetry payloads: schema-on-read extraction feeding exact
    integer aggregates (count / distinct / sum / min / max).

    Scale shape: extraction is map-only; one groupBy over a bounded
    key space with map-side partials; countDistinct rewrites to a
    two-phase expand+agg, still one logical shuffle chain."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.withColumn("k", k)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("k").alias("n_distinct_k"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"))
            .orderBy("event_type"))


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream bigram mining: (event_type -> next event_type)
    transition counts over each user's timeline — the input to a Markov
    navigation model. lead() over ONE (user_id) exchange with a total
    order (ts, event_id) so ties are deterministic; the bigram count
    aggregates with map-side partials on a tiny (type, type) key space.
    A user's timeline stays within one partition's window frame — no
    per-user materialization beyond the sort."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.withColumn("next_type", F.lead("event_type").over(w))
            .filter(F.col("next_type").isNotNull())
            .groupBy("event_type", "next_type")
            .agg(F.count("*").alias("n_transitions"))
            .orderBy("event_type", "next_type"))


def events_rolling_sum(spark: SparkSession, sf_dir: str,
                       window_s: int = 600) -> DataFrame:
    """Per-user rolling 10-minute aggregate over event time — the
    time-RANGE window frame (`rangeBetween(-window_s, 0)` over epoch
    seconds), as opposed to the ROWS frames used elsewhere: every event
    sees the sum/count of its user's events in the trailing window,
    ties on the timestamp included frame-wide by RANGE semantics (so
    the result is deterministic without a row tie-break).

    Epoch seconds come from pure NTZ arithmetic against an NTZ literal
    (the events_range_join recipe, relational.py:365) — never a
    session-timezone-dependent ltz/unix hop, so the frame is TZ-proof
    by construction. Truncation to whole seconds gives frame boundaries
    1 s resolution (the SQL twin floors epoch() to match). Per-item
    integer scaling (round(value*1000) per row, then integer window
    sums) keeps the values bit-identical cross-engine.

    Scale shape: ONE hashpartitioning(user_id) exchange feeds the
    window; per-user frames are bounded by the user's event rate x
    window seconds, never the corpus."""
    ev = _t(spark, sf_dir, "events")
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ "
                 "'1970-01-01 00:00:00', date_trunc('second', ts))")
    w = (Window.partitionBy("user_id")
         .orderBy(sec)
         .rangeBetween(-window_s, 0))
    v1000 = F.round(F.col("value") * 1000).cast("long")
    return (ev.withColumn("v1000", v1000)
            .select("user_id", "event_id", "ts",
                    F.count("*").over(w).alias("n_in_window"),
                    F.sum("v1000").over(w).alias("win_sum_x1000"))
            .orderBy("user_id", "event_id"))


def events_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins compaction (the CDC / SCD-type-1 upsert every
    lakehouse ingestion pipeline runs): collapse the event stream to one
    row per (user_id, event_type) carrying the LAST event — latest by
    event time, event_id as the total-order tiebreak — plus the group's
    event count.

    One shuffle, one pass: max_by against a zero-padded
    '<epoch-sec>|<event_id>' string key (fixed width, so lexicographic
    order == (sec, id) numeric order; event_id is unique, so the key is
    tie-free and max_by is deterministic). No window, no sort — the
    groupBy does map-side partial max_by, so a 10^12-event log reduces
    to |users x types| rows with one exchange. Epoch seconds via pure
    NTZ arithmetic (TZ-proof, the events_rolling_sum recipe); value
    scaled to integer x1000 for cross-engine equality."""
    ev = _t(spark, sf_dir, "events")
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ "
                 "'1970-01-01 00:00:00', date_trunc('second', ts))")
    key = F.format_string("%020d|%020d", sec, F.col("event_id"))
    v1000 = F.round(F.col("value") * 1000).cast("long")
    return (ev.select("user_id", "event_type", "event_id",
                      sec.alias("sec"), v1000.alias("v1000"),
                      key.alias("o"))
            .groupBy("user_id", "event_type")
            .agg(F.max_by("event_id", F.col("o")).alias("last_event_id"),
                 F.max_by("sec", F.col("o")).alias("last_sec"),
                 F.max_by("v1000", F.col("o")).alias("last_value_x1000"),
                 F.count("*").alias("n_events")))


def top_events_per_user(spark: SparkSession, sf_dir: str,
                        k: int = 3, pre_partitions: int = 32) -> DataFrame:
    """Per-user top-k events by value (grouped top-k), TWO-PHASE so a
    mega-user never funnels through one sort task (the sample_balanced
    pattern): phase 1 ranks within (user_id, hash-sub-partition) and
    keeps k per sub-group — each sub-group is a bounded share of the
    user's events; phase 2 ranks the surviving pre_partitions x k rows
    per user (tiny). Winners are identical: the user's global top-k are
    each top-k within their own sub-partition. Deterministic tie-break
    on event_id."""
    ev = _t(spark, sf_dir, "events")
    sub = F.pmod(F.xxhash64("event_id"), F.lit(pre_partitions))
    w1 = Window.partitionBy("user_id", "sub").orderBy(F.desc("value"),
                                                      F.asc("event_id"))
    pre = (ev.withColumn("sub", sub)
           .withColumn("prk", F.row_number().over(w1))
           .filter(F.col("prk") <= k))
    w2 = Window.partitionBy("user_id").orderBy(F.desc("value"),
                                               F.asc("event_id"))
    return (pre.withColumn("rk", F.row_number().over(w2).cast("long"))
            .filter(F.col("rk") <= k)
            .select("user_id", "rk", "event_id", "event_type", "value")
            .orderBy("user_id", "rk"))


def events_anomaly(spark: SparkSession, sf_dir: str, window: int = 30,
                   z: int = 3, min_n: int = 10) -> DataFrame:
    """Rolling z-score anomaly flags over each event type's minutely
    count series — the standard ops-monitoring screen, made exactly
    engine-portable by clearing the z-test of all denominators: with
    s = sum and q = sum-of-squares over the trailing ``window`` minutes
    (n rows), the count x is anomalous iff

        (n*x - s)^2  >  z^2 * (n*q - s^2)    and    n >= min_n

    which is (x - mean)^2 > z^2 * variance in pure BIGINT — no
    division, no sqrt, no floats, so Spark and DuckDB agree
    bit-for-bit. date_trunc minutes are NTZ (TZ-proof).

    Scale shape: one map-side-combined minutely pre-agg, then ONE
    hashpartitioning(event_type) exchange feeds the ROWS frame; the
    per-type series is bounded by wall-clock minutes, never by event
    volume, so frames stay small at any corpus size."""
    ev = _t(spark, sf_dir, "events")
    minutely = (ev.groupBy("event_type",
                           F.date_trunc("minute", "ts").alias("minute"))
                .agg(F.count("*").cast("long").alias("cnt")))
    w = (Window.partitionBy("event_type").orderBy("minute")
         .rowsBetween(-window, -1))
    n = F.count("*").over(w).cast("long")
    s = F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    q = F.coalesce(F.sum(F.col("cnt") * F.col("cnt")).over(w),
                   F.lit(0)).cast("long")
    x = F.col("cnt")
    lhs = (n * x - s) * (n * x - s)
    rhs = F.lit(z * z).cast("long") * (n * q - s * s)
    return (minutely.select(
        "event_type", "minute", "cnt", n.alias("n_prior"),
        ((n >= min_n) & (lhs > rhs)).alias("is_anomaly"))
        .orderBy("event_type", "minute"))


def bloom_semijoin(spark: SparkSession, sf_dir: str, m_bits: int = 1024,
                   k: int = 3) -> DataFrame:
    """Bloom-filter semi-join pruning — THE shuffle-avoidance sketch for
    100 TB joins: instead of shuffling the probe side against the build
    side, a tiny m-bit Bloom filter of the build keys broadcasts to
    every probe task and filters locally; only survivors shuffle. Build:
    distinct orders.o_custkey -> k md5-derived bit positions -> an
    m_bits/64-row (word, bits) table via bit_or (16 rows at the
    default — broadcast is bytes). Probe: customer.c_custkey tests all
    k bits via k broadcast word-lookups. Returns ONE accuracy row
    (n_probed, n_bloom_pass, n_true_match, n_false_pos): Bloom filters
    have NO false negatives (every true key passes by construction) and
    a false-positive rate set by m/n and k — the row quantifies the
    pruning quality a planner would get.

    Everything is md5 + integer bit arithmetic — a pure function of the
    keys, so the DuckDB oracle reproduces membership exactly (as
    position-set containment, no bit words needed)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")

    def positions(key_col):
        return [
            F.pmod(
                F.conv(F.substring(
                    F.md5(F.concat(F.lit(f"bloom{i}:"),
                                   key_col.cast("string"))), 1, 12),
                    16, 10).cast("long"),
                F.lit(m_bits)).cast("long")
            for i in range(k)]

    build = orders.select(F.col("o_custkey").alias("key")).distinct()
    words = (build
             .select(F.explode(F.array(*positions(F.col("key"))))
                     .alias("pos"))
             .select(F.floor(F.col("pos") / 64).cast("long").alias("word"),
                     F.pmod(F.col("pos"), F.lit(64)).cast("int")
                     .alias("bit"))
             .groupBy("word")
             .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
                  .alias("bits")))
    p = cust.select(F.col("c_custkey").alias("key"))
    pps = positions(F.col("key"))
    for i in range(k):
        p = (p.withColumn(f"w{i}", F.floor(pps[i] / 64).cast("long"))
             .withColumn(f"b{i}", F.pmod(pps[i], F.lit(64)).cast("int")))
    for i in range(k):
        wt = words.select(F.col("word").alias(f"w{i}"),
                          F.col("bits").alias(f"bits{i}"))
        p = p.join(F.broadcast(wt), f"w{i}", "left")
    hit = F.lit(True)
    for i in range(k):
        hit = hit & F.col(f"bits{i}").isNotNull() & \
            F.expr(f"(bits{i} & shiftleft(CAST(1 AS BIGINT), b{i})) != 0")
    truth = build.withColumn("is_true", F.lit(True))
    res = (p.withColumn("bloom_pass", hit)
           .join(truth, "key", "left")
           .agg(F.count("*").alias("n_probed"),
                F.sum(F.col("bloom_pass").cast("long"))
                .alias("n_bloom_pass"),
                F.sum(F.coalesce(F.col("is_true"), F.lit(False))
                      .cast("long")).alias("n_true_match"),
                F.sum((F.col("bloom_pass")
                       & F.col("is_true").isNull()).cast("long"))
                .alias("n_false_pos")))
    return res


def hll_registers(events: DataFrame, m: int = 64) -> DataFrame:
    """The HLL register table (event_type, reg, mx) shared by the batch
    estimator (event_user_hll below) and its streaming twin
    (streaming/events.streaming_user_hll_registers): register = low 6
    md5 bits, rank = 42-bit leading zeros + 1 via the exact integer
    threshold ladder (see event_user_sketch for why not floor(log2)).
    A pure select + one max-aggregation, so the identical code path is
    a valid streaming aggregation: state = m rows per event_type, the
    mergeable sketch property doing its job."""
    h_long = F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                                1, 12), 16, 10).cast("long")
    d = events.select("event_type", h_long.alias("hl"))
    d = d.withColumn("reg", (F.col("hl") % m).cast("long")) \
         .withColumn("v", F.expr(f"hl div {m}"))
    sig_bits = sum((F.col("v") >= F.lit(1 << i)).cast("int")
                   for i in range(42))
    return (d.withColumn("rank", (F.lit(43) - sig_bits).cast("long"))
            .groupBy("event_type", "reg")
            .agg(F.max("rank").alias("mx")))


def event_user_hll(spark: SparkSession, sf_dir: str,
                   m: int = 64) -> DataFrame:
    """Distinct-user HyperLogLog per event_type (Flajolet et al. 2007)
    with m = 64 registers — the multi-register upgrade of
    event_user_sketch above (stochastic averaging cuts the FM sketch's
    variance by ~1/sqrt(m)).

    Registers are derived DETERMINISTICALLY from md5 (unlike
    approx_count_distinct, whose register layout is
    implementation-defined): the 48-bit hash splits into register =
    low 6 bits, value = high 42 bits; rank = leading zeros of the
    42-bit value + 1 (43 when zero). The harmonic mean is computed in
    EXACT integer arithmetic — each register contributes
    2^(43 - rank) (absent registers contribute 2^43), and the estimate
    is floor(floor(m*m*2^43 / sum) * 709 / 1000) with alpha_64 = 0.709
    as a milli-exact constant — so the DuckDB twin agrees bit-for-bit.

    Scale shape: ONE map-side-combined aggregation to (event_type,
    register) — 64 rows per group — then a tiny rollup; sketch state is
    O(m) per group at any corpus size, which is the entire point at
    10^12 rows. The exact distinct count rides along as the quality
    reference (itself the full shuffle the sketch avoids)."""
    ev = _t(spark, sf_dir, "events")
    per_reg = hll_registers(ev, m=m)
    terms = per_reg.groupBy("event_type").agg(
        F.count("*").alias("n_regs"),
        F.sum(F.expr("shiftleft(1L, cast(43 - mx as int))")).alias("s"))
    # all-BIGINT: m*m*2^43 = 2^55 exceeds the double mantissa, so the
    # divisions must be integer `div`, never float-divide-then-floor
    est = F.expr(
        f"(({m * m * (1 << 43)} div "
        f"  (s + ({m} - n_regs) * {1 << 43})) * 709) div 1000")
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact_distinct")))
    return (terms.join(exact, "event_type")
            .select("event_type",
                    F.col("n_regs").cast("long").alias("n_regs"),
                    est.alias("hll_estimate"), "exact_distinct")
            .orderBy("event_type"))


def zorder_skipping_stats(spark: SparkSession, sf_dir: str,
                          chunk_rows: int = 250) -> DataFrame:
    """Z-order (Morton) data-layout evaluation — the clustering decision
    behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the bits of
    two 8-bit dimensions (user bucket = user_id % 256, time bucket =
    epoch-minute % 256), lay rows out in z-key order vs plain
    time-major order, cut the layout into chunk_rows-row files, record
    each file's (min, max) zone maps, and count how many files a
    2-dimensional range predicate (users 16-47 x minutes 64-127, ~3 %
    selectivity) can SKIP under each layout. Returns one row per
    layout: (layout, n_chunks, chunks_scanned, rows_matched) —
    rows_matched is layout-invariant by construction, the scanned-file
    gap is the point.

    Scale shape: the checked query ranks globally because the oracle
    needs a total order; the production write path is
    repartitionByRange(zkey) + sortWithinPartitions(zkey) — the same
    assignment with NO single-task sort — and the zone-map fold is one
    map-side-combined agg per file. Bit interleaving is pure integer
    arithmetic (shifts + masks), identical in the DuckDB twin; epoch
    minutes via NTZ timestampdiff (TZ-proof, the events_rolling_sum
    recipe)."""
    ev = _t(spark, sf_dir, "events")
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ "
                 "'1970-01-01 00:00:00', date_trunc('second', ts))")
    minute = (sec.cast("long") - F.pmod(sec.cast("long"), 60)) / 60
    x = F.pmod(F.col("user_id"), F.lit(256)).cast("long")
    y = F.pmod(minute.cast("long"), F.lit(256)).cast("long")
    zkey = sum(
        (F.shiftright(x, i).bitwiseAND(1) * F.lit(1 << (2 * i + 1))
         + F.shiftright(y, i).bitwiseAND(1) * F.lit(1 << (2 * i)))
        for i in range(8)).cast("long")
    base = ev.select(F.col("event_id"), x.alias("x"), y.alias("y"),
                     zkey.alias("zkey"))
    match = (F.col("x").between(16, 47)
             & F.col("y").between(64, 127)).cast("long")

    def layout_stats(df, order_cols, name):
        w = Window.orderBy(*order_cols)
        chunked = (df.withColumn("rn", F.row_number().over(w))
                   .withColumn("chunk", F.expr(f"(rn - 1) div {chunk_rows}")))
        zones = (chunked.groupBy("chunk")
                 .agg(F.min("x").alias("min_x"), F.max("x").alias("max_x"),
                      F.min("y").alias("min_y"), F.max("y").alias("max_y"),
                      F.sum(match).alias("n_match")))
        overlap = ~((F.col("max_x") < 16) | (F.col("min_x") > 47)
                    | (F.col("max_y") < 64) | (F.col("min_y") > 127))
        return (zones.agg(
            F.count("*").alias("n_chunks"),
            F.sum(overlap.cast("long")).alias("chunks_scanned"),
            F.sum("n_match").alias("rows_matched"))
            .withColumn("layout", F.lit(name)))

    return (layout_stats(base, [F.col("zkey"), F.col("event_id")], "zorder")
            .unionByName(layout_stats(
                base, [F.col("y"), F.col("x"), F.col("event_id")],
                "linear"))
            .orderBy("layout"))


def event_value_quantile_sketch(spark: SparkSession, sf_dir: str,
                                n_buckets: int = 256) -> DataFrame:
    """Deterministic histogram quantile sketch per event_type — the
    mergeable O(buckets)-state path that replaces exact percentiles at
    10^12 rows (the same idea as t-digest/KLL, in its simplest exactly-
    reproducible form; approx_percentile's sketch is implementation-
    defined, this one is portable):

    1. per-type (min, max) of value x1000 — one map-side-combined agg
       to a HANDFUL of rows, broadcast back;
    2. bucket = (v - min) * n_buckets div (max - min + 1) — pure
       integer, monotone, range [0, n_buckets);
    3. per-(type, bucket) counts — map-side combined, <= n_buckets rows
       per type ever shuffle;
    4. quantile q = the LOWER BOUND of the first bucket whose running
       count reaches ceil(q * n) — a guaranteed underestimate within
       one bucket width, reported in integer x1000.

    Exact same arithmetic in the DuckDB twin; the windows run over the
    bounded histogram table, never the corpus."""
    ev = _t(spark, sf_dir, "events")
    v = F.round(F.col("value") * 1000).cast("long")
    d = ev.select("event_type", v.alias("v1000"))
    rng = (d.groupBy("event_type")
           .agg(F.min("v1000").alias("lo"), F.max("v1000").alias("hi"),
                F.count("*").alias("n")))
    b = (d.join(F.broadcast(rng), "event_type")
         .withColumn("bucket",
                     F.expr(f"((v1000 - lo) * {n_buckets}) div "
                            "(hi - lo + 1)"))
         .groupBy("event_type", "bucket")
         .agg(F.count("*").alias("c"),
              F.first("lo").alias("lo"), F.first("hi").alias("hi"),
              F.first("n").alias("n")))
    w = (Window.partitionBy("event_type").orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = b.withColumn("cum", F.sum("c").over(w))

    def q_est(q_pm: int):
        # first bucket holding the FLOOR order statistic of the
        # linear-interpolation index 1 + (n-1)q — the same convention
        # percentile()/quantile_cont interpolate from, so the sketch is
        # a guaranteed lower bound on the exact interpolated quantile
        # (all-positive arithmetic: floor == truncate on both engines)
        need = F.expr(f"1 + ((n - 1) * {q_pm}) div 1000")
        hit = F.when(F.col("cum") >= need, F.col("bucket"))
        return F.min(hit)

    est = (cum.groupBy("event_type")
           .agg(F.first("lo").alias("lo"), F.first("hi").alias("hi"),
                F.first("n").alias("n"),
                q_est(500).alias("b50"), q_est(900).alias("b90"),
                q_est(990).alias("b99")))
    lb = lambda b: (F.col("lo")                          # noqa: E731
                    + F.expr(f"{b} * (hi - lo + 1) div {n_buckets}"))
    return (est.select(
        "event_type", F.col("n").cast("long").alias("n_events"),
        lb("b50").cast("long").alias("p50_est_x1000"),
        lb("b90").cast("long").alias("p90_est_x1000"),
        lb("b99").cast("long").alias("p99_est_x1000"))
        .orderBy("event_type"))


def events_funnel_ordered(spark: SparkSession, sf_dir: str,
                          steps: tuple = ("view", "click", "purchase")
                          ) -> DataFrame:
    """Ordered funnel analysis — the product-analytics staple the
    unordered event_type_funnel above cannot answer: a user reaches
    step k only via the strictly ORDERED progression step1 <= step2 <=
    ... (each step's time = the user's EARLIEST step-k event at or
    after their step-(k-1) time; ties on the timestamp count, matching
    same-second instrumentation). Returns one row per step: (step_idx,
    step, n_users, conversion_pm from step 1).

    Scale shape: per step one filter + one map-side-combined min per
    user, then an equi-join against the previous step's (user, t) table
    — every join keys on user_id, so AQE co-partitions the whole chain
    on one hash; per-user state is ONE timestamp per step. Epoch
    seconds via NTZ timestampdiff (TZ-proof); counts are exact."""
    ev = _t(spark, sf_dir, "events")
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ "
                 "'1970-01-01 00:00:00', date_trunc('second', ts))")
    d = ev.select("user_id", "event_type", sec.alias("sec"))
    reached = []
    prev = None
    for step in steps:
        s = d.filter(F.col("event_type") == step)
        if prev is None:
            cur = s.groupBy("user_id").agg(F.min("sec").alias("t"))
        else:
            cur = (s.join(prev.select("user_id",
                                      F.col("t").alias("t_prev")),
                          "user_id")
                   .filter(F.col("sec") >= F.col("t_prev"))
                   .groupBy("user_id").agg(F.min("sec").alias("t")))
        reached.append(cur)
        prev = cur
    per_step = None
    for i, (step, df) in enumerate(zip(steps, reached)):
        row = df.agg(F.count("*").alias("n_users")) \
                .select(F.lit(i + 1).cast("long").alias("step_idx"),
                        F.lit(step).alias("step"), "n_users")
        per_step = row if per_step is None else per_step.unionByName(row)
    w = Window.orderBy("step_idx") \
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    base = F.max(F.when(F.col("step_idx") == 1, F.col("n_users"))).over(w)
    return (per_step
            .withColumn("base", base)
            .withColumn("conversion_pm",
                        F.expr("CASE WHEN base > 0 THEN "
                               "(1000000 * n_users) div base "
                               "ELSE 0 END").cast("long"))
            .drop("base")
            .orderBy("step_idx"))


def events_mad_outliers(spark: SparkSession, sf_dir: str,
                        k: int = 3) -> DataFrame:
    """Robust outlier detection per event_type via Median Absolute
    Deviation (Hampel's rule — the breakdown-resistant alternative to
    the z-score battery above): flag v where |v - median| > k * MAD.

    All arithmetic is EXACT INTEGER despite the medians interpolating:
    a median of integers is at worst a half-integer, so 2x the median
    is an exact integer — med2 = 2*median(v1000), per-row deviation
    dev2 = |2*v1000 - med2|, mad4 = 2*median(dev2), and the flag
    2*dev2 > k*mad4 is the exact integer form of dev > k*MAD. Both
    engines interpolate medians identically (percentile ==
    quantile_cont, the event_value_percentiles precedent), and every
    derived value is an integer a double holds exactly.

    Scale shape: two grouped exact medians (each one shuffle of the
    group's values — the honest cost; swap in the quantile sketch above
    when 10^12 rows make exact medians silly) + a broadcast of the
    per-type median table for the deviation pass."""
    ev = _t(spark, sf_dir, "events")
    v = F.round(F.col("value") * 1000).cast("long")
    d = ev.select("event_type", v.alias("v1000"))
    med = (d.groupBy("event_type")
           .agg(F.floor(F.percentile("v1000", F.lit(0.5)) * 2)
                .cast("long").alias("med2"),
                F.count("*").alias("n_events")))
    dev = (d.join(F.broadcast(med), "event_type")
           .withColumn("dev2", F.abs(2 * F.col("v1000") - F.col("med2"))))
    mad = (dev.groupBy("event_type")
           .agg(F.floor(F.percentile("dev2", F.lit(0.5)) * 2)
                .cast("long").alias("mad4")))
    flagged = (dev.join(F.broadcast(mad), "event_type")
               .withColumn("is_out",
                           (2 * F.col("dev2") > k * F.col("mad4"))
                           .cast("long")))
    return (flagged.groupBy("event_type")
            .agg(F.first("n_events").alias("n_events"),
                 F.first("med2").alias("median_milli_x2"),
                 F.first("mad4").alias("mad_milli_x4"),
                 F.sum("is_out").alias("n_outliers"))
            .orderBy("event_type"))


def table_profile(spark: SparkSession, sf_dir: str,
                  m: int = 64) -> DataFrame:
    """ANALYZE-TABLE twin — the per-column statistics profile every
    warehouse maintenance loop runs before choosing join strategies and
    file layouts: for each events column, row/null counts (null share
    in ppm), a deterministic m=64-register HyperLogLog distinct
    estimate, and lexicographic min/max — all over CANONICAL string
    encodings (timestamps as NTZ epoch seconds, doubles as
    round(x*1000) milli-units), so both engines see identical bytes
    and the whole profile is bit-exact cross-engine (float formatting
    and timezone hops are the two classic profile nondeterminisms).

    Scale shape: one melt (6 struct literals + explode — a single
    corpus scan) feeding two MAP-SIDE-COMBINED aggregations whose
    outputs are bounded by columns x (m + 1) rows; no exact distinct
    anywhere (that is the full shuffle the sketch exists to avoid —
    event_user_hll carries the exact reference where quality needs
    auditing). The 6x row amplification of the melt stays inside the
    scan stage (combiner output is tiny); a one-pass-per-column
    variant trades plan uniformity for it at identical shuffle cost."""
    ev = _t(spark, sf_dir, "events")
    enc = {
        "event_id": F.col("event_id").cast("string"),
        "ts": F.expr("cast(timestampdiff(SECOND, TIMESTAMP_NTZ "
                     "'1970-01-01 00:00:00', ts) as string)"),
        "user_id": F.col("user_id").cast("string"),
        "event_type": F.col("event_type"),
        "value": F.expr("cast(cast(round(value * 1000) as bigint) "
                        "as string)"),
        "props": F.col("props"),
    }
    melted = (ev.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col"), v.alias("val"))
        for c, v in enc.items()])).alias("kv"))
        .select(F.col("kv.col").alias("col"), F.col("kv.val").alias("val")))
    stats = (melted.groupBy("col")
             .agg(F.count("*").alias("n_rows"),
                  F.sum(F.col("val").isNull().cast("long"))
                  .alias("n_null"),
                  F.min("val").alias("min_val"),
                  F.max("val").alias("max_val")))
    nn = melted.filter(F.col("val").isNotNull())
    h_long = F.conv(F.substring(F.md5("val"), 1, 12), 16, 10).cast("long")
    d = (nn.select("col", h_long.alias("hl"))
         .withColumn("reg", (F.col("hl") % m).cast("long"))
         .withColumn("v", F.expr(f"hl div {m}")))
    sig_bits = sum((F.col("v") >= F.lit(1 << i)).cast("int")
                   for i in range(42))
    per_reg = (d.withColumn("rank", (F.lit(43) - sig_bits).cast("long"))
               .groupBy("col", "reg").agg(F.max("rank").alias("mx")))
    terms = per_reg.groupBy("col").agg(
        F.count("*").alias("n_regs"),
        F.sum(F.expr("shiftleft(1L, cast(43 - mx as int))")).alias("s"))
    est = F.expr(
        f"(({m * m * (1 << 43)} div "
        f"  (s + ({m} - n_regs) * {1 << 43})) * 709) div 1000")
    return (stats.join(terms, "col", "left")
            .select("col",
                    F.col("n_rows").cast("long"),
                    F.col("n_null").cast("long"),
                    F.expr("(1000000 * n_null) div n_rows").cast("long")
                    .alias("null_ppm"),
                    F.coalesce(est, F.lit(0)).cast("long")
                    .alias("hll_distinct"),
                    "min_val", "max_val")
            .orderBy("col"))


def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS aggregation — the arbitrary-set sibling of CUBE /
    ROLLUP (dataset.corpus_stats_cube, events_rollup_hourly): one pass
    produces the (event_type, hour) leaf, the per-type margin, and the
    grand total, each tagged by grouping_id so a consumer can slice
    levels without re-aggregating. Spark plans a single Expand +
    hash aggregate (partial before the exchange), so the three levels
    cost one shuffle together — the reason warehouses expose the
    construct at all. Sums integer-scaled; hour from date_trunc on the
    NTZ timestamp (TZ-independent)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
        F.round(F.col("value") * 1000).cast("long").alias("v1000"))
    ev.createOrReplaceTempView("events_gs_in")
    return spark.sql("""
        SELECT event_type, hour,
               CAST(grouping_id(event_type, hour) AS BIGINT) AS gid,
               count(*) AS n_events,
               sum(v1000) AS sum_value_x1000
        FROM events_gs_in
        GROUP BY GROUPING SETS ((event_type, hour), (event_type), ())
    """)


def audience_overlap_hll(spark: SparkSession, sf_dir: str,
                         m: int = 64) -> DataFrame:
    """Audience-overlap matrix via HLL set algebra — the sketch query
    behind 'how many users who did A also did B' dashboards: for every
    unordered pair of event types, |A|, |B| and |A u B| are estimated
    from the SAME per-type register tables (union = register-wise max,
    the HLL property that makes the sketch mergeable), and the
    intersection comes out by inclusion-exclusion, clamped at 0
    (the classic estimator can go negative on small overlaps).

    Exactness contract: identical register machinery to event_user_hll
    (md5 48-bit split, integer rank ladder, alpha_64 = 709/1000 in
    BIGINT div), so the DuckDB twin is bit-identical; absent registers
    participate as rank 0 through a DENSE types x m register frame.
    The exact intersection rides along as the quality reference.

    Scale shape: registers are ONE map-side-combined agg to
    (type, reg) — m rows per type; everything after runs on bounded
    tables (types x m, then pairs x m). The exact-intersection
    reference is the only corpus-sized join, and it is a distinct
    (type, user) self-equi-join on user — the full shuffle the sketch
    exists to avoid (kept because the driver gate wants a truth
    column; drop it for the pure sketch at 10^12 rows)."""
    ev = _t(spark, sf_dir, "events")
    per_reg = hll_registers(ev, m=m)
    types = ev.select("event_type").distinct()
    regs = types.crossJoin(
        spark.range(m).select(F.col("id").cast("long").alias("reg")))
    dense = (regs.join(per_reg, ["event_type", "reg"], "left")
             .select("event_type", "reg",
                     F.coalesce("mx", F.lit(0)).cast("long").alias("mx")))
    a = dense.select(F.col("event_type").alias("type_a"),
                     "reg", F.col("mx").alias("mx_a"))
    b = dense.select(F.col("event_type").alias("type_b"),
                     "reg", F.col("mx").alias("mx_b"))
    pair_regs = a.join(b, "reg").filter(F.col("type_a") < F.col("type_b"))
    est = lambda s: F.expr(  # noqa: E731  (shared formula, see above)
        f"(({m * m * (1 << 43)} div {s}) * 709) div 1000")
    term = lambda c: F.expr(  # noqa: E731
        f"shiftleft(1L, cast(43 - {c} as int))")
    sums = (pair_regs.groupBy("type_a", "type_b")
            .agg(F.sum(term("mx_a")).alias("s_a"),
                 F.sum(term("mx_b")).alias("s_b"),
                 F.sum(term("greatest(mx_a, mx_b)")).alias("s_u")))
    est_a, est_b, est_u = est("s_a"), est("s_b"), est("s_u")
    users = ev.select("event_type", "user_id").distinct()
    ua = users.select(F.col("event_type").alias("type_a"),
                      "user_id")
    ub = users.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (ua.join(ub, "user_id")
             .filter(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.countDistinct("user_id").alias("exact_overlap")))
    return (sums.join(exact, ["type_a", "type_b"], "left")
            .select("type_a", "type_b",
                    est_a.cast("long").alias("est_a"),
                    est_b.cast("long").alias("est_b"),
                    est_u.cast("long").alias("est_union"),
                    F.greatest(F.lit(0).cast("long"),
                               (est_a + est_b - est_u).cast("long"))
                    .alias("est_overlap"),
                    F.coalesce("exact_overlap", F.lit(0)).cast("long")
                    .alias("exact_overlap"))
            .orderBy("type_a", "type_b"))


def session_window_native(spark: SparkSession, sf_dir: str,
                          gap: str = "30 minutes") -> DataFrame:
    """ENGINE-NATIVE sessionization (F.session_window) as a batch
    query — the same operator the streaming suite runs
    (streaming_session_windows), surfaced for the driver gate so the
    engine's own session-merge semantics are value-checked against a
    gaps-and-islands SQL twin. Semantics pinned here (empirically, by
    the boundary test): session_window merges sessions whose windows
    TOUCH — a gap of exactly the gap length still merges (boundary
    inclusive), so sessions break only on `gap > g`, matching
    user_sessions' custom rule; session_end = last event + gap. The
    twin encodes `gap > g` breaks and max(ts) + g accordingly.

    Scale shape: one user-hash exchange feeds the engine's session
    aggregation (incremental merge, spillable state) — same cost
    class as the window-function sessionizer, but the merge logic
    lives in the engine, not in lag()/sum() plumbing."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("user_id",
                       F.session_window("ts", gap).alias("win"))
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.round(F.col("value") * 1000).cast("long"))
                 .alias("sum_value_x1000"))
            .select("user_id",
                    F.col("win.start").alias("session_start"),
                    F.col("win.end").alias("session_end"),
                    "n_events", "sum_value_x1000")
            .orderBy("user_id", "session_start"))
