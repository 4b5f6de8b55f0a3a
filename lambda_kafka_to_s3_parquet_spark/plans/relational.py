"""Relational read-back query surface (SURVEY.md §2.8).

The reference queries its landed parquet with the stock PySpark DataFrame
API (check_parquet.py:22-32,94-98 — filters/projections/date handling/
count). This module is that surface widened to the full relational operator
set: scans with pushdown, joins (broadcast/sort-merge/semi/anti),
aggregations (incl. distinct + rollup), windows (ranking/frames), sorts/
top-k, set operations, and the scalar string/date/JSON/array function
families — all Catalyst built-ins, zero Python in the hot path.

Every query is paired with a DuckDB oracle. Conventions that make the
value-hash comparison deterministic:

* every computed column is aliased identically on both sides;
* floating aggregates are ``round()``-ed (summation order differs between
  engines in the last ulps);
* computed integers are cast to BIGINT on both sides (DuckDB promotes
  integer sums to HUGEINT, Spark to LONG);
* timestamps are emitted as formatted strings, never raw;
* every top-k has a total tie-break order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import load_table, register_tables
from . import register

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _pad(df: DataFrame, schema: list[tuple[str, "F.Column"]], **given) -> DataFrame:
    """Union-tag branch padding: project ``df`` onto the shared ``schema``
    (ordered ``(name, typed_null_literal)`` pairs), filling every column
    not passed via ``given`` with its typed NULL. Keeps multi-branch
    union-tagged queries (q04, q16) declarative: each branch states only
    the columns it populates."""
    return df.select(
        *[
            (given[name] if name in given else default).alias(name)
            for name, default in schema
        ]
    )


# --------------------------------------------------------------------------
# q01 — scan → filter → groupBy multi-agg → sort (TPC-H Q1 shape).
# Flagship: exercises parquet pushdown + partial aggregation + AQE coalesce.
# Round 11: former q06_revenue_forecast consolidated into the 'forecast'
# row (l_returnflag = '_Q6', l_linestatus = 'forecast') — the TPC-H Q6
# tight-filter global agg rides the same output schema: its revenue sum
# lands in sum_disc_price, its row count in count_order, every other
# aggregate NULL. Both engines keep all q06 predicates pushed to the
# scan; the freed driver-window slot oracle-checks w15.
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 2)                                        AS avg_qty,
           round(avg(l_extendedprice), 2)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    UNION ALL
    SELECT '_Q6', 'forecast',
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           round(sum(l_extendedprice * l_discount), 2),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           count(*)
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="filter + groupBy + 8 aggregates + sort ('pricing'), plus the "
    "pushed-down tight-filter global agg as the '_Q6'/'forecast' row "
    "(consolidates former q06_revenue_forecast, round 11)",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pricing = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
    dnull = F.lit(None).cast("double")
    forecast = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .select(
            F.lit("_Q6").alias("l_returnflag"),
            F.lit("forecast").alias("l_linestatus"),
            dnull.alias("sum_qty"),
            dnull.alias("sum_base_price"),
            "sum_disc_price",
            dnull.alias("sum_charge"),
            dnull.alias("avg_qty"),
            dnull.alias("avg_price"),
            dnull.alias("avg_disc"),
            "count_order",
        )
    )
    return pricing.unionByName(forecast).orderBy("l_returnflag", "l_linestatus")


# --------------------------------------------------------------------------
# q03 — 3-way join (broadcast dim → fact) + filter + agg + top-k
# (TPC-H Q3 shape; the agg→sort→limit top-k shape of former
# q02_topk_orders_by_revenue is a strict subplan of this query, so q02's
# registry slot was consolidated here in round 4). customer is broadcast:
# no shuffle on the fact side.
# --------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle="""
    WITH ship AS (
      SELECT o.o_orderkey AS key,
             o.o_orderpriority AS label,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             strftime(o.o_orderdate, '%Y-%m-%d')                   AS extra
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
      ORDER BY revenue DESC, o.o_orderkey
      LIMIT 10)
    SELECT 'shipping' AS src, key, label, revenue, extra FROM ship
    UNION ALL
    SELECT 'nation' AS src, CAST(NULL AS BIGINT) AS key,
           n.n_name AS label,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(NULL AS VARCHAR) AS extra
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    ORDER BY src, key, label
    """,
    doc="filtered 3-way join + agg + top-k ('shipping', TPC-H Q3 shape) / "
    "5-way star join through broadcast dims ('nation', TPC-H Q5 shape), "
    "union-tagged (consolidates former q05_nation_revenue in round 5)",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15 00:00:00"))
    ship = (
        # No broadcast hints: orders and customer are both sf-proportional,
        # so the join strategy is left to AQE — broadcast while a side fits
        # the 64 MiB threshold, shuffle-hash/sort-merge beyond.
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            F.lit("shipping").alias("src"),
            F.col("o_orderkey").alias("key"),
            F.col("o_orderpriority").alias("label"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("extra"),
        )
        .orderBy(F.desc("revenue"), F.asc("key"))
        .limit(10)
    )
    l2 = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o2 = _t(spark, sf_dir, "orders")
    c2 = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nation = (
        # Hints only on true dimensions (supplier/nation/region at TPC-H
        # ratios). orders and customer are sf-proportional: AQE picks
        # broadcast while small and falls back to shuffle joins at scale.
        l2.join(F.broadcast(s), l2.l_suppkey == s.s_suppkey)
        .join(o2, l2.l_orderkey == o2.o_orderkey)
        .join(c2, (o2.o_custkey == c2.c_custkey) & (c2.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            F.lit("nation").alias("src"),
            F.lit(None).cast("bigint").alias("key"),
            F.col("n_name").alias("label"),
            "revenue",
            F.lit(None).cast("string").alias("extra"),
        )
    )
    return ship.unionByName(nation)


# --------------------------------------------------------------------------
# q04 — semi/anti joins + derived-aggregate joins, union-tagged
# (consolidates former q19_customers_without_open_orders and, in late
# round 5, former q18_big_customers — freeing driver-window slots for
# x32/x39). Branches over (src, key, label, n, v1, v2):
#   * 'semi'      — EXISTS semi-join + group count (TPC-H Q4 shape):
#     key=NULL, label=o_orderpriority, n=order count;
#   * 'anti'      — NOT EXISTS anti-join (customers with no open orders):
#     key=c_custkey, label=name:segment, n=NULL;
#   * 'brand_avg' — parts above their brand's average price (broadcast
#     tiny derived aggregate): key=p_partkey, label=p_brand, v1=price,
#     v2=brand avg;
#   * 'big_cust'  — HAVING-filtered per-customer order aggregate joined
#     back to the dimension (AQE decides): key=c_custkey, label=c_name,
#     n=order count, v1=total spend.
# --------------------------------------------------------------------------
@register(
    "q04_priority_semi_join",
    oracle="""
    SELECT 'semi' AS src, CAST(NULL AS BIGINT) AS key,
           o_orderpriority AS label, CAST(count(*) AS BIGINT) AS n,
           CAST(NULL AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'anti' AS src, c_custkey AS key,
           c_name || ':' || c_mktsegment AS label, CAST(NULL AS BIGINT) AS n,
           CAST(NULL AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'O')
    UNION ALL
    SELECT 'brand_avg' AS src, p.p_partkey AS key, p.p_brand AS label,
           CAST(NULL AS BIGINT)      AS n,
           round(p.p_retailprice, 2) AS v1,
           round(b.brand_avg, 2)     AS v2
    FROM part p
    JOIN (SELECT p_brand, avg(p_retailprice) AS brand_avg
          FROM part GROUP BY p_brand) b
      ON p.p_brand = b.p_brand
    WHERE p.p_retailprice > round(b.brand_avg, 2)
    UNION ALL
    SELECT 'big_cust' AS src, c.c_custkey AS key, c.c_name AS label,
           g.cnt                  AS n,
           round(g.total, 2)      AS v1,
           CAST(NULL AS DOUBLE)   AS v2
    FROM customer c
    JOIN (SELECT o_custkey, count(*) AS cnt, sum(o_totalprice) AS total
          FROM orders GROUP BY o_custkey HAVING count(*) >= 13) g
      ON c.c_custkey = g.o_custkey
    ORDER BY src, key, label
    """,
    doc="left-semi join + agg / left-anti join / broadcast per-brand "
    "average filter / HAVING aggregate joined back to dimension, "
    "union-tagged",
)
def q04_priority_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = [
        ("src", F.lit(None).cast("string")),
        ("key", F.lit(None).cast("bigint")),
        ("label", F.lit(None).cast("string")),
        ("n", F.lit(None).cast("bigint")),
        ("v1", F.lit(None).cast("double")),
        ("v2", F.lit(None).cast("double")),
    ]
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    semi = _pad(
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n")),
        schema,
        src=F.lit("semi"),
        label=F.col("o_orderpriority"),
        n=F.col("n").cast("bigint"),
    )
    c = _t(spark, sf_dir, "customer")
    oo = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    anti = _pad(
        c.join(oo, c.c_custkey == oo.o_custkey, "left_anti"),
        schema,
        src=F.lit("anti"),
        key=F.col("c_custkey"),
        label=F.concat_ws(":", "c_name", "c_mktsegment"),
    )
    p = _t(spark, sf_dir, "part")
    b = p.groupBy("p_brand").agg(F.avg("p_retailprice").alias("brand_avg"))
    above = _pad(
        # b is a tiny derived aggregate (one row per brand) — always
        # broadcast-safe regardless of sf. Boundary rounded identically on
        # both engines: an unrounded float average differs in the last
        # ulps between Spark and DuckDB (summation order), which could
        # flip borderline rows.
        p.join(F.broadcast(b), "p_brand").filter(
            F.col("p_retailprice") > F.round("brand_avg", 2)
        ),
        schema,
        src=F.lit("brand_avg"),
        key=F.col("p_partkey"),
        label=F.col("p_brand"),
        v1=F.round("p_retailprice", 2),
        v2=F.round("brand_avg", 2),
    )
    c2 = _t(spark, sf_dir, "customer")
    o2 = _t(spark, sf_dir, "orders")
    g = (
        o2.groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"), F.sum("o_totalprice").alias("total"))
        .filter(F.col("cnt") >= 13)
    )
    big = _pad(
        c2.join(g, c2.c_custkey == g.o_custkey),  # customer is sf-proportional: AQE decides
        schema,
        src=F.lit("big_cust"),
        key=F.col("c_custkey"),
        label=F.col("c_name"),
        n=F.col("cnt"),
        v1=F.round("total", 2),
    )
    return semi.unionByName(anti).unionByName(above).unionByName(big)


# (q06_revenue_forecast was consolidated into q01's '_Q6'/'forecast' row
# in round 11 — same pushed-down tight-filter global agg, one slot. The
# standalone function stays for plan-contract tests; the freed
# driver-window slot oracle-checks w15_bm25_index_stream.)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# q07 — ranking windows over customer, union-tagged (consolidates former
# q29_ntile_quartiles in round 4): top-3 customers by balance per nation
# (row_number, desc) + ntile(4) quartile bounds per nation (asc). Both
# branches are one Window pass partitioned by c_nationkey; the union is
# append-only. Shared schema: k = custkey | quartile, n = rank | count,
# v1/v2 = balance | (lo, hi).
# --------------------------------------------------------------------------
@register(
    "q07_top_customers_per_nation",
    oracle="""
    SELECT 'top3' AS src, c_nationkey, CAST(c_custkey AS BIGINT) AS k,
           CAST(rn AS BIGINT)  AS n,
           round(c_acctbal, 2) AS v1, round(c_acctbal, 2) AS v2
    FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer)
    WHERE rn <= 3
    UNION ALL
    SELECT 'quartile' AS src, c_nationkey, CAST(quartile AS BIGINT) AS k,
           count(*)                 AS n,
           round(min(c_acctbal), 2) AS v1,
           round(max(c_acctbal), 2) AS v2
    FROM (
      SELECT c_nationkey, c_acctbal,
             ntile(4) OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer)
    GROUP BY c_nationkey, quartile
    ORDER BY src, c_nationkey, k
    """,
    doc="ranking windows: row_number top-3 per nation + ntile(4) quartile "
    "bounds, union-tagged, deterministic tie-breaks",
)
def q07_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w_top = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    top3 = (
        c.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= 3)
        .select(
            F.lit("top3").alias("src"),
            "c_nationkey",
            F.col("c_custkey").cast("bigint").alias("k"),
            F.col("rn").cast("bigint").alias("n"),
            F.round("c_acctbal", 2).alias("v1"),
            F.round("c_acctbal", 2).alias("v2"),
        )
    )
    w_q = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    quartiles = (
        c.select("c_nationkey", "c_acctbal", F.ntile(4).over(w_q).alias("quartile"))
        .groupBy("c_nationkey", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("v1"),
            F.round(F.max("c_acctbal"), 2).alias("v2"),
        )
        .select(
            F.lit("quartile").alias("src"),
            "c_nationkey",
            F.col("quartile").cast("bigint").alias("k"),
            "n",
            "v1",
            "v2",
        )
    )
    # No trailing global sort: the oracle hash is order-insensitive and
    # output order is not semantic here (unlike top-k limits).
    return top3.unionByName(quartiles)


# --------------------------------------------------------------------------
# q08 — analytic windows over one pass: cumulative revenue (running frame)
# + lag() gap days since the customer's previous order. Both window
# expressions share partition (o_custkey) and order (o_orderdate,
# o_orderkey), so Catalyst evaluates them in a SINGLE Window node — one
# shuffle + one sort for what used to be two registered full-table scans
# (consolidates former q28_order_gaps).
# --------------------------------------------------------------------------
@register(
    "q08_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total,
           CAST(datediff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="cumulative-sum frame + lag gap in one Window node",
)
def q08_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("run_total"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(wo))
        .cast("bigint")
        .alias("days_since_prev"),
    )  # no trailing global sort — it would re-shuffle the whole table for nothing


# --------------------------------------------------------------------------
# q09 — aggregation families, union-tagged (consolidates former
# q12_case_agg — which itself had absorbed q11_setops — in round 5 to
# free a driver-window slot for x33). Branches over (src, k, n1, n2,
# v1, v2):
#   * 'distinct'  — the v2 handler's count/countDistinct metrics
#     (lambda_function_with_AWS_datawrangler.py:67-74) as a grouped query:
#     k=o_orderstatus, n1=n_orders, n2=n_customers, v1=total, v2=avg;
#   * 'both' / 'cust_only' — INTERSECT / EXCEPT over nation keys (n1
#     carries the key);
#   * 'case' — TPC-H Q12-shape join + CASE conditional aggregation
#     (k=returnflag, n1/n2 = high/low line counts).
# --------------------------------------------------------------------------
@register(
    "q09_distinct_agg",
    oracle="""
    SELECT 'distinct' AS src, o_orderstatus AS k,
           CAST(count(*) AS BIGINT)                  AS n1,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n2,
           round(sum(o_totalprice), 2)               AS v1,
           round(avg(o_totalprice), 2)               AS v2
    FROM orders
    GROUP BY o_orderstatus
    UNION ALL
    SELECT 'both' AS src, CAST(NULL AS VARCHAR) AS k,
           CAST(n AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2,
           CAST(NULL AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2 FROM (
      SELECT DISTINCT c_nationkey AS n FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey AS n FROM supplier)
    UNION ALL
    SELECT 'cust_only' AS src, CAST(NULL AS VARCHAR) AS k,
           CAST(n AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2,
           CAST(NULL AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2 FROM (
      SELECT DISTINCT c_nationkey AS n FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey AS n FROM supplier)
    UNION ALL
    SELECT 'case' AS src, l.l_returnflag AS k,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           CAST(NULL AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY src, k, n1
    """,
    doc="count/countDistinct/sum/avg per group + INTERSECT/EXCEPT set ops "
    "+ conditional (CASE) aggregation over a join, union-tagged",
)
def q09_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    null_s = F.lit(None).cast("string")
    null_b = F.lit(None).cast("bigint")
    null_d = F.lit(None).cast("double")
    o = _t(spark, sf_dir, "orders")
    distinct = (
        o.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n1"),
            F.countDistinct("o_custkey").cast("bigint").alias("n2"),
            F.round(F.sum("o_totalprice"), 2).alias("v1"),
            F.round(F.avg("o_totalprice"), 2).alias("v2"),
        )
        .select(
            F.lit("distinct").alias("src"), F.col("o_orderstatus").alias("k"),
            "n1", "n2", "v1", "v2",
        )
    )

    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n")).distinct()
    sup = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n")).distinct()

    def setop_branch(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.lit(tag).alias("src"), null_s.alias("k"),
            F.col("n").cast("bigint").alias("n1"), null_b.alias("n2"),
            null_d.alias("v1"), null_d.alias("v2"),
        )

    both = setop_branch(c.intersect(sup), "both")
    cust_only = setop_branch(c.exceptAll(sup), "cust_only")

    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    case = (
        l.join(o, l.l_orderkey == o.o_orderkey)  # strategy left to AQE; orders is fact-scale
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("n1"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("n2"),
        )
        .select(
            F.lit("case").alias("src"), F.col("l_returnflag").alias("k"),
            "n1", "n2", null_d.alias("v1"), null_d.alias("v2"),
        )
    )
    return (
        distinct.unionByName(both)
        .unionByName(cust_only)
        .unionByName(case)
        .orderBy("src", "k", "n1")
    )


# --------------------------------------------------------------------------
# q10 — grouped-aggregation shapes, three flavors union-tagged in one
# result: ROLLUP over lineitem (hierarchical subtotals), CUBE over orders
# (every subtotal combination — consolidates former q22_cube), and the
# per-user event-type PIVOT matrix via conditional aggregation
# (consolidates former q20_event_type_pivot in round 6, freeing a
# driver-window slot for w10). Each branch is a single aggregate; the
# union is append-only (no extra shuffle beyond the three aggregations).
# Branch column mapping: grouping-sets branches use (k1, k2, n, agg_val)
# with n2..n5 NULL; the pivot branch carries its five conditional counts
# in (n..n5) and sum(value) in agg_val, k1 = user_id as string.
# --------------------------------------------------------------------------
@register(
    "q10_grouping_sets",
    oracle="""
    SELECT 'rollup_lineitem' AS src,
           coalesce(l_returnflag, 'ALL') AS k1,
           coalesce(l_linestatus, 'ALL') AS k2,
           count(*)                      AS n,
           CAST(NULL AS BIGINT) AS n2, CAST(NULL AS BIGINT) AS n3,
           CAST(NULL AS BIGINT) AS n4, CAST(NULL AS BIGINT) AS n5,
           round(sum(l_quantity), 2)     AS agg_val
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube_orders' AS src,
           coalesce(o_orderstatus, 'ALL')   AS k1,
           coalesce(o_orderpriority, 'ALL') AS k2,
           count(*)                         AS n,
           CAST(NULL AS BIGINT) AS n2, CAST(NULL AS BIGINT) AS n3,
           CAST(NULL AS BIGINT) AS n4, CAST(NULL AS BIGINT) AS n5,
           round(sum(o_totalprice), 2)      AS agg_val
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'pivot_events' AS src,
           CAST(user_id AS VARCHAR) AS k1,
           'ALL'                    AS k2,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n3,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n4,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n5,
           round(sum(value), 2) AS agg_val
    FROM events
    GROUP BY user_id
    ORDER BY src, k1, k2
    """,
    doc="ROLLUP (lineitem) + CUBE (orders) grouping sets + conditional-"
    "aggregation pivot (events), union-tagged",
)
def q10_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    e = _t(spark, sf_dir, "events")
    null_n = F.lit(None).cast("bigint")
    roll = (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("agg_val"))
        .select(
            F.lit("rollup_lineitem").alias("src"),
            F.coalesce("l_returnflag", F.lit("ALL")).alias("k1"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("k2"),
            "n",
            null_n.alias("n2"), null_n.alias("n3"),
            null_n.alias("n4"), null_n.alias("n5"),
            "agg_val",
        )
    )
    cub = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("agg_val"))
        .select(
            F.lit("cube_orders").alias("src"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("k1"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("k2"),
            "n",
            null_n.alias("n2"), null_n.alias("n3"),
            null_n.alias("n4"), null_n.alias("n5"),
            "agg_val",
        )
    )

    def cnt(t: str, alias: str):
        return (
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(alias)
        )

    piv = (
        e.groupBy("user_id")
        .agg(
            cnt("click", "n"),
            cnt("view", "n2"),
            cnt("purchase", "n3"),
            cnt("signup", "n4"),
            cnt("error", "n5"),
            F.round(F.sum("value"), 2).alias("agg_val"),
        )
        .select(
            F.lit("pivot_events").alias("src"),
            F.col("user_id").cast("string").alias("k1"),
            F.lit("ALL").alias("k2"),
            "n", "n2", "n3", "n4", "n5",
            "agg_val",
        )
    )
    return roll.unionByName(cub).unionByName(piv).orderBy("src", "k1", "k2")


# --------------------------------------------------------------------------
# q16 — scalar + semi-structured function surface, union-tagged. Absorbed
# over rounds 3-5: q15_json_extract, then (late round 5) the whole former
# q14_date_functions (which had itself absorbed q13_string_funcs and
# q23_date_arith) — freeing a driver-window slot for x40. Branches over
# (src, k1, k2, ks, n1..n4, v1..v3, s1..s5):
#   * 'json'   — get_json_object over the events.props JSON payload,
#     aggregated per event_type (ks=event_type, n1=count, v1=avg, v2=max);
#   * 'array'  — per-row array functions over the embedding vectors
#     (ks=vec_id as string, n1=dim, v1=first_val, v2=l2_norm, v3=mean) —
#     math forced to DOUBLE with explicit left-to-right folds so both
#     engines agree bit-wise before rounding;
#   * 'date'   — year/month bucketing over orders with per-row datediff/
#     add_months/last_day/dayofweek arithmetic folded into the monthly
#     groups (within a (year, month) group add_months/last_day are
#     constant, so min() recovers the per-row value — one narrow scan +
#     one shuffle);
#   * 'string' — per-row upper/substr/length/concat/replace/
#     regexp_extract + LIKE over part (narrow, rides the scan, no
#     shuffle).
# The union is append-only — branch results cannot interact.
# --------------------------------------------------------------------------
@register(
    "q16_array_stats",
    oracle="""
    SELECT 'json' AS src,
           CAST(NULL AS BIGINT) AS k1, CAST(NULL AS BIGINT) AS k2,
           event_type AS ks,
           count(*) AS n1,
           CAST(NULL AS BIGINT) AS n2, CAST(NULL AS BIGINT) AS n3,
           CAST(NULL AS BIGINT) AS n4,
           round(avg(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS v1,
           CAST(max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS DOUBLE)                                            AS v2,
           CAST(NULL AS DOUBLE)                                       AS v3,
           CAST(NULL AS DOUBLE)                                       AS v4,
           CAST(NULL AS VARCHAR) AS s1, CAST(NULL AS VARCHAR) AS s2,
           CAST(NULL AS VARCHAR) AS s3, CAST(NULL AS VARCHAR) AS s4,
           CAST(NULL AS VARCHAR) AS s5
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'array' AS src,
           CAST(NULL AS BIGINT) AS k1, CAST(NULL AS BIGINT) AS k2,
           CAST(vec_id AS VARCHAR) AS ks,
           CAST(len(embedding) AS BIGINT)                                  AS n1,
           CAST(NULL AS BIGINT) AS n2, CAST(NULL AS BIGINT) AS n3,
           CAST(NULL AS BIGINT) AS n4,
           round(embedding[1]::DOUBLE, 6)                                  AS v1,
           round(sqrt(list_aggregate(list_transform(embedding::DOUBLE[],
                 x -> x * x), 'sum')), 6)                                  AS v2,
           round(list_aggregate(embedding::DOUBLE[], 'sum')
                 / len(embedding), 6)                                      AS v3,
           CAST(NULL AS DOUBLE)                                            AS v4,
           CAST(NULL AS VARCHAR) AS s1, CAST(NULL AS VARCHAR) AS s2,
           CAST(NULL AS VARCHAR) AS s3, CAST(NULL AS VARCHAR) AS s4,
           CAST(NULL AS VARCHAR) AS s5
    FROM embeddings
    UNION ALL
    SELECT 'date' AS src,
           CAST(year(o_orderdate) AS BIGINT)  AS k1,
           CAST(month(o_orderdate) AS BIGINT) AS k2,
           CAST(NULL AS VARCHAR) AS ks,
           count(*)                           AS n1,
           count(DISTINCT o_custkey)          AS n2,
           CAST(max(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                              o_orderdate)) AS BIGINT)               AS n3,
           count(DISTINCT dayofweek(o_orderdate))                    AS n4,
           CAST(NULL AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2,
           CAST(NULL AS DOUBLE) AS v3, CAST(NULL AS DOUBLE) AS v4,
           min(strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m'))    AS s1,
           min(strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')) AS s2,
           CAST(NULL AS VARCHAR) AS s3,
           CAST(NULL AS VARCHAR) AS s4,
           CAST(NULL AS VARCHAR) AS s5
    FROM orders
    GROUP BY 2, 3
    UNION ALL
    SELECT 'string' AS src,
           p_partkey                                   AS k1,
           CAST(length(p_name) AS BIGINT)              AS k2,
           CAST(NULL AS VARCHAR) AS ks,
           CAST(NULL AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2,
           CAST(NULL AS BIGINT) AS n3, CAST(NULL AS BIGINT) AS n4,
           CAST(NULL AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2,
           CAST(NULL AS DOUBLE) AS v3, CAST(NULL AS DOUBLE) AS v4,
           upper(p_brand)                              AS s1,
           substr(p_name, 1, 8)                        AS s2,
           concat(p_brand, '#', p_type)                AS s3,
           replace(p_type, ' ', '_')                   AS s4,
           regexp_extract(p_type, '([a-z]+)$', 1)      AS s5
    FROM part
    WHERE p_name LIKE '%a%'
    UNION ALL
    SELECT 'pct' AS src,
           CAST(NULL AS BIGINT) AS k1, CAST(NULL AS BIGINT) AS k2,
           l_returnflag AS ks,
           CAST(NULL AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2,
           CAST(NULL AS BIGINT) AS n3, CAST(NULL AS BIGINT) AS n4,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS v1,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS v2,
           round(quantile_cont(l_extendedprice, 0.90), 6) AS v3,
           round(max(l_extendedprice), 2)                 AS v4,
           CAST(NULL AS VARCHAR) AS s1, CAST(NULL AS VARCHAR) AS s2,
           CAST(NULL AS VARCHAR) AS s3, CAST(NULL AS VARCHAR) AS s4,
           CAST(NULL AS VARCHAR) AS s5
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY src, k1, k2, ks
    """,
    doc="semi-structured + scalar function surface, union-tagged: JSON "
    "extraction per event_type; size/element_at/aggregate-fold over "
    "array<float>; date buckets (datediff/add_months/last_day/dayofweek "
    "in-group); string scalar family (upper/substr/length/concat/replace/"
    "regexp_extract + LIKE); exact interpolated percentiles per group — "
    "consolidates former q15_json_extract + q14_date_functions (round 5) "
    "and q21_percentiles (round 7)",
)
def q16_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    null_b = F.lit(None).cast("bigint")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    schema = [
        ("src", null_s), ("k1", null_b), ("k2", null_b), ("ks", null_s),
        ("n1", null_b), ("n2", null_b), ("n3", null_b), ("n4", null_b),
        ("v1", null_d), ("v2", null_d), ("v3", null_d), ("v4", null_d),
        ("s1", null_s), ("s2", null_s), ("s3", null_s), ("s4", null_s),
        ("s5", null_s),
    ]

    def pad(df, **given):
        return _pad(df, schema, **given)

    e = _t(spark, sf_dir, "events")
    kx = F.get_json_object("props", "$.k").cast("bigint")
    json_branch = pad(
        e.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.round(F.avg(kx), 2).alias("va"),
            F.max(kx).cast("double").alias("vb"),
        ),
        src=F.lit("json"), ks=F.col("event_type"),
        n1=F.col("n"), v1=F.col("va"), v2=F.col("vb"),
    )
    emb = _t(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    sum_sq = F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x)
    total = F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x)
    array_branch = pad(
        emb,
        src=F.lit("array"), ks=F.col("vec_id").cast("string"),
        n1=F.size("embedding").cast("bigint"),
        v1=F.round(F.element_at(emb_d, 1), 6),
        v2=F.round(F.sqrt(sum_sq), 6),
        v3=F.round(total / F.size("embedding"), 6),
    )
    o = _t(spark, sf_dir, "orders")
    date_branch = pad(
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("ka"),
            F.month("o_orderdate").cast("bigint").alias("kb"),
        ).agg(
            F.count("*").alias("na"),
            F.countDistinct("o_custkey").alias("nb"),
            F.max(F.datediff("o_orderdate", F.lit("1995-01-01")))
            .cast("bigint")
            .alias("nc"),
            F.countDistinct(F.dayofweek("o_orderdate")).alias("nd"),
            F.min(F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM")).alias("sa"),
            F.min(F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd")).alias("sb"),
        ),
        src=F.lit("date"), k1=F.col("ka"), k2=F.col("kb"),
        n1=F.col("na"), n2=F.col("nb"), n3=F.col("nc"), n4=F.col("nd"),
        s1=F.col("sa"), s2=F.col("sb"),
    )
    p = _t(spark, sf_dir, "part")
    string_branch = pad(
        p.filter(F.col("p_name").like("%a%")),
        src=F.lit("string"),
        k1=F.col("p_partkey"), k2=F.length("p_name").cast("bigint"),
        s1=F.upper("p_brand"),
        s2=F.substring("p_name", 1, 8),
        s3=F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")),
        s4=F.regexp_replace("p_type", " ", "_"),
        s5=F.regexp_extract("p_type", "([a-z]+)$", 1),
    )
    l = _t(spark, sf_dir, "lineitem")
    # absorbed former q21 (round-7 consolidation freeing an oracle slot
    # for x31): one percentile(col, array(...)) aggregate — the exact-
    # percentile buffer is built once per group, not per quantile. Exact
    # percentiles sort per group by design; at true 100 TB the operator
    # of choice is approx_percentile (t-digest, mergeable map-side) —
    # exact is kept for the oracle comparison. round(…, 6): interpolated
    # values of 2-decimal prices have <=4 decimal digits, so 6-decimal
    # rounding sits on no half-ulp boundary.
    pcts = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.90))
    )
    pct_branch = pad(
        l.groupBy("l_returnflag").agg(
            pcts.alias("_p"),
            F.round(F.max("l_extendedprice"), 2).alias("_p100"),
        ),
        src=F.lit("pct"), ks=F.col("l_returnflag"),
        v1=F.round(F.element_at("_p", 1), 6),
        v2=F.round(F.element_at("_p", 2), 6),
        v3=F.round(F.element_at("_p", 3), 6),
        v4=F.col("_p100"),
    )
    return (
        json_branch.unionByName(array_branch)
        .unionByName(date_branch)
        .unionByName(string_branch)
        .unionByName(pct_branch)
    )


# (q24_salted_join was consolidated into q26's union-tagged
# 'salted_segments' branch in round 11 — the oracle stays the PLAIN
# join, so the salt/unsalt round trip remains provably identity. The
# standalone function stays for plan/identity tests; the freed
# driver-window slot oracle-checks x44_snapshot_table.)
def q24_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    c = _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    return (
        # o_orderkey is unique per row: retry-deterministic salt derivation
        salted_join(o, c, "custkey", n_salts=8, ordinal_col="o_orderkey")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("c_mktsegment")
    )


# (former q25_sql_surface — shared-SQL-text-through-spark.sql — was
# consolidated into q30_subqueries in round 4: q30 runs its oracle text
# verbatim through spark.sql over register_tables' catalog views, proving
# the same SQL-API surface on a strictly harder query.)


# (q20_event_type_pivot was consolidated into q10_grouping_sets' union-
# tagged 'pivot_events' branch in round 6 — freeing a driver-window slot.)


# --------------------------------------------------------------------------
# q26 — join strategies, union-tagged (consolidates former q26 + q27, and
# — round 11 — former q24_salted_join as the 'salted_segments' branch).
# LEFT OUTER: customers per nation incl. those with no orders — nation
# broadcasts (true dim), the customer-orders outer join is AQE-decided.
# FULL OUTER: two derived daily series aligned by date, gaps coalesced to
# zero — both sides pre-aggregate before the join so the shuffle carries
# ~2.5k rows, not the fact tables. SALTED: the hot-key-proof shuffle join
# whose oracle is the PLAIN join — the salt/unsalt round trip must be
# identity (total rides the v1 double column, NULL on other branches).
# --------------------------------------------------------------------------
@register(
    "q26_outer_joins",
    oracle="""
    SELECT 'left_outer_customers' AS src,
           n.n_name AS k,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT)  AS n1,
           CAST(count(DISTINCT CASE WHEN o.o_orderkey IS NULL
                                    THEN c.c_custkey END) AS BIGINT) AS n2,
           CAST(count(o.o_orderkey) AS BIGINT)          AS n3,
           CAST(NULL AS DOUBLE)                         AS v1
    FROM nation n
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY n.n_name
    UNION ALL
    SELECT 'full_outer_dates' AS src,
           CAST(coalesce(od.d, sd.d) AS VARCHAR)        AS k,
           CAST(coalesce(od.n_orders, 0) AS BIGINT)     AS n1,
           CAST(coalesce(sd.n_ships, 0) AS BIGINT)      AS n2,
           CAST(NULL AS BIGINT)                         AS n3,
           CAST(NULL AS DOUBLE)                         AS v1
    FROM (SELECT o_orderdate AS d, count(*) AS n_orders FROM orders GROUP BY 1) od
    FULL OUTER JOIN
         (SELECT l_shipdate  AS d, count(*) AS n_ships  FROM lineitem GROUP BY 1) sd
      ON od.d = sd.d
    UNION ALL
    SELECT 'salted_segments' AS src,
           c.c_mktsegment                               AS k,
           count(*)                                     AS n1,
           CAST(NULL AS BIGINT)                         AS n2,
           CAST(NULL AS BIGINT)                         AS n3,
           round(sum(o.o_totalprice), 2)                AS v1
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY src, k
    """,
    doc="join strategies, union-tagged: left-outer (order-less customers "
    "per nation), full-outer (pre-aggregated daily series, coalesced "
    "gaps), and the salted shuffle join == plain join identity",
)
def q26_outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    dnull = F.lit(None).cast("double")
    left = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n1"),
            F.countDistinct(
                F.when(F.col("o_orderkey").isNull(), F.col("c_custkey"))
            ).alias("n2"),
            F.count("o_orderkey").alias("n3"),
        )
        .select(
            F.lit("left_outer_customers").alias("src"),
            F.col("n_name").alias("k"),
            "n1",
            "n2",
            "n3",
            dnull.alias("v1"),
        )
    )
    od = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count("*").alias("n_orders"))
    )
    sd = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").alias("d"))
        .agg(F.count("*").alias("n_ships"))
    )
    full = od.join(sd, ["d"], "full_outer").select(
        F.lit("full_outer_dates").alias("src"),
        F.col("d").cast("string").alias("k"),
        F.coalesce("n_orders", F.lit(0)).alias("n1"),
        F.coalesce("n_ships", F.lit(0)).alias("n2"),
        F.lit(None).cast("bigint").alias("n3"),
        dnull.alias("v1"),
    )
    o2 = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    c2 = _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    salted = (
        # o_orderkey is unique per row: retry-deterministic salt derivation
        salted_join(o2, c2, "custkey", n_salts=8, ordinal_col="o_orderkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n1"),
            F.round(F.sum("o_totalprice"), 2).alias("v1"),
        )
        .select(
            F.lit("salted_segments").alias("src"),
            F.col("c_mktsegment").alias("k"),
            "n1",
            F.lit(None).cast("bigint").alias("n2"),
            F.lit(None).cast("bigint").alias("n3"),
            "v1",
        )
    )
    return left.unionByName(full).unionByName(salted).orderBy("src", "k")


# --------------------------------------------------------------------------
# q30 — subquery surface in one SQL text (consolidates former
# q31_scalar_subquery, and — round 4 — former q25_sql_surface: the oracle
# text runs verbatim through spark.sql over register_tables' catalog
# views, so this query also proves the SQL-API surface): correlated
# EXISTS / NOT EXISTS (Catalyst rewrites to semi/anti joins — same plans
# q04/q19 build explicitly) plus an uncorrelated scalar subquery (global
# average computed once, single-row broadcast). The scalar boundary is
# rounded identically on both engines so last-ulp summation differences
# cannot flip membership (q17's guard).
# --------------------------------------------------------------------------
_Q30_SQL = """
    SELECT p.p_brand, count(*) AS n_parts,
           CAST(sum(CASE WHEN p.p_retailprice >
                         (SELECT round(avg(p_retailprice), 2) FROM part)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg
    FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
      AND NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_partkey = p.p_partkey
                        AND l2.l_returnflag = 'R' AND l2.l_quantity >= 49)
    GROUP BY p.p_brand
    ORDER BY p.p_brand
"""


@register(
    "q30_subqueries",
    oracle=_Q30_SQL,
    doc="correlated EXISTS/NOT EXISTS (semi/anti rewrite) + scalar subquery; "
    "oracle text runs verbatim through spark.sql (the SQL-API surface)",
)
def q30_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(_Q30_SQL)
