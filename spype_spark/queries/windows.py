"""Window functions (SURVEY.md §2.B "Window functions").

Scale notes: every window here partitions by a high-cardinality key
(custkey/suppkey), so the single shuffle distributes evenly and each
partition sorts locally — no global sort, no driver involvement. Ranking
ties are always broken by a unique key so output is deterministic under
any partitioning (SURVEY.md §5.2 determinism discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spype_spark.queries._util import dstr
from spype_spark.registry import query
from spype_spark.tables import load_table


@query(
    "q_window_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
           CAST(rank() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC) AS INT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC) AS INT) AS drnk
    FROM orders
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank of orders per customer by price.

    row_number's ordering adds the unique orderkey tiebreak; rank and
    dense_rank stay value-based (deterministic without it).
    """
    o = load_table(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_val = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w_rn).alias("rn"),
        F.rank().over(w_val).alias("rnk"),
        F.dense_rank().over(w_val).alias("drnk"),
    )


@query(
    "q_window_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (bench query).

    Spark pushes the rn<=3 filter into the window sort as a group-limit
    (AQE "WindowGroupLimit"), so each partition only keeps 3 rows per
    key during the sort — the per-group-top-k pattern that scales.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_analytic",
    oracle="""
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS first_price,
           last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last of order price per customer in date order."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w_full).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
    )


@query(
    "q_window_frame_rows",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1e4 + 0.5)
                         AS BIGINT))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber,
                               l_extendedprice, l_discount
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 1e4 AS moving_rev
    FROM lineitem
    """,
)
def q_window_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 7-row revenue sum per supplier (ROWS frame).

    Frame determinism: (l_orderkey, l_linenumber) is NOT unique in this
    corpus at sf0.1 (118k colliding pairs — discovered when DuckDB's
    parallel window produced sort-stability-dependent answers under
    load), so the ordering also includes the summed inputs
    (extendedprice, discount): any rows still tied are then
    contribution-identical AND output-identical, making the output
    multiset invariant to tie order in both engines. The sum itself
    uses scaled-long exact accumulation so sliding-frame strategy
    (segment trees in DuckDB vs running frames in Spark) cannot
    perturb values.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber",
            "l_extendedprice", "l_discount",
        )
        .rowsBetween(-6, Window.currentRow)
    )
    rev_scaled = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e4)
        + F.lit(0.5)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(rev_scaled).over(w) / F.lit(1e4)).alias("moving_rev"),
    )


@query(
    "q_window_frame_range",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_d,
           CAST(SUM(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 1e2 AS run_total
    FROM orders
    """,
)
def q_window_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over a RANGE frame (date peers merge)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        dstr("o_orderdate").alias("order_d"),
        (
            F.sum(F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5))).over(w)
            / F.lit(1e2)
        ).alias("run_total"),
    )


@query(
    "q_window_nth",
    oracle="""
    SELECT o_orderkey, o_custkey,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           first_value(o_orderkey) OVER w AS first_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a full-partition frame (deterministic unique
    ordering)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.first("o_orderkey").over(w).alias("first_key"),
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over customers by balance.

    A single unpartitioned window: fine at dimension-table cardinality;
    for a 100 TB fact one would precompute quantile boundaries with
    approxQuantile instead of a global sort.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q_window_percentiles",
    oracle="""
    SELECT c_custkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position analytics: percent_rank and cume_dist per
    segment (unique (acctbal, custkey) ordering → deterministic; both
    engines share the (rank-1)/(n-1) and rank/n definitions, rounded
    for the last-ulp division difference)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )
