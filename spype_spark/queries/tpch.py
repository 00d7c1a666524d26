"""Classic decision-support suite (TPC-H-adapted) over the slimmed
star schema.

The corpus is TPC-H-ish but slimmed (FIXTURES.md): no ``partsupp``, no
commit/receipt dates, no comment/phone/container columns. Each query
here keeps the *shape* of its classic counterpart — the join topology,
the correlation pattern, the aggregate structure — and re-parameterizes
predicates to columns that exist. Q1 lives in ``aggregates.py``
(``q_pricing_summary``); the queries needing ``partsupp`` (Q2/Q9/Q11/
Q16/Q20) or commit/receipt dates (Q12/Q21) live in ``tpch_deep.py``,
which re-derives the missing relations from observed lineitem pairs
(see its module docstring for the adaptation discipline).

Scale notes (100 TB):
- Dimension joins (nation/region) are explicit ``broadcast()``; the
  customer/orders/lineitem joins shuffle on their keys and AQE picks
  broadcast when a filtered side collapses below the threshold.
- Every date/segment/brand predicate sits directly on the scan so it
  reaches the Parquet reader (PushedFilters); top-k queries sort only
  the post-aggregation set, never the fact table.
- Money aggregates use the scaled-long discipline (``_util.dsum``):
  exact, order-independent, bit-identical across engines and
  partitionings — LIMIT boundaries therefore can't flap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spype_spark.queries._util import davg, davg_sql, dstr, dsum, dsum_sql, ts_lit
from spype_spark.registry import query
from spype_spark.tables import load_table

#: Revenue expression shared by most queries (4 true decimal places:
#: 2dp price × 2dp discount).
_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q3 — shipping priority: top unshipped orders by potential revenue.
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey, revenue, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM (
      SELECT l.l_orderkey AS l_orderkey, o.o_orderdate AS o_orderdate,
             {dsum_sql(_REV, 4)} AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-06-01'
        AND l.l_shipdate  > TIMESTAMP '1998-06-01'
      GROUP BY 1, 2) t
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): revenue of orders taken before a
    date but not yet shipped by it, for one market segment; top 10.

    Shape: 3-way fact join with both fact filters pushed to the scans,
    aggregate to order grain, then a top-k over the *aggregated* set
    (TakeOrderedAndProject — never a global sort of lineitem). The
    LIMIT boundary is deterministic: revenue is exact (scaled-long) and
    (o_orderdate, l_orderkey) break any remaining tie.
    """
    cutoff = ts_lit("1998-06-01")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_rev_col(), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", dstr("o_orderdate").alias("o_orderdate"))
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi-join).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: the classic
    ``l_commitdate < l_receiptdate`` lateness test becomes "some line
    shipped ≥ 90 days after the order date" (the corpus has no
    commit/receipt dates).

    Shape preserved exactly: quarter filter on orders, correlated
    EXISTS → left-semi hash join on the order key with the date
    predicate as a residual condition, then a tiny groupBy over the
    five priority classes (map-side partial aggregation moves ~5 rows
    per partition).
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1997-07-01"))
        & (F.col("o_orderdate") < ts_lit("1997-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate >= o.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (5-way join + region filter).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n.n_name AS n_name, {dsum_sql(_REV, 4)} AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue shipped customer→
    supplier within the same nation, for one region and one year.

    The distinctive edge is the *two-column* supplier join
    (``s_suppkey = l_suppkey AND s_nationkey = c_nationkey``) — the
    "local" constraint rides as a residual on the hash join, no extra
    shuffle. nation/region are explicit broadcasts; the year filter is
    pushed to the orders scan, shrinking the biggest shuffle by ~6×
    before it happens.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev_col(), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan-filter-agg).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q6",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * l_discount", 4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): one scan, three pushed
    predicates, one global sum — the canonical predicate-pushdown
    benchmark. All three filters reach the Parquet reader
    (PushedFilters in the formatted plan); at 100 TB this is I/O-bound
    on the row groups the date range selects and nothing else.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= ts_lit("1996-01-01"))
            & (F.col("l_shipdate") < ts_lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between region pairs (adapted from nation pair).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           {dsum_sql(_REV, 4)} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    JOIN region r1  ON r1.r_regionkey = n1.n_regionkey
    JOIN region r2  ON r2.r_regionkey = n2.n_regionkey
    WHERE r1.r_name <> r2.r_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping), adapted from a nation pair to
    cross-region trade flow (the synthetic corpus spreads 100 suppliers
    over 25 nations, so any single nation pair is empty at small SF;
    region grain keeps the two-sided-dimension shape non-degenerate at
    every scale).

    Shape preserved: the same supplier-side and customer-side dimension
    chains join the fact spine, the asymmetric-pair predicate sits on
    the (broadcast) dimension columns, and the aggregate is grouped by
    both sides plus the shipment year.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1996-01-01"))
        & (F.col("l_shipdate") < ts_lit("1998-01-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    r1 = load_table(spark, sf_dir, "region").alias("r1")
    r2 = load_table(spark, sf_dir, "region").alias("r2")
    return (
        li.join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1.n_nationkey") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("n2.n_nationkey") == c.c_nationkey)
        .join(F.broadcast(r1), F.col("r1.r_regionkey") == F.col("n1.n_regionkey"))
        .join(F.broadcast(r2), F.col("r2.r_regionkey") == F.col("n2.n_regionkey"))
        .filter(F.col("r1.r_name") != F.col("r2.r_name"))
        .groupBy(
            F.col("r1.r_name").alias("supp_region"),
            F.col("r2.r_name").alias("cust_region"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(_rev_col(), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share of one supplier nation inside one customer region.
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           ({dsum_sql("CASE WHEN n2.n_name = 'NATION_3' THEN " + _REV + " ELSE 0 END", 4)})
           / ({dsum_sql(_REV, 4)}) AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the fraction of one customer
    region's volume in one part type supplied by one nation, per year.

    The conditional-share pattern: numerator and denominator are both
    exact scaled-long sums over the same grouped rows, so the division
    is a single deterministic double op — no separate query for the
    denominator, no second shuffle. Dimension chains broadcast; the
    p_type filter prunes the part join input at the scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier")
    vol = _rev_col()
    national = F.when(F.col("n2.n_name") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1.n_nationkey") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("n1.n_regionkey"))
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n2), F.col("n2.n_nationkey") == s.s_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(national, 4) / dsum(vol, 4)).alias("mkt_share"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 customers by lost revenue).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           {dsum_sql(_REV, 4)} AS revenue,
           c.c_acctbal AS c_acctbal, n.n_name AS n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): customers who returned the most
    revenue in one quarter, with their nation; top 20.

    The returnflag filter sits on the lineitem scan and the quarter
    filter on the orders scan — both pushed, so the join inputs are
    pre-shrunk. Grouping carries the customer attribute columns
    through the aggregate (classic wide-key groupBy); the top-k is a
    TakeOrderedAndProject over ~|customers| aggregated rows with
    c_custkey as the deterministic tiebreak.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1997-01-01"))
        & (F.col("o_orderdate") < ts_lit("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev_col(), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left join preserving zeros).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of per-customer
    order counts, zeros included (the priority predicate stands in for
    the classic comment-pattern exclusion, which needs a column the
    corpus doesn't carry).

    The load-bearing detail is the predicate's *placement*: it belongs
    in the LEFT JOIN condition, not a WHERE (which would silently drop
    zero-order customers). Two shuffles by construction — one on the
    join/group key, one on the count — the second over at most
    |distinct counts| ≈ dozens of rows.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional share, single row).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT 100.0 * ({dsum_sql("CASE WHEN p.p_type = 'PROMO' THEN " + _REV + " ELSE 0 END", 4)})
           / ({dsum_sql(_REV, 4)}) AS promo_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percent of one month's revenue
    from promotional parts.

    One broadcast join (part is the small side after column pruning —
    only p_partkey/p_type survive), one global aggregate combining the
    conditional and unconditional sums in a single pass. The month
    filter is pushed to the lineitem scan.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1997-03-01"))
        & (F.col("l_shipdate") < ts_lit("1997-04-01"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = _rev_col()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .agg((F.lit(100.0) * dsum(promo, 4) / dsum(vol, 4)).alias("promo_revenue"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg per part).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q17",
    oracle=f"""
    SELECT {dsum_sql("l.l_extendedprice", 2)} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l2.l_partkey AS a_partkey,
             0.2 * AVG(l2.l_quantity) AS qty_cut
      FROM lineitem l2
      JOIN part p2 ON p2.p_partkey = l2.l_partkey
      WHERE p2.p_brand = 'Brand#3'
      GROUP BY 1) a ON a.a_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < a.qty_cut
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from orders of
    less than 20% of a part's average order quantity, for one brand
    (the classic container predicate has no corpus column).

    The correlated scalar subquery decorrelates into an aggregate +
    self-join: compute 0.2·avg(qty) per part once, join it back, keep
    rows under the cut. avg over integer-valued quantities is an exact
    sum ÷ count — deterministic in both engines, so the `<` boundary
    can't flap. The brand filter prunes part before broadcast, and the
    per-part aggregate runs over the already-filtered join output.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = load_table(spark, sf_dir, "lineitem")
    lp = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cuts = lp.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        lp.join(F.broadcast(cuts), cuts.a_partkey == lp.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg((dsum("l_extendedprice", 2) / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING over a fact-fact join).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q18",
    oracle="""
    SELECT c.c_name AS c_name, c.c_custkey AS c_custkey,
           o.o_orderkey AS o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice AS o_totalprice, t.sum_qty AS sum_qty
    FROM (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300) t
    JOIN orders o   ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 300 units, with their customer; top 100 by order value.

    The aggregate-then-join order is the scale decision: summing
    lineitem to order grain *first* shrinks the fact-fact join's probe
    side by ~4× and makes the HAVING a cheap post-aggregation filter.
    Quantity sums over integer-valued doubles are exact, so no scaled
    arithmetic is needed. The top-k sorts only qualifying orders.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            dstr("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicate).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT {dsum_sql(_REV, 4)} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): revenue matching any of three
    brand × size × quantity predicate groups (container/shipmode
    clauses dropped with their columns).

    The OR-of-ANDs spans both join sides, so it can only be a residual
    filter on the join — but Catalyst still derives and pushes the
    *implied* single-side disjunctions (brand/size to the part scan,
    quantity range to lineitem), the classic Q19 optimization. Part
    stays broadcast after pruning to 3 columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    g1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    g2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    g3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return joined.filter(g1 | g2 | g3).agg(dsum(_rev_col(), 4).alias("revenue"))


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (scalar subquery + anti-join).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q22",
    oracle=f"""
    SELECT c.c_nationkey AS c_nationkey, COUNT(*) AS numcust,
           {dsum_sql("c.c_acctbal", 2)} AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT {davg_sql("c2.c_acctbal", 2)}
        FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY 1
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): nations of above-average-
    balance customers with no recent orders (nationkey stands in for
    the classic phone country code; "no orders at all" is empty in this
    corpus, so the anti-join is against recent orders).

    Shape preserved: an uncorrelated scalar subquery (1-row aggregate →
    broadcast) gates the balance, and the NOT EXISTS is a left-anti
    hash join against the date-filtered orders scan. The threshold is
    a scaled-long average, so the `>` boundary is bit-deterministic
    across engines — a plain double AVG here would make membership of
    boundary customers partition-order-dependent.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= ts_lit("1999-01-01")
    )
    cut = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", 2).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(cut))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, o.o_custkey == c.c_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (aggregate view + max-equality selection).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {dsum_sql(_REV, 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximum revenue
    over one quarter of shipments.

    Shape preserved: the classic REVENUE view is the grouped quarter
    aggregate; the max-selection is an uncorrelated scalar subquery
    (1-row aggregate, broadcast) compared against the view, then a
    broadcast join to the supplier dimension for the name. The shipdate
    predicate is on the scan (PushedFilters); the only shuffle is the
    groupBy(l_suppkey). Equality against MAX on a plain double sum
    would be partition-order-dependent — the scaled-long revenue makes
    the `=` boundary exact, so the winning set can't flap between
    engines or partitionings.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1997-01-01"))
        & (F.col("l_shipdate") < ts_lit("1997-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev_col(), 4).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )
