"""The partsupp/commit-date TPC-H family, re-derived from the slimmed
star schema (Q2, Q9, Q11, Q12, Q16, Q20, Q21).

The corpus has no ``partsupp`` table and no commit/receipt dates
(FIXTURES.md), so the classic forms of these seven queries cannot run
verbatim. Each adaptation here keeps the *query shape* — the join
topology, the correlation pattern (correlated min, nested IN,
EXISTS / NOT EXISTS), the aggregate-then-threshold structure — and
re-derives the missing relation from what the corpus does record:

- the part↔supplier catalog (partsupp's role) becomes the *observed*
  (l_partkey, l_suppkey) pairs in lineitem — "suppliers who have
  actually shipped this part" — with ``MIN(l_extendedprice /
  l_quantity)`` as the offer price (Q2) and shipped-quantity sums as
  the stock proxy (Q11/Q20);
- the commit/receipt lateness test becomes "shipped ≥ N days after
  the order date" — the same proxy q_tpch_q4 established (Q12/Q21);
- Q16's "customer complaints" supplier exclusion becomes a negative
  account balance.

Determinism discipline is the module-wide one (queries/_util.py):
money sums via scaled longs, threshold comparisons on the *integer*
accumulators (never on re-divided doubles, so HAVING/TOP-k boundaries
cannot flap between engines or partitionings), per-row doubles as
identical IEEE expression trees on both sides, output timestamps
rendered as strings.

Scale notes (100 TB):
- the derived offer/stock tables aggregate lineitem by (part, supp) —
  one shuffle at the widest grain any of these queries needs; every
  dimension join (part-filtered, supplier, nation, region) is an
  explicit ``broadcast()``;
- Q2's regional-minimum is a window over the *aggregated* offer table
  (|parts-in-filter| × |suppliers| rows, not lineitem grain);
- Q11's threshold is one scalar aggregate broadcast against the
  grouped view — the classic uncorrelated-subquery plan;
- Q21 replaces the classic double self-join (EXISTS + NOT EXISTS over
  lineitem) with one groupBy(orderkey) producing supplier/late-supplier
  distinct counts, then a single join back — two shuffles on the same
  key instead of three full self-joins; the oracle keeps the classic
  EXISTS form, proving the rewrite exact at every SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spype_spark.queries._util import dsum, dsum_sql, ts_lit
from spype_spark.registry import query
from spype_spark.tables import load_table

#: Revenue expression shared with tpch.py (4 true decimal places).
_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated regional minimum).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q2",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(floor((l_extendedprice / l_quantity) * 1e6 + 0.5)
                      AS BIGINT)) AS unit_cost_l
      FROM lineitem GROUP BY 1, 2
    ),
    eligible AS (
      SELECT p.p_partkey AS p_partkey, p.p_name AS p_name,
             s.s_name AS s_name, s.s_acctbal AS s_acctbal,
             n.n_name AS n_name, o.unit_cost_l AS unit_cost_l
      FROM offers o
      JOIN part p     ON p.p_partkey = o.l_partkey
      JOIN supplier s ON s.s_suppkey = o.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           CAST(unit_cost_l AS DOUBLE) / 1e6 AS unit_cost
    FROM (SELECT *, MIN(unit_cost_l) OVER (PARTITION BY p_partkey) AS best_l
          FROM eligible) t
    WHERE unit_cost_l = best_l
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier), adapted: the partsupp offer
    catalog becomes the observed (part, supplier) pairs in lineitem
    with ``MIN(l_extendedprice / l_quantity)`` as the offer price; for
    each size-15 part, the EUROPE suppliers matching the regional
    minimum offer, richest account first.

    Shape preserved: the classic correlated ``MIN(ps_supplycost)``
    subquery is the per-part window minimum over the *aggregated*
    offer table (|parts| × |suppliers| grain — lineitem is touched
    once, by the groupBy that builds the offers). part/supplier/
    nation/region are all broadcast. The boundary selection runs on
    scaled-long INTEGERS (floor(price/qty · 1e6 + 0.5), the module's
    standard discipline): MIN over int64 and an exact int64 equality
    against the per-part window minimum, so the survivor set cannot
    drift if the offer expression is ever re-associated or fed decimal
    inputs — no raw-double equality anywhere. ``unit_cost`` is
    rendered back to double (÷1e6) only in the output projection,
    identically in both engines.
    """
    offers = _li(spark, sf_dir).groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.floor(
                (F.col("l_extendedprice") / F.col("l_quantity")) * F.lit(1e6)
                + F.lit(0.5)
            ).cast("bigint")
        ).alias("unit_cost_l")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        offers.join(F.broadcast(p), offers.l_partkey == p.p_partkey)
        .join(F.broadcast(s), offers.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "unit_cost_l"
        )
    )
    best_l = F.min("unit_cost_l").over(Window.partitionBy("p_partkey"))
    return (
        eligible.withColumn("best_l", best_l)
        .filter(F.col("unit_cost_l") == F.col("best_l"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("unit_cost_l").cast("double") / F.lit(1e6)).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 — product type profit by nation and year.
# ---------------------------------------------------------------------------
#: Profit per line: revenue minus a 60%-of-retail cost stand-in for the
#: missing ps_supplycost. Association order is pinned — both engines
#: evaluate the identical IEEE expression tree.
_PROFIT = f"{_REV} - (p_retailprice * l_quantity) * 0.6"


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           {dsum_sql(_PROFIT, 4)} AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gizmo%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit), adapted: profit on every line
    of a 'gizmo' part, by supplier nation and order year. The missing
    ``ps_supplycost`` becomes a 60%-of-retail cost stand-in
    (``(p_retailprice * l_quantity) * 0.6``).

    Shape preserved exactly: the classic 6-way join minus partsupp —
    lineitem ⋈ part (name-filtered, broadcast) ⋈ supplier (broadcast)
    ⋈ nation (broadcast) ⋈ orders (the one data-proportional join: an
    orderkey shuffle at production scale, though below the broadcast
    threshold AQE turns even it into a broadcast at test SFs),
    grouped to (nation, year). The profit expression is pinned to one
    association order so both engines produce bit-identical per-row
    doubles; the sum is scaled-long (grid 1e-4), so group totals are
    partition-order-free.
    """
    li = _li(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gizmo%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = _rev_col() - (F.col("p_retailprice") * F.col("l_quantity")) * F.lit(0.6)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit, 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock (grouped value vs a global-fraction threshold).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q11",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey AS p_partkey,
             CAST(SUM(CAST(floor(({_REV}) * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_l
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT p_partkey, CAST(value_l AS DOUBLE) / 1e4 AS part_value
    FROM pv
    WHERE value_l > (2 * (SELECT CAST(SUM(value_l) AS BIGINT) FROM pv))
                    // (SELECT CAST(COUNT(*) AS BIGINT) FROM pv)
    ORDER BY part_value DESC, p_partkey
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), adapted: per-part shipped revenue
    for one nation's suppliers, keeping the parts worth more than 2×
    the nation's mean per-part value — partsupp's availqty·supplycost
    value becomes the lineitem revenue flow, and the classic
    SF-scaled fraction (0.0001/SF) becomes the mean-relative form so
    the survivor set stays non-degenerate at every corpus size.

    Shape preserved: grouped view + uncorrelated scalar-subquery
    threshold (one 1-row aggregate, broadcast). The boundary is
    compared on scaled-long *integers* via exact floor division —
    ``value_l > (2·total_l) div nparts`` — which for positive integers
    is equivalent to the rational ``value_l·nparts > 2·total_l`` (if
    q = (2T) div n and r the remainder: v·n > 2T ⟺ v > q+r/n ⟺ v ≥ q+1
    ⟺ v > q, using r < n), so the boundary part set is identical
    across engines and partitionings. Unlike the multiply form, the
    only product left is ``2·total_l``: DuckDB promotes SUM to
    HUGEINT (exact), and the Spark side carries a runtime
    ``assert_true(total_l ≤ 2^62)`` so int64 overflow is a loud error,
    not a silent non-ANSI wraparound — at true 100 TB the 1e4 scale
    grid drops to 1e2 and the same headroom argument holds.
    """
    li = _li(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    pv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(F.floor(_rev_col() * F.lit(1e4) + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("value_l")
        )
    )
    total = pv.agg(
        F.sum("value_l").cast("bigint").alias("total_l"),
        F.count("*").cast("bigint").alias("nparts"),
    )
    overflow_guard = F.assert_true(
        # strict <: at total_l == 2**62 exactly, 2*total_l == 2**63
        # already exceeds int64 max (2**63 - 1)
        F.col("total_l") < F.lit(2**62),
        F.lit("q11 scaled-long overflow: 2*total_l exceeds int64 headroom"),
    )
    return (
        pv.join(F.broadcast(total))
        # assert_true yields NULL on success (isNull keeps it in the plan
        # rather than letting column pruning drop the check), raises on
        # overflow — the guard the docstring's headroom argument demands.
        .filter(
            overflow_guard.isNull()
            & (
                F.col("value_l")
                > F.expr("(2 * total_l) div nparts").cast("bigint")
            )
        )
        .select(
            "p_partkey",
            (F.col("value_l").cast("double") / F.lit(1e4)).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping class / order priority (dual conditional counts).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate > o.o_orderdate + INTERVAL 180 DAY
      AND l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), adapted: lines
    shipped very late (>180 days after ordering, the q_tpch_q4 lateness
    proxy) during 1998, counted as high- vs low-priority per return
    flag — the corpus has no l_shipmode, so the two audited ship modes
    become the two audited return flags.

    Shape preserved exactly: fact-fact equi-join with the year window
    and flag filter on the lineitem scan (PushedFilters), the lateness
    test as a join residual, then dual conditional COUNTs over a 2-group
    aggregate (map-side partials move 2 rows per partition).
    """
    li = _li(spark, sf_dir).filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= ts_lit("1998-01-01"))
        & (F.col("l_shipdate") < ts_lit("1999-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 180 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q16 — part/supplier relationship (distinct count + NOT IN exclusion).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: how many
    distinct suppliers have shipped each surveyed (brand, type, size)
    combination — partsupp's catalog becomes the observed lineitem
    pairs, and the classic "complaints" supplier exclusion becomes a
    negative account balance.

    Shape preserved: brand/type/size-set filters on the broadcast part
    dimension, NOT IN → broadcast left-anti join against the (tiny)
    excluded-supplier set, then COUNT(DISTINCT suppkey) per combo —
    Spark plans the two-phase distinct aggregate (partial distinct by
    (combo, suppkey), then count), which is the 100 TB-safe form.
    """
    li = _li(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 23, 36, 45, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (nested IN with grouped HAVING).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q20",
    oracle="""
    SELECT s.s_name, s.s_suppkey
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_8'
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1999-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 20)
    ORDER BY s_name, s_suppkey
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: one nation's
    suppliers who moved a surplus (>20 units of some 'small' part)
    during 1998 — partsupp's availqty test becomes a shipped-quantity
    HAVING over the observed (supplier, part) pairs.

    Shape preserved: the classic double-nested IN — partkeys by name
    prefix (broadcast semi-join), then the grouped HAVING over
    lineitem, then suppkey IN → left-semi join from the supplier
    dimension — with the nation filter broadcast. Quantities are small
    integers in doubles, so SUM is exact (≪ 2^53) and the HAVING
    boundary cannot flap.
    """
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= ts_lit("1998-01-01"))
        & (F.col("l_shipdate") < ts_lit("1999-01-01"))
    )
    movers = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 20)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS).
# ---------------------------------------------------------------------------
@query(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, numwait FROM (
      SELECT s.s_name AS s_name, COUNT(*) AS numwait
      FROM lineitem l1
      JOIN orders o   ON o.o_orderkey = l1.l_orderkey
      JOIN supplier s ON s.s_suppkey = l1.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE o.o_orderstatus = 'F'
        AND l1.l_shipdate > o.o_orderdate + INTERVAL 150 DAY
        AND n.n_name = 'NATION_12'
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 150 DAY)
      GROUP BY s.s_suppkey, s.s_name) t
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: for one
    nation, count each supplier's very-late lines (>150 days, the
    lateness proxy) on finished multi-supplier orders where it was the
    *only* late supplier. Lateness replaces the missing
    receipt-vs-commit test; everything else is the classic query.

    The oracle keeps the classic EXISTS / NOT EXISTS form; the Spark
    plan is the scale-correct aggregate rewrite — one
    groupBy(orderkey) derives (distinct suppliers, distinct late
    suppliers) per order, and a late line qualifies iff nsupp > 1 and
    nlatesupp = 1 (the line's own supplier then IS the unique late
    one). Two shuffles on orderkey replace the classic pair of full
    lineitem self-joins; the differential check proves the rewrite
    row-exact at every SF.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lo = (
        _li(spark, sf_dir)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 150 DAYS")
            ).alias("late"),
        )
    )
    stats = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "nlatesupp"
        ),
    )
    waits = (
        lo.filter(F.col("late"))
        .join(stats, "l_orderkey")
        .filter((F.col("nsupp") > 1) & (F.col("nlatesupp") == 1))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_12")
    return (
        waits.join(F.broadcast(s), waits.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
