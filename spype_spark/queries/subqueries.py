"""Subqueries and null-handling (SURVEY.md §2.B extension rows).

Exercises Spark SQL's subquery planner: scalar subqueries (compiled to
a broadcast of the 1-row aggregate), IN-subqueries (→ left-semi join),
and correlated aggregates (→ rewritten as a keyed join). All inner
aggregates use the scaled-long exact-average pattern so the comparison
boundary is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spype_spark.registry import query
from spype_spark.tables import load_table

#: deterministic avg(o_totalprice): exact scaled-long sum / count
_AVG = "(SUM(floor(o_totalprice * 1e2 + 0.5)) / 1e2) / COUNT(*)"


@query(
    "q_subquery_scalar",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT {_AVG} FROM orders)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above 1.8× the global mean.

    Spark plans the inner aggregate once and broadcasts the scalar —
    no per-row recomputation; the exact-average formulation keeps the
    predicate boundary bit-identical to the oracle.
    """
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("spype_sq_orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM spype_sq_orders
        WHERE o_totalprice > 1.8 * (SELECT {_AVG} FROM spype_sq_orders)
        """
    )


@query(
    "q_subquery_in",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    )
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (planned as left-semi join on the distinct inner keys)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("spype_sq_cust")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("spype_sq_ord")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM spype_sq_cust
        WHERE c_custkey IN (
          SELECT o_custkey FROM spype_sq_ord
          WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        )
        """
    )


@query(
    "q_subquery_correlated",
    oracle=f"""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      SELECT {_AVG.replace('o_totalprice', 'i.o_totalprice')}
      FROM orders i WHERE i.o_custkey = o.o_custkey
    )
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated aggregate subquery: orders 1.5× above their customer's
    own mean (decorrelated by Spark into a join with a grouped agg)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("spype_sq_orders_c")
    return spark.sql(
        f"""
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM spype_sq_orders_c o
        WHERE o.o_totalprice > 1.5 * (
          SELECT {_AVG.replace('o_totalprice', 'i.o_totalprice')}
          FROM spype_sq_orders_c i WHERE i.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "q_null_handling",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           o.o_orderkey IS NULL AS no_2001_order,
           COALESCE(o.o_totalprice, -1.0) AS price_filled,
           CASE WHEN o.o_totalprice IS NULL THEN 'missing'
                ELSE 'present' END AS presence
    FROM customer c
    LEFT JOIN (SELECT * FROM orders
               WHERE o_orderdate >= TIMESTAMP '2001-01-01') o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics end-to-end: outer-join nulls, IS NULL, COALESCE,
    CASE-on-null — the corpus itself is null-free, so the nulls are
    *produced* relationally and then handled."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        "o_orderkey",
        F.col("o_orderkey").isNull().alias("no_2001_order"),
        F.coalesce("o_totalprice", F.lit(-1.0)).alias("price_filled"),
        F.when(F.col("o_totalprice").isNull(), "missing")
        .otherwise("present")
        .alias("presence"),
    )


@query(
    "q_sample_seeded",
    oracle="""
    SELECT COUNT(*) AS n_source, TRUE AS frac_in_bounds
    FROM lineitem
    """,
)
def q_sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample invariants (fraction 0.1, seed 42).

    The sampled row SET is engine-specific (per-partition XORShift
    streams never match another engine), so the driver-checkable
    surface is the statistical invariant: the sampled fraction lands
    inside [0.08, 0.12] of the (data-dependent) source count — a
    Bernoulli(0.1) sample at n = 60 000 sits within ±4σ of that window.
    At 100 TB this is the standard cheap-profiling primitive:
    scan-local, no shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    n_src = li.agg(F.count("*").alias("n_source"))
    n_smp = li.sample(fraction=0.1, seed=42).agg(
        F.count("*").alias("__n_sampled")
    )
    return n_src.crossJoin(n_smp).select(
        "n_source",
        (
            (F.col("__n_sampled") >= F.col("n_source") * 0.08)
            & (F.col("__n_sampled") <= F.col("n_source") * 0.12)
        ).alias("frac_in_bounds"),
    )


@query(
    "q_subquery_lateral",
    oracle="""
    SELECT c_custkey, t.max_price, t.n_orders
    FROM customer, LATERAL (
      SELECT max(o_totalprice) AS max_price, COUNT(*) AS n_orders
      FROM orders WHERE o_custkey = c_custkey) t
    WHERE t.n_orders > 0
    """,
)
def q_subquery_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated table subquery: per-customer order stats.

    The table-valued correlation form (SQL:1999 LATERAL, Spark 3.2+ /
    DuckDB native): the subquery runs "per outer row" semantically,
    and both planners decorrelate it into a keyed aggregate + join —
    the plan one would hand-write, derived from the declarative form.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("spype_lat_customer")
    o.createOrReplaceTempView("spype_lat_orders")
    return spark.sql(
        """
        SELECT c_custkey, t.max_price, t.n_orders
        FROM spype_lat_customer, LATERAL (
          SELECT max(o_totalprice) AS max_price, COUNT(*) AS n_orders
          FROM spype_lat_orders WHERE o_custkey = c_custkey) t
        WHERE t.n_orders > 0
        """
    )


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT date_trunc('month', (SELECT MIN(o_orderdate) FROM orders))
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < date_trunc('month', (SELECT MAX(o_orderdate) FROM orders))
    )
    SELECT strftime(m, '%Y-%m') AS month,
           (SELECT COUNT(*) FROM orders o
            WHERE date_trunc('month', o.o_orderdate) = m) AS n_orders
    FROM months
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate the month spine
    from min to max order date, then count orders per month — months
    with zero orders appear with n_orders = 0.

    The canonical recursion use (dimension-spine generation) on the
    one engine feature Spark only gained in 4.x; the correlated scalar
    count decorrelates to an outer-joined aggregate in both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("spype_rc_orders")
    # Bounds are computed ONCE as a 1-row aggregate and inlined as
    # literals: with scalar subqueries in the recursive term, Spark
    # re-evaluates MIN/MAX over orders on EVERY recursion step (~84
    # full rescans for this spine — measured 10 s vs 1 s at sf0.01).
    # A two-value bounds fetch is a dimension-sized scalar, not a
    # driver-side data loop.
    lo, hi = o.selectExpr(
        "date_format(date_trunc('month', MIN(o_orderdate)),"
        " 'yyyy-MM-dd HH:mm:ss') AS lo",
        "date_format(date_trunc('month', MAX(o_orderdate)),"
        " 'yyyy-MM-dd HH:mm:ss') AS hi",
    ).first()
    if lo is None:
        # Empty orders: MIN/MAX aggregate to NULL and the literals
        # below would render as TIMESTAMP 'None' (opaque parse error).
        # Return the empty result with the output schema, matching the
        # scalar-subquery form's behavior on an empty spine.
        return spark.createDataFrame(
            [], "month string, n_orders bigint not null"
        )
    return spark.sql(
        f"""
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '{lo}'
          UNION ALL
          SELECT m + INTERVAL '1' MONTH FROM months
          WHERE m < TIMESTAMP '{hi}'
        )
        SELECT date_format(m, 'yyyy-MM') AS month,
               (SELECT COUNT(*) FROM spype_rc_orders o
                WHERE date_trunc('month', o.o_orderdate) = m) AS n_orders
        FROM months
        """
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH l AS (SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS k
               FROM orders),
         r AS (SELECT DISTINCT NULLIF(o_orderstatus, 'O') AS k,
                      COALESCE(NULLIF(o_orderstatus, 'O'), 'NULLKEY')
                        AS label
               FROM orders)
    SELECT label, COUNT(*) AS n
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY label
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing.

    The join-family row a plain equi-join can't express: keys are
    derived with NULLIF so one group is genuinely NULL, and the
    null-safe comparison keeps those rows joined (a standard-join
    formulation would silently drop the whole NULL partition). Spark
    plans <=> as a hash join on a null-safe key, not a BNLJ.
    """
    o = load_table(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    left = o.select("o_orderkey", key.alias("k"))
    right = (
        o.select(
            key.alias("k"),
            F.coalesce(key, F.lit("NULLKEY")).alias("label"),
        )
        .distinct()
    )
    return (
        left.join(right, left["k"].eqNullSafe(right["k"]))
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_quality_audit",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
        AS null_custkeys,
      (SELECT COUNT(*) FROM orders o ANTI JOIN customer c
         ON o.o_custkey = c.c_custkey) AS orphan_orders,
      (SELECT COUNT(*) FROM lineitem l ANTI JOIN orders o
         ON l.l_orderkey = o.o_orderkey) AS orphan_lineitems,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
        AS nonpositive_qty,
      (SELECT COUNT(*) FROM orders WHERE o_totalprice < 0)
        AS negative_price,
      (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
        AS dup_orderkeys
    """,
)
def q_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: one row of violation counters — null keys,
    referential orphans (anti-joins against the parent tables),
    domain-range violations, and primary-key duplicates.

    The expectations-suite pattern as a single fused plan: each check
    is an aggregate or anti-join the optimizer runs over one pass of
    each table; a pipeline gates promotion on "all counters zero". On
    this corpus all six ARE zero — the audit proving it is the
    contract, and any future corpus regression flips the hash.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    # every counter is a lazy 1-row aggregate; the cross joins of
    # single rows fuse the audit into ONE submitted plan — no
    # driver-side counting between checks
    nulls = o.agg(
        F.sum(F.col("o_custkey").isNull().cast("long")).alias(
            "null_custkeys"
        )
    )
    orph_o = o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
        F.count("*").alias("orphan_orders")
    )
    orph_li = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(
        F.count("*").alias("orphan_lineitems")
    )
    domains = li.agg(
        F.sum((F.col("l_quantity") <= 0).cast("long")).alias(
            "nonpositive_qty"
        )
    )
    keys = o.agg(
        F.sum((F.col("o_totalprice") < 0).cast("long")).alias(
            "negative_price"
        ),
        (F.count("*") - F.countDistinct("o_orderkey")).alias(
            "dup_orderkeys"
        ),
    )
    return (
        nulls.crossJoin(orph_o)
        .crossJoin(orph_li)
        .crossJoin(domains)
        .crossJoin(keys)
    )
