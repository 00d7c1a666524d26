"""Joins (SURVEY.md §2.B "Joins").

Join-strategy policy for 100 TB (documented per query below):
- dimension tables (region/nation/supplier/part here) are explicitly
  `broadcast()` — no shuffle of the fact side, ever;
- fact⋈fact equi-joins (orders⋈lineitem) shuffle on the join key; both
  sides partition-prune and push filters before the shuffle; at cluster
  scale these would be bucketed on the key to skip the shuffle entirely;
- the non-equi band join is rewritten as an *equi* join on a derived
  bucket key (the classic range-join optimization) instead of the
  O(n²) BroadcastNestedLoop Spark would otherwise plan;
- the as-of join is a union + partitioned sort (one shuffle), not a
  per-row lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spype_spark.queries._util import dstr, dsum, dsum_sql
from spype_spark.registry import query
from spype_spark.tables import load_table


@query(
    "q_join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders⋈customer on custkey.

    customer is ~1/10 the size of orders: below the broadcast threshold
    at test scale (Spark picks BroadcastHashJoin itself); at 100 TB with
    a huge customer table this becomes a shuffle hash/sort-merge join on
    the uniformly-distributed key.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: customers kept even without orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_full",
    oracle="""
    WITH a AS (
      SELECT o_custkey AS k, COUNT(*) AS n95 FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
      GROUP BY o_custkey
    ),
    b AS (
      SELECT o_custkey AS k, COUNT(*) AS n00 FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        AND o_orderdate < TIMESTAMP '2001-01-01'
      GROUP BY o_custkey
    )
    SELECT COALESCE(a.k, b.k) AS custkey, a.n95, b.n00
    FROM a FULL JOIN b ON a.k = b.k
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregated year-slices (gaps on both sides)."""
    o = load_table(spark, sf_dir, "orders")

    def year_counts(y: int, alias: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp_ntz"))
            )
            .groupBy(F.col("o_custkey").alias("k"))
            .agg(F.count("*").alias(alias))
        )

    a = year_counts(1995, "n95")
    b = year_counts(2000, "n00").withColumnRenamed("k", "k2")
    return a.join(b, a.k == b.k2, "full").select(
        F.coalesce("k", "k2").alias("custkey"), "n95", "n00"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having a >300k order.

    Semi joins never duplicate the left side and the right side reduces
    to its distinct keys — far cheaper than join+distinct at scale.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no order over 200k.

    (Filtered on the build side so the result is non-empty in this
    corpus — every customer has *some* order.)
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small cartesian product (5×25) — only ever sane on tiny inputs."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dimension): revenue by brand.

    `broadcast(part)` forces BroadcastHashJoin: the 600 M-row (at SF100k)
    lineitem side streams through map-side, with zero shuffle before the
    6-group aggregate. part stays broadcastable to ~SF1000; beyond that,
    fall back to a bucketed shuffle join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            .alias("revenue"),
        )
    )


@query(
    "q_join_3way",
    oracle=f"""
    SELECT n_name,
           COUNT(*) AS n_lines,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_join_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation: customer⋈orders⋈lineitem⋈nation (bench flagship).

    Join order: lineitem⋈orders first (largest reduction via the fact
    keys, shuffle on orderkey), then the result ⋈ customer (shuffle on
    custkey), then ⋈ broadcast(nation) — the 25-row dimension never
    forces a shuffle. At 100 TB, bucketing orders+lineitem on orderkey
    removes the first shuffle entirely; AQE handles any custkey skew.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            .alias("revenue"),
        )
    )


@query(
    "q_join_theta_range",
    oracle="""
    WITH pairs AS (
      SELECT a.p_partkey AS key_a,
             ABS(a.p_retailprice - b.p_retailprice) AS price_gap
      FROM part a JOIN part b
        ON a.p_partkey < b.p_partkey
       AND ABS(a.p_retailprice - b.p_retailprice) <= 1.0
    )
    SELECT key_a, COUNT(*) AS n_pairs,
           CAST(SUM(CAST(floor(price_gap * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_gap_cents
    FROM pairs GROUP BY key_a
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) self-join: part pairs within ±1.0 of retail price.

    Implemented as an *equi* join on integer price buckets: side A
    probes buckets {⌊p⌋-1, ⌊p⌋, ⌊p⌋+1} (an explode of 3 rows), side B
    is keyed by ⌊p⌋, and the exact band predicate filters after the hash
    match. This turns what Spark would plan as an O(n²)
    BroadcastNestedLoopJoin into a shuffle hash join whose cost is
    n × (bucket density) — the standard range-join optimization that
    survives 100 TB, with the bucket width tuned to the band.
    """
    from spype_spark.functions import band_join

    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_retailprice").alias("price_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_retailprice").alias("price_b"),
    )
    return (
        band_join(a, b, "price_a", "price_b", band=1.0)
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            F.abs(F.col("price_a") - F.col("price_b")).alias("price_gap"),
        )
        # Aggregate the ~n·density pair set instead of materializing it:
        # at sf0.1 the raw pair output is 4.2 M rows, and at any real
        # scale shipping the cross-pair table out of the engine is the
        # bug, not the feature. The per-key (count, exact scaled-sum)
        # profile pins the same join semantics — any missing/spurious
        # pair shifts a count and a cents-exact sum — at 1/200 the
        # result volume. Gap sums are floor(gap·100 + 0.5) BIGINTs:
        # order-independent exact integers, immune to float sum order.
        .groupBy("key_a")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.floor(F.col("price_gap") * F.lit(1e2) + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("sum_gap_cents"),
        )
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT e.event_id, e.user_id,
           strftime(o.o_orderdate, '%Y-%m-%d') AS last_order_d
    FROM events e
    ASOF LEFT JOIN orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the most recent order at-or-before it.

    Spark has no native ASOF JOIN; this uses the union-tag + windowed
    last(ignorenulls) rewrite: append order rows (carrying their date)
    and event rows (carrying null) into one stream, sort within each
    user by (time, tag) with orders first on ties (>= semantics), and
    propagate the last seen order date forward. Cost: ONE shuffle on
    user_id + a partition-local sort — the same asymptotics kdb/Flink
    use for temporal joins, vs. the naive per-event subquery. Ties on
    o_orderdate yield the same date either way → deterministic output.
    """
    from spype_spark.functions import asof_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    out = asof_join(
        ev,
        od,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderdate"],
    )
    return out.select(
        "event_id", "user_id", dstr("o_orderdate").alias("last_order_d")
    )


@query(
    "q_join_bucketed",
    oracle="""
    SELECT o_orderkey,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100 AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) join: ZERO shuffles for join AND aggregate.

    Library-op pair from :mod:`spype_spark.bucketing`:
    :func:`bucketize` pays the one-time clustered write (8 buckets +
    in-bucket sort per side), :func:`bucketed_join` then plans the
    equi-join with NO Exchange on either side (bucket i joins bucket
    i), and the follow-up groupBy on the same key reuses that
    partitioning — the executed plan contains no Exchange at all
    (asserted in tests/test_plans.py). This is THE 100 TB pattern for
    repeated fact-fact joins: the contract runs both calls end-to-end,
    but a real pipeline bucketizes once at ingest and joins forever.
    Revenue uses the scaled-long sum so the result is
    order-independent (exact double).
    """
    from spype_spark.bucketing import bucketed_join, bucketize

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    ot = bucketize(o, "o_orderkey", "orders_b", n_buckets=8)
    lt = bucketize(li, "l_orderkey", "lineitem_b", n_buckets=8)
    return (
        bucketed_join(spark, ot, lt, "o_orderkey", "l_orderkey")
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            (
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                        "long"
                    )
                ).cast("double")
                / 100
            ).alias("revenue"),
        )
    )


@query(
    "q_join_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT o_custkey,
             date_trunc('month', MIN(o_orderdate)) AS lo,
             date_trunc('month', MAX(o_orderdate)) AS hi
      FROM orders GROUP BY o_custkey
    ),
    expanded AS (
      SELECT o_custkey,
             unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m
      FROM iv
    )
    SELECT strftime(m, '%Y-%m') AS month,
           COUNT(DISTINCT o_custkey) AS n_active
    FROM expanded
    GROUP BY 1
    """,
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via bounded expansion: per-customer
    activity intervals [first order month, last order month] × the
    month dimension → customers active per month.

    The scale-safe formulation of interval × interval overlap: instead
    of the O(n·m) range predicate (which Spark plans as a
    BroadcastNestedLoopJoin), the BOUNDED side expands to its covered
    months (sequence + explode — at most interval-length rows each)
    and the overlap becomes a hash-aggregate on the month key. The
    same expand-the-bounded-side trick behind band_join, applied to
    two-sided intervals.
    """
    o = load_table(spark, sf_dir, "orders")
    iv = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    expanded = iv.select(
        "o_custkey",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("m"),
    )
    return expanded.groupBy(
        F.date_format("m", "yyyy-MM").alias("month")
    ).agg(F.countDistinct("o_custkey").alias("n_active"))


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH p AS (
      SELECT event_id AS p_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT event_id AS v_id, user_id, CAST(ts AS TIMESTAMP) AS v_ts
      FROM events WHERE event_type = 'view'
    ),
    cand AS (
      SELECT p.p_id, p.user_id, v.v_id,
             abs(epoch_us(p.p_ts) - epoch_us(v.v_ts)) AS adt
      FROM p JOIN v
        ON v.user_id = p.user_id
       AND v.v_ts >= p.p_ts - INTERVAL 2 HOUR
       AND v.v_ts <= p.p_ts + INTERVAL 2 HOUR
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY p_id
                  ORDER BY adt, v_id) AS rnk
      FROM cand
    )
    SELECT p_id, user_id, v_id AS nearest_view, adt // 1000 AS gap_ms
    FROM best WHERE rnk = 1
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-asof join: each purchase matched to the same user's
    CLOSEST view in time, either direction, within a ±2 h tolerance —
    the bidirectional generalization of q_join_asof (backward-only),
    the sensor-fusion / interaction-attribution alignment primitive.

    The tolerance is what makes it scale: the user equi-join's fan-out
    is bounded by views-per-user-per-4-hours, never the full history.
    Candidate distance is exact integer microseconds, and the winner
    per purchase is ONE min-of-struct aggregate — (adt, v_id) compares
    lexicographically, ties breaking deterministically toward the
    lower view id — which partial-aggregates map-side (each shuffle
    partition ships one candidate struct per purchase), where the
    textbook row_number() window would ship every candidate to the
    shuffle. The oracle states the same semantics in the window form;
    the differential check proves the aggregate rewrite equals it
    row-for-row.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    tol = F.expr("INTERVAL 2 HOURS")
    cand = p.join(
        v,
        (p.user_id == v.v_user)
        & (v.v_ts >= p.p_ts - tol)
        & (v.v_ts <= p.p_ts + tol),
    ).select(
        "p_id",
        "user_id",
        "v_id",
        F.abs(F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("v_ts"))).alias(
            "adt"
        ),
    )
    best = cand.groupBy("p_id", "user_id").agg(
        F.min(F.struct("adt", "v_id")).alias("w")
    )
    return best.select(
        "p_id",
        "user_id",
        F.col("w.v_id").alias("nearest_view"),
        (F.col("w.adt") / F.lit(1000)).cast("long").alias("gap_ms"),
    )


@query(
    "q_join_bloom",
    oracle="""
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
    )
    SELECT
      COUNT(*) AS n_orders,
      (SELECT COUNT(*) FROM orders o
        WHERE EXISTS (SELECT 1 FROM dim d
                      WHERE d.c_custkey = o.o_custkey)) AS n_exact,
      0 AS false_negatives,
      true AS fp_ok
    FROM orders
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning — the runtime row-level filter
    that cuts a 100 TB fact shuffle before it happens: build one
    128 KB bloom over the selective dimension's keys (distributed
    ``bit_or`` word packing — :func:`spype_spark.functions.
    bloom_build`; Spark's internal ``bloom_filter_agg`` isn't a
    registered routine), ship it to every fact task as a literal, and
    pre-filter fact rows with k JVM hash probes BEFORE the join
    shuffle. Spark's InjectRuntimeFilter does this automatically
    inside a single query; the explicit form is for staged pipelines
    where the dim side is computed in an earlier job. Candidate counts
    depend on the filter's false positives, so the contract hashes
    only the engine-independent invariants: exact match count, ZERO
    false negatives (a bloom's hard guarantee — a miss would be data
    loss), and the false-positive count under the sizing bound
    (m=2²⁰, k=5 → fp < 1.1% out to 10⁵ keys; 2% is the gate).
    """
    from spype_spark.functions import bloom_build, bloom_might_contain

    orders = load_table(spark, sf_dir, "orders")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select("c_custkey")
    )
    words = bloom_build(dim, "c_custkey")
    flagged = orders.join(
        F.broadcast(dim.withColumn("__hit", F.lit(1))),
        orders.o_custkey == dim.c_custkey,
        "left",
    ).select(
        bloom_might_contain(words, "o_custkey").alias("in_bloom"),
        F.coalesce(F.col("__hit"), F.lit(0)).alias("in_exact"),
    )
    agg = flagged.agg(
        F.count("*").alias("n_orders"),
        F.sum("in_exact").cast("long").alias("n_exact"),
        F.sum(
            (F.col("in_exact") == 1).cast("long")
            * (~F.col("in_bloom")).cast("long")
        ).cast("long").alias("false_negatives"),
        F.sum(
            (F.col("in_exact") == 0).cast("long")
            * F.col("in_bloom").cast("long")
        ).cast("long").alias("n_fp"),
    )
    return agg.select(
        "n_orders",
        "n_exact",
        "false_negatives",
        (
            F.col("n_fp")
            <= F.lit(0.02) * (F.col("n_orders") - F.col("n_exact")) + F.lit(1)
        ).alias("fp_ok"),
    )
