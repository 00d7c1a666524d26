"""Streaming-semantics queries, batch analogs (SURVEY.md §2.B "Streaming").

Each query here defines the *semantics* (tumbling/sliding/session
windows, dedup, running state) on the finite events table as a normal
batch plan, oracle-checked against DuckDB. The true Structured Streaming
variants (readStream + Trigger.AvailableNow + watermarks) live in
:mod:`spype_spark.streaming` and are asserted equal to these analogs in
tests — on a finite input the watermark has passed everything, so the
answers must coincide.

Time discipline: events.ts is nanosecond-precision in Parquet. Spark
loads it µs-truncated (tables.load_table); the oracle SQL casts DuckDB's
TIMESTAMP_NS to TIMESTAMP (µs, same truncation) and all gap/duration
arithmetic is integer microseconds on both sides — no float time math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spype_spark.queries._util import TS_FMT_SPARK, tstr
from spype_spark.registry import query
from spype_spark.tables import load_table


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1e6 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per 1-hour tumbling window × event type.

    Uses the real `window()` grouping (the same expression a streaming
    job uses) and flattens window.start to a formatted string. In
    streaming mode this runs with a watermark and emits finalized
    windows incrementally; state per key is one partial aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)))
                / F.lit(1e6)
            ).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), TS_FMT_SPARK).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "q_stream_sliding",
    oracle="""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, event_type FROM events),
    w AS (
      SELECT make_timestamp(
               (epoch_us(t) // 900000000) * 900000000
                 - CAST(k.k AS BIGINT) * 900000000
             ) AS win_start,
             event_type
      FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, COUNT(*) AS n
    FROM w GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts per 1-hour window sliding every 15 minutes.

    Spark's window(ts, '1 hour', '15 minutes') assigns each event to 4
    overlapping windows; the oracle reproduces the same grid with
    integer epoch-µs arithmetic (window start = 15-min-floor(ts) − k·15
    min, k ∈ 0..3).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("win.start"), TS_FMT_SPARK).alias("win_start"),
            "event_type",
            "n",
        )
    )


@query(
    "q_stream_session",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN us - lag(us) OVER w IS NULL THEN 1
                  WHEN us - lag(us) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sessions AS (
      SELECT *,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id,
           CAST(session_idx AS INT) AS session_idx,
           COUNT(*) AS n_events,
           strftime(MIN(t), '%Y-%m-%d %H:%M:%S') AS session_start,
           (MAX(us) - MIN(us)) // 1000000 AS duration_s
    FROM sessions
    GROUP BY user_id, session_idx
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization with a 30-minute inactivity gap.

    Batch rewrite of session_window: lag → gap flag → running sum
    assigns session ids (one shuffle on user_id, partition-local sort).
    All gap/duration math is integer microseconds. The streaming
    variant uses session_window(ts, '30 minutes') with a watermark —
    merging windows with bounded state.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = ev.select("user_id", "event_id", F.col("ts"), us.alias("us"))
    flagged = e.withColumn(
        "is_new",
        F.when(F.col("us") - F.lag("us").over(w) > 1_800_000_000, 1)
        .when(F.lag("us").over(w).isNull(), 1)
        .otherwise(0),
    )
    sess = flagged.withColumn("session_idx", F.sum("is_new").over(wrun))
    return sess.groupBy("user_id", F.col("session_idx").cast("int").alias("session_idx")).agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), TS_FMT_SPARK).alias("session_start"),
        F.expr("(max(us) - min(us)) div 1000000").alias("duration_s"),
    )


@query(
    "q_events_hourly_agg",
    oracle="""
    SELECT user_id, event_type,
           strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS hour_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1e6 AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY n DESC, user_id, event_type, hour_start
    LIMIT 100
    """,
)
def q_events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE.md's hourly-activity query: user × type × hour, top 100.

    Hash aggregate on a three-part key then TakeOrderedAndProject for
    the global top-100 (per-partition heaps, no full sort). Unique
    tiebreak (user, type, hour) makes the selected set deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
        )
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)))
                / F.lit(1e6)
            ).alias("sum_value"),
        )
        # format AFTER the aggregate: one string per group, not per row
        .select(
            "user_id",
            "event_type",
            F.date_format("hour_ts", TS_FMT_SPARK).alias("hour_start"),
            "n",
            "sum_value",
        )
        .orderBy(
            F.desc("n"), F.asc("user_id"), F.asc("event_type"), F.asc("hour_start")
        )
        .limit(100)
    )


@query(
    "q_ts_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS lo,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS hi
      FROM events WHERE event_type = 'purchase'
    ),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
      FROM bounds
    ),
    actual AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
             COUNT(*) AS n
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    )
    SELECT strftime(g.hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_start,
           COALESCE(a.n, 0) AS n
    FROM grid g LEFT JOIN actual a ON g.hour_ts = a.hour_ts
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hourly grid with zero-filled
    holes (resample semantics).

    The grid is generated relationally (sequence + explode over the
    min/max bounds — one row in, |hours| rows out, no driver loop) and
    left-joined with the actual hourly counts. At scale the grid side
    is trivially small and broadcast; the pattern generalizes to any
    resample interval.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    hour = F.date_trunc("hour", F.col("ts"))
    actual = ev.groupBy(hour.alias("hour_ts")).agg(F.count("*").alias("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts")
    )
    return (
        grid.join(actual, "hour_ts", "left")
        .select(
            F.date_format("hour_ts", TS_FMT_SPARK).alias("hour_start"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


@query(
    "q_stream_lake_upsert",
    oracle="""
    SELECT user_id, event_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC,
                        event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def q_stream_lake_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC stream → lakehouse conditional MERGE, true streaming drain.

    The only contract that runs a REAL Structured Streaming query:
    events split into random-order files, drained one file per
    micro-batch, each batch conditionally merge_upsert'ed into a
    versioned-Parquet table with "newer (ts, event_id) wins"
    (:func:`spype_spark.streaming.jobs.run_stream_lake_upsert`). The
    condition makes the upsert a max-semilattice, so ANY arrival order
    converges to the oracle's answer — the global latest event per
    user. Deterministic under AvailableNow; exercises MERGE
    WHEN MATCHED AND <cond>, the atomic commit protocol, and
    foreachBatch in one driver-hash-checked path.
    """
    from spype_spark.streaming.jobs import run_stream_lake_upsert

    return run_stream_lake_upsert(spark, sf_dir)


@query(
    "q_stream_txn_sink",
    oracle="""
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS hour_ts,
           COUNT(*) AS n_events,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users
    FROM events
    GROUP BY date_trunc('hour', CAST(ts AS TIMESTAMP))
    """,
)
def q_stream_txn_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once MULTI-TABLE streaming sink: each micro-batch lands
    in a latest-per-user table AND an additive hourly-counts table in
    ONE catalog transaction keyed (app_id, batch id); the whole stream
    is then REPLAYED against a fresh checkpoint and every batch must
    no-op through the idempotent-writer ledger (asserted in-job). The
    additive table is deliberately non-idempotent — a single
    double-applied batch breaks the count oracle, so the driver's
    hash check IS the exactly-once verdict.
    See :func:`spype_spark.streaming.jobs.run_stream_txn_sink`.
    """
    from spype_spark.streaming.jobs import run_stream_txn_sink

    return run_stream_txn_sink(spark, sf_dir)


@query(
    "q_stream_dedup_watermark",
    oracle="""
    SELECT COUNT(DISTINCT event_id) AS n_unique_events,
           COUNT(DISTINCT user_id) AS n_users,
           strftime(MIN(CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(MAX(CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events
    """,
)
def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-id dedup (batch analog of watermarked dropDuplicates).

    Streaming runs withWatermark('ts','1 hour').dropDuplicates(
    ['event_id']) — state is bounded by the watermark horizon. The
    summary (unique events / users / span) is deterministic because
    event_id is unique in the corpus (dedup survivor choice can't
    change any aggregate), so the oracle recomputes it with DISTINCT
    aggregation; the streaming-equals-batch assertion lives in
    tests/test_streaming.py.
    """
    ev = load_table(spark, sf_dir, "events")
    deduped = ev.dropDuplicates(["event_id"])
    return deduped.agg(
        F.count("*").alias("n_unique_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.date_format(F.min("ts"), TS_FMT_SPARK).alias("first_ts"),
        F.date_format(F.max("ts"), TS_FMT_SPARK).alias("last_ts"),
    )


@query(
    "q_stream_stateful_running",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER (PARTITION BY user_id
                          ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                          ROWS UNBOUNDED PRECEDING) AS running_n
    FROM events
    """,
)
def q_stream_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user event count at each event (stateful semantics).

    Batch analog of an update-mode streaming aggregation (the streaming
    variant keeps one counter per user via applyInPandasWithState; see
    spype_spark.streaming). Window cumsum with unique (ts, event_id)
    ordering — deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.count("*").over(w).alias("running_n")
    )


@query(
    "q_ts_interpolate",
    oracle="""
    WITH src AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
             COUNT(*) AS n
      FROM events WHERE event_type = 'purchase' AND value >= 90
      GROUP BY 1
    ),
    bounds AS (SELECT MIN(hour_ts) AS lo, MAX(hour_ts) AS hi FROM src),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
      FROM bounds
    ),
    j AS (SELECT g.hour_ts, s.n FROM grid g LEFT JOIN src s USING (hour_ts)),
    w AS (
      SELECT hour_ts, n,
        last_value(n IGNORE NULLS) OVER
          (ORDER BY hour_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN n IS NOT NULL THEN hour_ts END IGNORE NULLS) OVER
          (ORDER BY hour_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(n IGNORE NULLS) OVER
          (ORDER BY hour_ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN n IS NOT NULL THEN hour_ts END IGNORE NULLS) OVER
          (ORDER BY hour_ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j
    )
    SELECT strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_start,
           CASE WHEN n IS NOT NULL THEN 0 ELSE 1 END AS filled,
           round(CASE
             WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
             WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
             WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
             ELSE pv + (nv - pv)
                  * (CAST(epoch(hour_ts) AS DOUBLE) - CAST(epoch(pt) AS DOUBLE))
                  / (CAST(epoch(nt) AS DOUBLE) - CAST(epoch(pt) AS DOUBLE))
           END, 6) AS n_interp
    FROM w
    """,
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation: missing grid hours get the
    straight line between their last and next observed values (edges
    forward/back-fill) — the resample-and-interpolate primitive.

    Two global-ordered window passes (running last/first with
    ignorenulls) — the same single-shuffle shape as the as-of join. The
    demo series is one global series, so the window is unpartitioned;
    a real deployment interpolates per series key (partitionBy(series))
    and the plan shards accordingly. Arithmetic is identical IEEE
    double ops on both engines, rounded at 1e-6.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("value") >= 90)
    )
    hour = F.date_trunc("hour", F.col("ts"))
    src = ev.groupBy(hour.alias("hour_ts")).agg(F.count("*").alias("n"))
    bounds = src.agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour_ts"
        )
    )
    j = grid.join(src, "hour_ts", "left")
    w_prev = Window.orderBy("hour_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_next = Window.orderBy("hour_ts").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_ts = F.when(F.col("n").isNotNull(), F.col("hour_ts"))
    pv = F.last("n", ignorenulls=True).over(w_prev).cast("double")
    pt = F.last(obs_ts, ignorenulls=True).over(w_prev)
    nv = F.first("n", ignorenulls=True).over(w_next).cast("double")
    nt = F.first(obs_ts, ignorenulls=True).over(w_next)
    sec = lambda c: c.cast("long").cast("double")  # noqa: E731
    frac = (sec(F.col("hour_ts")) - sec(pt)) / (sec(nt) - sec(pt))
    interp = (
        F.when(F.col("n").isNotNull(), F.col("n").cast("double"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * frac)
    )
    return j.select(
        F.date_format("hour_ts", TS_FMT_SPARK).alias("hour_start"),
        F.when(F.col("n").isNotNull(), 0).otherwise(1).alias("filled"),
        F.round(interp, 6).alias("n_interp"),
    )


@query(
    "q_stream_true_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT))
                AS DOUBLE) / 1e6 AS sum_value
    FROM events
    WHERE date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR
          <= (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR
              FROM events)
    GROUP BY 1, 2
    """,
)
def q_stream_true_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming tumbling windows, driver-checkable.

    Runs the real readStream → withWatermark('ts','1 hour') → window
    aggregate → append-mode memory sink drain
    (:func:`spype_spark.streaming.jobs.run_stream_tumbling`). Append
    mode's output is deterministic and SQL-expressible: exactly the
    windows FINALIZED by the terminal watermark (window end ≤ max
    event time − 1 h) — trailing windows are withheld, and the oracle
    applies the same cutoff relationally. Complements
    q_stream_tumbling (the batch analog over ALL windows): together
    they pin both the aggregate values and the late-data eviction
    boundary.
    """
    from spype_spark.streaming.jobs import run_stream_tumbling

    return run_stream_tumbling(spark, sf_dir)


@query(
    "q_stream_session_true",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN us - lag(us) OVER w IS NULL THEN 1
                  WHEN us - lag(us) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sessions AS (
      SELECT *,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(t), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_idx
    HAVING MAX(us) + 1800000000 <= (SELECT MAX(us) FROM e) - 3600000000
    """,
)
def q_stream_session_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming session windows, driver-checkable.

    Runs the real readStream → withWatermark('ts', '1 hour') →
    session_window(ts, '30 minutes') aggregate → append-mode drain
    (:func:`spype_spark.streaming.jobs.run_stream_session_window`).
    Append mode emits exactly the sessions FINALIZED by the terminal
    watermark — session end (last event + 30 min gap) at or before
    max event time − 1 h — and the oracle applies the same cutoff to
    the batch lag/gap/cumsum sessionization. Complements
    q_stream_session (the batch analog over ALL sessions): together
    they pin both the session boundaries and the watermark-eviction
    rule, closing the last batch-vs-streaming asymmetry in the
    streaming family (the tumbling pair q_stream_tumbling /
    q_stream_true_tumbling already has both halves).
    """
    from spype_spark.streaming.jobs import run_stream_session_window

    return run_stream_session_window(spark, sf_dir)


@query(
    "q_events_funnel",
    oracle="""
    WITH e AS (SELECT user_id, event_type,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                      CAST(ts AS TIMESTAMP) AS t
               FROM events),
    v AS (SELECT user_id, MIN(us) AS v_us FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(us) AS c_us FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND us > v_us GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(us) AS p_us FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND us > c_us GROUP BY e.user_id)
    SELECT v.user_id,
           CAST(1 + CAST(c.user_id IS NOT NULL AS INT)
                  + CAST(p.user_id IS NOT NULL AS INT) AS INT)
             AS step_reached,
           strftime(make_timestamp(v_us), '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(make_timestamp(c_us), '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(make_timestamp(p_us), '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: view → click → purchase, strictly ordered per
    user, earliest qualifying chain.

    The product-analytics staple. Each stage is a conditional min over
    the PREVIOUS stage's anchor (first view, first click after that
    view, first purchase after that click) — three grouped aggregates
    chained by equi-joins on user_id, one shuffle key throughout, no
    window over the full event stream. step_reached ∈ {1,2,3} counts
    how deep the user got; µs-integer comparisons keep the strict
    ordering deterministic in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = ev.select("user_id", "event_type", us.alias("us"))
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    fmt = lambda col: F.date_format(  # noqa: E731
        F.timestamp_micros(F.col(col)), TS_FMT_SPARK
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("c_us").isNotNull().cast("int")
                + F.col("p_us").isNotNull().cast("int")
            ).alias("step_reached"),
            fmt("v_us").alias("view_ts"),
            fmt("c_us").alias("click_ts"),
            fmt("p_us").alias("purchase_ts"),
        )
    )


@query(
    "q_rolling_dau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
      FROM events
    ), days AS (SELECT DISTINCT d FROM ud)
    SELECT strftime(w.d, '%Y-%m-%d') AS day,
           COUNT(DISTINCT u.user_id) AS dau7
    FROM days w
    JOIN ud u ON u.d >= w.d - INTERVAL 6 DAY AND u.d <= w.d
    GROUP BY 1
    """,
)
def q_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per observed day.

    COUNT(DISTINCT) over a sliding range frame isn't a window Spark
    (or any engine) can evaluate directly, and the naive day×day range
    join is quadratic in days. The scale plan: collapse events to
    distinct (user, day) pairs FIRST (the only full-data shuffle),
    then each pair contributes to exactly 7 window-days via a
    sequence-explode — bounded 7× expansion of the collapsed set,
    equi-join back to observed days, one distinct-agg per day. The
    oracle states the same semantics as the (fine-at-oracle-scale)
    range join.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        F.date_trunc("day", F.col("ts")).alias("d"), "user_id"
    ).distinct()
    days = ud.select(F.col("d").alias("wd")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.expr("sequence(d, d + INTERVAL 6 DAYS, INTERVAL 1 DAY)")
        ).alias("wd"),
    )
    return (
        contrib.join(days, "wd")
        .groupBy("wd")
        .agg(F.countDistinct("user_id").alias("dau7"))
        .select(F.date_format("wd", "yyyy-MM-dd").alias("day"), "dau7")
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH cw AS (
      SELECT user_id,
             MIN(date_trunc('week', CAST(ts AS TIMESTAMP))) AS cohort_w
      FROM events GROUP BY 1
    ), aw AS (
      SELECT DISTINCT user_id,
             date_trunc('week', CAST(ts AS TIMESTAMP)) AS activity_w
      FROM events
    )
    SELECT strftime(c.cohort_w, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', c.cohort_w, a.activity_w) / 7 AS INT)
             AS week_n,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM aw a JOIN cw c ON c.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted in each subsequent activity week.

    The product-analytics staple. Two aggregates over the user
    partitioning (first-week per user; distinct user×week) share one
    shuffle key, then a user-keyed equi-join — at 100 TB both sides
    are user-grain (millions of rows, not events), so the join is
    cheap and skew-free. week_n arithmetic is exact (day diffs are
    multiples of 7 by construction of the common week-trunc).
    """
    ev = load_table(spark, sf_dir, "events")
    cw = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_w")
    )
    aw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_w")
    ).distinct()
    return (
        aw.join(cw, "user_id")
        .groupBy(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("activity_w"), F.col("cohort_w")) / 7)
            .cast("int")
            .alias("week_n"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "q_events_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             COUNT(*) AS c
      FROM events
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT user_id, COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2
      FROM hourly GROUP BY 1
    ),
    scored AS (
      SELECT h.user_id, h.h, h.c,
             (h.c - CAST(s.s1 AS DOUBLE) / s.n)
               / sqrt((CAST(s.s2 AS DOUBLE)
                       - (CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE)) / s.n)
                      / (s.n - 1)) AS z
      FROM hourly h JOIN stats s USING (user_id)
      WHERE s.n >= 3
        AND (CAST(s.s2 AS DOUBLE)
             - (CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE)) / s.n) > 0
    )
    SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           c AS n_events, round(z, 6) AS z
    FROM scored
    WHERE abs(round(z, 6)) >= 2.0
    """,
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly activity anomalies: hours whose event count
    sits ≥ 2 sample standard deviations from that user's own hourly
    mean — the rate-spike/drop detector of an observability pipeline.

    Determinism discipline: never call the engines' stddev (each uses
    its own single-pass update order — last-ulp divergence). The
    moments (n, Σc, Σc²) are exact integer sums, order-free under any
    partitioning, and mean/variance/z are then the SAME fixed sequence
    of double ops on both engines, so the |z| ≥ 2 membership boundary
    cannot flap. Scale: two grouped aggregates sharing the user_id
    key (hour grain, then user moments — both map-side combined) and
    one equi-join of the hourly frame against the user-grain moment
    table; no window over the raw stream, nothing quadratic.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("user_id", "h")
        .agg(F.count("*").alias("c"))
    )
    stats = hourly.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    var_num = F.col("s2").cast("double") - (
        F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / F.col("n")
    z = (F.col("c") - F.col("s1").cast("double") / F.col("n")) / F.sqrt(
        var_num / (F.col("n") - 1)
    )
    return (
        hourly.join(stats, "user_id")
        .filter((F.col("n") >= 3) & (var_num > 0))
        .select(
            "user_id",
            F.date_format("h", TS_FMT_SPARK).alias("hour"),
            F.col("c").alias("n_events"),
            F.round(z, 6).alias("z"),
        )
        .filter(F.abs(F.col("z")) >= 2.0)
    )


@query(
    "q_stream_enrich_static",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def q_stream_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming stream-static enrichment: the events readStream
    inner-joined per micro-batch against the broadcast customer
    dimension, drained under Trigger.AvailableNow.

    Stream-static inner joins are stateless — every micro-batch joins
    independently, the static side is re-read (picking up dimension
    updates between batches for free) — so the drained result equals
    the batch join row-for-row: the oracle IS the plain SQL join. At
    scale this is the streaming twin of the dimension-broadcast rule;
    no watermark, no state store, nothing to size.
    """
    from spype_spark.streaming.jobs import run_stream_static_join

    return run_stream_static_join(spark, sf_dir)


@query(
    "q_stream_stream_join",
    oracle="""
    WITH p AS (
      SELECT event_id AS p_id, user_id AS p_user,
             CAST(ts AS TIMESTAMP) AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS c_id, user_id AS c_user,
             CAST(ts AS TIMESTAMP) AS c_ts
      FROM events WHERE event_type = 'click'
    )
    SELECT p.p_id, c.c_id, p.p_user
    FROM p JOIN c
      ON p.p_user = c.c_user
     AND c.c_ts <= p.p_ts
     AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream join: each purchase matched to the same
    user's clicks up to one hour before it, both sides watermarked,
    drained under Trigger.AvailableNow.

    The canonical attribution join. The time-bound predicate is what
    makes it feasible: it lets Spark evict click state older than
    (purchase watermark − 1 h), so state is bounded by one hour of
    traffic instead of the whole stream. Inner join ⇒ watermarks only
    bound state, they never drop matches under AvailableNow, so the
    drained output equals this batch theta-join exactly — which the
    oracle states relationally (the banded-join rewrite of the same
    predicate is q_join_theta_range's shape).
    """
    from spype_spark.streaming.jobs import run_stream_stream_join

    return run_stream_stream_join(spark, sf_dir)


@query(
    "q_stream_stream_left_join",
    oracle="""
    WITH p AS (
      SELECT event_id AS p_id, user_id AS p_user,
             CAST(ts AS TIMESTAMP) AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS c_id, user_id AS c_user,
             CAST(ts AS TIMESTAMP) AS c_ts
      FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT p.p_id, c.c_id, p.p_user, p.p_ts
      FROM p LEFT JOIN c
        ON p.p_user = c.c_user
       AND c.c_ts <= p.p_ts
       AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
    ),
    wm AS (
      SELECT LEAST((SELECT date_trunc('milliseconds', MAX(c_ts)) FROM c),
                   (SELECT date_trunc('milliseconds', MAX(p_ts)) FROM p))
             - INTERVAL 1 HOUR AS cut
    )
    SELECT p_id, c_id, p_user
    FROM j, wm
    WHERE c_id IS NOT NULL OR p_ts < cut
    """,
)
def q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream LEFT OUTER join: every purchase with its
    clicks ≤ 1 h prior; purchases with no qualifying click emit one
    null-padded row — but only once the click-side watermark PROVES no
    match can still arrive.

    The outer-specific subtlety a batch engine never faces: a null row
    is a *negative* claim, so it may only emit after the watermark
    passes the purchase's match window. Micro-batch timing makes the
    set of emitted null rows for purchases NEAR the final watermark an
    implementation detail (Spark may or may not have finalized them in
    the last AvailableNow batch) — so the contract intersects the
    drained stream with the deterministic provable region: matched
    rows, plus null rows with p_ts < the final GLOBAL watermark
    (min of the two sides' max event time, millisecond-truncated —
    Spark tracks event-time watermarks at ms precision and evicts
    outer-join state on the min across all input streams — minus the
    1 h delay). Inside that region the streaming result is exactly the
    batch left join with the same cutoff — which is the oracle. The
    watermark cutoff is computed batch-side and broadcast (1 row); the
    filter is the only post-drain work.

    Flush guarantee: null rows below the cut only exist in the sink if
    the terminal no-data micro-batch ran (it is what advances the
    watermark and flushes finalized outer state under AvailableNow).
    The drain helper asserts ``noDataMicroBatches.enabled`` up front,
    and this contract re-checks that the watermark the sink actually
    observed reached the batch-side cut — turning an un-flushed drain
    into a loud error instead of a nondeterministic hash mismatch.
    """
    from spype_spark.streaming.jobs import run_stream_stream_left_join

    stream, observed_wm = run_stream_stream_left_join(spark, sf_dir)
    wm = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .agg(
            (
                F.least(
                    F.date_trunc(
                        "millisecond",
                        F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
                    ),
                    F.date_trunc(
                        "millisecond",
                        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
                    ),
                )
                - F.expr("INTERVAL 1 HOUR")
            ).alias("cut")
        )
    )
    cut_row = wm.first()["cut"]
    if cut_row is not None and (observed_wm is None or observed_wm < cut_row):
        # observed_wm is the post-delay global watermark (min of both
        # sides' max event time − 1 h, ms-truncated) — the same quantity
        # cut recomputes batch-side, so they compare directly; a strictly
        # smaller observed watermark means the final flush never ran.
        raise RuntimeError(
            "stream-stream left join drained without its final watermark "
            f"reaching the provable-region cut ({observed_wm=!r} vs "
            f"cut={cut_row!r}): null rows below the cut may be missing. "
            "The terminal no-data micro-batch did not flush outer state."
        )
    # cut is already driver-side for the guard above; inline it as a
    # literal rather than re-scanning events through a broadcast join.
    cut_lit = F.lit(cut_row).cast("timestamp")
    keep = F.col("c_id").isNotNull()
    if cut_row is not None:
        keep = keep | (F.col("p_ts") < cut_lit)
    return stream.filter(keep).select("p_id", "c_id", "p_user")
