"""Event-log modeling contracts: grouped trend fitting and SCD2
dimension-history derivation.

Two shapes every production event pipeline grows into:

- **q_regress_grouped** — fit a per-group linear trend (OLS) without
  leaving the JVM: the normal-equation sums (Σx, Σy, Σxy, Σx²) over
  integer day-indices and daily counts are *exact integer* aggregates,
  so the closed-form slope/intercept is one correctly-rounded IEEE
  division per group — bit-identical across engines and partitionings
  (the same discipline as `_util.dsum`, applied to regression).
  Built-in `regr_slope`-style aggregates are avoided deliberately:
  their double accumulation order is engine-private, ours is exact.
- **q_scd2_history** — derive a Type-2 slowly-changing dimension from
  the raw event log: per user, consecutive runs of the same
  event_type collapse to [valid_from, valid_to) versions
  (gaps-and-islands via the difference-of-row_numbers run id), the
  standard CDC-log → dimension-table derivation that feeds the
  lakehouse MERGE (q_lake_merge_upsert).

Scale (100 TB): q_regress_grouped is two hash aggregates (events →
(group, day) counts → per-group sums); partial aggregation moves
O(groups·days) then O(groups) rows — no window, no sort.
q_scd2_history is one user-partitioned sort-window pass plus a
(user, run) groupBy: state per user is its own history, exactly the
shuffle any SCD2 build needs; ties inside a user are totally ordered
by (ts, event_id) so re-partitioning can't reorder versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spype_spark.queries._util import TS_FMT_DUCK, TS_FMT_SPARK
from spype_spark.registry import query
from spype_spark.tables import load_table

#: Day-index epoch for the trend fit (the corpus' event horizon start).
_X0 = "2024-01-01"


@query(
    "q_regress_grouped",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', TIMESTAMP '{_X0}',
                            date_trunc('day', ts)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events
      GROUP BY 1, 2
    ),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT event_type, n AS n_days,
           CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           (CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n
             AS intercept
    FROM sums
    WHERE n * sxx - sx * sx <> 0
    ORDER BY event_type
    """,
)
def q_regress_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of daily event volume: OLS
    slope/intercept of count-per-day against the day index, fitted
    with exact integer normal-equation sums.

    Shape: two hash aggregates — events → (type, day) counts, then
    per-type Σx/Σy/Σxy/Σx² — and a closed-form projection. All sums
    are int64 (day indices and counts are small integers), so both
    engines hold identical integers and the final divisions are single
    correctly-rounded IEEE ops — the raw doubles pass through unrounded
    (identical bit patterns on both sides, per the _util discipline). No window, no sort, no UDF — the 100 TB plan is the
    same two partial-aggregated shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(F.date_trunc("day", F.col("ts")), F.lit(_X0).cast("date"))
            .cast("bigint")
            .alias("x"),
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    sums = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n")
    return (
        sums.filter(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0)
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            slope.alias("slope"),
            intercept.alias("intercept"),
        )
        .orderBy("event_type")
    )


@query(
    "q_scd2_history",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_all,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn_type
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type,
             MIN(ts) AS valid_from,
             MIN(rn_all) AS seq
      FROM ordered
      GROUP BY user_id, event_type, rn_all - rn_type
    ),
    versioned AS (
      SELECT user_id, event_type, valid_from,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY seq) AS version,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY seq) AS valid_to
      FROM runs
    )
    SELECT user_id, event_type, CAST(version AS BIGINT) AS version,
           strftime(valid_from, '{TS_FMT_DUCK}') AS valid_from,
           strftime(valid_to, '{TS_FMT_DUCK}') AS valid_to,
           CAST(valid_to IS NULL AS BOOLEAN) AS is_current
    FROM versioned
    ORDER BY user_id, version
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension derived from the event log:
    per user, consecutive runs of one event_type become versioned
    [valid_from, valid_to) rows, open-ended for the current state.

    Gaps-and-islands via the difference-of-row_numbers run id (the
    set-based form — no iterative self-join): two window passes over
    the SAME (user_id → ts, event_id) sort order plus one groupBy, so
    Spark plans a single user-hash shuffle and reuses the sort. Run
    starts are MIN(ts) per island — order-free — and the (ts,
    event_id) tiebreak makes every window total-ordered, so output is
    partitioning-invariant. Versions are ordered by the run's SEQUENCE
    position (MIN(rn_all) per island — runs are contiguous rn_all
    intervals, so this is strictly increasing in true run order), NOT
    by (valid_from, event_type): with interleaved same-timestamp
    events (A,B,A all at ts T) two same-type runs share valid_from and
    a timestamp sort would order them nondeterministically AND break
    the alternation invariant. Under seq order consecutive versions
    alternate type by construction (runs are maximal same-type
    intervals); same-ts ties merely yield zero-length [T, T)
    versions, which still tile. valid_from/valid_to render as strings
    (second grain is enough: run boundaries are distinct event rows).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.row_number().over(w_all).alias("rn_all"),
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("run"),
    )
    runs = ordered.groupBy("user_id", "event_type", "run").agg(
        F.min("ts").alias("valid_from"),
        F.min("rn_all").alias("seq"),
    )
    w_ver = Window.partitionBy("user_id").orderBy("seq")
    return (
        runs.select(
            "user_id",
            "event_type",
            "valid_from",
            F.row_number().over(w_ver).cast("bigint").alias("version"),
            F.lead("valid_from").over(w_ver).alias("valid_to"),
        )
        .select(
            "user_id",
            "event_type",
            "version",
            F.date_format("valid_from", TS_FMT_SPARK).alias("valid_from"),
            F.date_format("valid_to", TS_FMT_SPARK).alias("valid_to"),
            F.col("valid_to").isNull().alias("is_current"),
        )
        # no output orderBy: a global range-sort of the full history is
        # an extra Exchange the contract doesn't need (the differential
        # checker lexsorts before hashing, and consumers key on
        # (user_id, version) anyway).
    )


@query(
    "q_path_ngrams",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type,
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
    ),
    grams AS (
      SELECT event_type || '>' || lead(event_type, 1) OVER w2
                        || '>' || lead(event_type, 2) OVER w2 AS gram
      FROM sessions
      WINDOW w2 AS (PARTITION BY user_id, session_idx ORDER BY us, event_id)
    )
    SELECT gram, COUNT(*) AS n
    FROM grams WHERE gram IS NOT NULL
    GROUP BY gram
    ORDER BY n DESC, gram
    LIMIT 20
    """,
)
def q_path_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-path mining: the 20 most frequent event-type trigrams
    inside 30-minute-gap sessions (the "what do users do next"
    sequence-analytics staple).

    Shape: the standard lag→flag→running-sum sessionization (the
    q_stream_session idiom, one user-hash shuffle with a partition-
    local sort), then two lead() calls over the SAME (user, session)
    sort — Spark plans one window stage, no extra exchange — and a
    trigram count with map-side partials. The top-20 is
    TakeOrderedAndProject over the aggregated gram table (never a
    global sort); (n, gram) is a total order, so the LIMIT boundary
    is deterministic. Self-joins for n-gramming are deliberately
    avoided: lead(k) keeps the pass linear and shuffle-free beyond
    the session window itself — at 100 TB the only data movement is
    the one user-hash partition.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = ev.select("user_id", "event_id", "event_type", us.alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = e.withColumn(
        "is_new",
        F.when(F.col("us") - F.lag("us").over(w) > 1_800_000_000, 1)
        .when(F.lag("us").over(w).isNull(), 1)
        .otherwise(0),
    )
    sess = flagged.withColumn("session_idx", F.sum("is_new").over(wrun))
    w2 = Window.partitionBy("user_id", "session_idx").orderBy("us", "event_id")
    # F.concat (not concat_ws): concat_ws SKIPS nulls, silently emitting a
    # malformed 1-separator gram if any event_type in the window is null,
    # while the oracle's || propagates NULL into the IS NOT NULL filter.
    # concat matches the oracle: a null anywhere nulls the whole gram.
    grams = sess.select(
        F.concat(
            F.col("event_type"),
            F.lit(">"),
            F.lead("event_type", 1).over(w2),
            F.lit(">"),
            F.lead("event_type", 2).over(w2),
        ).alias("gram")
    ).filter(F.col("gram").isNotNull())
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "gram")
        .limit(20)
    )
