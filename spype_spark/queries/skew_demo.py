"""Skew-handling demo contract (SCALE.md "Skew" / spype_spark.skew).

The corpus's keys are uniform, so the hot key is *constructed* (70 % of
lineitem collapses into one group) — exactly the shape that melts a
single reducer at 100 TB. The salted two-phase aggregation must still
produce oracle-identical results: the pattern changes the distribution,
never the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spype_spark.registry import query
from spype_spark.skew import salted_agg
from spype_spark.tables import load_table

_SEG_SQL = """CASE WHEN l_orderkey % 10 < 7 THEN 'HOT'
              ELSE 'cold' || CAST(l_orderkey % 10 AS VARCHAR) END"""


@query(
    "q_skew_salted_agg",
    oracle=f"""
    SELECT {_SEG_SQL} AS seg,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT))
                AS DOUBLE) / 1e2 AS total
    FROM lineitem
    GROUP BY 1
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 70 %-hot key.

    Phase 1 spreads the HOT group across 16 salted reducers; phase 2
    merges 16 partial rows per key. Result-identical to a direct
    groupBy (this oracle), but no reducer ever holds more than ~1/16
    of the hot key — the explicit form of what AQE's skew handling
    does for joins, applied to aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    seg = (
        F.when(F.col("l_orderkey") % 10 < 7, "HOT")
        .otherwise(F.concat(F.lit("cold"), (F.col("l_orderkey") % 10).cast("string")))
        .alias("seg")
    )
    skewed = li.select(seg, "l_extendedprice")
    scaled = F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5))
    out = salted_agg(
        skewed,
        ["seg"],
        {"n": F.count("*"), "total_scaled": F.sum(scaled)},
        n_salts=16,
    )
    return out.select(
        "seg", "n", (F.col("total_scaled") / F.lit(1e2)).alias("total")
    )
