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


@query(
    "q_join_skew_salted",
    oracle="""
    SELECT p.p_brand AS p_brand,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1e4 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 1e4 AS revenue
    FROM (SELECT l_extendedprice, l_discount,
                 CASE WHEN l_orderkey % 10 < 7 THEN 0 ELSE l_partkey END
                   AS probe_key
          FROM lineitem) l
    JOIN part p ON p.p_partkey = l.probe_key
    GROUP BY 1
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join over a 70 %-hot probe key: the fact side's key
    is remapped so most rows probe one part row, then the join runs
    salted (fact rows take a hash salt in [0,16); the dim side is
    exploded 16×) and aggregates per brand.

    The join-shaped twin of q_skew_salted_agg: when the build side is
    too large to broadcast and one probe key dominates, a plain hash
    join melts the reducer owning the hot key; salting splits that key
    across 16 reducers at the cost of replicating the (much smaller)
    build side. The dim side carries a shuffle_hash hint because at
    corpus scale Catalyst would broadcast the 2 000-row part table and
    erase the pattern under test — at 100 TB the dim is a billion-row
    table and the shuffle shape is forced. Result-identical to the
    plain join (this oracle): salting changes the distribution, never
    the answer, and the revenue is a scaled-long sum, immune to the
    reducer-count change the salt introduces.
    """
    from spype_spark.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice",
        "l_discount",
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(0))
        .otherwise(F.col("l_partkey"))
        .alias("probe_key"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand").hint(
        "shuffle_hash"
    )
    joined = salted_join(li, p, "probe_key", "p_partkey", n_salts=16)
    scaled = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e4)
        + F.lit(0.5)
    )
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        (F.sum(scaled) / F.lit(1e4)).alias("revenue"),
    )
