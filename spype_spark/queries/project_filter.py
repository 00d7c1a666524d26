"""Projection expressions and filter predicates (SURVEY.md §2.B).

All expressions are built-in `Column` algebra — they compile into
whole-stage-codegen'd JVM code; no Python executes per row at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spype_spark.registry import query
from spype_spark.tables import load_table


@query(
    "q_project_exprs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def q_project_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column projection (TPC-H revenue/charge expressions).

    Pure per-row arithmetic, deliberately unrounded: the identical
    IEEE-754 expression is bit-deterministic in both engines, whereas
    round() itself diverges on repr ties (see _util module docstring).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_price.alias("revenue"),
        (disc_price * (1 + F.col("l_tax"))).alias("charge"),
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P')
           AND o_totalprice BETWEEN 50000 AND 200000
           AND NOT (o_orderpriority = '5-LOW'))
       OR (o_totalprice < 2000 AND o_orderpriority IS NOT NULL)
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean predicate: AND/OR/NOT, IN, BETWEEN, IS NULL."""
    o = load_table(spark, sf_dir, "orders")
    cond = (
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000, 200000)
        & ~(F.col("o_orderpriority") == "5-LOW")
    ) | ((F.col("o_totalprice") < 2000) & F.col("o_orderpriority").isNotNull())
    return o.filter(cond).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "q_filter_like_regex",
    oracle="""
    SELECT p_partkey, p_brand, p_type,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_num
    FROM part
    WHERE p_type LIKE '%AR%'
      AND regexp_matches(p_brand, 'Brand#[12]')
    """,
)
def q_filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + RLIKE predicates and regexp capture-group extraction."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_type").like("%AR%") & F.col("p_brand").rlike("Brand#[12]")
        ).select(
            "p_partkey",
            "p_brand",
            "p_type",
            F.regexp_extract("p_brand", r"Brand#(\d+)", 1)
            .cast("int")
            .alias("brand_num"),
        )
    )
