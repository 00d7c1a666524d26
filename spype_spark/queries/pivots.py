"""Pivot / unpivot reshaping (SURVEY.md §2.B extension rows).

Pivot compiles to a single hash aggregate with one conditional
aggregate per (pivot value × measure) — explicit value lists keep the
plan static (no distinct-scan of the pivot column, which at 100 TB
would be an extra pass and a driver-side collect). Unpivot is an
Expand node: each row emits |measures| rows with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spype_spark.registry import query
from spype_spark.tables import load_table


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS "F",
           SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS "O"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns: qty totals per returnflag × status.

    The explicit value list ['F','O'] (FIXTURES.md domain) avoids the
    implicit distinct-collect Spark otherwise runs to discover pivot
    values. l_quantity is integer-valued → exact double sums.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) three measure columns into (measure, val) rows.

    Plans as one Expand over the scan — 3× the rows, zero shuffles;
    values pass through bit-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
