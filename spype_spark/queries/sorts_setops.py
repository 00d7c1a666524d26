"""Sorts, limits/top-k, and set operations (SURVEY.md §2.B).

Scale notes: `orderBy` is a range-partitioned sort (sampled boundaries,
no single-node sort); `orderBy().limit(k)` is planned as
TakeOrderedAndProject — each partition keeps its top-k, the driver merges
k×partitions rows, so a global top-10 over 100 TB never materializes a
full sort. Set operations are shuffles on the full row value; distinct
variants get partial (map-side) dedup for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spype_spark.queries._util import ts_lit
from spype_spark.registry import query
from spype_spark.tables import load_table


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort (asc + desc, explicit null placement).

    The value-hash compare is order-insensitive, so this contract
    verifies the sort *plan* runs and preserves the row set; ordering
    itself is exercised in unit tests (collect + assert monotonic).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy(
        F.asc("o_orderstatus"),
        F.desc_nulls_last("o_totalprice"),
        F.asc("o_orderkey"),
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price → TakeOrderedAndProject.

    Unique-key tiebreak (orderkey) makes the selected set deterministic
    even under price ties.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


def _custkeys_in_range(spark: SparkSession, sf_dir: str, lo: str, hi: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= ts_lit(lo)) & (F.col("o_orderdate") < ts_lit(hi))
    ).select("o_custkey")


_A = ("1995-01-01", "1996-01-01")
_B = ("1996-01-01", "1997-01-01")

_SETOP_CTE = """
    WITH a AS (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
    ),
    b AS (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
    )
"""


@query(
    "q_set_union_all",
    oracle=_SETOP_CTE + "SELECT o_custkey FROM a UNION ALL SELECT o_custkey FROM b",
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics — duplicates preserved, no shuffle)."""
    a = _custkeys_in_range(spark, sf_dir, *_A)
    b = _custkeys_in_range(spark, sf_dir, *_B)
    return a.unionByName(b)


@query(
    "q_set_union_distinct",
    oracle=_SETOP_CTE + "SELECT o_custkey FROM a UNION SELECT o_custkey FROM b",
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics — union then hash-distinct, one shuffle)."""
    a = _custkeys_in_range(spark, sf_dir, *_A)
    b = _custkeys_in_range(spark, sf_dir, *_B)
    return a.unionByName(b).distinct()


@query(
    "q_set_intersect",
    oracle=_SETOP_CTE + "SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers active in both periods."""
    a = _custkeys_in_range(spark, sf_dir, *_A)
    b = _custkeys_in_range(spark, sf_dir, *_B)
    return a.intersect(b)


@query(
    "q_set_union_byname",
    oracle="""
    SELECT o_custkey, o_totalprice AS amount, 'order' AS src
    FROM orders WHERE o_totalprice > 400000
    UNION ALL BY NAME
    SELECT c_acctbal AS amount, c_custkey AS o_custkey, 'customer' AS src
    FROM customer WHERE c_acctbal > 9900
    """,
)
def q_set_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union by column NAME across differently-ordered projections —
    positional union would silently mix amount/custkey here."""
    from spype_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    ).select(
        "o_custkey", F.col("o_totalprice").alias("amount"), F.lit("order").alias("src")
    )
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 9900
    ).select(
        F.col("c_acctbal").alias("amount"),
        F.col("c_custkey").alias("o_custkey"),
        F.lit("customer").alias("src"),
    )
    return o.unionByName(c)


@query(
    "q_set_except",
    oracle=_SETOP_CTE + "SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers active in A but not B."""
    a = _custkeys_in_range(spark, sf_dir, *_A)
    b = _custkeys_in_range(spark, sf_dir, *_B)
    return a.subtract(b)
