"""Classic-suite (TPC-H-adapted) checks: result invariants the oracle
can't see plus the physical-plan shapes the 100 TB story relies on.

Correctness vs DuckDB is covered by tools/check.py / the driver; these
tests pin the *plan* decisions (pushdown, broadcast, top-k operator,
no nested-loop) and a few semantic invariants (zero-count customers
survive Q13's left join; Q8's share is a valid fraction).
"""

import pytest

from spype_spark.queries import REGISTRY
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def sf001():
    return "/root/testdata/sf0.001"


def test_q6_pushes_all_three_predicates(spark, sf001):
    plan = plan_of(REGISTRY["q_tpch_q6"].fn(spark, sf001))
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed


def test_q3_is_top_k_not_global_sort(spark, sf001):
    plan = plan_of(REGISTRY["q_tpch_q3"].fn(spark, sf001))
    assert "TakeOrderedAndProject" in plan


def test_q5_broadcasts_dims_and_keeps_local_residual(spark, sf001):
    df = REGISTRY["q_tpch_q5"].fn(spark, sf001)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_q19_disjunction_stays_hash_join(spark, sf001):
    plan = plan_of(REGISTRY["q_tpch_q19"].fn(spark, sf001))
    assert "NestedLoop" not in plan
    # Catalyst derives the lineitem-side implied filter from the OR
    # groups, so a quantity predicate reaches the lineitem scan.
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_quantity" in ln for ln in pushed)


def test_q13_keeps_zero_order_customers(spark, sf001):
    rows = {
        r["c_count"]: r["custdist"]
        for r in REGISTRY["q_tpch_q13"].fn(spark, sf001).collect()
    }
    n_cust = spark.read.parquet(f"{sf001}/customer.parquet").count()
    assert sum(rows.values()) == n_cust  # every customer binned exactly once


def test_q8_share_is_valid_fraction(spark, sf001):
    for r in REGISTRY["q_tpch_q8"].fn(spark, sf001).collect():
        assert 0.0 <= r["mkt_share"] <= 1.0


def test_q18_aggregates_before_join(spark, sf001):
    """The lineitem aggregate must sit below the orders join (probe-side
    shrink) — i.e. the plan filters on the quantity sum, not a raw col."""
    df = REGISTRY["q_tpch_q18"].fn(spark, sf001)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.index("Aggregate") > optimized.index("Join"), (
        "expected the qty aggregate nested under the join in the tree "
        "(deeper = later in toString)"
    )


# ---- the partsupp/commit-date family (tpch_deep.py) ----------------------


def test_q2_winners_share_the_per_part_minimum(spark, sf001):
    """Every surviving row of a part carries the identical (minimal)
    unit_cost — the window-min filter kept only regional minima."""
    rows = REGISTRY["q_tpch_q2"].fn(spark, sf001).collect()
    assert rows  # non-degenerate at the smallest SF
    by_part = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], set()).add(r["unit_cost"])
    assert all(len(costs) == 1 for costs in by_part.values())


def test_deep_family_plans_stay_hash_join(spark, sf001):
    """Q2/Q9/Q12/Q16/Q20/Q21 are pure hash-join topologies; the only
    permitted nested loop is Q11's 1-row scalar-threshold gate."""
    for key in ("q_tpch_q2", "q_tpch_q9", "q_tpch_q12", "q_tpch_q16",
                "q_tpch_q20", "q_tpch_q21"):
        plan = plan_of(REGISTRY[key].fn(spark, sf001))
        assert "NestedLoop" not in plan, key


def test_q12_high_low_partition_the_late_lines(spark, sf001):
    """high + low counts must equal the total qualifying late lines —
    the dual conditional COUNTs partition, never drop or double-count."""
    import pyspark.sql.functions as F

    rows = REGISTRY["q_tpch_q12"].fn(spark, sf001).collect()
    li = spark.read.parquet(f"{sf001}/lineitem.parquet")
    o = spark.read.parquet(f"{sf001}/orders.parquet")
    total = (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
        )
        .join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate")
               > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS")),
        )
        .count()
    )
    assert sum(r["high_line_count"] + r["low_line_count"] for r in rows) == total


def test_q16_never_counts_excluded_suppliers(spark, sf001):
    """supplier_cnt is bounded by the clean-supplier population."""
    import pyspark.sql.functions as F

    s = spark.read.parquet(f"{sf001}/supplier.parquet")
    clean = s.filter(F.col("s_acctbal") >= 0).count()
    rows = REGISTRY["q_tpch_q16"].fn(spark, sf001).collect()
    assert rows
    assert max(r["supplier_cnt"] for r in rows) <= clean


def test_q20_q21_outputs_stay_in_their_nation(spark, sf001):
    import pyspark.sql.functions as F

    s = spark.read.parquet(f"{sf001}/supplier.parquet")
    n = spark.read.parquet(f"{sf001}/nation.parquet")
    nat = {
        r["s_name"]: r["n_name"]
        for r in s.join(n, s.s_nationkey == n.n_nationkey).collect()
    }
    q20 = REGISTRY["q_tpch_q20"].fn(spark, sf001).collect()
    q21 = REGISTRY["q_tpch_q21"].fn(spark, sf001).collect()
    assert q20 and all(nat[r["s_name"]] == "NATION_8" for r in q20)
    assert q21 and all(nat[r["s_name"]] == "NATION_12" for r in q21)
    assert all(r["numwait"] > 0 for r in q21)


def test_asof_nearest_aggregate_not_window(spark, sf001):
    """The nearest-asof winner selection must be the min-of-struct
    aggregate (map-side combinable), not a row_number window, and each
    purchase appears at most once."""
    df = REGISTRY["q_join_asof_nearest"].fn(spark, sf001)
    plan = plan_of(df)
    assert "Window" not in plan
    rows = df.collect()
    assert rows
    ids = [r["p_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(0 <= r["gap_ms"] <= 2 * 3600 * 1000 for r in rows)
