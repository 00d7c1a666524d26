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
