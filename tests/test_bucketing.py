"""Bucketing evidence for SCALE.md's claim: "bucketing orders+lineitem
on orderkey removes the fact-fact shuffle entirely."

Writes both fact tables bucketed by the join key (8 buckets) into the
session warehouse, joins them with broadcast disabled, and asserts the
plan contains NO shuffle exchange on either side — the scan's bucket
layout satisfies the join's distribution requirement, which is exactly
what a 100 TB deployment relies on.
"""

import pytest
from pyspark.sql import functions as F

from spype_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS spype_b_{name}")
        (
            load_table(spark, SF, name)
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"spype_b_{name}")
        )
    yield
    for name in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS spype_b_{name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("spype_b_orders")
        li = spark.table("spype_b_lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
            F.count("*").alias("n")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the join's inputs must come straight from the bucketed scans —
        # no Exchange between scan and join (the agg above may shuffle).
        before_agg = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning" not in before_agg, plan
        # and the answer is right:
        got = {r.o_orderstatus: r.n for r in j.collect()}
        li_raw = load_table(spark, SF, "lineitem")
        o_raw = load_table(spark, SF, "orders")
        want = {
            r.o_orderstatus: r.n
            for r in li_raw.join(o_raw, li_raw.l_orderkey == o_raw.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")