"""Invariants for the market-basket contract (market_basket.py)."""

from spype_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_basket_pairs_support_and_lift_consistent(spark):
    import pyspark.sql.functions as F

    rows = REGISTRY["q_basket_pairs"].fn(spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = spark.read.parquet(f"{SF}/part.parquet")
    bi = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("b"), F.col("p_brand").alias("i"))
        .distinct()
    )
    n = bi.select("b").distinct().count()
    supp = {r["i"]: r["c"] for r in bi.groupBy("i").agg(F.count("*").alias("c")).collect()}
    baskets = {}
    for r in bi.collect():
        baskets.setdefault(r["b"], set()).add(r["i"])
    for r in rows:
        assert r["item_a"] < r["item_b"]
        expect = sum(1 for s in baskets.values()
                     if r["item_a"] in s and r["item_b"] in s)
        assert r["support"] == expect, (r["item_a"], r["item_b"])
        lift = r["support"] * n / (supp[r["item_a"]] * supp[r["item_b"]])
        assert abs(lift - r["lift"]) < 1e-12
    # descending-support total order holds
    pairs = [(-r["support"], r["item_a"], r["item_b"]) for r in rows]
    assert pairs == sorted(pairs)
