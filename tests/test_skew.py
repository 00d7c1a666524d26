"""Salting correctness: the skew patterns must be result-identical to
their naive forms (the whole point is changing the *distribution*, not
the answer)."""

from pyspark.sql import functions as F

from spype_spark.skew import salted_agg, salted_join


def make_skewed(spark, n_hot=5000, n_tail=500):
    """One pathologically hot key + a uniform tail."""
    hot = spark.range(n_hot).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(n_tail).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_equals_direct(spark):
    df = make_skewed(spark)
    direct = {
        (r.k): (r.total, r.n, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("*").alias("n"),
             F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.total, r.n, r.mx)
        for r in salted_agg(
            df, ["k"],
            {"total": F.sum("v"), "n": F.count("*"), "mx": F.max("v")},
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_decomposable(spark):
    # non-decomposable partials must raise, never silently merge via sum
    import pytest

    df = make_skewed(spark, n_hot=50, n_tail=10)
    for bad in (
        F.first("v"),
        F.collect_list("v"),
        F.stddev("v"),
        F.avg("v"),
        F.countDistinct("v"),
    ):
        with pytest.raises(ValueError, match="not salt-decomposable"):
            salted_agg(df, ["k"], {"x": bad})


def test_salted_join_equals_direct(spark):
    fact = make_skewed(spark, n_hot=2000, n_tail=200)
    dim = spark.createDataFrame(
        [("HOT", 1)] + [(f"t{i}", i) for i in range(50)], "dk string, attr int"
    )
    direct = (
        fact.join(dim, fact.k == dim.dk)
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("attr").alias("s"))
    )
    salted = (
        salted_join(fact, dim, "k", "dk")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("attr").alias("s"))
    )
    assert {tuple(r) for r in direct.collect()} == {
        tuple(r) for r in salted.collect()
    }