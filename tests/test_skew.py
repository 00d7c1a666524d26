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

def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's native skew handling, plan-asserted: the constructed
    70 %-hot sort-merge join (thresholds scaled down to corpus size)
    must execute with ``SortMergeJoin(skew=true)`` and an
    ``AQEShuffleRead … skewed`` on the fact side — the hot partition
    split at runtime with NO salting code — and return exactly the
    plain-join rows.

    When salting still wins (the spype_spark.skew module rule): hot
    AGGREGATION keys (AQE's skew rule only rewrites joins), joins whose
    output feeds another shuffle on the join key (OptimizeSkewedJoin
    skips the split rather than break the required distribution — the
    salted contracts q_skew_salted_agg / q_join_skew_salted are exactly
    those shapes), and runs that must be partition-deterministic (AQE's
    split boundaries depend on observed sizes)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        # enough initial partitions that the hot key's partition is a
        # clear outlier against the median (the session fixture may run
        # with very few)
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(300000).select(
            F.when(F.col("id") % 10 < 7, "HOT")
            .otherwise(F.concat(F.lit("t"), (F.col("id") % 50).cast("string")))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.createDataFrame(
            [("HOT", 1)] + [(f"t{i}", i) for i in range(50)],
            "dk string, attr int",
        )
        joined = fact.join(dim, fact.k == dim.dk)
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert any(
            "AQEShuffleRead" in ln and "skewed" in ln
            for ln in plan.splitlines()
        ), plan
        # correctness: the split changed the schedule, not the answer
        assert len(rows) == 300000
        from collections import Counter

        per_key = Counter(r.k for r in rows)
        assert per_key["HOT"] == 210000  # the 70 % hot key
        # cold keys: t_i is populated iff i % 10 ∈ {7,8,9} (id%10 picks
        # hot), 6 000 rows each, 90 000 total
        cold = {k: n for k, n in per_key.items() if k != "HOT"}
        assert sum(cold.values()) == 90000
        assert all(n == 6000 for n in cold.values()), cold
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
