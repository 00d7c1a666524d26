"""Semantic + plan properties of the round-6 additions (k-means,
stratified sampling, passage dedup, salted join, Q15).

The differential checker already proves oracle equality; these pin the
properties the oracle can't express — exact stratum counts, cluster
label sanity, internal consistency of the dup accounting, and the plan
shapes the scale story depends on.
"""

import math

import pytest
from pyspark.sql import functions as F

from spype_spark.queries import REGISTRY
from spype_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_stratified_sample_counts_are_exact(spark):
    """Every language stratum yields precisely ceil(n/5) rows — the
    property rate-based sample()/sampleBy() cannot give."""
    out = REGISTRY["q_sample_stratified"].fn(spark, SF)
    got = {r["lang"]: r["cnt"] for r in
           out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    base = {r["lang"]: r["cnt"] for r in
            load_table(spark, SF, "documents")
            .groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert set(got) == set(base)
    for lang, n in base.items():
        assert got[lang] == math.ceil(n / 5), lang


def test_kmeans_labels_and_cohesion(spark):
    """Every vector gets exactly one label in [0, 8); clusters are
    non-degenerate (>1 used); cohesion is a cosine in (-1, 1]."""
    out = REGISTRY["q_cluster_kmeans"].fn(spark, SF).collect()
    n_vec = load_table(spark, SF, "embeddings").count()
    assert len(out) == n_vec
    labels = {r["cluster"] for r in out}
    assert labels <= set(range(8)) and len(labels) > 1
    for r in out:
        assert -1.0 - 1e-9 <= r["cohesion"] <= 1.0 + 1e-9


def test_kmeans_update_does_not_degrade_cohesion(spark):
    """One Lloyd round must not hurt the spherical k-means objective:
    mean cohesion under the updated centroids >= mean cosine the
    seed-set assignment achieved (Lloyd monotonicity, which survives
    the 1e-7 centroid quantization by a wide margin here)."""
    from spype_spark.ann import _dot_hof, _normalize
    from pyspark.sql import Window

    e = _normalize(load_table(spark, SF, "embeddings"), "vec_id", "embedding")
    w0 = Window.orderBy("vec_id")
    c0 = (e.orderBy("vec_id").limit(8)
          .select((F.row_number().over(w0) - 1).alias("cell_id"),
                  F.col("embedding").alias("cent")))
    wv = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("cell_id"))
    seed_mean = (
        e.crossJoin(F.broadcast(c0))
        .select("vec_id", "cell_id",
                _dot_hof(F.col("embedding"), F.col("cent")).alias("score"))
        .withColumn("rnk", F.row_number().over(wv))
        .filter(F.col("rnk") == 1)
        .agg(F.avg("score")).collect()[0][0]
    )
    final_mean = (REGISTRY["q_cluster_kmeans"].fn(spark, SF)
                  .agg(F.avg("cohesion")).collect()[0][0])
    assert final_mean >= seed_mean - 1e-6


def test_kmeans_plan_is_pure_dataframe(spark):
    """The whole iteration is JVM-side: no Python eval nodes anywhere
    (unlike the GEMM kernels, k-means needs none)."""
    df = REGISTRY["q_cluster_kmeans"].fn(spark, SF)
    assert "PythonUDF" not in df._jdf.queryExecution().optimizedPlan().toString()


def test_paragraph_dedup_accounting_is_consistent(spark):
    """n_dup + kept == n_chunks per doc; corpus-wide chunk total equals
    sum of ceil(words/8); the corpus's repeated passages are detected
    (distinct chunk count < total chunk count implies sum(n_dup) > 0)."""
    out = REGISTRY["q_text_paragraph_dedup"].fn(spark, SF)
    rows = out.collect()
    for r in rows:
        kept = round(r["keep_frac"] * r["n_chunks"])
        assert kept + r["n_dup"] == r["n_chunks"]
    expected_chunks = (
        load_table(spark, SF, "documents")
        .select(F.ceil(F.size(F.split("text", " ")) / 8.0).alias("c"))
        .agg(F.sum("c")).collect()[0][0]
    )
    assert sum(r["n_chunks"] for r in rows) == expected_chunks


def test_salted_join_plan_shape(spark):
    """The salted join must actually run as a shuffled hash join on the
    salted key (the hint blocks the broadcast that would erase the
    pattern) and never fall back to a nested loop."""
    df = REGISTRY["q_join_skew_salted"].fn(spark, SF)
    plan = plan_of(df)
    assert "ShuffledHashJoin" in plan, plan
    assert "NestedLoop" not in plan


def test_q15_winner_has_global_max_revenue(spark):
    """The selected supplier's revenue equals the true max over the
    full revenue view (recomputed independently)."""
    from spype_spark.queries._util import dsum, ts_lit

    out = REGISTRY["q_tpch_q15"].fn(spark, SF).collect()
    assert len(out) >= 1
    li = load_table(spark, SF, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1997-01-01"))
        & (F.col("l_shipdate") < ts_lit("1997-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("r")
    )
    true_max = rev.agg(F.max("r")).collect()[0][0]
    for r in out:
        assert r["total_revenue"] == true_max
