"""The continuous-aggregate invariant: answers derived from the hourly
rollup must equal direct computation from raw events bit-for-bit."""

from pyspark.sql import functions as F

from spype_spark.queries import REGISTRY
from spype_spark.queries._util import D_FMT_SPARK
from spype_spark.tables import load_table


def test_daily_from_rollup_equals_direct(spark, sf_dir):
    via_rollup = {
        (r.day, r.event_type): (r.n, r.sum_value)
        for r in REGISTRY["q_rollup_materialized"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    direct = {
        (r.day, r.event_type): (r.n, r.sum_value)
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), D_FMT_SPARK).alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)))
                / F.lit(1e6)
            ).alias("sum_value"),
        )
        .collect()
    }
    assert via_rollup == direct