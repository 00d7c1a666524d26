"""Invariants for the event-log modeling contracts (events_modeling.py).

Cross-engine equality is tools/check.py's job; these pin the semantic
invariants an oracle hash can't articulate: the OLS fit matches an
independent numpy solve, and the SCD2 intervals tile each user's
timeline exactly."""

import numpy as np

from spype_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_regress_matches_numpy_lstsq(spark):
    rows = REGISTRY["q_regress_grouped"].fn(spark, SF).collect()
    assert rows
    import pyspark.sql.functions as F

    from spype_spark.tables import load_table

    ev = load_table(spark, SF, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", F.col("ts")),
                F.lit("2024-01-01").cast("date"),
            ).alias("x"),
        )
        .agg(F.count("*").alias("y"))
        .collect()
    )
    for r in rows:
        pts = [(d["x"], d["y"]) for d in daily if d["event_type"] == r["event_type"]]
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(slope - r["slope"]) < 1e-9, r["event_type"]
        assert abs(intercept - r["intercept"]) < 1e-6, r["event_type"]
        assert r["n_days"] == len(pts)


def test_scd2_intervals_tile_each_user(spark):
    rows = REGISTRY["q_scd2_history"].fn(spark, SF).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, hist in by_user.items():
        hist.sort(key=lambda r: r["version"])
        # versions are contiguous 1..k and exactly the last is current
        assert [r["version"] for r in hist] == list(range(1, len(hist) + 1))
        assert [r["is_current"] for r in hist] == [False] * (len(hist) - 1) + [True]
        for a, b in zip(hist, hist[1:]):
            # intervals chain with no gaps, runs genuinely alternate
            assert a["valid_to"] == b["valid_from"], uid
            assert a["event_type"] != b["event_type"], uid
        assert hist[-1]["valid_to"] is None


def test_path_ngrams_single_window_stage(spark):
    """The lead(k) n-gramming must reuse the sessionization sort — one
    user-hash exchange feeds both window passes, and the top-20 is a
    TakeOrderedAndProject, not a global sort."""
    from tests.test_plans import plan_of

    df = REGISTRY["q_path_ngrams"].fn(spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert rows
    assert all(r["gram"].count(">") == 2 for r in rows)
    # descending-count order with the (n, gram) total-order tiebreak
    pairs = [(-r["n"], r["gram"]) for r in rows]
    assert pairs == sorted(pairs)


def test_regress_plan_is_pure_aggregation(spark):
    """The OLS fit must stay two hash aggregates — no window, no
    Python UDF, no sort before the (tiny) output."""
    from tests.test_plans import plan_of

    plan = plan_of(REGISTRY["q_regress_grouped"].fn(spark, SF))
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
