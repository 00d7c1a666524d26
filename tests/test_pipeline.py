"""Unit tests for the pipeline algebra — mirrors spype's test style
(SURVEY.md §5.1: small inline inputs, assert outputs, callback firing,
and wiring-time incompatibility errors), with tiny DataFrames as the
flowing unit."""

import pytest
from pyspark.sql import functions as F

from spype_spark.pipeline import (
    ContractError,
    IncompatibleTasksError,
    Pype,
    RunContext,
    Task,
    expect,
    expect_schema,
    task,
)


@pytest.fixture
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], "id long, k string, v double"
    )


# -- A1/A2/A3: task, decorator, chaining ------------------------------------


def test_chain_composes_lazily(df):
    @task
    def double_v(d):
        return d.withColumn("v", F.col("v") * 2)

    @task
    def only_a(d):
        return d.filter(F.col("k") == "a")

    out = (double_v | only_a).apply(df)
    rows = {r.id: r.v for r in out.collect()}
    assert rows == {1: 20.0, 3: 60.0}


def test_task_is_callable_directly(df):
    t = Task(lambda d: d.select("id"), name="proj")
    assert t(df).columns == ["id"]


def test_partial_binds_params(df):
    @task
    def add_const(d, amount=0):
        return d.withColumn("v", F.col("v") + amount)

    out = Pype.from_node(add_const.partial(amount=5)).apply(df)
    assert sorted(r.v for r in out.collect()) == [15.0, 25.0, 35.0]


# -- A14: wiring-time contract checking -------------------------------------


def test_incompatible_wiring_fails_at_composition_time():
    a = Task(lambda d: d, name="a", produces=["x"])
    b = Task(lambda d: d, name="b", requires=["y"])
    with pytest.raises(IncompatibleTasksError, match="missing columns"):
        _ = a | b  # no DataFrame involved: fails at build, not run


def test_type_conflict_detected_at_wiring():
    a = Task(lambda d: d, name="a", produces={"x": "bigint"})
    b = Task(lambda d: d, name="b", requires={"x": "string"})
    with pytest.raises(IncompatibleTasksError, match="type conflicts"):
        _ = a | b


def test_compatible_wiring_passes():
    a = Task(lambda d: d, name="a", produces={"x": "bigint", "y": None})
    b = Task(lambda d: d, name="b", requires={"x": "bigint"})
    assert isinstance(a | b, Pype)


# -- A4/A5: fan-out and fan-in ----------------------------------------------


def test_fan_out_then_merge(df):
    @task
    def src(d):
        return d

    @task
    def sums(d):
        return d.groupBy("k").agg(F.sum("v").alias("s"))

    @task
    def counts(d):
        return d.groupBy(F.col("k").alias("k2")).agg(F.count("*").alias("n"))

    @task(n_inputs=2)
    def merge(a, b):
        return a.join(b, a.k == b.k2).select("k", "s", "n")

    out = (src | (sums, counts) | merge).apply(df)
    got = {r.k: (r.s, r.n) for r in out.collect()}
    assert got == {"a": (40.0, 2), "b": (20.0, 1)}


def test_fan_in_arity_mismatch_raises(df):
    @task
    def src(d):
        return d

    one_input = Task(lambda d: d, name="one")
    with pytest.raises(ValueError, match="fan-in"):
        _ = src | (src.copy(), src.copy()) | one_input


def test_ampersand_keeps_tails_open(df):
    a = Task(lambda d: d.select("id"), name="ids")
    b = Task(lambda d: d.select("k"), name="ks")
    p = a & b
    out = p.apply(df, df)
    assert set(out) == {"ids", "ks"}
    assert out["ids"].columns == ["id"]


# -- A6: iff gating ----------------------------------------------------------


def test_iff_gates_rows(df):
    t = Task(lambda d: d.select("id"), name="proj").iff(F.col("v") > 15)
    out = Pype.from_node(t).apply(df)
    assert sorted(r.id for r in out.collect()) == [2, 3]


def test_iff_returns_copy(df):
    t = Task(lambda d: d, name="t")
    gated = t.iff(F.col("v") > 15)
    assert t.gate is None and gated.gate is not None


# -- A7: lifecycle callbacks -------------------------------------------------


def test_callbacks_fire_in_order(df):
    seen = []
    t = (
        Task(lambda d: d, name="t")
        .on_start(lambda task: seen.append(("start", task.name)))
        .on_success(lambda: seen.append(("success", None)))
        .on_finish(lambda: seen.append(("finish", None)))
    )
    Pype.from_node(t).apply(df)
    assert [s[0] for s in seen] == ["start", "success", "finish"]


def test_failure_callback_receives_exception(df):
    caught = []

    def boom(d):
        raise RuntimeError("kaput")

    t = Task(boom, name="boom").on_failure(lambda e: caught.append(str(e)))
    with pytest.raises(RuntimeError, match="kaput"):
        Pype.from_node(t).apply(df)
    assert caught == ["kaput"]


def test_failure_callback_can_supply_fallback(df):
    def boom(d):
        raise RuntimeError("kaput")

    t = Task(boom, name="boom").on_failure(lambda e, df: df.limit(0))
    out = Pype.from_node(t).apply(df)
    assert out.count() == 0  # recovered with the fallback


# -- A9: fixtures ------------------------------------------------------------


def test_ctx_fixture_injected(df):
    got = {}

    @task
    def uses_ctx(d, ctx=None):
        got["run_id"] = ctx.params.get("run_id")
        return d

    Pype.from_node(uses_ctx).apply(df, ctx=RunContext(params={"run_id": "r1"}))
    assert got["run_id"] == "r1"


# -- A8: runtime validation --------------------------------------------------


def test_expect_schema_pass_and_fail(df):
    assert expect_schema(df, {"id": "bigint", "v": "double"}) is df
    with pytest.raises(ContractError, match="missing"):
        expect_schema(df, ["nope"])
    with pytest.raises(ContractError, match="mistyped"):
        expect_schema(df, {"id": "string"})


def test_expect_splits_and_counts(df):
    valid, bad = expect(df, F.col("v") > 15, quarantine=True)
    assert valid.count() == 2 and bad.count() == 1


def test_expect_null_predicate_counts_as_violation(spark):
    # rows where the predicate evaluates to NULL must land in quarantine
    # and be counted — not silently vanish from both branches
    from pyspark.sql import Observation

    d = spark.createDataFrame(
        [(1, 20.0), (2, None), (3, 10.0)], "id bigint, v double"
    )
    obs = Observation("null_contract")
    valid, bad = expect(
        d, F.col("v") > 15, quarantine=True, observation=obs
    )
    assert valid.count() == 1
    assert bad.count() == 2  # the NULL row is quarantined, not lost
    assert obs.get["violations"] == 2 and obs.get["rows"] == 3


def test_expect_observation_metrics_readable(df):
    from pyspark.sql import Observation

    obs = Observation("contract")
    valid = expect(df, F.col("v") > 15, observation=obs)
    assert valid.count() == 2
    got = obs.get
    assert got["violations"] == 1 and got["rows"] == 3


# -- A12/A13 -----------------------------------------------------------------


def test_compose_does_not_mutate_original(df):
    a = Task(lambda d: d, name="a")
    p1 = Pype.from_node(a)
    p2 = p1 | Task(lambda d: d.select("id"), name="b")
    assert len(p1.nodes) == 1 and len(p2.nodes) == 2


def test_pype_run_fires_action_time_hooks(df):
    seen = []
    p = (
        Pype.from_node(Task(lambda d: d.select("id"), name="proj"))
        .on_success(lambda results: seen.append(("ok", len(results["__terminal"]))))
        .on_finish(lambda: seen.append(("fin", None)))
    )
    rows = p.run(df)
    assert len(rows) == 3
    assert seen == [("ok", 3), ("fin", None)]


def test_pype_run_failure_hook_receives_exception(df):
    caught = []

    def explode_on_action(d):
        # valid plan, fails at execution: ANSI cast of bad literal per row
        from pyspark.sql import functions as F

        return d.withColumn("boom", F.lit("xx").cast("int") + F.col("id"))

    p = (
        Pype.from_node(Task(explode_on_action, name="boom"))
        .on_failure(lambda e: caught.append(type(e).__name__))
    )
    with pytest.raises(Exception):
        p.run(df)
    assert caught and caught[0]


def test_pype_run_with_writer_action(df, tmp_path):
    out_dir = str(tmp_path / "out")
    p = Pype.from_node(Task(lambda d: d.select("id", "v"), name="proj"))
    p.run(df, action=lambda d: d.write.mode("overwrite").parquet(out_dir))
    back = df.sparkSession.read.parquet(out_dir)
    assert back.count() == 3


def test_pype_composes_over_streaming_dataframes(spark, tmp_path):
    """The algebra is execution-mode agnostic: the same Task/Pype
    composes onto a streaming DataFrame, and the composed plan runs
    under Trigger.AvailableNow."""
    import os

    from pyspark.sql import functions as F

    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id long, k string, v double",
    )
    d = str(tmp_path / "in")
    src.write.parquet(d)
    stream = spark.readStream.schema("id long, k string, v double").parquet(d)

    @task
    def big_only(df):
        return df.filter(F.col("v") >= 20)

    @task
    def label(df):
        return df.withColumn("tag", F.concat(F.col("k"), F.lit("!")))

    out = (big_only | label).apply(stream)
    assert out.isStreaming
    os.makedirs("/root/repo/.scratch", exist_ok=True)
    q = (
        out.writeStream.format("memory")
        .queryName("pype_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {tuple(r) for r in spark.table("pype_stream_test").collect()}
    assert rows == {(2, "b", 20.0, "b!"), (3, "a", 30.0, "a!")}


def test_explain_renders_dag():
    a = Task(lambda d: d, name="alpha")
    b = Task(lambda d: d, name="beta").iff(F.lit(True))
    text = (a | b).explain()
    assert "alpha#0" in text and "beta#1 [gated]" in text


def test_to_dot_renders_graphviz():
    a = Task(lambda d: d, name="alpha")
    b = Task(lambda d: d, name="beta").iff(F.lit(True))
    dot = (a | b).to_dot()
    assert dot.startswith("digraph pype {")
    assert 'label="alpha"' in dot and "shape=diamond" in dot
    assert "n0 -> n1" in dot
