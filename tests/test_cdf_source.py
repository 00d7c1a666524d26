"""Tests for the ``delta_cdf`` Python DataSource
(:mod:`spype_spark.cdf_source`) — batch + Structured Streaming change
feeds over a foreign Delta log — and the no-Spark log replay
(:func:`spype_spark.delta_log.replay_state_py`) it plans with.

The ground truth throughout is :func:`delta_interop.delta_changes`
(itself oracle-verified by the ``q_lake_delta_changes`` contract): the
format must produce the SAME rows through the DataSource worker path
that the batch function produces through Spark scans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spype_spark import delta_interop as dl
from spype_spark import delta_log as dlog
from spype_spark.cdf_source import register_delta_cdf


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def reg(spark):
    register_delta_cdf(spark)
    return spark


def _mutation_fixture(spark, path):
    """v0 create / v1 DV delete / v2 append / v3 cdc UPDATE — one of
    every decode path delta_changes distinguishes."""
    df = spark.range(80).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )
    dl.write_delta(spark, df, path)
    dl.delta_delete_rows(spark, path, F.col("k") > 70)
    dl.write_delta(spark, df.filter(F.col("k") < 5), path, mode="append")
    dl.delta_update_rows(
        spark, path, F.col("g") == 3, {"v": F.col("v") + 100.0}
    )


def test_batch_format_matches_delta_changes(reg, tmp_path):
    """read.format('delta_cdf') over the full mutation fixture equals
    the batch delta_changes feed row-for-row."""
    p = str(tmp_path / "t")
    _mutation_fixture(reg, p)
    got = reg.read.format("delta_cdf").option("path", p).load()
    ref = dl.delta_changes(reg, p, 0)
    assert got.columns == ref.columns
    assert _rows(got) == _rows(ref)


def test_batch_window_options(reg, tmp_path):
    """startingVersion/endingVersion bound the batch window exactly."""
    p = str(tmp_path / "t")
    _mutation_fixture(reg, p)
    got = (
        reg.read.format("delta_cdf")
        .option("path", p)
        .option("startingVersion", 1)
        .option("endingVersion", 2)
        .load()
    )
    ref = dl.delta_changes(reg, p, 1, 2)
    assert _rows(got) == _rows(ref)


def test_stream_available_now_matches_batch(reg, tmp_path):
    """readStream + Trigger.AvailableNow drains the whole feed into a
    memory sink with exactly the batch rows."""
    p = str(tmp_path / "t")
    _mutation_fixture(reg, p)
    q = (
        reg.readStream.format("delta_cdf")
        .option("path", p)
        .load()
        .writeStream.format("memory")
        .queryName("cdf_all")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _rows(reg.table("cdf_all")) == _rows(dl.delta_changes(reg, p, 0))


def test_stream_restart_exactly_once(reg, tmp_path):
    """Offsets live in Spark's checkpoint: a restarted query emits
    ONLY commits after the consumed version, and a caught-up restart
    emits nothing (no duplicates across three drains)."""
    p = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    df = reg.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    dl.write_delta(reg, df, p)

    def drain():
        q = (
            reg.readStream.format("delta_cdf")
            .option("path", p)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert reg.read.parquet(out).count() == 50
    dl.delta_delete_rows(reg, p, F.col("k") >= 45)
    dl.write_delta(reg, df.filter(F.col("k") < 3), p, mode="append")
    drain()
    ref = dl.delta_changes(reg, p, 0)
    assert _rows(reg.read.parquet(out)) == _rows(ref)
    drain()  # caught up — idempotent
    assert reg.read.parquet(out).count() == ref.count()


def test_stream_rate_limit_max_versions(reg, tmp_path):
    """maxVersionsPerTrigger=1 caps each microbatch at one commit —
    the feed arrives over multiple batches but completely."""
    p = str(tmp_path / "t")
    df = reg.range(30).select(F.col("id").alias("k"))
    dl.write_delta(reg, df, p)
    dl.write_delta(reg, df, p, mode="append")
    dl.write_delta(reg, df, p, mode="append")
    q = (
        reg.readStream.format("delta_cdf")
        .option("path", p)
        .option("maxVersionsPerTrigger", 1)
        .load()
        .writeStream.format("memory")
        .queryName("cdf_rl")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = reg.table("cdf_rl")
    assert got.count() == 90
    assert [
        r["_commit_version"] for r in
        got.groupBy("_commit_version").count().orderBy("_commit_version")
        .collect()
    ] == [0, 1, 2]


def test_partitioned_table_injects_partition_values(reg, tmp_path):
    """Hive-partitioned files lack the partition column — the reader
    fills it from the add's partitionValues, typed per the schema."""
    p = str(tmp_path / "t")
    df = reg.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("part_g")
    )
    dl.write_delta(reg, df, p, partition_by=["part_g"])
    dl.delta_delete_rows(reg, p, F.col("k") >= 35)
    got = reg.read.format("delta_cdf").option("path", p).load()
    ref = dl.delta_changes(reg, p, 0)
    assert _rows(got) == _rows(ref)
    assert got.filter(F.col("part_g").isNull()).count() == 0


def test_column_mapping_name_mode(reg, tmp_path):
    """After ALTER-style renames (name-mode mapping), physical file
    columns resolve back to logical names."""
    p = str(tmp_path / "t")
    df = reg.range(25).select(
        F.col("id").alias("old_k"), (F.col("id") * 2).alias("w")
    )
    dl.write_delta(reg, df, p)
    dl.delta_rename_column(reg, p, {"old_k": "new_k"})
    got = reg.read.format("delta_cdf").option("path", p).load()
    ref = dl.delta_changes(reg, p, 0)
    assert got.columns == ref.columns and "new_k" in got.columns
    assert _rows(got) == _rows(ref)


def test_column_mapping_id_mode(reg, tmp_path):
    """Id-mode tables (random physical names + parquet field ids) are
    resolved per-file by footer field id."""
    p = str(tmp_path / "t")
    df = reg.range(25).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w")
    )
    dl.write_delta(reg, df, p, column_mapping="id")
    got = reg.read.format("delta_cdf").option("path", p).load()
    ref = dl.delta_changes(reg, p, 0)
    assert got.columns == ref.columns
    assert _rows(got) == _rows(ref)


def test_schema_evolution_fills_null(reg, tmp_path):
    """Files written before a column existed read as NULL for it —
    the same evolution rule the batch scan applies."""
    p = str(tmp_path / "t")
    df1 = reg.range(10).select(F.col("id").alias("k"))
    dl.write_delta(reg, df1, p)
    df2 = reg.range(10, 20).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("extra")
    )
    dl.write_delta(reg, df2, p, mode="append", )
    # append with evolved schema: write_delta refuses mismatched
    # schema? fall back to manual check only if it succeeded
    got = reg.read.format("delta_cdf").option("path", p).load()
    ref = dl.delta_changes(reg, p, 0)
    assert _rows(got) == _rows(ref)


def test_typed_columns_roundtrip(reg, tmp_path):
    """date / timestamp / decimal columns survive the Arrow channel
    with value parity against the batch feed."""
    p = str(tmp_path / "t")
    df = reg.range(12).select(
        F.col("id").alias("k"),
        F.to_date(F.lit("2024-03-01")).alias("d"),
        (
            F.to_timestamp(F.lit("2024-03-01 12:30:00"))
            + F.make_interval(secs=F.col("id"))
        ).alias("ts"),
        (F.col("id") * 1.0).cast("decimal(10,2)").alias("x"),
    )
    dl.write_delta(reg, df, p)
    dl.delta_delete_rows(reg, p, F.col("k") >= 9)
    got = reg.read.format("delta_cdf").option("path", p).load()
    ref = dl.delta_changes(reg, p, 0)
    assert _rows(got) == _rows(ref)


def test_rewrite_without_cdc_raises(reg, tmp_path):
    """A compaction-style rewrite without cdc actions must FAIL the
    read loudly (undecidable row-level feed), same as delta_changes."""
    p = str(tmp_path / "t")
    df = reg.range(10).select(F.col("id").alias("k"))
    dl.write_delta(reg, df, p)
    st = dlog.replay_state_py(p)
    old = st["adds"][0]
    import os
    import shutil as sh

    sh.copy(
        os.path.join(p, old["path"]), os.path.join(p, "rewritten.parquet")
    )
    dl._publish_commit(
        p,
        1,
        [
            {"remove": {"path": old["path"], "dataChange": True}},
            {
                "add": {
                    "path": "rewritten.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
        ],
    )
    with pytest.raises(Exception, match="without cdc"):
        reg.read.format("delta_cdf").option("path", p).load().collect()


def test_truncated_window_raises(reg, tmp_path):
    """Commits dropped below a checkpoint make the requested window
    unavailable — a loud error, not a partial feed."""
    import os

    p = str(tmp_path / "t")
    df = reg.range(10).select(F.col("id").alias("k"))
    dl.write_delta(reg, df, p)
    dl.write_delta(reg, df, p, mode="append")
    dl.checkpoint_delta(reg, p)
    os.remove(dlog.commit_path(p, 0))
    with pytest.raises(Exception, match="checkpoint-truncated"):
        reg.read.format("delta_cdf").option("path", p).load().collect()


def test_replay_state_py_matches_spark_replay(reg, tmp_path):
    """The no-Spark replay (classic checkpoint via pyarrow + JSON
    tail) reconstructs byte-identical state to the Spark-backed
    _replay_state."""
    p = str(tmp_path / "t")
    _mutation_fixture(reg, p)
    dl.checkpoint_delta(reg, p)
    dl.write_delta(
        reg,
        reg.range(5).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 1.5).alias("v"),
        ),
        p,
        mode="append",
    )
    a = dlog.replay_state_py(p)
    b = dl._replay_state(reg, p, None)
    assert a["version"] == b["version"]
    assert a["meta"]["schemaString"] == b["meta"]["schemaString"]
    ka = sorted(x["path"] for x in a["adds"])
    kb = sorted(x["path"] for x in b["adds"])
    assert ka == kb
    assert sorted(x["path"] for x in a["tombstones"]) == sorted(
        x["path"] for x in b["tombstones"]
    )
    assert a["txns"] == b["txns"]


def test_replay_state_py_v2_checkpoint(reg, tmp_path):
    """replay_state_py reads V2 checkpoints (uuid top + sidecars) the
    same as the Spark path."""
    p = str(tmp_path / "t")
    df = reg.range(20).select(F.col("id").alias("k"))
    dl.write_delta(reg, df, p)
    dl.delta_delete_rows(reg, p, F.col("k") >= 15)
    dl.checkpoint_delta_v2(reg, p)
    a = dlog.replay_state_py(p)
    b = dl._replay_state(reg, p, None)
    assert sorted(x["path"] for x in a["adds"]) == sorted(
        x["path"] for x in b["adds"]
    )
