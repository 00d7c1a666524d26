"""Tests for the ``iceberg_cdc`` Python DataSource
(:mod:`spype_spark.iceberg_cdc`) — batch + Structured Streaming
incremental reads over a foreign Iceberg snapshot chain. Ground truth
is :func:`iceberg_interop.iceberg_changes` (oracle-verified by the
``q_lake_iceberg_changes`` contract)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from spype_spark import iceberg_interop as ice
from spype_spark.iceberg_cdc import register_iceberg_cdc


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def reg(spark):
    register_iceberg_cdc(spark)
    return spark


def _chain_fixture(reg, p):
    """append / append / pos-delete / eq-delete — every decidable
    layer of the incremental read."""
    df = reg.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    s0 = ice.write_iceberg(reg, df, p)
    s1 = ice.write_iceberg(
        reg,
        reg.range(30, 40).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        p,
        mode="append",
    )
    hits = (
        ice.position_scan(reg, p)
        .filter(F.col("k") < 5)
        .select(F.col("_file").alias("file_path"), F.col("_pos").alias("pos"))
    )
    s2 = ice.write_iceberg_pos_deletes(reg, hits, p)
    s3 = ice.write_iceberg_eq_deletes(
        reg, reg.range(0, 40, 10).select(F.col("id").alias("k")), p, ["k"]
    )
    return s0, s1, s2, s3


def test_batch_matches_iceberg_changes(reg, tmp_path):
    p = str(tmp_path / "t")
    _chain_fixture(reg, p)
    got = reg.read.format("iceberg_cdc").option("path", p).load()
    ref = ice.iceberg_changes(reg, p)
    assert got.columns == ref.columns
    assert _rows(got) == _rows(ref)


def test_batch_window_options(reg, tmp_path):
    p = str(tmp_path / "t")
    s0, s1, s2, s3 = _chain_fixture(reg, p)
    got = (
        reg.read.format("iceberg_cdc")
        .option("path", p)
        .option("fromSnapshotId", s1)
        .option("toSnapshotId", s2)
        .load()
    )
    ref = ice.iceberg_changes(
        reg, p, from_snapshot_id=s1, to_snapshot_id=s2
    )
    assert _rows(got) == _rows(ref)
    with pytest.raises(Exception, match="not in snapshot chain"):
        (
            reg.read.format("iceberg_cdc")
            .option("path", p)
            .option("fromSnapshotId", 123)
            .load()
            .collect()
        )


def test_stream_available_now_matches_batch(reg, tmp_path):
    p = str(tmp_path / "t")
    _chain_fixture(reg, p)
    q = (
        reg.readStream.format("iceberg_cdc")
        .option("path", p)
        .load()
        .writeStream.format("memory")
        .queryName("ice_all")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _rows(reg.table("ice_all")) == _rows(ice.iceberg_changes(reg, p))


def test_stream_restart_exactly_once(reg, tmp_path):
    p = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    df = reg.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    ice.write_iceberg(reg, df, p)

    def drain():
        q = (
            reg.readStream.format("iceberg_cdc")
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
    assert reg.read.parquet(out).count() == 30
    hits = (
        ice.position_scan(reg, p)
        .filter(F.col("k") < 5)
        .select(F.col("_file").alias("file_path"), F.col("_pos").alias("pos"))
    )
    ice.write_iceberg_pos_deletes(reg, hits, p)
    ice.write_iceberg(
        reg,
        reg.range(30, 35).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        p,
        mode="append",
    )
    drain()
    ref = ice.iceberg_changes(reg, p)
    assert _rows(reg.read.parquet(out)) == _rows(ref)
    drain()  # caught up
    assert reg.read.parquet(out).count() == ref.count()


def test_stream_rate_limit(reg, tmp_path):
    p = str(tmp_path / "t")
    for lo in (0, 10, 20):
        ice.write_iceberg(
            reg,
            reg.range(lo, lo + 10).select(F.col("id").alias("k")),
            p,
            mode="append" if lo else "error",
        )
    q = (
        reg.readStream.format("iceberg_cdc")
        .option("path", p)
        .option("maxSnapshotsPerTrigger", 1)
        .load()
        .writeStream.format("memory")
        .queryName("ice_rl")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = reg.table("ice_rl")
    assert got.count() == 30
    assert (
        got.select("_snapshot_id").distinct().count() == 3
    )


def test_expired_chain_fails_loudly(reg, tmp_path):
    """A checkpointed offset whose ordinal/id no longer matches the
    chain (history expired) must raise, never re-window silently."""
    p = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    ice.write_iceberg(
        reg, reg.range(10).select(F.col("id").alias("k")), p
    )
    ice.write_iceberg(
        reg,
        reg.range(10, 20).select(F.col("id").alias("k")),
        p,
        mode="append",
    )
    q = (
        reg.readStream.format("iceberg_cdc")
        .option("path", p)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # expire the FIRST snapshot: drop it from the chain and republish
    # the metadata (what a retention job does), then append so the
    # stream has something new to plan
    from spype_spark.iceberg_log import current_metadata, meta_dir

    meta = current_metadata(p)
    meta["snapshots"] = meta["snapshots"][1:]
    md = meta_dir(p)
    with open(os.path.join(md, "version-hint.text")) as f:
        n = int(f.read().strip())
    with open(os.path.join(md, f"v{n + 1}.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write(str(n + 1))
    ice.write_iceberg(
        reg,
        reg.range(20, 25).select(F.col("id").alias("k")),
        p,
        mode="append",
    )
    q2 = (
        reg.readStream.format("iceberg_cdc")
        .option("path", p)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="expired or rewritten"):
        q2.awaitTermination()


def test_rename_resolves_by_field_id(reg, tmp_path):
    """Files written before a rename resolve through footer field ids;
    the feed carries the CURRENT logical names."""
    p = str(tmp_path / "t")
    ice.write_iceberg(
        reg,
        reg.range(15).select(
            F.col("id").alias("old_k"), (F.col("id") * 2).alias("v")
        ),
        p,
    )
    ice.rename_iceberg_columns(reg, p, {"old_k": "new_k"})
    ice.write_iceberg(
        reg,
        reg.range(15, 20).select(
            F.col("id").alias("new_k"), (F.col("id") * 2).alias("v")
        ),
        p,
        mode="append",
    )
    got = reg.read.format("iceberg_cdc").option("path", p).load()
    ref = ice.iceberg_changes(reg, p)
    assert got.columns == ref.columns and "new_k" in got.columns
    assert _rows(got) == _rows(ref)
    assert got.filter(F.col("new_k").isNull()).count() == 0
