"""Tests for the Delta→native continuous replication pipeline
(:mod:`spype_spark.replicate`): the mirrored native table must equal
``read_delta`` of the source at every drain point, across restarts
and every change-decode class."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spype_spark import delta_interop as dl
from spype_spark import lakehouse as lake
from spype_spark.replicate import replicate_delta_to_lake


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mirror(spark, src, dst, ck):
    q = replicate_delta_to_lake(spark, src, dst, ck, keys=["k"])
    q.awaitTermination()


def test_replication_tracks_all_change_classes(spark, tmp_path):
    src, dst, ck = (
        str(tmp_path / "delta"),
        str(tmp_path / "native"),
        str(tmp_path / "ck"),
    )
    df = spark.range(40).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )
    dl.write_delta(spark, df, src)
    dl.delta_delete_rows(spark, src, F.col("k") >= 35)  # DV delete
    _mirror(spark, src, dst, ck)
    assert _rows(lake.read_table(spark, dst)) == _rows(
        dl.read_delta(spark, src)
    )
    # cdc UPDATE + append of NEW keys, then a resumed mirror
    dl.delta_update_rows(spark, src, F.col("g") == 2, {"v": F.col("v") + 9.0})
    dl.write_delta(
        spark,
        spark.range(100, 110).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("g"),
            (F.col("id") * 1.5).alias("v"),
        ),
        src,
        mode="append",
    )
    _mirror(spark, src, dst, ck)
    assert _rows(lake.read_table(spark, dst)) == _rows(
        dl.read_delta(spark, src)
    )
    # caught-up mirror changes nothing and publishes no version
    v = lake.latest_version(dst)
    _mirror(spark, src, dst, ck)
    assert lake.latest_version(dst) == v


def test_replication_batch_reapply_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-applying the SAME change
    batch must leave the table unchanged (upsert + key-delete
    idempotence — the effective-exactly-once argument)."""
    from spype_spark.replicate import apply_cdf_batch

    src, dst = str(tmp_path / "delta"), str(tmp_path / "native")
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    dl.write_delta(spark, df, src)
    dl.delta_delete_rows(spark, src, F.col("k") >= 15)
    batch = dl.delta_changes(spark, src, 0)
    apply_cdf_batch(spark, batch, dst, keys=["k"])
    first = _rows(lake.read_table(spark, dst))
    apply_cdf_batch(spark, batch, dst, keys=["k"])  # replay
    assert _rows(lake.read_table(spark, dst)) == first
    assert first == _rows(dl.read_delta(spark, src))


def test_replication_requires_keyed_source(spark, tmp_path):
    """Appending duplicate keys at the source breaks the keyed-CDC
    premise: the mirror (upsert semantics) keeps ONE row per key —
    assert the documented divergence is exactly that, not silent
    corruption of other rows."""
    src, dst, ck = (
        str(tmp_path / "delta"),
        str(tmp_path / "native"),
        str(tmp_path / "ck"),
    )
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    dl.write_delta(spark, df, src)
    dl.write_delta(spark, df.limit(3), src, mode="append")  # dup keys
    _mirror(spark, src, dst, ck)
    got = lake.read_table(spark, dst)
    assert got.count() == 10  # one row per key
    assert got.select("k").distinct().count() == 10


def test_iceberg_replication_tracks_chain(spark, tmp_path):
    from spype_spark import iceberg_interop as ice
    from spype_spark.replicate import replicate_iceberg_to_lake

    src, dst, ck = (
        str(tmp_path / "ice"),
        str(tmp_path / "native"),
        str(tmp_path / "ck"),
    )
    df = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    ice.write_iceberg(spark, df, src)
    hits = (
        ice.position_scan(spark, src)
        .filter(F.col("k") < 5)
        .select(F.col("_file").alias("file_path"), F.col("_pos").alias("pos"))
    )
    ice.write_iceberg_pos_deletes(spark, hits, src)

    def mirror():
        q = replicate_iceberg_to_lake(spark, src, dst, ck, keys=["k"])
        q.awaitTermination()

    mirror()
    assert _rows(lake.read_table(spark, dst)) == _rows(
        ice.read_iceberg(spark, src)
    )
    ice.write_iceberg(
        spark,
        spark.range(100, 108).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        ),
        src,
        mode="append",
    )
    ice.write_iceberg_eq_deletes(
        spark, spark.range(0, 30, 10).select(F.col("id").alias("k")),
        src, ["k"],
    )
    mirror()
    assert _rows(lake.read_table(spark, dst)) == _rows(
        ice.read_iceberg(spark, src)
    )
    v = lake.latest_version(dst)
    mirror()
    assert lake.latest_version(dst) == v


def test_sql_replicate_statement(spark, tmp_path):
    """`REPLICATE DELTA '<src>' INTO '<dst>' KEYS (k)` — the facade
    statement runs one incremental sync and returns the native
    version; a repeated statement resumes from the same checkpoint."""
    from spype_spark import sqltext

    src = str(tmp_path / "delta")
    dst = str(tmp_path / "native")
    df = spark.range(15).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    dl.write_delta(spark, df, src)
    v = sqltext.sql(spark, f"REPLICATE DELTA '{src}' INTO '{dst}' KEYS (k)")
    assert v == lake.latest_version(dst)
    assert _rows(lake.read_table(spark, dst)) == _rows(
        dl.read_delta(spark, src)
    )
    dl.delta_delete_rows(spark, src, F.col("k") >= 10)
    sqltext.sql(spark, f"REPLICATE DELTA '{src}' INTO '{dst}' KEYS (k)")
    assert _rows(lake.read_table(spark, dst)) == _rows(
        dl.read_delta(spark, src)
    )
    # explicit checkpoint form + iceberg flavor parse
    from spype_spark import iceberg_interop as ice

    isrc = str(tmp_path / "ice")
    idst = str(tmp_path / "inative")
    ice.write_iceberg(spark, df, isrc)
    sqltext.sql(
        spark,
        f"REPLICATE ICEBERG '{isrc}' INTO '{idst}' KEYS (k) "
        f"CHECKPOINT '{tmp_path / 'ick'}'",
    )
    assert _rows(lake.read_table(spark, idst)) == _rows(
        ice.read_iceberg(spark, isrc)
    )
    # LAKE flavor (r15): native -> native mirror through the facade
    lsrc = str(tmp_path / "lsrc")
    ldst = str(tmp_path / "ldst")
    lake.write_table(df, lsrc)
    lake.delete_where_dv(spark, lsrc, F.col("k") >= 12)
    sqltext.sql(spark, f"REPLICATE LAKE '{lsrc}' INTO '{ldst}' KEYS (k)")
    assert _rows(lake.read_table(spark, ldst)) == _rows(
        lake.read_table(spark, lsrc)
    )
    lake.merge_upsert(
        spark,
        lsrc,
        spark.createDataFrame([(1, -1.0), (50, 5.0)], "k long, v double"),
        ["k"],
    )
    sqltext.sql(spark, f"REPLICATE LAKE '{lsrc}' INTO '{ldst}' KEYS (k)")
    assert _rows(lake.read_table(spark, ldst)) == _rows(
        lake.read_table(spark, lsrc)
    )


def test_key_changing_update_deletes_old_key(spark, tmp_path):
    """A source UPDATE that changes a KEY column emits a preimage
    whose key has no postimage — the mirror must delete the old key,
    not keep a ghost row (review r13)."""
    from spype_spark.replicate import apply_cdf_batch

    src, dst = str(tmp_path / "delta"), str(tmp_path / "native")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    dl.write_delta(spark, df, src)
    # key-changing update: k -> k + 100 for k < 3
    dl.delta_update_rows(
        spark, src, F.col("k") < 3, {"k": F.col("k") + 100}
    )
    apply_cdf_batch(spark, dl.delta_changes(spark, src, 0), dst, keys=["k"])
    assert _rows(lake.read_table(spark, dst)) == _rows(
        dl.read_delta(spark, src)
    )
    got_keys = sorted(
        r["k"] for r in lake.read_table(spark, dst).collect()
    )
    assert got_keys == [3, 4, 5, 6, 7, 8, 9, 100, 101, 102]


def test_iceberg_orphan_snapshot_is_loud(spark, tmp_path):
    """Change rows whose snapshot vanished from the metadata chain
    between read and apply must raise — ordering is undecidable
    (review r13)."""
    from spype_spark import iceberg_interop as ice
    from spype_spark.replicate import apply_iceberg_batch

    src, dst = str(tmp_path / "ice"), str(tmp_path / "native")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    s0 = ice.write_iceberg(spark, df, src)
    batch = ice.iceberg_changes(spark, src)
    with pytest.raises(ValueError, match="no longer in the metadata chain"):
        apply_iceberg_batch(spark, batch, dst, ["k"], chain=[s0 + 1])


# ---------------------------------------------------------------------------
# Model-based replication fuzz (round 14): random mutation chains
# through BOTH pipelines vs a plain dict model — the interaction class
# the two pinned contracts cannot cover (delete/re-insert sequencing,
# key-changing updates mid-chain, restarts between arbitrary commits).
# ---------------------------------------------------------------------------

import random  # noqa: E402


def _kv_df(spark, model: dict):
    rows = [(int(k), int(v)) for k, v in sorted(model.items())]
    return spark.createDataFrame(rows, "k long, v long")


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(25))
def test_fuzz_delta_replication_chain(spark, tmp_path, seed):
    """create → {append | dv-delete | cdc-update | key-move}* with a
    REPLICATION DRAIN at random points (restart = resumed checkpoint):
    after the final drain the native mirror must equal both the dict
    model and read_delta at head."""
    rng = random.Random(7000 + seed)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    model = {k: k * 3 for k in range(20)}
    dl.write_delta(spark, _kv_df(spark, model), src)
    nxt = 100
    n_ops = 3
    drain_after = {rng.randrange(n_ops)}
    for step in range(n_ops):
        op = rng.choice(["append", "dvdel", "update", "keymove"])
        mod, res = rng.choice([3, 5, 7]), rng.randrange(3)
        hit = [k for k in model if k % mod == res]
        if op == "append" or not hit:
            new = {k: k * 3 for k in range(nxt, nxt + rng.randint(2, 6))}
            nxt += 50
            dl.write_delta(spark, _kv_df(spark, new), src, mode="append")
            model.update(new)
        elif op == "dvdel":
            dl.delta_delete_rows(
                spark, src, F.col("k") % mod == res
            )
            for k in hit:
                del model[k]
        elif op == "update":
            dl.delta_update_rows(
                spark,
                src,
                F.col("k") % mod == res,
                {"v": F.col("v") + 1000},
            )
            for k in hit:
                model[k] += 1000
        else:  # key-move: UPDATE that changes the key tuple
            dl.delta_update_rows(
                spark,
                src,
                F.col("k") % mod == res,
                {"k": F.col("k") + 100000},
            )
            for k in hit:
                model[k + 100000] = model.pop(k)
        if step in drain_after:
            _mirror(spark, src, dst, ck)
    _mirror(spark, src, dst, ck)
    got = sorted((r["k"], r["v"]) for r in lake.read_table(spark, dst).collect())
    assert got == sorted(model.items()), f"seed={seed} mirror != model"
    ref = sorted(
        (r["k"], r["v"]) for r in dl.read_delta(spark, src).collect()
    )
    assert got == ref, f"seed={seed} mirror != source head"


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(25))
def test_fuzz_iceberg_replication_chain(spark, tmp_path, seed):
    """The Iceberg twin: {append | pos-delete | eq-delete}* snapshots
    with a drain at a random point; eq-deletes sample live AND absent
    keys (absent must be a no-op), pos-deletes come from the verified
    position scan. Mirror must equal the model and the source head."""
    from spype_spark import iceberg_interop as ice
    from spype_spark.replicate import replicate_iceberg_to_lake

    rng = random.Random(8000 + seed)
    src = str(tmp_path / "isrc")
    dst = str(tmp_path / "idst")
    ck = str(tmp_path / "ick")
    model = {k: k * 3 for k in range(20)}
    ice.write_iceberg(spark, _kv_df(spark, model), src)
    nxt = 100
    n_ops = 3
    drain_after = {rng.randrange(n_ops)}

    def drain():
        q = replicate_iceberg_to_lake(spark, src, dst, ck, keys=["k"])
        q.awaitTermination()

    for step in range(n_ops):
        op = rng.choice(["append", "posdel", "eqdel"])
        mod, res = rng.choice([3, 5, 7]), rng.randrange(3)
        hit = [k for k in model if k % mod == res]
        if op == "append" or not hit:
            new = {k: k * 3 for k in range(nxt, nxt + rng.randint(2, 6))}
            nxt += 50
            ice.write_iceberg(
                spark, _kv_df(spark, new), src, mode="append"
            )
            model.update(new)
        elif op == "posdel":
            hits = (
                ice.position_scan(spark, src)
                .filter(F.col("k") % mod == res)
                .select(
                    F.col("_file").alias("file_path"),
                    F.col("_pos").alias("pos"),
                )
            )
            ice.write_iceberg_pos_deletes(spark, hits, src)
            for k in hit:
                del model[k]
        else:  # eq-delete on sampled live + one absent key
            sample = rng.sample(hit, k=min(len(hit), 4))
            keys_df = spark.createDataFrame(
                [(int(k),) for k in sample] + [(999999,)], "k long"
            )
            ice.write_iceberg_eq_deletes(spark, keys_df, src, ["k"])
            for k in sample:
                del model[k]
        if step in drain_after:
            drain()
    drain()
    got = sorted((r["k"], r["v"]) for r in lake.read_table(spark, dst).collect())
    assert got == sorted(model.items()), f"seed={seed} mirror != model"
    ref = sorted(
        (r["k"], r["v"]) for r in ice.read_iceberg(spark, src).collect()
    )
    assert got == ref, f"seed={seed} mirror != source head"


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(15))
def test_fuzz_lake_replication_chain(spark, tmp_path, seed):
    """Native→native fuzz (r15): random chains of {append | DV-delete
    | eq-delete | MERGE-update | key-move | COMPACT | SET/DROP BLOOM
    KEYS} with a drain at a random point. COMPACT and the bloom
    (re)index commits are dataChange=false — the r15 CDF planner must
    SKIP them at plan time mid-stream (zero change rows, no keys
    demanded) while everything around them still mirrors exactly; the
    final state must equal both the dict model and the source head.
    Bloom entries riding the manifests must never disturb the
    replication apply."""
    from spype_spark.lake_sink import register_lake_sink
    from spype_spark.replicate import replicate_lake_to_lake

    register_lake_sink(spark)
    rng = random.Random(1500 + seed)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    model = {k: k * 3 for k in range(20)}
    lake.write_table(_kv_df(spark, model), src)
    nxt = 100
    n_ops = 4
    drain_after = {rng.randrange(n_ops)}

    def drain():
        q = replicate_lake_to_lake(spark, src, dst, ck, keys=["k"])
        q.awaitTermination()

    for step in range(n_ops):
        op = rng.choice(
            [
                "append",
                "dvdel",
                "eqdel",
                "update",
                "keymove",
                "compact",
                "bloom",
            ]
        )
        mod, res = rng.choice([3, 5, 7]), rng.randrange(3)
        hit = [k for k in model if k % mod == res]
        if op == "append" or (
            not hit and op not in ("compact", "bloom")
        ):
            new = {k: k * 3 for k in range(nxt, nxt + rng.randint(2, 6))}
            nxt += 50
            lake.append_table(spark, src, _kv_df(spark, new))
            model.update(new)
        elif op == "dvdel":
            lake.delete_where_dv(spark, src, F.col("k") % mod == res)
            for k in hit:
                del model[k]
        elif op == "eqdel":
            keys = rng.sample(hit, min(len(hit), 3)) + [999999]
            lake.delete_keys(
                spark,
                src,
                spark.createDataFrame([(k,) for k in keys], "k long"),
            )
            for k in keys:
                model.pop(k, None)
        elif op == "update":
            upd = {k: model[k] + 1000 for k in hit}
            lake.merge_upsert(spark, src, _kv_df(spark, upd), ["k"])
            model.update(upd)
        elif op == "keymove":
            merged = dict(model)
            for k in hit:
                merged[k + 100000] = merged.pop(k)
            # key move = delete the old keys + upsert the new ones
            lake.delete_keys(
                spark,
                src,
                spark.createDataFrame([(k,) for k in hit], "k long"),
            )
            lake.merge_upsert(
                spark,
                src,
                _kv_df(spark, {k + 100000: model[k] for k in hit}),
                ["k"],
            )
            model = merged
        elif op == "bloom":
            # (re)index or drop: dataChange=false either way — the
            # feed must skip the commit AND the stamped entries must
            # ride every later commit without disturbing the apply
            if lake.table_bloom_keys(src):
                lake.set_bloom_keys(spark, src, [])
            else:
                lake.set_bloom_keys(spark, src, "k")
        else:  # compact: dataChange=false — the feed must skip it
            lake.compact(spark, src)
        if step in drain_after:
            drain()
    drain()
    got = sorted(
        (r["k"], r["v"]) for r in lake.read_table(spark, dst).collect()
    )
    assert got == sorted(model.items()), f"seed={seed} mirror != model"
    ref = sorted(
        (r["k"], r["v"]) for r in lake.read_table(spark, src).collect()
    )
    assert got == ref, f"seed={seed} mirror != source head"


def test_lake_to_lake_replication(spark, tmp_path):
    """Native→native mirror over the r14 change-feed format: the same
    apply path handles appends, MoR deletes, MERGE updates, and a
    KEY-CHANGING update, with a restart between phases."""
    from spype_spark.replicate import replicate_lake_to_lake

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    df = spark.createDataFrame(
        [(k, k * 3) for k in range(20)], "k long, v long"
    )
    lake.write_table(df, src)
    lake.delete_where_dv(spark, src, F.col("k") % 5 == 0)

    def mirror():
        q = replicate_lake_to_lake(spark, src, dst, ck, keys=["k"])
        q.awaitTermination()

    mirror()
    assert sorted(r["k"] for r in lake.read_table(spark, dst).collect()) == [
        k for k in range(20) if k % 5 != 0
    ]
    # key-changing MERGE: k=1 moves to k=101 (old key must vanish)
    lake.merge_upsert(
        spark,
        src,
        spark.createDataFrame([(101, 3)], "k long, v long").unionByName(
            lake.read_table(spark, src).filter(F.col("k") != 1)
        ),
        ["k"],
    )
    lake.delete_keys(spark, src, spark.createDataFrame([(1,)], "k long"))
    mirror()
    got = sorted((r["k"], r["v"]) for r in lake.read_table(spark, dst).collect())
    ref = sorted((r["k"], r["v"]) for r in lake.read_table(spark, src).collect())
    assert got == ref
    v = lake.latest_version(dst)
    mirror()
    assert lake.latest_version(dst) == v, "caught-up mirror published"
