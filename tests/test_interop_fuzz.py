"""Model-based fuzz of the round-13 interop surfaces: random operation
sequences against a plain-Python model of the expected table state.

The differential contracts pin ONE composition each; these drive many
(seeded, reproducible) — the class of bug they exist to catch is
interaction state: a deletion vector merged wrong on the second
delete of the same file, an equality delete leaking onto rows
appended later, a v2 checkpoint mid-sequence dropping tombstoned
positions, a rename breaking a delete written under the old name."""

import random

import pytest
from pyspark.sql import functions as F

from spype_spark import delta_interop as dl
from spype_spark import iceberg_interop as ice


def _mk(spark, keys):
    return spark.createDataFrame(
        [(int(k), int(k) * 3, str(k % 4)) for k in sorted(keys)],
        "k long, v long, s string",
    )


@pytest.mark.parametrize("seed", range(4))
def test_delta_dv_sequences_match_model(spark, tmp_path, seed):
    """write → {append | dv-delete | overwrite | v2-checkpoint}* —
    the read must equal a dict-model replay at every step."""
    rng = random.Random(1000 + seed)
    p = str(tmp_path / f"t{seed}")
    nxt = 100
    live = set(range(0, 30))
    dl.write_delta(spark, _mk(spark, live), p)
    for step in range(6):
        op = rng.choice(["append", "delete", "delete", "ckpt"])
        if op == "append":
            new = set(range(nxt, nxt + rng.randint(3, 10)))
            nxt += 20
            dl.write_delta(spark, _mk(spark, new), p, mode="append")
            live |= new
        elif op == "delete":
            mod = rng.choice([3, 5, 7])
            res = rng.randrange(mod)
            dl.delta_delete_rows(spark, p, F.col("k") % mod == res)
            live = {k for k in live if k % mod != res}
        elif op == "ckpt":
            v = dl.checkpoint_delta_v2(spark, p)
            assert v >= 1
        got = sorted(r["k"] for r in dl.read_delta(spark, p).collect())
        assert got == sorted(live), f"seed={seed} step={step} op={op}"
    # rename mid-chain: the vectored state must survive it, and (r14)
    # appends and DV deletes stay in-profile on the mapped table
    dl.delta_rename_column(spark, p, {"v": "value"})
    got = dl.read_delta(spark, p)
    assert set(got.columns) == {"k", "value", "s"}
    assert sorted(r["k"] for r in got.collect()) == sorted(live)
    new = set(range(nxt, nxt + rng.randint(3, 8)))
    dl.write_delta(
        spark,
        _mk(spark, new).withColumnRenamed("v", "value"),
        p,
        mode="append",
    )
    live |= new
    mod = rng.choice([2, 3])
    dl.delta_delete_rows(spark, p, F.col("value") % (3 * mod) == 0)
    live = {k for k in live if (k * 3) % (3 * mod) != 0}
    got = dl.read_delta(spark, p)
    assert sorted(r["k"] for r in got.collect()) == sorted(live), (
        f"seed={seed} post-rename mutations diverged"
    )


@pytest.mark.parametrize("seed", range(4))
def test_iceberg_mor_sequences_match_model(spark, tmp_path, seed):
    """write → {append | eq-delete | pos-delete | rename}* with the
    spec's sequence-number semantics modeled exactly: an equality
    delete hides only rows whose snapshot PRECEDES it; a position
    delete hides the concrete live rows it named when written."""
    rng = random.Random(2000 + seed)
    p = str(tmp_path / f"t{seed}")
    nxt = 100
    # model: key -> insertion generation (monotonic op counter)
    gen = {k: 0 for k in range(0, 25)}
    ice.write_iceberg(spark, _mk(spark, gen), p)
    opno = 0
    renamed = False
    for step in range(6):
        opno += 1
        pool = (
            ["eq", "eq", "pos"]  # the fixture writer gates appends
            if renamed           # after a rename; deletes still work
            else ["append", "eq", "eq", "pos", "rename"]
        )
        op = rng.choice(pool)
        if op == "append" and not renamed:
            new = list(range(nxt, nxt + rng.randint(3, 8)))
            nxt += 20
            ice.write_iceberg(spark, _mk(spark, new), p, mode="append")
            for k in new:
                gen[k] = opno
        elif op == "eq":
            mod = rng.choice([3, 5, 7])
            res = rng.randrange(mod)
            vals = [(int(k),) for k in range(0, nxt) if k % mod == res]
            kcol = "key" if renamed else "k"
            ice.write_iceberg_eq_deletes(
                spark, spark.createDataFrame(vals, f"{kcol} long"), p, [kcol]
            )
            # strictly-older rule: only rows inserted BEFORE this op
            gen = {
                k: g
                for k, g in gen.items()
                if not (k % mod == res and g < opno)
            }
        elif op == "pos":
            mod = rng.choice([4, 6])
            res = rng.randrange(mod)
            kcol = "key" if renamed else "k"
            ps = ice.position_scan(spark, p)
            dels = ps.filter(F.col(kcol) % mod == res).select(
                F.col("_file").alias("file_path"), F.col("_pos").alias("pos")
            )
            ice.write_iceberg_pos_deletes(spark, dels, p)
            # position deletes name live rows concretely
            gen = {k: g for k, g in gen.items() if k % mod != res}
        elif op == "rename" and not renamed:
            ice.rename_iceberg_columns(spark, p, {"k": "key"})
            renamed = True
        kcol = "key" if renamed else "k"
        got = sorted(r[kcol] for r in ice.read_iceberg(spark, p).collect())
        assert got == sorted(gen), f"seed={seed} step={step} op={op}"


@pytest.mark.parametrize("seed", range(3))
def test_delta_cdf_format_matches_batch_function(spark, tmp_path, seed):
    """Random mutation sequences: the Python DataSource change feed
    (format('delta_cdf'), planned without Spark and read through the
    Arrow channel) must equal delta_changes row-for-row over the full
    window AND over a random sub-window — the interaction class this
    catches is planner drift: a DV delta attributed to the wrong
    commit, lazily-reconstructed pre-window state missing a re-add,
    cdc files mixed into file-diff commits."""
    from spype_spark.cdf_source import register_delta_cdf

    register_delta_cdf(spark)
    rng = random.Random(3000 + seed)
    p = str(tmp_path / f"t{seed}")
    nxt = 100
    dl.write_delta(spark, _mk(spark, set(range(0, 25))), p)
    head = 0
    for _step in range(5):
        op = rng.choice(["append", "delete", "update"])
        if op == "append":
            new = set(range(nxt, nxt + rng.randint(3, 8)))
            nxt += 20
            dl.write_delta(spark, _mk(spark, new), p, mode="append")
        elif op == "delete":
            mod = rng.choice([3, 5, 7])
            dl.delta_delete_rows(
                spark, p, F.col("k") % mod == rng.randrange(mod)
            )
        else:
            dl.delta_update_rows(
                spark,
                p,
                F.col("s") == str(rng.randrange(4)),
                {"v": F.col("v") + 1000},
            )
        head += 1
    ref = sorted(
        tuple(r) for r in dl.delta_changes(spark, p, 0).collect()
    )
    got = sorted(
        tuple(r)
        for r in spark.read.format("delta_cdf")
        .option("path", p)
        .load()
        .collect()
    )
    assert got == ref, f"seed={seed} full window"
    lo = rng.randint(1, head)
    hi = rng.randint(lo, head)
    ref_w = sorted(
        tuple(r) for r in dl.delta_changes(spark, p, lo, hi).collect()
    )
    got_w = sorted(
        tuple(r)
        for r in spark.read.format("delta_cdf")
        .option("path", p)
        .option("startingVersion", lo)
        .option("endingVersion", hi)
        .load()
        .collect()
    )
    assert got_w == ref_w, f"seed={seed} window {lo}-{hi}"


@pytest.mark.parametrize("seed", range(3))
def test_iceberg_cdc_format_matches_batch_function(spark, tmp_path, seed):
    """Random snapshot chains (appends, pos-deletes, eq-deletes): the
    per-file-mask Python DataSource feed must equal the join-based
    iceberg_changes on the full window and a random sub-window —
    catches sequence-rule drift between the two implementations (a
    pos delete applied at the wrong seq bound, an eq delete leaking
    onto later appends, mask diffs on untargeted files)."""
    from spype_spark.iceberg_cdc import register_iceberg_cdc

    register_iceberg_cdc(spark)
    rng = random.Random(4000 + seed)
    p = str(tmp_path / f"t{seed}")
    nxt = 100
    sids = [ice.write_iceberg(spark, _mk(spark, set(range(0, 25))), p)]
    for _step in range(4):
        op = rng.choice(["append", "pos", "eq"])
        if op == "append":
            new = set(range(nxt, nxt + rng.randint(3, 8)))
            nxt += 20
            sids.append(
                ice.write_iceberg(spark, _mk(spark, new), p, mode="append")
            )
        elif op == "pos":
            mod = rng.choice([3, 5])
            hits = (
                ice.position_scan(spark, p)
                .filter(F.col("k") % mod == rng.randrange(mod))
                .select(
                    F.col("_file").alias("file_path"),
                    F.col("_pos").alias("pos"),
                )
            )
            if hits.count() == 0:
                continue
            sids.append(ice.write_iceberg_pos_deletes(spark, hits, p))
        else:
            mod = rng.choice([4, 7])
            keys = spark.createDataFrame(
                [(int(k),) for k in range(0, nxt, mod)], "k long"
            )
            sids.append(ice.write_iceberg_eq_deletes(spark, keys, p, ["k"]))
    ref = sorted(
        tuple(r) for r in ice.iceberg_changes(spark, p).collect()
    )
    got = sorted(
        tuple(r)
        for r in spark.read.format("iceberg_cdc")
        .option("path", p)
        .load()
        .collect()
    )
    assert got == ref, f"seed={seed} full chain"
    lo = rng.randrange(len(sids))
    hi = rng.randrange(lo, len(sids))
    ref_w = sorted(
        tuple(r)
        for r in ice.iceberg_changes(
            spark, p, from_snapshot_id=sids[lo], to_snapshot_id=sids[hi]
        ).collect()
    )
    got_w = sorted(
        tuple(r)
        for r in spark.read.format("iceberg_cdc")
        .option("path", p)
        .option("fromSnapshotId", sids[lo])
        .option("toSnapshotId", sids[hi])
        .load()
        .collect()
    )
    assert got_w == ref_w, f"seed={seed} window {lo}-{hi}"


@pytest.mark.parametrize("seed", range(3))
def test_lake_sink_interleaved_with_engine_verbs(spark, tmp_path, seed):
    """Random interleavings of format('spype_lake') appends with
    engine MERGE/DELETE/append verbs against a dict model — the
    interaction class: a sink commit basing on a pre-verb manifest
    (must rebase), carried delete state crossing a sink append, txns
    keys surviving engine commits."""
    from spype_spark import lakehouse as lake
    from spype_spark.lake_sink import register_lake_sink

    register_lake_sink(spark)
    rng = random.Random(5000 + seed)
    p = str(tmp_path / f"t{seed}")

    def mkdf(keys, bump=0):
        return spark.createDataFrame(
            [(int(k), int(k) * 3 + bump) for k in sorted(keys)],
            "k long, v long",
        )

    model = {k: k * 3 for k in range(20)}
    lake.write_table(mkdf(model), p)
    nxt = 100
    for step in range(6):
        op = rng.choice(["sink", "sink", "engine_append", "delete", "merge"])
        if op == "sink":
            new = set(range(nxt, nxt + rng.randint(2, 6)))
            nxt += 10
            mkdf(new).write.format("spype_lake").mode("append").option(
                "path", p
            ).save()
            model.update({k: k * 3 for k in new})
        elif op == "engine_append":
            new = set(range(nxt, nxt + rng.randint(2, 6)))
            nxt += 10
            lake.append_table(spark, p, mkdf(new))
            model.update({k: k * 3 for k in new})
        elif op == "delete":
            mod = rng.choice([3, 5, 7])
            res = rng.randrange(mod)
            lake.delete_where(spark, p, F.col("k") % mod == res)
            model = {k: v for k, v in model.items() if k % mod != res}
        else:
            hit = sorted(model)[: rng.randint(1, 5)]
            lake.merge_upsert(
                spark, p, mkdf(hit, bump=step + 1), keys=["k"]
            )
            model.update({k: k * 3 + step + 1 for k in hit})
        got = {
            r["k"]: r["v"]
            for r in lake.read_table(spark, p).collect()
        }
        assert got == model, f"seed={seed} step={step} op={op}"
