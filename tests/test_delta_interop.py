"""Delta Lake log interop (spype_spark/delta_interop.py): the reader
must replay spec-shaped JSON commits + parquet checkpoints, honor
partitionValues as authoritative, time-travel by version, and FAIL
LOUDLY on protocol features it cannot honor."""

import json
import os

import pytest
from pyspark.sql import functions as F

from spype_spark import delta_interop as dl


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        (F.col("id") % 3).cast("int").alias("p"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_delta_round_trip_unpartitioned(spark, tmp_path):
    p = str(tmp_path / "t")
    v = dl.write_delta(spark, _df(spark, 0, 10), p)
    assert v == 0
    got = dl.read_delta(spark, p)
    assert got.schema.simpleString() == "struct<k:bigint,v:bigint,p:int>"
    assert _rows(got) == _rows(_df(spark, 0, 10))


def test_delta_append_overwrite_time_travel(spark, tmp_path):
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 5), p)
    dl.write_delta(spark, _df(spark, 5, 8), p, mode="append")
    assert _rows(dl.read_delta(spark, p)) == _rows(_df(spark, 0, 8))
    assert _rows(dl.read_delta(spark, p, version=0)) == _rows(_df(spark, 0, 5))
    v = dl.write_delta(spark, _df(spark, 100, 103), p, mode="overwrite")
    assert v == 2
    assert _rows(dl.read_delta(spark, p)) == _rows(_df(spark, 100, 103))
    assert _rows(dl.read_delta(spark, p, version=1)) == _rows(_df(spark, 0, 8))
    h = dl.delta_history(spark, p).collect()
    assert [(r.version, r.n_added > 0, r.n_removed > 0) for r in h] == [
        (0, True, False),
        (1, True, False),
        (2, True, True),
    ]


def test_delta_partitioned_hive_layout(spark, tmp_path):
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 12), p, partition_by=["p"])
    # the writer produced Hive-style dirs; the reader must take the
    # single-scan path and still type the partition column per schema
    got = dl.read_delta(spark, p)
    assert dict(got.dtypes)["p"] == "int"
    assert _rows(got.select("k", "v", "p")) == _rows(
        _df(spark, 0, 12).select("k", "v", "p")
    )
    # partition pruning works on the discovered column
    assert got.filter(F.col("p") == 1).count() == 4


def test_delta_partition_values_are_authoritative(spark, tmp_path):
    """An add whose path DISAGREES with its partitionValues must read
    the partitionValues (spec), via the group-scan fallback."""
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 6), p, partition_by=["p"])
    # rewrite commit 0: point every add's partitionValues at p=7
    cpath = dl._commit_path(p, 0)
    actions = [json.loads(x) for x in open(cpath) if x.strip()]
    for a in actions:
        if "add" in a:
            a["add"]["partitionValues"] = {"p": "7"}
    with open(cpath, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    got = dl.read_delta(spark, p)
    assert {r.p for r in got.select("p").distinct().collect()} == {7}
    assert got.count() == 6
    assert dict(got.dtypes)["p"] == "int"


def test_delta_checkpoint_and_log_cleanup(spark, tmp_path):
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 4), p)
    dl.write_delta(spark, _df(spark, 4, 6), p, mode="append")
    v = dl.checkpoint_delta(spark, p)
    assert v == 1
    assert json.load(open(os.path.join(p, "_delta_log", "_last_checkpoint")))[
        "version"
    ] == 1
    dl.write_delta(spark, _df(spark, 6, 7), p, mode="append")
    # simulate metadata cleanup: drop the pre-checkpoint JSON commits
    os.unlink(dl._commit_path(p, 0))
    os.unlink(dl._commit_path(p, 1))
    assert _rows(dl.read_delta(spark, p)) == _rows(_df(spark, 0, 7))
    # time travel to the checkpointed version works WITHOUT the JSONs
    assert _rows(dl.read_delta(spark, p, version=1)) == _rows(_df(spark, 0, 6))
    # …but behind the checkpoint the history is gone — loud error
    with pytest.raises(FileNotFoundError, match="missing commit"):
        dl.read_delta(spark, p, version=0)


def test_delta_remove_action_honored(spark, tmp_path):
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 8).repartition(2), p)
    meta, adds, _ = dl._replay(spark, p, None)
    assert len(adds) == 2
    drop = sorted(a["path"] for a in adds)[0]
    with open(dl._commit_path(p, 1), "w") as f:
        f.write(json.dumps({"remove": {"path": drop, "dataChange": True}}) + "\n")
    kept = dl.read_delta(spark, p)
    assert 0 < kept.count() < 8
    _, adds1, _ = dl._replay(spark, p, None)
    assert sorted(a["path"] for a in adds1) == sorted(
        a["path"] for a in adds if a["path"] != drop
    )


def test_delta_protocol_gate(spark, tmp_path):
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 3), p)
    # minReaderVersion 2 (column mapping era) is IN profile since r13:
    # a v2 table without mapping metadata reads as plain parquet
    with open(dl._commit_path(p, 1), "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
            )
            + "\n"
        )
    assert dl.read_delta(spark, p).count() == 3
    with open(dl._commit_path(p, 1), "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 4, "minWriterVersion": 7}}
            )
            + "\n"
        )
    with pytest.raises(ValueError, match="minReaderVersion 4"):
        dl.read_delta(spark, p)
    with open(dl._commit_path(p, 1), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["typeWidening"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(ValueError, match="typeWidening"):
        dl.read_delta(spark, p)
    # version 0 predates the protocol bump and still reads
    assert dl.read_delta(spark, p, version=0).count() == 3


def test_delta_not_a_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="not a Delta table"):
        dl.read_delta(spark, str(tmp_path / "nope"))


def test_import_delta_by_reference(spark, tmp_path):
    """Unpartitioned import: zero data copy — manifest entries name the
    Delta files absolutely; reads, scans (stats pruning live), and a
    subsequent native MERGE all work; vacuum never touches the foreign
    files."""
    import glob

    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake

    dpath, tpath = str(tmp_path / "delta"), str(tmp_path / "native")
    dl.write_delta(spark, _df(spark, 0, 50).repartition(4), dpath)
    dl.write_delta(spark, _df(spark, 50, 60), dpath, mode="append")
    assert dl.import_delta(spark, dpath, tpath) == 0
    # zero data files under the native root
    assert glob.glob(os.path.join(tpath, "data", "**", "*.parquet"),
                     recursive=True) == []
    got = lake.read_table(spark, tpath)
    assert _rows(got) == _rows(_df(spark, 0, 60))
    # footer stats imported -> manifest range pruning works
    pruned = lake.scan_table(spark, tpath, where=("between", "k", 55, 59))
    assert pruned.count() == 5
    m = lake._m_load(tpath, 0)
    entries = lake._m_entries(tpath, m)
    kept = [
        e for e in entries
        if lake._pred_maybe(e, ("between", "k", 55, 59), None)
    ]
    assert 0 < len(kept) < len(entries)
    # a native mutation COWs into the table's own dir, carrying foreign
    # entries by reference
    lake.merge_upsert(
        spark, tpath,
        spark.createDataFrame([(0, 999, 0)], "k long, v long, p int"),
        keys=["k"],
    )
    assert lake.read_table(spark, tpath).filter(F.col("k") == 0).collect()[0].v == 999
    # the Delta table still reads its own (unchanged) snapshot
    assert _rows(dl.read_delta(spark, dpath)) == _rows(_df(spark, 0, 60))
    # vacuum the native table: the foreign Delta files must survive
    lake.vacuum(tpath, keep_last=1, grace_seconds=0.0)
    assert _rows(dl.read_delta(spark, dpath)) == _rows(_df(spark, 0, 60))


def test_import_delta_partitioned_materializes(spark, tmp_path):
    """Partitioned import rewrites once (formats disagree on in-file
    partition columns) and preserves identity partitioning for COW."""
    from spype_spark import lakehouse as lake

    dpath, tpath = str(tmp_path / "deltap"), str(tmp_path / "nativep")
    dl.write_delta(spark, _df(spark, 0, 30), dpath, partition_by=["p"])
    dl.import_delta(spark, dpath, tpath)
    got = lake.read_table(spark, tpath)
    assert _rows(got.select("k", "v", "p")) == _rows(
        _df(spark, 0, 30).select("k", "v", "p")
    )
    m = lake._m_load(tpath, 0)
    assert m.get("partition_by") == ["p"]


def test_export_delta_dual_format_in_place(spark, tmp_path):
    """export_delta mirrors a native table as a Delta log IN PLACE:
    zero copies, read_delta == read_table; a native append + re-export
    appends a snapshot-replace commit and Delta time travel sees the
    pre-append snapshot."""
    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake

    tpath = str(tmp_path / "dual")
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    lake.write_table(df, tpath)
    assert dl.export_delta(spark, tpath) == 0
    assert os.path.isdir(os.path.join(tpath, "_delta_log"))
    assert _rows(dl.read_delta(spark, tpath)) == _rows(
        lake.read_table(spark, tpath)
    )
    # native append, then re-export: snapshot-replace commit
    lake.append_table(
        spark, tpath,
        spark.range(20, 25).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ),
    )
    assert dl.export_delta(spark, tpath) == 1
    assert dl.read_delta(spark, tpath).count() == 25
    assert dl.read_delta(spark, tpath, version=0).count() == 20
    assert _rows(dl.read_delta(spark, tpath)) == _rows(
        lake.read_table(spark, tpath)
    )


def test_export_delta_out_of_profile_is_loud(spark, tmp_path):
    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake

    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("p")
    )
    # hidden-partition transforms have no Delta equivalent
    bt = str(tmp_path / "bucketed")
    lake.write_table(df, bt, partition_by=[("bucket", 4, "k")])
    with pytest.raises(ValueError, match="transform"):
        dl.export_delta(spark, bt)
    # partitioned + mapped graduated r14: partitionValues keyed by the
    # PHYSICAL partition name, partitionColumns stay logical, and the
    # mapped read (incl. a logical-name partition filter) round-trips
    rt = str(tmp_path / "renamed_part")
    lake.write_table(df, rt, partition_by=["p"])
    lake.rename_columns(spark, rt, {"k": "key", "p": "part"})
    assert dl.export_delta(spark, rt) == 0
    st = dl._replay_state(spark, rt, None)
    assert list(st["meta"]["partitionColumns"]) == ["part"]
    assert all(
        set(a["partitionValues"]) == {"p"} for a in st["adds"]
    )
    assert _rows(dl.read_delta(spark, rt)) == _rows(
        lake.read_table(spark, rt)
    )
    assert (
        dl.read_delta(spark, rt, partition_filter={"part": "1"}).count()
        == 5
    )
    # pending deletes over by-reference imported files have no fname anchor
    src = str(tmp_path / "dsrc")
    dl.write_delta(spark, df, src)
    imp = str(tmp_path / "imported")
    dl.import_delta(spark, src, imp)
    lake.delete_keys(
        spark, imp, spark.range(0, 3).select(F.col("id").alias("k"))
    )
    with pytest.raises(ValueError, match="by-reference"):
        dl.export_delta(spark, imp, delta_path=str(tmp_path / "out"))


def test_export_delta_mor_deletes_round_trip(spark, tmp_path):
    """Pending equality + positional merge-on-read deletes export as
    Delta deletion vectors: protocol gains deletionVectors, touched
    files carry roaring DVs, and the replay scan returns exactly the
    native live rows — including after an append + re-export."""
    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake

    tpath = str(tmp_path / "mor")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    lake.write_table(df, tpath)
    lake.delete_keys(
        spark, tpath, spark.range(0, 100, 10).select(F.col("id").alias("k"))
    )
    lake.delete_where_dv(spark, tpath, F.col("v") > 240)
    assert dl.export_delta(spark, tpath) == 0
    _meta, adds, _ = dl._replay(spark, tpath, None)
    assert any(a.get("deletionVector") for a in adds)
    st = dl._replay_state(spark, tpath, None)
    assert "deletionVectors" in (st["protocol"].get("readerFeatures") or [])
    assert _rows(dl.read_delta(spark, tpath)) == _rows(
        lake.read_table(spark, tpath)
    )
    # append lands files NEWER than the deletes (sequence rule: they
    # must stay un-vectored), re-export keeps the mirror true
    lake.append_table(
        spark,
        tpath,
        spark.range(100, 120).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ),
    )
    assert dl.export_delta(spark, tpath) == 1
    assert _rows(dl.read_delta(spark, tpath)) == _rows(
        lake.read_table(spark, tpath)
    )
    assert _rows(dl.read_delta(spark, tpath, version=0)) != _rows(
        dl.read_delta(spark, tpath)
    )


def test_export_delta_column_mapping_round_trip(spark, tmp_path):
    """A renamed (then dropped-from) unpartitioned table exports as
    columnMapping name mode and reads back with the logical schema."""
    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake

    tpath = str(tmp_path / "cm")
    df = spark.range(0, 50).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 5).alias("w"),
    )
    lake.write_table(df, tpath)
    lake.rename_columns(spark, tpath, {"v": "value"})
    lake.append_table(
        spark,
        tpath,
        spark.range(50, 60).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("value"),
            (F.col("id") % 5).alias("w"),
        ),
    )
    assert dl.export_delta(spark, tpath) == 0
    got = dl.read_delta(spark, tpath)
    assert got.columns == ["k", "value", "w"]
    assert _rows(got) == _rows(lake.read_table(spark, tpath))
    st = dl._replay_state(spark, tpath, None)
    conf = st["meta"]["configuration"]
    assert conf["delta.columnMapping.mode"] == "name"
    assert "columnMapping" in st["protocol"]["readerFeatures"]
    # schema evolution across exports: a drop re-emits metaData
    lake.drop_columns(spark, tpath, ["w"])
    assert dl.export_delta(spark, tpath) == 1
    got2 = dl.read_delta(spark, tpath)
    assert got2.columns == ["k", "value"]
    assert _rows(got2) == _rows(lake.read_table(spark, tpath))


def test_export_delta_partitioned_round_trip(spark, tmp_path):
    """A partitioned native table exports with partitionValues taken
    from the manifest entries; read_delta resolves partition columns
    from them (the authoritative channel) and matches the native
    read. A partition-COW delete + re-export keeps the mirror true."""
    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake

    tpath = str(tmp_path / "pdual")
    df = spark.range(0, 30).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("p"),
        (F.col("id") * 7).alias("v"),
    )
    lake.write_table(df, tpath, partition_by=["p"])
    assert dl.export_delta(spark, tpath) == 0
    meta, adds, _ = dl._replay(spark, tpath, None)
    assert meta["partitionColumns"] == ["p"]
    assert all(a["partitionValues"].get("p") in {"0", "1", "2"} for a in adds)
    assert _rows(dl.read_delta(spark, tpath)) == _rows(
        lake.read_table(spark, tpath)
    )
    # partition-level COW mutation, then re-export: mirror follows
    lake.delete_where(spark, tpath, F.col("p") == 1)
    assert dl.export_delta(spark, tpath) == 1
    assert _rows(dl.read_delta(spark, tpath)) == _rows(
        lake.read_table(spark, tpath)
    )
    assert dl.read_delta(spark, tpath, version=0).count() == 30


def test_export_delta_reemits_metadata_on_schema_evolution(spark, tmp_path):
    """Re-export after additive schema evolution must carry a fresh
    metaData action (same table id) — without it Delta readers keep
    the stale v0 schema and silently drop the new column (ADVICE
    r12)."""
    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake

    tpath = str(tmp_path / "evolve")
    lake.write_table(
        spark.range(0, 8).select(F.col("id").alias("k")), tpath
    )
    assert dl.export_delta(spark, tpath) == 0
    meta0, _, _ = dl._replay(spark, tpath, None)
    # additive evolution: merge a frame carrying an extra column
    lake.merge_upsert(
        spark, tpath,
        spark.range(8, 12).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("extra")
        ),
        keys=["k"], evolve_schema=True,
    )
    assert dl.export_delta(spark, tpath) == 1
    meta1, _, _ = dl._replay(spark, tpath, None)
    assert meta1["id"] == meta0["id"], "table id must be preserved"
    names = [f["name"] for f in json.loads(meta1["schemaString"])["fields"]]
    assert "extra" in names, "evolved column missing from Delta schema"
    got = dl.read_delta(spark, tpath)
    assert "extra" in got.columns
    assert got.count() == 12


def test_export_delta_widened_narrow_files_guarded(spark, tmp_path):
    """widen_types is metadata-only, so carried files keep the narrow
    physical type — the export must refuse (older Delta readers fail
    the int32→bigint conversion) unless explicitly allowed."""
    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake

    tpath = str(tmp_path / "widen")
    lake.write_table(
        spark.range(0, 6).select(F.col("id").cast("int").alias("k")), tpath
    )
    lake.widen_types(spark, tpath, {"k": "bigint"})
    with pytest.raises(ValueError, match="widened"):
        dl.export_delta(spark, tpath)
    v = dl.export_delta(spark, tpath, allow_narrow_files=True)
    assert v == 0
    got = dl.read_delta(spark, tpath)
    assert got.schema["k"].dataType.simpleString() == "bigint"
    assert got.count() == 6


def test_checkpoint_carries_txn_and_tombstones(spark, tmp_path):
    """A checkpoint must carry setTransaction state and remove
    tombstones (ADVICE r12) — engines replaying from it after JSON
    cleanup lose streaming idempotency and vacuum safety otherwise."""
    from pyspark.sql import functions as F

    dpath = str(tmp_path / "txnckpt")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    dl.write_delta(spark, df, dpath)
    # hand-append a commit with a txn action + a remove (overwrite)
    meta, adds, v = dl._replay(spark, dpath, None)
    actions = [
        {"txn": {"appId": "stream-7", "version": 42}},
        {
            "remove": {
                "path": adds[0]["path"],
                "deletionTimestamp": 1000,
                "dataChange": True,
            }
        },
    ]
    dl._publish_commit(dpath, v + 1, actions)
    cv = dl.checkpoint_delta(spark, dpath)
    assert cv == v + 1
    # delete every JSON commit: state must come back from the
    # checkpoint alone
    for f in os.listdir(os.path.join(dpath, "_delta_log")):
        if f.endswith(".json") and len(f) == 25:
            os.unlink(os.path.join(dpath, "_delta_log", f))
    st = dl._replay_state(spark, dpath, None)
    assert st["txns"] == {"stream-7": 42}
    assert [t["path"] for t in st["tombstones"]] == [adds[0]["path"]]
    assert len(st["adds"]) == len(adds) - 1


def test_delta_commit_publish_is_put_if_absent(spark, tmp_path):
    """Two writers racing to the same commit version: exactly one
    wins; the loser gets ConcurrentWriteError and the winner's commit
    file is untouched (Delta requires put-if-absent on N.json)."""
    from pyspark.sql import functions as F

    from spype_spark.lakehouse import ConcurrentWriteError

    dpath = str(tmp_path / "race")
    dl.write_delta(
        spark, spark.range(0, 4).select(F.col("id").alias("k")), dpath
    )
    winner = [{"commitInfo": {"timestamp": 1, "operation": "A"}}]
    loser = [{"commitInfo": {"timestamp": 2, "operation": "B"}}]
    dl._publish_commit(dpath, 1, winner)
    with pytest.raises(ConcurrentWriteError):
        dl._publish_commit(dpath, 1, loser)
    with open(os.path.join(dpath, "_delta_log", f"{1:020d}.json")) as f:
        assert json.loads(f.readline())["commitInfo"]["operation"] == "A"


def test_delta_state_df_matches_driver_replay(spark, tmp_path):
    """DataFrame state reconstruction (checkpoint ∪ tail, one window)
    must agree with driver replay on a log exercising removes,
    re-adds, a checkpoint, and post-checkpoint commits."""
    p = str(tmp_path / "state")
    dl.write_delta(spark, _df(spark, 0, 20).repartition(3), p)
    dl.write_delta(spark, _df(spark, 20, 30), p, mode="append")
    # remove one file, then checkpoint, then more commits
    _, adds0, _ = dl._replay(spark, p, None)
    victim = sorted(a["path"] for a in adds0)[0]
    dl._publish_commit(
        p, 2,
        [{"remove": {"path": victim, "deletionTimestamp": 5, "dataChange": True}}],
    )
    dl.checkpoint_delta(spark, p)
    dl.write_delta(spark, _df(spark, 30, 35), p, mode="append")
    # re-add the removed path (self-overwrite pattern: add wins)
    dl._publish_commit(
        p, 4,
        [{"add": {"path": victim, "partitionValues": {}, "size": 1,
                  "modificationTime": 9, "dataChange": True}}],
    )
    _, adds, v = dl._replay(spark, p, None)
    got = {
        r["path"]: r["version"]
        for r in dl.delta_state_df(spark, p).collect()
    }
    assert set(got) == {a["path"] for a in adds}
    assert got[victim] == 4
    # version pinning matches too
    _, adds_v2, _ = dl._replay(spark, p, 2)
    got_v2 = {r["path"] for r in dl.delta_state_df(spark, p, 2).collect()}
    assert got_v2 == {a["path"] for a in adds_v2}


def test_read_delta_spark_replay_path_equivalent(spark, tmp_path, monkeypatch):
    """Forcing the DataFrame reconstruction path (threshold 0) returns
    the same rows and schema as driver replay — including partitioned
    tables through the group-scan assembly."""
    p = str(tmp_path / "big")
    dl.write_delta(spark, _df(spark, 0, 24), p, partition_by=["p"])
    dl.write_delta(spark, _df(spark, 24, 30), p, mode="append")
    expect = _rows(dl.read_delta(spark, p))
    schema = dl.read_delta(spark, p).schema
    monkeypatch.setattr(dl, "_SPARK_REPLAY_THRESHOLD", 0)
    got = dl.read_delta(spark, p)
    assert got.schema == schema
    assert _rows(got) == expect
    assert _rows(dl.read_delta(spark, p, version=0)) == _rows(
        _df(spark, 0, 24)
    )


def test_read_delta_partition_filter_prunes_before_scan(spark, tmp_path, monkeypatch):
    """partition_filter prunes at the partitionValues level: only
    matching files reach the scan (asserted via input_file_name), on
    BOTH the driver-replay and the DataFrame-reconstruction paths."""
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 30), p, partition_by=["p"])
    meta, adds, _ = dl._replay(spark, p, None)
    want = {a["path"] for a in adds if a["partitionValues"].get("p") == "1"}
    assert 0 < len(want) < len(adds)
    for thr in (10**9, 0):  # driver path, then forced DF path
        monkeypatch.setattr(dl, "_SPARK_REPLAY_THRESHOLD", thr)
        got = dl.read_delta(spark, p, partition_filter={"p": 1})
        assert {r.p for r in got.select("p").distinct().collect()} == {1}
        files = {
            os.path.basename(r[0])
            for r in got.select(F.input_file_name()).distinct().collect()
        }
        assert files == {os.path.basename(w) for w in want}
    # list-valued filter
    got2 = dl.read_delta(spark, p, partition_filter={"p": [0, 2]})
    assert {r.p for r in got2.select("p").distinct().collect()} == {0, 2}


# ---------------------------------------------------------------------------
# column mapping (name mode) — graduated r13
# ---------------------------------------------------------------------------


def test_delta_column_mapping_rename_read_append(spark, tmp_path):
    """delta_rename_column is metadata-only; the reader maps physical
    file names back to logical, appends write physical names, and
    partition filters accept the LOGICAL name."""
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 20), p, partition_by=["p"])
    files = {
        os.path.join(r, n)
        for r, _d, ns in os.walk(p)
        for n in ns
        if n.endswith(".parquet")
    }
    dl.delta_rename_column(spark, p, {"v": "value", "p": "part"})
    files2 = {
        os.path.join(r, n)
        for r, _d, ns in os.walk(p)
        for n in ns
        if n.endswith(".parquet")
    }
    assert files == files2  # metadata-only
    got = dl.read_delta(spark, p)
    assert got.columns == ["k", "value", "part"]
    assert _rows(got.select("k", "value")) == [(k, k * 10) for k in range(20)]
    # append with the new logical schema: files get PHYSICAL names
    dl.write_delta(
        spark,
        _df(spark, 20, 25).select(
            "k", F.col("v").alias("value"), F.col("p").alias("part")
        ),
        p,
        mode="append",
    )
    assert dl.read_delta(spark, p).count() == 25
    newfile = sorted(
        {
            os.path.join(r, n)
            for r, _d, ns in os.walk(p)
            for n in ns
            if n.endswith(".parquet")
        }
        - files2
    )[0]
    import pyarrow.parquet as pq

    assert set(pq.read_schema(newfile).names) == {"k", "v"}  # physical
    # logical-name partition filter prunes to the right rows
    pf = dl.read_delta(spark, p, partition_filter={"part": 1})
    assert sorted(r["k"] for r in pf.collect()) == [
        k for k in range(25) if k % 3 == 1
    ]
    # pre-rename time travel keeps the old names
    assert set(dl.read_delta(spark, p, version=0).columns) == {"k", "v", "p"}


def test_delta_column_mapping_id_mode_fallback(spark, tmp_path):
    """id mode over files/schema WITHOUT ids falls back to the
    physicalName (here: the field name itself) — the spec's fallback,
    formerly a loud gate (graduated r13)."""
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 4), p)
    meta, _a, v = dl._replay(spark, p, None)
    new_meta = {
        **meta,
        "configuration": {"delta.columnMapping.mode": "id"},
    }
    dl._publish_commit(
        p,
        v + 1,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["columnMapping"],
                }
            },
            {"metaData": new_meta},
        ],
    )
    got = dl.read_delta(spark, p)
    assert got.columns == ["k", "v", "p"]
    assert got.count() == 4


def test_delta_column_mapping_gates_checkpoint_and_import(spark, tmp_path):
    from spype_spark import lakehouse as lake

    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 12), p)
    dl.delta_rename_column(spark, p, {"v": "value"})
    with pytest.raises(ValueError, match="column-mapped"):
        dl.checkpoint_delta(spark, p)
    # by-reference import would null physical-named columns: forced
    # materialize keeps it correct
    nt = str(tmp_path / "native")
    dl.import_delta(spark, p, nt)
    got = lake.read_table(spark, nt)
    assert got.columns == ["k", "value", "p"]
    assert got.count() == 12


def test_delta_rename_column_validation(spark, tmp_path):
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 3), p)
    with pytest.raises(ValueError, match="unknown"):
        dl.delta_rename_column(spark, p, {"nope": "x"})
    with pytest.raises(ValueError, match="already exist"):
        dl.delta_rename_column(spark, p, {"v": "k"})


# ---------------------------------------------------------------------------
# deletion vectors — graduated r13
# ---------------------------------------------------------------------------


def test_z85_spec_vector():
    """The ZeroMQ Z85 reference vector (spec 32): 0x86 0x4F 0xD2 0x6F
    0xB5 0x59 0xF7 0x5B encodes to 'HelloWorld'."""
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dl._z85_encode(raw) == "HelloWorld"
    assert dl._z85_decode("HelloWorld") == raw


def test_delta_dv_delete_read_merge(spark, tmp_path):
    """delta_delete_rows writes deletion vectors (no data file
    rewritten); a second delete on the same files MERGES positions;
    reads, time travel, and partition filters all honor the DVs."""
    import glob

    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 60), p, partition_by=["p"])
    files0 = set(glob.glob(f"{p}/**/*.parquet", recursive=True))
    v1 = dl.delta_delete_rows(spark, p, F.col("k") % 7 == 3)
    assert set(glob.glob(f"{p}/**/*.parquet", recursive=True)) == files0
    assert sorted(r["k"] for r in dl.read_delta(spark, p).collect()) == [
        k for k in range(60) if k % 7 != 3
    ]
    dl.delta_delete_rows(spark, p, F.col("k") % 5 == 1)
    exp = [k for k in range(60) if k % 7 != 3 and k % 5 != 1]
    assert sorted(r["k"] for r in dl.read_delta(spark, p).collect()) == exp
    assert dl.read_delta(spark, p, version=0).count() == 60
    assert sorted(
        r["k"] for r in dl.read_delta(spark, p, version=v1).collect()
    ) == [k for k in range(60) if k % 7 != 3]
    pf = dl.read_delta(spark, p, partition_filter={"p": 1})
    assert sorted(r["k"] for r in pf.collect()) == [
        k for k in exp if k % 3 == 1
    ]


def test_delta_dv_state_df_path_equivalent(spark, tmp_path, monkeypatch):
    """The large-log DataFrame state reconstruction carries the
    deletionVector descriptors — both replay paths agree."""
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 30), p)
    dl.delta_delete_rows(spark, p, F.col("k") % 4 == 2)
    exp = [k for k in range(30) if k % 4 != 2]
    for thr in (10**9, 0):
        monkeypatch.setattr(dl, "_SPARK_REPLAY_THRESHOLD", thr)
        assert sorted(
            r["k"] for r in dl.read_delta(spark, p).collect()
        ) == exp


def test_delta_dv_inline_storage_and_crc_gate(spark, tmp_path):
    """Inline ('i') DVs decode from z85; a corrupted DV file fails the
    CRC check loudly instead of mis-deleting."""
    from spype_spark import roaring

    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 10).coalesce(1), p)
    meta, adds, v = dl._replay(spark, p, None)
    assert len(adds) == 1
    payload = roaring.serialize_array64([0, 3, 4])
    inline = {
        "storageType": "i",
        "pathOrInlineDv": dl._z85_encode(
            payload + b"\x00" * ((4 - len(payload) % 4) % 4)
        ),
        "sizeInBytes": 0,  # unknown — decoder tolerates 0
        "cardinality": 3,
    }
    add = {**adds[0], "deletionVector": inline, "dataChange": True}
    dl._publish_commit(
        p,
        v + 1,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                }
            },
            {"remove": {"path": adds[0]["path"], "dataChange": True}},
            {"add": add},
        ],
    )
    got = sorted(r["k"] for r in dl.read_delta(spark, p).collect())
    assert got == [k for k in range(10) if k not in (0, 3, 4)]
    # corrupt the on-disk DV of a real delete -> loud CRC error
    p2 = str(tmp_path / "t2")
    dl.write_delta(spark, _df(spark, 0, 10).coalesce(1), p2)
    dl.delta_delete_rows(spark, p2, F.col("k") == 5)
    (dvf,) = [
        os.path.join(p2, n)
        for n in os.listdir(p2)
        if n.startswith("deletion_vector_")
    ]
    blob = bytearray(open(dvf, "rb").read())
    blob[7] ^= 0xFF
    open(dvf, "wb").write(bytes(blob))
    with pytest.raises(Exception, match="CRC|cardinality|roaring|magic"):
        dl.read_delta(spark, p2).collect()


def test_delta_dv_gates_checkpoint_and_import(spark, tmp_path):
    from spype_spark import lakehouse as lake

    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 20), p)
    dl.delta_delete_rows(spark, p, F.col("k") < 5)
    with pytest.raises(ValueError, match="deletionVector"):
        dl.checkpoint_delta(spark, p)
    nt = str(tmp_path / "native")
    dl.import_delta(spark, p, nt)  # forced materialize
    assert sorted(
        r["k"] for r in lake.read_table(spark, nt).collect()
    ) == list(range(5, 20))


# ---------------------------------------------------------------------------
# v2 checkpoints — graduated r13
# ---------------------------------------------------------------------------


def test_delta_v2_checkpoint_round_trip(spark, tmp_path):
    """checkpoint_delta_v2 writes the table-features checkpoint form
    (uuid-named JSON top + parquet sidecar); replay works with the
    pre-checkpoint JSON commits deleted, deletion vectors carried."""
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 40), p, partition_by=["p"])
    dl.delta_delete_rows(spark, p, F.col("k") % 5 == 2)
    v = dl.checkpoint_delta_v2(spark, p)
    exp = [k for k in range(40) if k % 5 != 2]
    for t in range(0, v):
        os.unlink(dl._commit_path(p, t))
    assert sorted(r["k"] for r in dl.read_delta(spark, p).collect()) == exp
    # appends after the checkpoint replay on top
    dl.write_delta(spark, _df(spark, 100, 103), p, mode="append")
    assert sorted(r["k"] for r in dl.read_delta(spark, p).collect()) == (
        exp + [100, 101, 102]
    )
    # the DataFrame state-reconstruction path reads v2 sidecars too
    import pytest as _pytest  # noqa: F401

    orig = dl._SPARK_REPLAY_THRESHOLD
    try:
        dl._SPARK_REPLAY_THRESHOLD = 0
        assert sorted(
            r["k"] for r in dl.read_delta(spark, p).collect()
        ) == exp + [100, 101, 102]
    finally:
        dl._SPARK_REPLAY_THRESHOLD = orig


def test_delta_v2_checkpoint_colmap_and_classic_gate(spark, tmp_path):
    """Column-mapped tables cannot classic-checkpoint (loud gate names
    the v2 writer) but v2-checkpoint cleanly — the protocol action in
    the checkpoint carries the feature flags."""
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 15), p)
    dl.delta_rename_column(spark, p, {"v": "value"})
    with pytest.raises(ValueError, match="checkpoint_delta_v2"):
        dl.checkpoint_delta(spark, p)
    v = dl.checkpoint_delta_v2(spark, p)
    for t in range(0, v):
        os.unlink(dl._commit_path(p, t))
    got = dl.read_delta(spark, p)
    assert got.columns == ["k", "value", "p"]
    assert got.count() == 15
    # time travel exactly to the checkpoint version
    assert dl.read_delta(spark, p, version=v).count() == 15


def test_delta_v2_checkpoint_txn_carried(spark, tmp_path):
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 5), p)
    with open(dl._commit_path(p, 1), "w") as f:
        f.write(json.dumps({"txn": {"appId": "job-1", "version": 42}}) + "\n")
    v = dl.checkpoint_delta_v2(spark, p)
    for t in range(0, v):
        os.unlink(dl._commit_path(p, t))
    st = dl._replay_state(spark, p, None)
    assert st["txns"] == {"job-1": 42}
    assert st["protocol"]["readerFeatures"] == ["v2Checkpoint"]


def test_delta_id_mode_column_mapping(spark, tmp_path):
    """id-mode tables (the Iceberg-compatible form) match file columns
    by PARQUET FIELD ID: a foreign file with entirely different
    physical names but the right ids reads correctly; physicalName is
    the fallback; renames keep id mode."""
    import glob

    import pyarrow.parquet as pq

    p = str(tmp_path / "t")
    base = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    dl.write_delta(spark, base, p, column_mapping="id")
    got = dl.read_delta(spark, p)
    assert got.columns == ["k", "v"]
    assert sorted((r["k"], r["v"]) for r in got.collect()) == [
        (k, 3 * k) for k in range(20)
    ]
    # data files carry random physical names, never the logical ones
    names = set(pq.read_schema(glob.glob(f"{p}/*.parquet")[0]).names)
    assert not names & {"k", "v"}
    # foreign file: different physical names, same field ids
    fdf = (
        spark.range(100, 103)
        .select(F.col("id").alias("wa"), (F.col("id") * 3).alias("wb"))
        .withMetadata("wa", {"parquet.field.id": 1})
        .withMetadata("wb", {"parquet.field.id": 2})
    )
    stage = str(tmp_path / "stage")
    fdf.coalesce(1).write.parquet(stage)
    part = [n for n in os.listdir(stage) if n.endswith(".parquet")][0]
    os.replace(os.path.join(stage, part), os.path.join(p, "foreign.parquet"))
    dl._publish_commit(
        p,
        1,
        [
            {
                "add": {
                    "path": "foreign.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(p, "foreign.parquet")),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        ],
    )
    got2 = sorted((r["k"], r["v"]) for r in dl.read_delta(spark, p).collect())
    assert got2 == [(k, 3 * k) for k in list(range(20)) + [100, 101, 102]]
    # rename keeps id mode; append takes the LOGICAL schema (r14)
    dl.delta_rename_column(spark, p, {"v": "value"})
    meta, _a, _v = dl._replay(spark, p, None)
    assert meta["configuration"]["delta.columnMapping.mode"] == "id"
    assert dl.read_delta(spark, p).columns == ["k", "value"]
    with pytest.raises(ValueError, match="missing columns"):
        dl.write_delta(spark, base, p, mode="append")
    dl.write_delta(
        spark, base.withColumnRenamed("v", "value"), p, mode="append"
    )
    got3 = sorted(
        (r["k"], r["value"]) for r in dl.read_delta(spark, p).collect()
    )
    assert got3 == sorted(
        [(k, 3 * k) for k in list(range(20)) + [100, 101, 102]]
        + [(k, 3 * k) for k in range(20)]
    )
    # the appended files carry the table's stable field ids
    newest = max(
        glob.glob(f"{p}/*.parquet"), key=os.path.getmtime
    )
    ids = {
        f.metadata.get(b"PARQUET:field_id")
        for f in pq.read_schema(newest)
    }
    assert ids == {b"1", b"2"}


def test_delta_id_mode_partitioned(spark, tmp_path):
    """Partitioned id-mode (graduated r14): files/Hive dirs/
    partitionValues use physical names, metaData partitionColumns
    stay logical, reads attach partition columns from the
    authoritative partitionValues, and partition_filter takes the
    LOGICAL name."""
    p = str(tmp_path / "t")
    df = spark.range(0, 24).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("g"),
    )
    dl.write_delta(
        spark, df, p, column_mapping="id", partition_by=["g"]
    )
    dl.write_delta(
        spark,
        spark.range(24, 30).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("int").alias("g"),
        ),
        p,
        mode="append",
    )
    got = dl.read_delta(spark, p)
    assert sorted((r["k"], r["g"]) for r in got.collect()) == [
        (k, k % 3) for k in range(30)
    ]
    meta, adds, _v = dl._replay(spark, p, None)
    assert list(meta["partitionColumns"]) == ["g"]
    phys_g = {
        f["name"]: (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName"
        )
        for f in json.loads(meta["schemaString"])["fields"]
    }["g"]
    assert all(set(a["partitionValues"]) == {phys_g} for a in adds)
    assert (
        dl.read_delta(spark, p, partition_filter={"g": "1"}).count() == 10
    )


def test_delta_dv_decode_paths_equivalent(spark, tmp_path, monkeypatch):
    """The adaptive DV decode (driver inline below the cardinality
    threshold, mapInPandas above) returns identical state on both
    paths — and the executor path stays exercised regardless of how
    small the fixtures are."""
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 40), p, partition_by=["p"])
    dl.delta_delete_rows(spark, p, F.col("k") % 3 == 1)
    dl.delta_delete_rows(spark, p, F.col("k") % 7 == 0)
    exp = [k for k in range(40) if k % 3 != 1 and k % 7 != 0]
    for thr in (10**9, 0):  # driver path, then forced executor path
        monkeypatch.setattr(dl, "_DV_DRIVER_DECODE_THRESHOLD", thr)
        assert sorted(
            r["k"] for r in dl.read_delta(spark, p).collect()
        ) == exp


def test_delta_protocol_features_accumulate(spark, tmp_path):
    """A rename AFTER a DV delete must keep the deletionVectors
    feature in the protocol (review r13): overwriting the feature
    lists would leave live vectored adds behind a protocol that no
    longer declares them — a malformed table."""
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 20), p)
    dl.delta_delete_rows(spark, p, F.col("k") % 4 == 1)
    dl.delta_rename_column(spark, p, {"v": "value"})
    st = dl._replay_state(spark, p, None)
    feats = set(st["protocol"]["readerFeatures"])
    assert {"deletionVectors", "columnMapping"} <= feats
    got = dl.read_delta(spark, p)
    assert got.columns == ["k", "value", "p"]
    assert sorted(r["k"] for r in got.collect()) == [
        k for k in range(20) if k % 4 != 1
    ]


def test_delta_v2_sidecar_absolute_uri(spark, tmp_path):
    """Sidecar actions may name their file by absolute URI
    (file:///…) — os.path.isabs alone misjoins that form."""
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 12), p)
    v = dl.checkpoint_delta_v2(spark, p)
    d = dl._log_dir(p)
    (top,) = [n for n in os.listdir(d) if ".checkpoint." in n]
    lines = [json.loads(x) for x in open(os.path.join(d, top))]
    for a in lines:
        if a.get("sidecar"):
            a["sidecar"]["path"] = "file://" + os.path.join(
                d, "_sidecars", a["sidecar"]["path"]
            )
    with open(os.path.join(d, top), "w") as f:
        for a in lines:
            f.write(json.dumps(a) + "\n")
    for t in range(0, v):
        os.unlink(dl._commit_path(p, t))
    assert dl.read_delta(spark, p).count() == 12


def test_delta_partition_filter_logically_keyed_mapped_log(spark, tmp_path):
    """A column-mapped table whose adds key partitionValues by the
    LOGICAL name (the in-the-wild tolerance pv_of exists for) must
    still honor partition_filter instead of pruning to empty."""
    p = str(tmp_path / "t")
    dl.write_delta(spark, _df(spark, 0, 12), p, partition_by=["p"])
    dl.delta_rename_column(spark, p, {"p": "part"})
    # the log's partitionValues are keyed "p" (physical); read with
    # the logical name works (baseline)…
    assert sorted(
        r["k"]
        for r in dl.read_delta(spark, p, partition_filter={"part": 1}).collect()
    ) == [k for k in range(12) if k % 3 == 1]
    # …and a log keyed LOGICALLY (rewrite the adds) must match too
    for t in dl._commit_versions(p):
        cpath = dl._commit_path(p, t)
        actions = [json.loads(x) for x in open(cpath) if x.strip()]
        for a in actions:
            if "add" in a and "p" in (a["add"].get("partitionValues") or {}):
                a["add"]["partitionValues"] = {
                    "part": a["add"]["partitionValues"]["p"]
                }
        with open(cpath, "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
    got = dl.read_delta(spark, p, partition_filter={"part": 1})
    assert sorted(r["k"] for r in got.collect()) == [
        k for k in range(12) if k % 3 == 1
    ]


def test_delta_changes_full_window(spark, tmp_path):
    """CDF decode paths: create (insert), DV delete (position delta),
    append (insert), cdc update (pre/post images); head state stays
    consistent with the feed."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "cdf")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    dl.write_delta(spark, df, p)
    dl.delta_delete_rows(spark, p, F.col("k") < 5)
    dl.write_delta(
        spark,
        spark.range(40, 50).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        p,
        mode="append",
    )
    dl.delta_update_rows(
        spark, p, F.col("k") % 10 == 0, {"v": F.col("v") + 1}
    )
    ch = dl.delta_changes(spark, p, 0)
    counts = {
        (r["_commit_version"], r["_change_type"]): r["count"]
        for r in ch.groupBy("_commit_version", "_change_type")
        .count()
        .collect()
    }
    assert counts[(0, "insert")] == 40
    assert counts[(1, "delete")] == 5
    assert counts[(2, "insert")] == 10
    # live keys at v2 divisible by 10: 10,20,30,40  (0 was deleted)
    assert counts[(3, "update_preimage")] == 4
    assert counts[(3, "update_postimage")] == 4
    post = {
        r["k"]: r["v"]
        for r in ch.filter("_change_type = 'update_postimage'").collect()
    }
    assert post == {10: 21, 20: 41, 30: 61, 40: 81}
    # a second DV delete produces ONLY the newly tombstoned rows
    dl.delta_delete_rows(spark, p, F.col("k") < 8)
    ch4 = dl.delta_changes(spark, p, 4, 4)
    assert sorted(r["k"] for r in ch4.collect()) == [5, 6, 7]
    assert set(r["_change_type"] for r in ch4.collect()) == {"delete"}


def test_delta_changes_gates_are_loud(spark, tmp_path):
    from pyspark.sql import functions as F

    p = str(tmp_path / "g")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    dl.write_delta(spark, df, p)
    # overwrite = remove+add different paths, no cdc => undecidable
    dl.write_delta(
        spark,
        spark.range(5, 15).select(F.col("id").alias("k")),
        p,
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="without\\s+cdc|undecidable"):
        dl.delta_changes(spark, p, 0).collect()
    # but a window past the rewrite works
    assert dl.delta_changes(spark, p, 2, 1).count() == 0  # empty window
    # checkpoint-truncated prefix raises
    p2 = str(tmp_path / "t")
    dl.write_delta(spark, spark.range(3).select(F.col("id").alias("k")), p2)
    dl.write_delta(
        spark,
        spark.range(3, 6).select(F.col("id").alias("k")),
        p2,
        mode="append",
    )
    dl.checkpoint_delta(spark, p2)
    os.remove(dl._commit_path(p2, 0))
    with pytest.raises(ValueError, match="not retained"):
        dl.delta_changes(spark, p2, 0)
    # a window starting after the truncation still reconstructs state
    ch = dl.delta_changes(spark, p2, 1, 1)
    assert sorted(r["k"] for r in ch.collect()) == [3, 4, 5]


def test_delta_dv_delete_on_mapped_tables(spark, tmp_path):
    """DV deletes graduated for column-mapped tables (r14): the
    predicate evaluates on the LOGICAL schema (name mode: post-rename
    name; id mode: logical names over footer-id-resolved files) and
    the vectors anchor to (file, position) — column names never enter
    the DV. Second delete merges positions (single-DV invariant)."""
    df = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    # name mode
    p1 = str(tmp_path / "nm")
    dl.write_delta(spark, df, p1)
    dl.delta_rename_column(spark, p1, {"v": "value"})
    dl.delta_delete_rows(spark, p1, F.col("value") % 9 == 0)
    assert sorted(r["k"] for r in dl.read_delta(spark, p1).collect()) == [
        k for k in range(30) if (k * 3) % 9 != 0
    ]
    # id mode, partitioned, with a DV merge on the second delete
    p2 = str(tmp_path / "idm")
    dl.write_delta(
        spark,
        df.withColumn("g", (F.col("k") % 3).cast("int")),
        p2,
        column_mapping="id",
        partition_by=["g"],
    )
    dl.delta_delete_rows(spark, p2, F.col("k") % 5 == 0)
    dl.delta_delete_rows(spark, p2, F.col("k") % 7 == 0)
    assert sorted(r["k"] for r in dl.read_delta(spark, p2).collect()) == [
        k for k in range(30) if k % 5 != 0 and k % 7 != 0
    ]


def test_delta_update_rows_partitioned(spark, tmp_path):
    """Partitioned UPDATE graduated (r14): the rewrite restores the
    Hive layout + per-add partitionValues, the cdc actions stay
    authoritative for the change feed, and partition filters keep
    working after the rewrite."""
    p = str(tmp_path / "t")
    df = spark.range(30).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        (F.col("id") % 3).cast("int").alias("g"),
    )
    dl.write_delta(spark, df, p, partition_by=["g"])
    dl.delta_update_rows(
        spark, p, F.col("k") % 4 == 0, {"v": F.col("v") + 1000}
    )
    got = sorted(
        (r["k"], r["v"], r["g"]) for r in dl.read_delta(spark, p).collect()
    )
    assert got == sorted(
        (k, k * 3 + (1000 if k % 4 == 0 else 0), k % 3) for k in range(30)
    )
    ch = sorted(
        (r["k"], r["g"], r["_change_type"])
        for r in dl.delta_changes(spark, p, starting_version=1).collect()
    )
    assert ch == sorted(
        [(k, k % 3, "update_preimage") for k in range(30) if k % 4 == 0]
        + [(k, k % 3, "update_postimage") for k in range(30) if k % 4 == 0]
    ), "change rows must carry real partition values, never NULL"
    assert (
        dl.read_delta(spark, p, partition_filter={"g": "1"}).count() == 10
    )
    # raw-action check: mainstream Delta CDF readers fill partition
    # columns for cdc files FROM the action's partitionValues — the
    # writer must key them, not leave {} (advice r15)
    with open(
        os.path.join(p, "_delta_log", "00000000000000000001.json")
    ) as fh:
        cdc_acts = [
            json.loads(ln)["cdc"] for ln in fh if '"cdc"' in ln
        ]
    assert cdc_acts, "UPDATE commit must carry cdc actions"
    assert all(
        set(c["partitionValues"]) == {"g"}
        and c["partitionValues"]["g"] in {"0", "1", "2"}
        for c in cdc_acts
    ), f"cdc partitionValues must be keyed: {cdc_acts}"
