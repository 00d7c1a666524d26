"""Probe: Delta log state reconstruction at 1e4 / 1e5 adds —
driver-side replay vs DataFrame reconstruction (delta_state_df).

Fabricates spec-shaped logs (JSON commits + optional classic
checkpoint; no data files — state reconstruction never opens them)
and times (a) driver _replay, (b) delta_state_df count (the
distributed window), (c) the post-dedup live-list collect that a
scan plan needs. Results go to SCALE.md round-13.

Run: python tools/delta_state_probe.py
"""

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from spype_spark import delta_interop as dl


def fabricate(root: str, n_adds: int, n_commits: int, churn: float = 0.1) -> None:
    os.makedirs(os.path.join(root, "_delta_log"), exist_ok=True)
    per = n_adds // n_commits
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}}
        ],
    }
    live = []
    for c in range(n_commits):
        actions = []
        if c == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": json.dumps(schema),
                        "partitionColumns": [],
                        "configuration": {},
                        "createdTime": 0,
                    }
                }
            )
        # churn: remove a slice of earlier files (exercises the window)
        n_rm = int(per * churn) if c else 0
        for p in live[:n_rm]:
            actions.append(
                {"remove": {"path": p, "deletionTimestamp": c, "dataChange": True}}
            )
        live = live[n_rm:]
        for i in range(per):
            p = f"part-{c:05d}-{i:06d}.parquet"
            live.append(p)
            actions.append(
                {
                    "add": {
                        "path": p,
                        "partitionValues": {},
                        "size": 1048576,
                        "modificationTime": c,
                        "dataChange": True,
                    }
                }
            )
        with open(os.path.join(root, "_delta_log", f"{c:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")


def bench(spark, root):
    t0 = time.monotonic()
    _meta, adds, _v = dl._replay(spark, root, None)
    t_driver = time.monotonic() - t0
    t0 = time.monotonic()
    n = dl.delta_state_df(spark, root).count()
    t_df_count = time.monotonic() - t0
    t0 = time.monotonic()
    rows = dl.delta_state_df(spark, root).select("path").collect()
    t_df_collect = time.monotonic() - t0
    assert n == len(adds) == len(rows), (n, len(adds), len(rows))
    return len(adds), t_driver, t_df_count, t_df_collect


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("delta-state-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("n_adds_target commits ckpt live driver_s df_count_s df_collect_s")
    for n_adds, commits, with_ckpt in (
        (10_000, 10, False),
        (100_000, 25, False),
        (100_000, 25, True),
    ):
        tmp = tempfile.mkdtemp(prefix="spype_delta_probe_")
        try:
            fabricate(tmp, n_adds, commits)
            if with_ckpt:
                dl.checkpoint_delta(spark, tmp)
                # drop all but the last 2 JSON commits: tail replay on
                # top of the checkpoint, the steady-state shape
                for c in range(commits - 2):
                    os.unlink(os.path.join(tmp, "_delta_log", f"{c:020d}.json"))
            live, td, tc, tl = bench(spark, tmp)
            print(
                f"{n_adds} {commits} {int(with_ckpt)} {live} "
                f"{td:.3f} {tc:.3f} {tl:.3f}"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
