"""CDF rewrite scale-out probe (round 15, VERDICT-r14 item 2).

Two claims to measure:

1. **Plan-time skip of dataChange=false commits.** A compaction
   (z-order, OPTIMIZE) rewrites every file but provably changes no
   live row; pre-r15 the feed paid a full key-diff read of the whole
   rewritten table to emit zero rows. With the r15 ``op`` stamp the
   planner emits NOTHING from the manifest alone — the probe times
   the CDF window over a compaction commit at 1M rows and asserts
   zero partitions + millisecond wall.

2. **Hash-bucketed key-diff.** A big scattered MERGE funnels its
   whole change set through ONE diff partition pre-r15 (single
   Python task does the full-outer Arrow join). r15 splits the diff
   into ≤64 deterministic key-hash buckets once the touched bytes
   cross ``diffBucketBytes``. The probe reads the SAME rewrite
   commit's feed with the split disabled (one task) and enabled
   (N tasks) and records wall + partition counts + row-identical
   output. The win is parallel CPU + bounded per-task join memory;
   the cost is re-reading touched files per bucket — the trade a
   1000-executor cluster wants for a multi-GB MERGE.

Usage: python tools/cdf_bucket_probe.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spype_spark import lakehouse as lake  # noqa: E402
from spype_spark import manifest_log as mlog  # noqa: E402
from spype_spark.lake_sink import _plan_cdf_step, register_lake_sink  # noqa: E402
from spype_spark.session import get_spark  # noqa: E402


def timed_window(spark, path, v, bucket_bytes):
    t0 = time.perf_counter()
    df = (
        spark.read.format("spype_lake")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("keys", "k")
        .option("startingVersion", v)
        .option("endingVersion", v)
        .option("diffBucketBytes", bucket_bytes)
        .load()
    )
    rows = df.groupBy("_change_type").count().collect()
    wall = time.perf_counter() - t0
    return wall, {r["_change_type"]: r["count"] for r in rows}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("cdf-bucket-probe")
    register_lake_sink(spark)
    tmp = tempfile.mkdtemp(prefix="cdf_bucket_")
    out = []
    try:
        path = os.path.join(tmp, "t")
        df = spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("g"),
            (F.col("id") * 3).cast("double").alias("x"),
        )
        lake.write_table(df.repartition(16), path)

        # --- claim 1: compaction skips at plan time -------------------
        v_c = lake.compact(spark, path, target_files=8)
        assert mlog.m_load(path, v_c)["op"]["dataChange"] is False
        t0 = time.perf_counter()
        parts = _plan_cdf_step(path, v_c, None, {})
        plan_ms = (time.perf_counter() - t0) * 1000
        w_cold, counts = timed_window(spark, path, v_c, 1 << 40)
        w_warm, _ = timed_window(spark, path, v_c, 1 << 40)
        rec = {
            "probe": "compaction_skip",
            "rows": n,
            "plan_partitions": len(parts),
            "plan_ms": round(plan_ms, 2),
            "window_wall_cold_s": round(w_cold, 3),
            "window_wall_warm_s": round(w_warm, 3),
            "change_rows": counts,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
        assert parts == [] and not counts

        # --- claim 2: bucketed key-diff on a scattered MERGE ----------
        # every 16th key updates -> every file is touched (no stats
        # pruning opportunity), the worst-case rewrite for the feed
        upd = (
            spark.range(0, n, 16)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 97).alias("g"),
                F.lit(-1.0).alias("x"),
            )
        )
        v_m = lake.merge_upsert(spark, path, upd, ["k"])
        single_w, single_counts = timed_window(spark, path, v_m, 1 << 40)
        multi_w, multi_counts = timed_window(spark, path, v_m, 8 << 20)
        parts_multi = _plan_cdf_step(
            path, v_m, ["k"], {}, bucket_bytes=8 << 20
        )
        rec = {
            "probe": "bucketed_diff",
            "rows": n,
            "updated": n // 16,
            "single_task_wall_s": round(single_w, 3),
            "bucketed_wall_s": round(multi_w, 3),
            "buckets": len(parts_multi),
            "speedup": round(single_w / multi_w, 2),
            "identical": single_counts == multi_counts,
            "change_rows": single_counts,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
        assert single_counts == multi_counts
        assert len(parts_multi) > 1
        print(json.dumps({"summary": "cdf_bucket_probe", "records": out}))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
