"""Native change-feed cost probe (round 14): the CDF claims its cost
is bounded by each commit's own change set / write amplification,
never the table size. Measure it.

Fixture: a manifest table at N rows (N = 100k and 1M, 8 files), then
two change commits — a merge-on-read key delete of 1 000 keys (per-file
mask partitions) and a RANGE-CLUSTERED merge update of 1 000 keys
(rewrite commit → key-diff of the touched files; manifest min/max
stats confine the rewrite to the files covering the key range). The
probe times the batch CDF window of EACH commit alone at both base
sizes: flat wall across 10× base = the bounded-cost claim holds.

Usage: python tools/lake_cdf_probe.py
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
from spype_spark.lake_sink import register_lake_sink  # noqa: E402
from spype_spark.session import get_spark  # noqa: E402


def cdf_count(spark, path, lo, hi):
    t0 = time.perf_counter()
    n = (
        spark.read.format("spype_lake")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("keys", "k")
        .option("startingVersion", str(lo))
        .option("endingVersion", str(hi))
        .load()
        .count()
    )
    return n, (time.perf_counter() - t0) * 1000


def run(spark, n_rows: int, layout: str) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"cdfprobe_{n_rows}_")
    path = os.path.join(tmp, "t")
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    shaped = (
        df.repartitionByRange(8, "k")
        if layout == "range"
        else df.repartition(8)
    )
    lake.write_table(shaped, path)  # v0
    lake.delete_keys(
        spark,
        path,
        spark.range(0, 50_000, 50).select(F.col("id").alias("k")),
    )  # v1: MoR delete of 1000 scattered keys
    # v2: clustered merge update of 1000 keys (stats-pruned rewrite)
    lake.merge_upsert(
        spark,
        path,
        spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 3 + 7).alias("v")
        ),
        ["k"],
    )
    # warm + timed, per commit window
    out = {"rows": n_rows, "layout": layout}
    for label, lo, hi in [("mor_delete", 1, 1), ("merge", 2, 2)]:
        cdf_count(spark, path, lo, hi)
        n, ms = cdf_count(spark, path, lo, hi)
        out[label] = {"change_rows": n, "ms": round(ms)}
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> int:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    register_lake_sink(spark)
    res = [
        run(spark, n, layout)
        for layout in ("hash", "range")
        for n in (100_000, 1_000_000)
    ]
    print(json.dumps({"summary": "lake_cdf_cost", "runs": res}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
