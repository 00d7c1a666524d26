"""Phase-level timing of the expensive lake bench kernels (r15 opt).

Breaks q_lake_merge / q_lake_bloom / q_lake_cdf_native / q_lake_scan
into their component phases (initial write, mutation commits, read
back) so optimization effort goes where the milliseconds are
(guide §1.1-1.2).  Each phase is timed over N repetitions after one
warm-up of the whole kernel.

Usage: python tools/opt_profile_lake.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spype_spark import lakehouse as lake  # noqa: E402
from spype_spark.queries.sources_sinks import _scratch  # noqa: E402
from spype_spark.session import get_spark  # noqa: E402
from spype_spark.tables import load_table  # noqa: E402


def t(label, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {label:45s} {best*1000:8.0f} ms")
    return out


def profile_merge(spark, sf_dir):
    print("== q_lake_merge phases ==")
    orders = load_table(spark, sf_dir, "orders")
    upd = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    )
    tmp = _scratch("prof_merge_")
    try:
        def full():
            p = f"{tmp}/t{time.monotonic_ns()}"
            lake.write_table(orders, p)
            lake.merge_upsert(spark, p, upd, keys=["o_orderkey"])
            return lake.read_table(spark, p).localCheckpoint()
        full()  # warm
        # phase: initial write
        paths = []
        def w():
            p = f"{tmp}/w{time.monotonic_ns()}"
            lake.write_table(orders, p)
            paths.append(p)
        t("write_table(orders)", w)
        # phase: merge on a fresh copy each time
        def mg():
            p = paths.pop()
            lake.merge_upsert(spark, p, upd, keys=["o_orderkey"])
            paths.insert(0, p)
        t("merge_upsert(1/3 update)", mg)
        p0 = paths[0]
        t("read_table.localCheckpoint", lambda: lake.read_table(spark, p0).localCheckpoint())
        t("FULL kernel", full)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def profile_bloom(spark, sf_dir):
    import hashlib
    print("== q_lake_bloom phases ==")
    orders = load_table(spark, sf_dir, "orders").select(
        F.md5(F.col("o_orderkey").cast("string")).alias("k"),
        "o_orderkey",
        "o_totalprice",
    )
    tmp = _scratch("prof_bloom_")
    try:
        path = f"{tmp}/orders_hash"
        t0 = time.perf_counter()
        lake.write_table(orders.repartition(32, F.col("k")), path, bloom_keys="k")
        print(f"  {'write_table bloom_keys (once)':45s} {(time.perf_counter()-t0)*1000:8.0f} ms")
        run = [0]
        def merge8():
            run[0] += 1
            keys = [
                hashlib.md5(str(1 + 7 * (run[0] * 8 + i)).encode()).hexdigest()
                for i in range(8)
            ]
            ups = spark.createDataFrame(
                [(k, -1, -1.0) for k in keys],
                "k string, o_orderkey long, o_totalprice double",
            )
            lake.merge_upsert(spark, path, ups, keys=["k"])
        merge8()  # warm
        t("8-key point MERGE", merge8)
        t("absent-key DELETE", lambda: lake.delete_predicate(spark, path, ("eq", "k", "f" * 32)))
        t("read+agg+localCheckpoint", lambda: (
            lake.read_table(spark, path)
            .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
            .localCheckpoint()
        ))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def profile_native_cdf(spark, sf_dir):
    from spype_spark.lake_sink import register_lake_sink
    print("== q_lake_cdf_native phases ==")
    register_lake_sink(spark)
    tmp = _scratch("prof_ncdf_")
    try:
        path = f"{tmp}/orders_cdf"
        orders = load_table(spark, sf_dir, "orders")
        t0 = time.perf_counter()
        lake.write_table(orders, path)
        lake.delete_where_dv(spark, path, F.col("o_orderkey") % 10 == 3)
        live = lake.read_table(spark, path)
        lake.merge_upsert(
            spark,
            path,
            live.filter(F.col("o_orderstatus") == "F").withColumn(
                "o_totalprice", F.col("o_totalprice") + 10.0
            ),
            ["o_orderkey"],
        )
        print(f"  {'fixture build (once)':45s} {(time.perf_counter()-t0)*1000:8.0f} ms")
        def read():
            return (
                spark.read.format("spype_lake")
                .option("path", path)
                .option("readChangeFeed", "true")
                .option("keys", "o_orderkey")
                .load()
                .collect()
            )
        read()  # warm
        t("CDF window read+collect", read)
        # split: plan-only (load, count partitions via limit 0 trick not
        # possible; read with a never-true filter still scans) — skip.
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("spype-opt-profile")
    profile_merge(spark, sf_dir)
    profile_bloom(spark, sf_dir)
    profile_native_cdf(spark, sf_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
