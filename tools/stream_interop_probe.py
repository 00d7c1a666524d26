"""Measured probes for the round-13 streaming interop claims.

1. ``spype_lake`` sink: one fixed-size streaming microbatch appended
   into tables of growing size — the claim is O(new rows) per commit
   REGARDLESS of table size (base entries carry by reference).
2. ``delta_cdf`` source: incremental drain of ONE new commit on logs
   of growing length — the claim is the tail poll pays O(new change
   files) + O(log-metadata parse), not O(history) (state replay is
   lazy; pure appends never reconstruct state).

Usage: python tools/stream_interop_probe.py [sizes...]
Writes human-readable timings to stdout (recorded in SCALE.md).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spype_spark import delta_interop as dl  # noqa: E402
from spype_spark import lakehouse as lake  # noqa: E402
from spype_spark.cdf_source import register_delta_cdf  # noqa: E402
from spype_spark.lake_sink import register_lake_sink  # noqa: E402
from spype_spark.queries.sources_sinks import _scratch  # noqa: E402
from spype_spark.session import get_spark  # noqa: E402


def probe_sink(spark, sizes: list[int]) -> None:
    print("== spype_lake sink: fixed 10k-row microbatch vs table size")
    for n in sizes:
        tmp = _scratch("probe_sink_")
        try:
            p = f"{tmp}/t"
            base = spark.range(n).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("g")
            )
            lake.write_table(base, p)
            src = f"{tmp}/src"
            spark.range(n, n + 10_000).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("g")
            ).coalesce(4).write.parquet(src)
            t0 = time.perf_counter()
            q = (
                spark.readStream.schema("k bigint, g bigint")
                .parquet(src)
                .writeStream.format("spype_lake")
                .option("path", p)
                .option("checkpointLocation", f"{tmp}/ck")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            dt = time.perf_counter() - t0
            assert lake.read_table(spark, p).count() == n + 10_000
            print(f"  base_rows={n:>9,}  drain_one_batch={dt*1000:8.0f} ms")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def probe_cdf_tail(spark, commit_counts: list[int]) -> None:
    print("== delta_cdf source: one-commit incremental drain vs log length")
    for n_commits in commit_counts:
        tmp = _scratch("probe_cdf_")
        try:
            p = f"{tmp}/t"
            df = spark.range(2_000).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("g")
            )
            dl.write_delta(spark, df, p)
            for _ in range(n_commits - 1):
                dl.write_delta(spark, df.limit(200), p, mode="append")
            sink, ck = f"{tmp}/sink", f"{tmp}/ck"

            def drain():
                q = (
                    spark.readStream.format("delta_cdf")
                    .option("path", p)
                    .load()
                    .writeStream.format("parquet")
                    .option("path", sink)
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()

            drain()  # consume history
            dl.write_delta(spark, df.limit(300), p, mode="append")
            t0 = time.perf_counter()
            drain()  # the incremental poll being measured
            dt = time.perf_counter() - t0
            print(
                f"  log_commits={n_commits:>5}  "
                f"incremental_drain={dt*1000:8.0f} ms"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def probe_ice_tail(spark, snap_counts: list[int]) -> None:
    print("== iceberg_cdc source: one-snapshot incremental drain vs chain length")
    from spype_spark import iceberg_interop as ice
    from spype_spark.iceberg_cdc import register_iceberg_cdc

    register_iceberg_cdc(spark)
    for n_snaps in snap_counts:
        tmp = _scratch("probe_icecdc_")
        try:
            p = f"{tmp}/t"
            df = spark.range(2_000).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("g")
            )
            ice.write_iceberg(spark, df, p)
            for _ in range(n_snaps - 1):
                ice.write_iceberg(spark, df.limit(200), p, mode="append")
            sink, ck = f"{tmp}/sink", f"{tmp}/ck"

            def drain():
                q = (
                    spark.readStream.format("iceberg_cdc")
                    .option("path", p)
                    .load()
                    .writeStream.format("parquet")
                    .option("path", sink)
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()

            drain()
            ice.write_iceberg(spark, df.limit(300), p, mode="append")
            t0 = time.perf_counter()
            drain()
            dt = time.perf_counter() - t0
            print(
                f"  chain_snaps={n_snaps:>5}  "
                f"incremental_drain={dt*1000:8.0f} ms"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = get_spark("stream-interop-probe")
    register_lake_sink(spark)
    register_delta_cdf(spark)
    probe_sink(spark, [10_000, 100_000, 1_000_000])
    probe_cdf_tail(spark, [5, 50, 200])
    probe_ice_tail(spark, [5, 30, 100])


if __name__ == "__main__":
    main()
