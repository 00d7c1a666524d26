"""Scale probe for the round-13 interop graduations: Iceberg
merge-on-read deletes, Delta deletion vectors, and field-id footer
projection. Measures the driver-side planning quantities (what must
stay metadata-class) and the executor-side decode throughput (what
the anti-join path actually costs per file), so SCALE.md can state
measured numbers instead of hopes.

Usage: python tools/interop_mor_probe.py [--files 400] [--rows 200000]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=400)
    ap.add_argument("--rows", type=int, default=200_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from spype_spark import delta_interop as di
    from spype_spark import iceberg_interop as ice
    from spype_spark import roaring

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1. roaring decode throughput (the per-file executor cost) ---
    for n in (10_000, 1_000_000):
        # worst-ish case: scattered positions across a wide file
        pos = list(range(0, n * 7, 7))
        t0 = time.perf_counter()
        blob = roaring.serialize_array64(pos)
        t_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = roaring.deserialize_array64(blob)
        t_dec = time.perf_counter() - t0
        assert got == pos
        print(
            f"roaring n={n:>9,}: blob={len(blob):>9,} B "
            f"({8 * len(blob) / n:.2f} bits/row)  "
            f"encode={t_enc * 1e3:7.1f} ms  decode={t_dec * 1e3:7.1f} ms "
            f"({n / max(t_dec, 1e-9) / 1e6:.1f} M pos/s)"
        )

    # --- 2. footer field-id sweep (driver planning, O(files)) --------
    with tempfile.TemporaryDirectory() as tmp:
        d = os.path.join(tmp, "many")
        spark.range(args.files).repartition(args.files).select(
            F.col("id").alias("k")
        ).write.parquet(d)
        files = [
            os.path.join(r, n)
            for r, _dd, ns in os.walk(d)
            for n in ns
            if n.endswith(".parquet")
        ]
        fields = [{"id": 1, "name": "k", "type": "long"}]
        t0 = time.perf_counter()
        groups = ice._group_files_by_projection(files, fields)
        dt = time.perf_counter() - t0
        print(
            f"footer sweep: {len(files)} files in {dt * 1e3:.0f} ms "
            f"({dt * 1e6 / len(files):.0f} us/file; "
            f"10^5 files ~ {dt * 1e5 / len(files):.0f} s driver-side), "
            f"{len(groups)} group(s)"
        )

    # --- 3. Delta DV write+read vs COW rewrite -----------------------
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "t")
        df = spark.range(args.rows).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        )
        di.write_delta(spark, df.repartition(8), p)
        t0 = time.perf_counter()
        di.delta_delete_rows(spark, p, F.col("k") % 10 == 3)
        t_dv = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = di.read_delta(spark, p).count()
        t_read = time.perf_counter() - t0
        assert n == args.rows - args.rows // 10
        dv_bytes = sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.startswith("deletion_vector_")
        )
        print(
            f"delta DV: delete 10% of {args.rows:,} rows in "
            f"{t_dv * 1e3:.0f} ms (DV files {dv_bytes:,} B, zero data "
            f"rewritten); MoR read+count {t_read * 1e3:.0f} ms"
        )

    # --- 4. Iceberg MoR planning vs delete-file count -----------------
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "t")
        df = spark.range(50_000).select(
            F.col("id").alias("k"), (F.col("id") % 5).cast("int").alias("p")
        )
        ice.write_iceberg(spark, df, p, partition_by=["p"])
        for i in range(8):
            ice.write_iceberg_eq_deletes(
                spark,
                spark.createDataFrame([(int(i),)], "k long"),
                p,
                ["k"],
            )
        t0 = time.perf_counter()
        got = ice.read_iceberg(spark, p)
        t_plan = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = got.count()
        t_exec = time.perf_counter() - t0
        assert n == 50_000 - 8
        print(
            f"iceberg MoR: 8 eq-delete snapshots -> plan "
            f"{t_plan * 1e3:.0f} ms, execute {t_exec * 1e3:.0f} ms "
            f"(one anti-join per (seq, id-set) group)"
        )

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
