"""Benchmark harness — BASELINE.md query set (SURVEY.md §7.1 M6).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], one warm-up run +
one timed run each (same method as BASELINE.md), and prints ONE JSON
line:

    {"metric": "...", "value": <total>, "unit": "sec",
     "queries": {...}, "sf": 0.1}

Usage: python bench.py  [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spype_spark.queries import REGISTRY  # noqa: E402
from spype_spark.session import get_spark  # noqa: E402

def _minhash_kernel(spark, sf_dir):
    """The MinHash candidate kernel — q_dedup_minhash's CONTRACT is now
    a containment audit (kernel + exact-Jaccard reference + anti-join),
    so benching the registry key would time the audit, not the kernel,
    and break comparability with the BASELINE.md row. This binds the
    bench label to the same computation every prior round timed."""
    from pyspark.sql import functions as F  # noqa: F401

    from spype_spark.functions import minhash_candidates
    from spype_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").repartition(32)
    return minhash_candidates(d, n_hashes=16)


def _lake_merge_kernel(spark, sf_dir):
    """Manifest-commit-layer MERGE at full table size: write orders as
    a manifest table, merge a ~1/3 update set, read the result back.
    Times the WHOLE mutation path — file writes, manifest assembly,
    put-if-absent publish, merged read — which became the DEFAULT
    protocol in round 8 with no wall-clock row; this closes that gap.
    (The contract key q_lake_merge_upsert is key-range-limited for its
    oracle, so it shrinks relative to the table at higher SF; this
    kernel scales WITH the table.)"""
    import shutil

    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake
    from spype_spark.queries.sources_sinks import _scratch
    from spype_spark.tables import load_table

    tmp = _scratch("bench_lake_merge_")
    try:
        path = f"{tmp}/orders_tbl"
        orders = load_table(spark, sf_dir, "orders")
        lake.write_table(orders, path)
        upd = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
        )
        lake.merge_upsert(spark, path, upd, keys=["o_orderkey"])
        return lake.read_table(spark, path).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _ivf_ann_kernel(spark, sf_dir):
    """IVF ANN production kernel (VERDICT r10 task 7): centroid
    assignment + per-cell tiled GEMM re-rank + global top-k over the
    embeddings table. Benches :func:`spype_spark.ann.ivf_ann` directly
    — the contract key's oracle replays the full cell enumeration and
    would time the audit, not the kernel (same reasoning as the
    minhash row). ``n_cells=None`` is the pinned-occupancy scale path;
    nprobe=4, k=10 are production-shaped."""
    from spype_spark.ann import ivf_ann
    from spype_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).repartition(32)
    return ivf_ann(e, n_cells=None, nprobe=4, k=10)


def _sql_merge_kernel(spark, sf_dir):
    """The SQL-facade twin of :func:`_lake_merge_kernel`: IDENTICAL
    work (write orders as a manifest table, merge a ~1/3 update set,
    read back) with ONLY the merge step driven through
    ``sqltext.sql("MERGE INTO …")``. The row's value is its DELTA vs
    the q_lake_merge row — statement parsing, clause scanning, alias
    rewriting, and view resolution are the facade's only extra work,
    so a parse-path regression (e.g. an accidentally-quadratic regex)
    shows here while q_lake_merge stays flat (VERDICT r11 task 9)."""
    import shutil

    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake
    from spype_spark import sqltext
    from spype_spark.queries.sources_sinks import _scratch
    from spype_spark.tables import load_table

    tmp = _scratch("bench_sql_merge_")
    try:
        path = f"{tmp}/orders_tbl"
        orders = load_table(spark, sf_dir, "orders")
        lake.write_table(orders, path)
        upd = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
        )
        upd.createOrReplaceTempView("bench_sql_merge_upd")
        sqltext.sql(spark, f"""
            MERGE INTO '{path}' AS t USING bench_sql_merge_upd AS s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        """)
        spark.catalog.dropTempView("bench_sql_merge_upd")
        return lake.read_table(spark, path).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SCAN_TABLE_CACHE: dict[str, str] = {}


def _lake_scan_kernel(spark, sf_dir):
    """Manifest READ path: `scan_table` predicate planning + pruned
    read over a ~1.2k-entry hidden-partitioned manifest table. The
    table is built ONCE per process (outside every timed run); the
    timed part is exactly what a 100 TB reader pays per query — load
    the manifest, translate the predicate through transform + stats
    pruning (pure driver-side arithmetic that grows with the
    predicate/transform algebra, previously untracked), open the
    surviving handful of files, collect. Floor in BASELINE.md."""
    import atexit
    import shutil

    from spype_spark import lakehouse as lake
    from spype_spark.queries.sources_sinks import _scratch
    from spype_spark.tables import load_table

    path = _SCAN_TABLE_CACHE.get(sf_dir)
    if path is None:
        tmp = _scratch("bench_lake_scan_")
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        path = f"{tmp}/orders_tbl"
        orders = load_table(spark, sf_dir, "orders").coalesce(1)
        lake.write_table(
            orders, path, partition_by=[("truncate", 500, "o_orderkey")]
        )
        _SCAN_TABLE_CACHE[sf_dir] = path
    return lake.scan_table(
        spark,
        path,
        where=(
            "and",
            ("between", "o_orderkey", 1000, 3500),
            ("ge", "o_totalprice", 1000.0),
        ),
    )


_DELTA_TABLE_CACHE: dict[str, str] = {}


def _delta_read_kernel(spark, sf_dir):
    """Delta-interop READ path (VERDICT r12 task 7): replay a
    spec-shaped log (classic parquet checkpoint + one tail JSON
    commit — the steady-state shape of a maintained Delta table) and
    scan the live files. The fixture is built ONCE per process
    (outside every timed run); the timed part is exactly what a
    foreign-table reader pays per query — checkpoint load, tail
    replay, live-list assembly, one declarative scan, collect. Gives
    interop planning the same regression comparator scan/merge/facade
    already have."""
    import atexit
    import shutil

    from pyspark.sql import functions as F

    from spype_spark import delta_interop as dl
    from spype_spark.queries.sources_sinks import _scratch
    from spype_spark.tables import load_table

    path = _DELTA_TABLE_CACHE.get(sf_dir)
    if path is None:
        tmp = _scratch("bench_delta_read_")
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        path = f"{tmp}/orders_delta"
        orders = load_table(spark, sf_dir, "orders")
        dl.write_delta(
            spark, orders.filter(F.col("o_orderkey") % 4 < 3), path
        )
        dl.write_delta(
            spark, orders.filter(F.col("o_orderkey") % 4 == 3), path,
            mode="append",
        )
        dl.checkpoint_delta(spark, path)
        dl.write_delta(
            spark,
            orders.filter(F.col("o_orderkey") % 4 == 3).limit(0),
            path,
            mode="append",
        )
        _DELTA_TABLE_CACHE[sf_dir] = path
    return dl.read_delta(spark, path)


_DV_TABLE_CACHE: dict[str, str] = {}


def _dv_read_kernel(spark, sf_dir):
    """Deletion-vector READ path (round 13): the fixture (built once,
    outside every timed run) is the orders table with TWO stacked DV
    deletes (~10 % + ~14 % of rows, the second merging vectors into
    already-vectored files). The timed part is what a foreign
    vectored-table reader pays per query: log replay, DV byte load,
    executor-side roaring decode, ONE anti-join on the scan's
    (_metadata.file_path, row_index), scan, collect. Its delta vs
    q_lake_delta_read isolates the merge-on-read surcharge the same
    way q_lake_sql_merge isolates parsing vs q_lake_merge."""
    import atexit
    import shutil

    from pyspark.sql import functions as F

    from spype_spark import delta_interop as dl
    from spype_spark.queries.sources_sinks import _scratch
    from spype_spark.tables import load_table

    path = _DV_TABLE_CACHE.get(sf_dir)
    if path is None:
        tmp = _scratch("bench_delta_dv_")
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        path = f"{tmp}/orders_dv"
        orders = load_table(spark, sf_dir, "orders")
        dl.write_delta(spark, orders, path)
        dl.delta_delete_rows(spark, path, F.col("o_orderkey") % 10 == 3)
        dl.delta_delete_rows(spark, path, F.col("o_orderkey") % 7 == 2)
        _DV_TABLE_CACHE[sf_dir] = path
    return dl.read_delta(spark, path)


_CDF_TABLE_CACHE: dict[str, str] = {}


def _cdf_read_kernel(spark, sf_dir):
    """Change-feed READ through the Python DataSource (round-13
    second continuation): the fixture (built once, outside every
    timed run) is the orders table as a Delta log with one DV-delta
    commit and one cdc UPDATE commit — one of each change-decode
    class. The timed part is what a CDC consumer pays per full-window
    poll through ``format("delta_cdf")``: data-source worker planning
    (JSON parse + DV bitmap delta), one executor task per change file
    through the Arrow batch channel, collect. This is the ONLY bench
    row whose scan executes in Python workers (pyarrow, not
    WholeStageCodegen) — its floor tracks the Python DataSource
    overhead the streaming CDC contracts ride on."""
    import atexit
    import shutil

    from pyspark.sql import functions as F

    from spype_spark import delta_interop as dl
    from spype_spark.cdf_source import register_delta_cdf
    from spype_spark.queries.sources_sinks import _scratch
    from spype_spark.tables import load_table

    register_delta_cdf(spark)
    path = _CDF_TABLE_CACHE.get(sf_dir)
    if path is None:
        tmp = _scratch("bench_delta_cdf_")
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        path = f"{tmp}/orders_cdf"
        orders = load_table(spark, sf_dir, "orders")
        dl.write_delta(spark, orders, path)
        dl.delta_delete_rows(spark, path, F.col("o_orderkey") % 10 == 3)
        dl.delta_update_rows(
            spark,
            path,
            F.col("o_orderstatus") == "F",
            {"o_totalprice": F.col("o_totalprice") + 10.0},
        )
        _CDF_TABLE_CACHE[sf_dir] = path
    return spark.read.format("delta_cdf").option("path", path).load()


_NCDF_TABLE_CACHE: dict[str, str] = {}


def _native_cdf_kernel(spark, sf_dir):
    """NATIVE change-feed batch window (round-15 row: the r14 reader
    had no bench twin): the fixture is the orders table as a native
    manifest chain with one merge-on-read DV delete (mask-class
    change set) and one MERGE rewrite (key-diff class) — the same two
    decode classes as q_lake_cdf_read's foreign fixture, so the
    pair's delta isolates native-manifest planning vs Delta-log
    planning on the same Python DataSource channel. Timed: full
    window plan (manifest walk, no-Spark worker) + per-partition
    Arrow reads (insert files, DV masks, hash-bucketed key-diff) +
    collect."""
    import atexit
    import shutil

    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake
    from spype_spark.lake_sink import register_lake_sink
    from spype_spark.queries.sources_sinks import _scratch
    from spype_spark.tables import load_table

    register_lake_sink(spark)
    path = _NCDF_TABLE_CACHE.get(sf_dir)
    if path is None:
        tmp = _scratch("bench_lake_cdf_")
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        path = f"{tmp}/orders_cdf"
        orders = load_table(spark, sf_dir, "orders")
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
        _NCDF_TABLE_CACHE[sf_dir] = path
    return (
        spark.read.format("spype_lake")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("keys", "o_orderkey")
        .load()
    )


_BLOOM_TABLE_CACHE: dict = {}


def _bloom_prune_kernel(spark, sf_dir):
    """Bloom point-mutation row (round-15 continuation: the per-file
    Bloom filters had no wall-clock row): the fixture is orders keyed
    by md5(o_orderkey) in 32 hash-bucketed files with
    ``bloom_keys`` — the layout where range stats prune NOTHING — and
    each timed run pays one 8-key point MERGE (Bloom carries the
    ~75% of files the keys miss), one absent-key DELETE (a pure
    metadata commit: every filter refutes, zero data files read), and
    a count-class read-back. The fixture is cached across runs
    (point-mutation cost is the claim — it must stay flat as the
    version chain grows); the mutation keys rotate per run so the
    merge never degenerates to a no-op rewrite of already-hot files
    only."""
    import atexit
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    from spype_spark import lakehouse as lake
    from spype_spark.queries.sources_sinks import _scratch
    from spype_spark.tables import load_table

    path = _BLOOM_TABLE_CACHE.get(sf_dir)
    if path is None:
        tmp = _scratch("bench_lake_bloom_")
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        path = f"{tmp}/orders_hash"
        orders = load_table(spark, sf_dir, "orders").select(
            F.md5(F.col("o_orderkey").cast("string")).alias("k"),
            "o_orderkey",
            "o_totalprice",
        )
        lake.write_table(
            orders.repartition(32, F.col("k")), path, bloom_keys="k"
        )
        _BLOOM_TABLE_CACHE[sf_dir] = path
        _BLOOM_TABLE_CACHE[(sf_dir, "run")] = 0
    run = _BLOOM_TABLE_CACHE[(sf_dir, "run")] = (
        _BLOOM_TABLE_CACHE.get((sf_dir, "run"), 0) + 1
    )
    keys = [
        hashlib.md5(str(1 + 7 * (run * 8 + i)).encode()).hexdigest()
        for i in range(8)
    ]
    ups = spark.createDataFrame(
        [(k, -1, -1.0) for k in keys],
        "k string, o_orderkey long, o_totalprice double",
    )
    lake.merge_upsert(spark, path, ups, keys=["k"])
    lake.delete_predicate(spark, path, ("eq", "k", "f" * 32))
    return (
        lake.read_table(spark, path)
        .agg(
            F.count("*").alias("n"),
            F.sum("o_totalprice").alias("s"),
        )
        .localCheckpoint()
    )


#: BASELINE.md rows → registry keys (strings) or direct callables of
#: (spark, sf_dir). q_events_hourly_agg is the tumbling hourly
#: aggregate (same shape as the baseline's user×type×hour query).
BENCH_QUERIES = {
    "q_pricing_summary": "q_pricing_summary",
    "q_join_3way": "q_join_3way",
    "q_window_topk": "q_window_topk",
    "q_events_hourly_agg": "q_events_hourly_agg",
    # engine-differentiating extras, benched for regression visibility:
    "q_dedup_minhash": _minhash_kernel,
    # DECLARED FIXTURE (r16, VERDICT-r15 item 7): this row measures
    # query cost against a PREBUILT tile table — the kernel memoizes
    # the localCheckpoint'd tile pack per (session, corpus) (ann.py
    # _TILE_MEMO), so the first (warm-up, untimed) call pays the tile
    # build + sizing count and every timed run pays the B×B GEMM grid +
    # top-k merge only. That is the production shape (the tile table is
    # written once and queried many times) and it has been this row's
    # shape since round 5 (BASELINE.md: "one-shot tile materialization"),
    # stated here explicitly the way q_lake_bloom declares its cached
    # fixture. Every timed run still executes the full grid from the
    # tile table — no query RESULT is cached.
    "q_sim_cosine_topk": "q_sim_cosine_topk",
    # classic-suite rows (added round 3 — totals are NOT comparable to
    # BENCH_r01/r02; compare per-query against BASELINE.md floors):
    "q_tpch_q5": "q_tpch_q5",
    "q_tpch_q18": "q_tpch_q18",
    # deep classic-suite row (added round 6 with tpch_deep.py: the
    # 5-way broadcast-chain profit rollup — totals are NOT comparable
    # to BENCH_r05; compare per-query):
    "q_tpch_q9": "q_tpch_q9",
    # events-analytics rows (added round 5, post-corpus-regen: these
    # exercise the dtype-normalized ts path end-to-end — totals are NOT
    # comparable to BENCH_r03/r04; compare per-query):
    "q_rolling_dau": "q_rolling_dau",
    "q_stream_session": "q_stream_session",
    # round-9 rows (totals NOT comparable to BENCH_r08; compare
    # per-query): the manifest MERGE mutation path (default commit
    # layer since round 8, previously untracked) and the bloom
    # build+probe semi-join (binary-literal probe plan):
    "q_lake_merge": _lake_merge_kernel,
    "q_join_bloom": "q_join_bloom",
    # round-10 row (totals NOT comparable to BENCH_r09; compare
    # per-query): the manifest READ path — scan planning (predicate →
    # transform/stats file pruning, driver-side) + the pruned read:
    "q_lake_scan": _lake_scan_kernel,
    # round-11 row (totals NOT comparable to BENCH_r10; compare
    # per-query): the production-shaped ANN kernel — IVF assignment +
    # per-cell GEMM re-rank (the 6-kernel ANN family previously had no
    # wall-clock regression row):
    "q_sim_ivf_ann": _ivf_ann_kernel,
    # round-12 row (totals NOT comparable to BENCH_r11; compare
    # per-query): the SQL-facade merge — q_lake_merge's exact kernel
    # with the merge step driven through sqltext.sql; its delta vs
    # q_lake_merge isolates statement-planning overhead:
    "q_lake_sql_merge": _sql_merge_kernel,
    # round-13 row (totals NOT comparable to BENCH_r12; compare
    # per-query): the Delta-interop read path — checkpoint + tail
    # replay + live-list assembly + scan (previously untracked):
    "q_lake_delta_read": _delta_read_kernel,
    # round-13 row (late addition, same round): the deletion-vector
    # read path — its delta vs q_lake_delta_read is the merge-on-read
    # surcharge (DV decode + one anti-join):
    "q_lake_delta_dv": _dv_read_kernel,
    # round-13 second-continuation row: the change-feed read through
    # the Python DataSource (format("delta_cdf")) — the one bench row
    # on the Arrow-batch Python channel; tracks the overhead the
    # streaming CDC contracts ride on:
    "q_lake_cdf_read": _cdf_read_kernel,
    # round-15 row (totals NOT comparable to BENCH_r14; compare
    # per-query): the NATIVE change-feed batch window — same two
    # change-decode classes as q_lake_cdf_read on the native manifest
    # chain; the pair isolates manifest-vs-Delta-log planning cost:
    "q_lake_cdf_native": _native_cdf_kernel,
    # round-15 continuation row (totals NOT comparable to earlier
    # BENCH snapshots; compare per-query): Bloom point-mutation cost
    # on a hash-keyed table — 8-key MERGE + absent-key DELETE +
    # count read; the layout range stats cannot prune at all:
    "q_lake_bloom": _bloom_prune_kernel,
}


def _calibrate_ms(reps: int = 3) -> float:
    """Fixed single-core CPU probe (~100 ms class on an unloaded core):
    a deterministic md5 chain whose work never changes, so its wall
    time is a pure function of the host's effective single-thread
    speed during THIS bench run. The min over ``reps`` is the floor the
    box could deliver; rounds compare their query floors against each
    other THROUGH this number (VERDICT r15 item 1 — the 0.868 geomean
    "regression" was host drift that nothing in-band could prove)."""
    import hashlib

    best = None
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        h = b"spype-calib"
        for _ in range(200_000):
            h = hashlib.md5(h).digest()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best * 1000, 2)


def _env_fingerprint(spark) -> dict:
    """Effective-parallelism + host-state fingerprint, emitted in-band
    with the results (additions-only: a new top-level JSON key; the 21
    existing query rows and the protocol are untouched). Proves the
    $SPARK_GRAFT_CPUS contract (master/defaultParallelism show what
    actually ran) and makes host drift attributable (loadavg + the
    fixed single-core calibration probe)."""
    sc = spark.sparkContext
    try:
        la1, la5, la15 = os.getloadavg()
    except OSError:
        la1 = la5 = la15 = None
    return {
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        "cpus_env": os.environ.get("SPARK_GRAFT_CPUS"),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "loadavg_1m": la1,
        "loadavg_5m": la5,
        "loadavg_15m": la15,
        "calib_single_core_ms": _calibrate_ms(),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3, help="timed runs (best kept)")
    ap.add_argument(
        "--sessions",
        type=int,
        default=2,
        help="independent SparkSessions; per-query floor is the min "
        "across all sessions (BASELINE.md's own protocol — single-"
        "session snapshots have shown ±30%%+ one-off artifacts)",
    )
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    sf_dir = args.sf_dir
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    times: dict[str, float] = {}
    env: dict | None = None
    for sess_idx in range(max(1, args.sessions)):
        spark = get_spark("spype-bench")
        if env is None:
            env = _env_fingerprint(spark)
            print(f"# env {json.dumps(env)}", file=sys.stderr)
        for label, key in BENCH_QUERIES.items():
            fn = REGISTRY[key].fn if isinstance(key, str) else key
            fn(spark, sf_dir).collect()  # warm: JIT/codegen + file listing
            best = times.get(label)
            for _ in range(max(1, args.runs)):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[label] = best
            print(
                f"# s{sess_idx} {label}: floor {best*1000:.0f} ms",
                file=sys.stderr,
            )
        if sess_idx + 1 < max(1, args.sessions):
            spark.stop()  # next loop builds a fresh session/context
    times = {k: round(v, 4) for k, v in times.items()}

    # close the fingerprint with END-of-run host state: a calibration
    # delta between the two probes flags drift DURING the run itself
    if env is not None:
        try:
            la1, la5, _ = os.getloadavg()
            env["loadavg_1m_end"] = la1
            env["loadavg_5m_end"] = la5
        except OSError:
            pass
        env["calib_single_core_ms_end"] = _calibrate_ms()

    print(
        json.dumps(
            {
                "metric": "headline_query_latency_warm_total",
                "value": round(sum(times.values()), 4),
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "env": env,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
