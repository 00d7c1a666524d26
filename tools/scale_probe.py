"""Scale probe — measure headline-query scaling sf0.1 → ~sf1.

Replicates the sf0.1 corpus N× (key-offset per replica so join/group
cardinalities scale realistically instead of collapsing onto duplicate
keys) into a scratch dir, then times a set of headline queries at both
scales and prints the per-query wall-clock ratio.

A ratio near N on the data-bound queries (scan+agg) and the observed
sub-N ratio on overhead-bound ones is the local[32] evidence behind
SCALE.md's "overhead amortizes, data path scales linearly" claim.

Usage:  python tools/scale_probe.py [N]          (default N=10)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spype_spark.queries import REGISTRY
from spype_spark.session import get_spark
from spype_spark.tables import TABLES

BASE = "/root/testdata/sf0.1"
SCRATCH = "/tmp/spype_scale_probe"

#: per-table key columns offset per replica (keeps FK joins valid:
#: every replica is a self-consistent shard of the composite corpus)
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # region/nation are dimension-stable: replicating them would break
    # FK semantics (nationkey is NOT offset in customer/supplier)
    "region": [],
    "nation": [],
}

QUERIES = [
    "q_pricing_summary",
    "q_join_3way",
    "q_window_topk",
    "q_events_hourly_agg",
    "q_dedup_minhash",
    "q_tpch_q5",
    "q_tpch_q18",
]


def build(spark, n: int) -> None:
    os.makedirs(SCRATCH, exist_ok=True)
    for t in TABLES:
        out = f"{SCRATCH}/{t}.parquet"
        if os.path.exists(out):
            continue
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        keys = KEY_COLS[t]
        if not keys:
            df.write.mode("overwrite").parquet(out)
            continue
        # key span per replica: next power of ten above the widest key
        span = max(
            10 ** len(str(int(v)))
            for v in df.agg(*[F.max(k) for k in keys]).collect()[0]
        )
        parts = []
        for i in range(n):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * span))
            parts.append(rep)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(32).write.mode("overwrite").parquet(out)
        print(f"built {t} x{n}", flush=True)


def timed(fn, *args):
    t0 = time.time()
    df = fn(*args)
    df.collect()
    return time.time() - t0


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark()
    build(spark, n)
    print(f"{'query':28s} {'sf0.1':>8s} {'x' + str(n):>8s}  ratio")
    for key in QUERIES:
        fn = REGISTRY[key].fn
        timed(fn, spark, BASE)  # warm (plan + codegen cache)
        t_small = min(timed(fn, spark, BASE) for _ in range(2))
        timed(fn, spark, SCRATCH)
        t_big = min(timed(fn, spark, SCRATCH) for _ in range(2))
        print(
            f"{key:28s} {t_small*1000:7.0f}ms {t_big*1000:7.0f}ms "
            f"{t_big / t_small:6.2f}x",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    rc = main()
    shutil.rmtree(SCRATCH, ignore_errors=True)
    sys.exit(rc)
