"""Scale probe — measure headline-query scaling sf0.1 → ~sf1.

Replicates the sf0.1 corpus N× (key-offset per replica so join/group
cardinalities scale realistically instead of collapsing onto duplicate
keys) into a scratch dir, then times a set of headline queries at both
scales and prints the per-query wall-clock ratio.

A ratio near N on the data-bound queries (scan+agg) and the observed
sub-N ratio on overhead-bound ones is the local[32] evidence behind
SCALE.md's "overhead amortizes, data path scales linearly" claim.

Key offsets are computed per *key domain*, not per table: FK columns
(o_custkey, l_partkey, events.user_id, …) must shift by the same span
as the PK they reference, or cross-table joins only match replica-0
rows and the xN timings understate join work.

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

#: table -> {column: key_domain}. Every column in a domain is offset by
#: the SAME span (the domain-wide max), so FK joins stay valid across
#: replicas: orders.o_custkey shifts exactly like customer.c_custkey,
#: lineitem.l_partkey like part.p_partkey, events.user_id like
#: c_custkey (q_join_asof joins e.user_id = o.o_custkey).
#: region/nation are dimension-stable: replicating them would break FK
#: semantics (nationkey is NOT offset in customer/supplier).
KEY_DOMAINS = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "event_id", "user_id": "custkey"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
    "region": {},
    "nation": {},
}

QUERIES = [
    "q_pricing_summary",
    "q_join_3way",
    "q_window_topk",
    "q_events_hourly_agg",
    "q_tpch_q5",
    "q_tpch_q18",
    # round-6 additions (fixed-parameter contracts; the k-scaled
    # clustering variants are kernel probes below)
    "q_text_paragraph_dedup",
    "q_text_unigram_logprob",
    "q_events_anomaly",
    "q_join_skew_salted",
    "q_tpch_q15",
    # the partsupp/commit-date family: Q2 stresses the (part,supp)
    # offer aggregate, Q9 the 5-way broadcast chain, Q11 the grouped
    # view + scalar gate, Q21 the groupBy(orderkey) EXISTS rewrite.
    "q_tpch_q2",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q21",
]


def _emb(spark, d):
    return spark.read.parquet(f"{d}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _probe_lsh(spark, d):
    """LSH kernel (not the audit contract — that includes the exact
    quadratic reference on purpose). Crossing n=2k→20k moves the band
    auto-scaler r=5→8, the behavior under test."""
    from pyspark.sql import functions as F

    from spype_spark.queries.llm import _emb_double, lsh_ann_topk

    e = (
        spark.read.parquet(f"{d}/embeddings.parquet")
        .repartition(32)
        .select("vec_id", _emb_double().alias("emb"))
    )
    return lsh_ann_topk(e, k=3)


def _probe_cosine_tiled(spark, d):
    """Auto-sized exact tiled GEMM: grid 4→40 blocks across 2k→20k."""
    from spype_spark.ann import cosine_topk_tiled

    return cosine_topk_tiled(_emb(spark, d), k=3)


def _probe_ivf(spark, d):
    from spype_spark.ann import ivf_ann

    return ivf_ann(_emb(spark, d), n_cells=16, nprobe=4, k=3)


def _probe_nndescent(spark, d):
    from spype_spark.ann import ivf_ann, nn_descent_refine

    e = _emb(spark, d)
    return nn_descent_refine(
        e, ivf_ann(e, n_cells=16, nprobe=4, k=3), k=3, n_rounds=1
    )


def _probe_components(spark, d):
    from spype_spark.queries import REGISTRY

    return REGISTRY["q_dedup_components"].fn(spark, d)


def _probe_minhash(spark, d):
    """MinHash candidate kernel (the q_dedup_minhash contract is now a
    containment audit; probe the kernel itself)."""
    from spype_spark.functions import minhash_candidates

    doc = spark.read.parquet(f"{d}/documents.parquet").repartition(32)
    return minhash_candidates(doc, n_hashes=16)


def _probe_kmeans(spark, d):
    """Full Lloyd round with scale-proportional k (GEMM assignment)."""
    from spype_spark.queries.clustering import kmeans_assign

    return kmeans_assign(spark, d).select(
        "vec_id", "cell_id", "score"
    )


def _probe_semdedup(spark, d):
    """SemDeDup with scale-proportional k: cluster + per-cell pair GEMM
    + survivor anti-join."""
    from spype_spark.ann import cell_pairs_threshold
    from spype_spark.queries.clustering import _SEMDEDUP_TAU, kmeans_assign

    a2 = kmeans_assign(spark, d).localCheckpoint(
        eager=False
    )
    dropped = (
        cell_pairs_threshold(
            a2.select("vec_id", "cell_id", "embedding"), _SEMDEDUP_TAU
        )
        .select(F.col("v").alias("vec_id"))
        .distinct()
    )
    return a2.join(dropped, "vec_id", "left_anti").select("vec_id", "cell_id")


#: ANN/dedup kernel probes (VERDICT r5 task 4): callables of (spark,
#: dir), timed like the registry queries.
KERNEL_PROBES = {
    "kmeans[k~n/250]": _probe_kmeans,
    "semdedup[k~n/250]": _probe_semdedup,
    "minhash_candidates": _probe_minhash,
    "lsh_ann_topk[kernel]": _probe_lsh,
    "cosine_topk_tiled[auto]": _probe_cosine_tiled,
    "ivf_ann[kernel]": _probe_ivf,
    "nn_descent[1round]": _probe_nndescent,
    "dedup_components": _probe_components,
}


def domain_spans(spark) -> dict[str, int]:
    """One span per key domain: next power of ten above the widest key
    of ANY column in the domain, across ALL tables that carry it."""
    dom_max: dict[str, int] = {}
    for t, cols in KEY_DOMAINS.items():
        if not cols:
            continue
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        row = df.agg(*[F.max(c) for c in cols]).collect()[0]
        for (c, dom), v in zip(cols.items(), row):
            dom_max[dom] = max(dom_max.get(dom, 0), int(v))
    return {d: 10 ** len(str(m)) for d, m in dom_max.items()}


def build(spark, n: int) -> None:
    # Stamp N into the scratch dir: a crashed run or a run with a
    # different N must not silently reuse stale replicas.
    marker = f"{SCRATCH}/.replicas_n"
    if os.path.exists(marker) and open(marker).read().strip() == str(n):
        return
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    spans = domain_spans(spark)
    print(f"domain spans: {spans}", flush=True)
    for t in TABLES:
        out = f"{SCRATCH}/{t}.parquet"
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        cols = KEY_DOMAINS[t]
        if not cols:
            df.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for i in range(n):
            rep = df
            for c, dom in cols.items():
                rep = rep.withColumn(c, F.col(c) + F.lit(i * spans[dom]))
            parts.append(rep)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(32).write.mode("overwrite").parquet(out)
        print(f"built {t} x{n}", flush=True)
    with open(marker, "w") as f:
        f.write(str(n))


def timed(fn, *args):
    t0 = time.time()
    df = fn(*args)
    df.collect()
    return time.time() - t0


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark()
    build(spark, n)
    import math

    print(f"{'query':28s} {'sf0.1':>8s} {'x' + str(n):>8s}  ratio  exp")
    probes = [(k, REGISTRY[k].fn) for k in QUERIES] + list(
        KERNEL_PROBES.items()
    )
    for key, fn in probes:
        timed(fn, spark, BASE)  # warm (plan + codegen cache)
        t_small = min(timed(fn, spark, BASE) for _ in range(2))
        timed(fn, spark, SCRATCH)
        t_big = min(timed(fn, spark, SCRATCH) for _ in range(2))
        # scaling exponent: t ~ n^exp  =>  exp = log(ratio)/log(N)
        exp = math.log(t_big / t_small) / math.log(n)
        print(
            f"{key:28s} {t_small*1000:7.0f}ms {t_big*1000:7.0f}ms "
            f"{t_big / t_small:6.2f}x {exp:5.2f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
