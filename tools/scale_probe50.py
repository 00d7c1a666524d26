"""50× scale probe for the documents/embeddings kernel families.

Third point on the scaling curve (after SCALE.md's 10× and 20× full-
corpus probes): replicates ONLY documents + embeddings 50× (key-offset
per replica, same shared-key-domain rule as tools/scale_probe.py) and
times the engine-differentiating dedup/ANN kernels. The relational
families already have two probe points with flat exponents; the
banded/blocked kernels are where a third point either confirms the
sub-linear trend or exposes a bucket-occupancy knee.

dedup_components is probed DECOMPOSED (pair-finding vs CC loop): the
replication multiplies duplicate-cluster sizes (50 identical copies of
every base document → C(50,2) intra-cluster candidate pairs), so the
pair stage is deliberately stressed super-proportionally while the
star-contraction loop must stay round-stable.

Usage: python tools/scale_probe50.py [N]   (default N=50)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spype_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
SCRATCH = "/tmp/spype_scale_probe50"

#: same per-domain offset rule as tools/scale_probe.py (domains are
#: table-local here — doc_id and vec_id are not foreign keys).
KEY_COLS = {"documents": "doc_id", "embeddings": "vec_id"}


def build(spark, n: int) -> None:
    marker = f"{SCRATCH}/.replicas_n"
    if os.path.exists(marker) and open(marker).read().strip() == str(n):
        return
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    for t, keycol in KEY_COLS.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        span = 10 ** len(str(df.agg(F.max(keycol)).first()[0]))
        parts = [
            df.withColumn(keycol, F.col(keycol) + F.lit(i * span))
            for i in range(n)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(32).write.mode("overwrite").parquet(
            f"{SCRATCH}/{t}.parquet"
        )
        print(f"built {t} x{n}", flush=True)
    with open(marker, "w") as f:
        f.write(str(n))


def _emb(spark, d):
    return spark.read.parquet(f"{d}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _probe_minhash(spark, d):
    from spype_spark.functions import minhash_candidates

    doc = spark.read.parquet(f"{d}/documents.parquet").repartition(32)
    return minhash_candidates(doc, n_hashes=16)


def _probe_lsh(spark, d):
    from spype_spark.queries.llm import _emb_double, lsh_ann_topk

    e = (
        spark.read.parquet(f"{d}/embeddings.parquet")
        .repartition(32)
        .select("vec_id", _emb_double().alias("emb"))
    )
    return lsh_ann_topk(e, k=3)


def _probe_ivf(spark, d):
    """FIXED 16 cells — the contract's oracle-replayable parameters.
    Super-linear over growing n by construction (per-query candidates
    = nprobe·n/16); kept as the counter-example row."""
    from spype_spark.ann import ivf_ann

    return ivf_ann(_emb(spark, d), n_cells=16, nprobe=4, k=3)


def _probe_ivf_auto(spark, d):
    """Auto-sized cells (occupancy pinned at ~2 500/cell) — the scale
    path; compare against the fixed-cell row above."""
    from spype_spark.ann import ivf_ann

    return ivf_ann(_emb(spark, d), n_cells=None, nprobe=4, k=3)


def _probe_kmeans(spark, d):
    from spype_spark.queries.clustering import kmeans_assign

    return kmeans_assign(spark, d).select(
        "vec_id", "cell_id", "score"
    )


def _probe_semdedup(spark, d):
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


def _probe_minhash_exact_first(spark, d):
    """The production pipeline ORDER: exact dedup (hash groupBy —
    cheap, clone-mass removal) BEFORE near-dup candidates. On a
    clone-heavy corpus (every replica is byte-identical), hash blocking
    alone is output-bound — no banding can split identical texts, and
    their C(c,2) intra-clone pairs are true positives that must be
    emitted. Deduping first removes that irreducible mass."""
    from spype_spark.functions import exact_dedup, minhash_candidates

    doc = spark.read.parquet(f"{d}/documents.parquet").repartition(32)
    return minhash_candidates(exact_dedup(doc), n_hashes=16)


KERNELS = {
    "minhash_candidates": _probe_minhash,
    "minhash[exact-first]": _probe_minhash_exact_first,
    "lsh_ann_topk[kernel]": _probe_lsh,
    "ivf_ann[kernel]": _probe_ivf,
    "ivf_ann[cells~n/2500]": _probe_ivf_auto,
    "kmeans[k~n/250]": _probe_kmeans,
    "semdedup[k~n/250]": _probe_semdedup,
}


def timed(fn, *args):
    t0 = time.time()
    fn(*args).collect()
    return time.time() - t0


def main() -> int:
    import argparse
    import math

    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=50)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated kernel-name substrings to run (skip rest)",
    )
    ap.add_argument(
        "--skip-components",
        action="store_true",
        help="skip the components decomposition (the raw clone-heavy "
        "x50 pair stage needs ~4x the local heap; the exact-first "
        "variant below runs regardless)",
    )
    args = ap.parse_args()
    n = args.n
    wanted = args.only.split(",") if args.only else None
    spark = get_spark("scale-probe50")
    build(spark, n)
    print(f"{'kernel':26s} {'sf0.1':>9s} {'x' + str(n):>9s}  ratio   exp")
    for key, fn in KERNELS.items():
        if wanted and not any(w in key for w in wanted):
            continue
        timed(fn, spark, BASE)  # warm
        t_small = min(timed(fn, spark, BASE) for _ in range(2))
        t_big = timed(fn, spark, SCRATCH)
        ratio = t_big / t_small
        exp = math.log(ratio) / math.log(n)
        print(
            f"{key:26s} {t_small*1000:8.0f}ms {t_big*1000:8.0f}ms "
            f"{ratio:6.2f}x {exp:5.2f}",
            flush=True,
        )

    if wanted and not any(w in "components" for w in wanted):
        return 0

    # dedup_components decomposed: pair stage vs star-contraction loop —
    # in production order (exact dedup first; see _probe_minhash_exact_first
    # for why clone mass must come out before shingle blocking).
    from spype_spark.functions import (
        connected_components,
        exact_dedup,
        ngram_jaccard_pairs,
    )
    from spype_spark.tables import load_table

    configs = [(BASE, "sf0.1", False), (SCRATCH, f"x{n}", True)]
    if not args.skip_components:
        configs.insert(1, (SCRATCH, f"x{n}-raw", False))
    for d, label, exact_first in configs:
        doc = load_table(spark, d, "documents")
        t0 = time.time()
        if exact_first:
            doc = exact_dedup(doc)
        pairs = (
            ngram_jaccard_pairs(doc, min_jaccard=0.5)
            .select("doc_a", "doc_b")
            .localCheckpoint(eager=True)
        )
        t1 = time.time()
        st: dict = {}
        connected_components(pairs, src="doc_a", dst="doc_b", stats=st).collect()
        t2 = time.time()
        print(
            f"components[{label}{'/exact-first' if exact_first else ''}]: "
            f"pairs {t1-t0:6.1f}s  cc {t2-t1:5.1f}s  "
            f"rounds={st['rounds']}  n_pairs={pairs.count()}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
