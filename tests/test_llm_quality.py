"""Quality properties of the approximate LLM-data operators.

Everything here is deterministic (fixed-seed hashing, fixed corpus),
so recall floors are exact regression guards, not flaky statistics:
if a refactor silently changes banding or bucketing, recall shifts
and these fail.
"""

import os

import pytest
from pyspark.sql import functions as F

from spype_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def exact_topk(spark):
    df = REGISTRY["q_sim_cosine_topk"].fn(spark, SF)
    return {(r.src_id, r.nbr_id) for r in df.collect() if r.rank <= 3}


def _emb(spark):
    from spype_spark.tables import load_table

    return load_table(spark, SF, "embeddings").select("vec_id", "embedding")


def _ivf(spark):
    """IVF kernel neighbor list (the audit contracts wrap this; tests
    pin its recall directly)."""
    from spype_spark.ann import ivf_ann

    return ivf_ann(_emb(spark), n_cells=16, nprobe=4, k=3)


def _ivfpq(spark):
    from spype_spark.ann import ivf_pq_ann

    return ivf_pq_ann(_emb(spark), n_cells=16, nprobe=4, k=3)


def _nnd(spark):
    from spype_spark.ann import ivf_ann, nn_descent_refine

    e = _emb(spark)
    return nn_descent_refine(
        e, ivf_ann(e, n_cells=16, nprobe=4, k=3), k=3, n_rounds=1
    )


def test_minhash_finds_high_jaccard_pairs(spark):
    """Every pair with 3-gram Jaccard ≥ 0.5 must surface as a MinHash
    candidate (b=8, r=2 ⇒ P(candidate) ≈ 97% at s=0.5; with these
    fixed seeds and corpus the set relationship is exact)."""
    from spype_spark.functions import minhash_candidates
    from spype_spark.tables import load_table

    jac = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_dedup_ngram_jaccard"].fn(spark, SF).collect()
        if r.jaccard >= 0.5
    }
    d = load_table(spark, SF, "documents").repartition(32)
    cand = {
        (r.doc_a, r.doc_b) for r in minhash_candidates(d, n_hashes=16).collect()
    }
    missed = jac - cand
    assert not missed, f"minhash missed high-jaccard pairs: {sorted(missed)[:5]}"
    # and the audit contract itself must report containment intact
    audit = REGISTRY["q_dedup_minhash"].fn(spark, SF).collect()[0]
    assert audit.all_high_found and audit.n_high_pairs == len(jac)


def test_lsh_ann_recall_floor(spark, exact_topk):
    """Banded hyperplane-LSH top-3 must recover a fixed fraction of the
    exact top-3 (history on this near-uniform corpus: 0.019 with a
    single 8-plane band → 0.349 with 8 bands × 6 planes → 0.688 with
    the round-3 auto-scaler picking r = 4 at n = 500, whose wider
    buckets admit more candidates at this toy scale; the floor guards
    against silent banding regressions)."""
    from spype_spark.queries.llm import _emb_double, lsh_ann_topk
    from spype_spark.tables import load_table

    e = (
        load_table(spark, SF, "embeddings")
        .repartition(32)
        .select("vec_id", _emb_double().alias("emb"))
    )
    got = {(r.src_id, r.nbr_id) for r in lsh_ann_topk(e, k=3).collect()}
    recall = len(got & exact_topk) / len(exact_topk)
    assert recall >= 0.60, f"LSH recall collapsed: {recall:.3f}"


def test_ivf_ann_recall_floor(spark, exact_topk):
    got = {(r.src_id, r.nbr_id) for r in _ivf(spark).collect()}
    # measured 0.518 at nprobe=4 (2026-08-13)
    recall = len(got & exact_topk) / len(exact_topk)
    assert recall >= 0.45, f"IVF recall collapsed: {recall:.3f}"


def test_ivf_never_beats_exact(spark, exact_topk):
    """Approximate rank-1 cosine can never exceed the exact rank-1."""
    exact1 = {
        r.src_id: r.cosine
        for r in REGISTRY["q_sim_cosine_topk"].fn(spark, SF).collect()
        if r.rank == 1
    }
    for r in _ivf(spark).collect():
        if r.rank == 1:
            assert r.cosine <= exact1[r.src_id] + 1e-9


def test_tiled_gemm_equals_broadcast_gemm(spark):
    """The broadcast-free tiled decomposition must be exactly the
    brute-force answer — same pairs, same rounded cosines, same ranks."""
    tiled = {
        (r.src_id, r.nbr_id, r.cosine, r.rank)
        for r in REGISTRY["q_sim_cosine_tiled"].fn(spark, SF).collect()
    }
    exact = {
        (r.src_id, r.nbr_id, r.cosine, r.rank)
        for r in REGISTRY["q_sim_cosine_topk"].fn(spark, SF).collect()
    }
    assert tiled == exact


def test_minhash_hot_bucket_capped(spark, tmp_path):
    """Adversarial skew guard: a spam cluster of m identical-ish docs
    sharing one band bucket must NOT produce m²/2 candidate pairs. The
    guard drops buckets over LSH_BUCKET_CAP, so the pair count stays
    bounded by the normal corpus; exact dedup remains the path that
    collapses such clusters."""
    from spype_spark.functions import minhash_candidates
    from spype_spark.queries.llm import LSH_BUCKET_CAP

    n_spam = LSH_BUCKET_CAP + 44  # one bucket over cap
    spam = [
        (100000 + i, "buy cheap pills now best price online today offer", "en", "spam", 48)
        for i in range(n_spam)
    ]
    normal = [
        (
            200000 + i,
            f"unique document {i} talking about topic {i * 7} with words {i * 13}",
            "en",
            "web",
            60,
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(
        spam + normal, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    docs = spark.read.parquet(str(tmp_path / "documents.parquet")).repartition(32)
    pairs = minhash_candidates(docs, n_hashes=16)
    n_pairs = pairs.count()
    # without the guard this would be ≥ n_spam*(n_spam-1)/2 ≈ 45k pairs
    assert n_pairs < n_spam, f"hot bucket not capped: {n_pairs} pairs"
    # spam-cluster pairs specifically are gone
    spam_pairs = pairs.filter(
        (F.col("doc_a") >= 100000) & (F.col("doc_b") < 200000)
    ).count()
    assert spam_pairs == 0


def test_minhash_guard_noop_on_normal_corpus(spark):
    """The cap must be invisible on the real corpus: bucket sizes here
    are far below LSH_BUCKET_CAP, so the guarded pair set equals the
    unguarded one (pinned by the recall test above plus this count)."""
    from spype_spark.functions import minhash_candidates
    from spype_spark.tables import load_table

    # guarded run (the kernel the audit contract wraps)
    d = load_table(spark, SF, "documents").repartition(32)
    n_guarded = minhash_candidates(d, n_hashes=16).count()
    assert n_guarded > 0
    # the recall test asserts every jaccard≥0.5 pair still surfaces;
    # here just pin the corpus-wide candidate count so a silently
    # stricter guard would fail loudly
    # measured 37 candidate pairs at sf0.01 with the guard (2026-08-13),
    # identical to the unguarded count — the cap is a no-op here
    assert n_guarded >= 37, f"guard dropped normal-corpus pairs: {n_guarded}"


def test_no_driver_collect_in_package():
    """Scale guard: no driver-side .collect() anywhere in the package
    except (a) the pipeline DSL's explicit action API (dsl.py) and
    (b) lines carrying the explicit ``metadata-sized collect`` marker —
    collects whose result is bounded by a DIMENSION (distinct partition
    values of a mutation's update set), not by the data. The round-1
    embedding kernels collected the whole table on the driver — this
    pins the fix, and the marker keeps every exemption a reviewed,
    greppable decision rather than a silent hole."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "spype_spark"
    offenders = []
    for p in sorted(root.rglob("*.py")):
        lines = p.read_text().splitlines()
        for i, line in enumerate(lines, 1):
            if ".collect()" not in line:
                continue
            stripped = line.strip()
            if stripped.startswith("#") or "``" in line:
                continue  # comment / docstring mention
            if p.name == "dsl.py":
                continue  # the explicit Pype action API
            window = "\n".join(lines[max(0, i - 5) : i])
            if "metadata-sized collect" in window:
                continue  # reviewed dimension-bounded collect
            offenders.append(f"{p.name}:{i}: {stripped}")
    assert not offenders, f"driver-side collect() in hot path: {offenders}"


def test_exact_dedup_is_lossless(spark):
    """Exact dedup must preserve every distinct text exactly once."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    n_distinct = d.select("text").distinct().count()
    out = REGISTRY["q_dedup_exact"].fn(spark, SF)
    assert out.count() == n_distinct
    assert out.agg(F.sum("n_copies")).collect()[0][0] == d.count()

def test_pq_encode_quality_and_determinism(spark):
    """PQ codes: (a) in range, 8 per vector; (b) reconstruction error
    strictly no worse than always-code-0 (argmin property); (c) stable
    under repartitioning (window argmin has a deterministic tiebreak)."""
    from spype_spark.ann import pq_encode

    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    out = pq_encode(e, n_subspaces=8, n_codes=16).collect()
    assert len(out) == e.count()
    for r in out[:50]:
        codes = [int(c) for c in r.codes.split(",")]
        assert len(codes) == 8 and all(0 <= c < 16 for c in codes)
        assert r.err2 >= 0.0
    # (b) argmin beats the fixed-code-0 baseline in aggregate
    import numpy as np

    rows = {r.vec_id: r for r in e.collect()}
    cents = np.array(
        [rows[v].embedding for v in sorted(rows)[:16]], dtype=np.float64
    )
    total_err = sum(r.err2 for r in out)
    base_err = 0.0
    for v, r in rows.items():
        x = np.array(r.embedding, dtype=np.float64)
        base_err += sum(
            float(np.sum((x[s * 8:(s + 1) * 8] - cents[0, s * 8:(s + 1) * 8]) ** 2))
            for s in range(8)
        )
    assert total_err < base_err
    # (c) determinism under different partitioning
    out2 = {
        r.vec_id: (r.codes, r.err2)
        for r in pq_encode(e.repartition(17), n_subspaces=8, n_codes=16).collect()
    }
    assert {r.vec_id: (r.codes, r.err2) for r in out} == out2


def test_lsh_band_width_scaling_law():
    """The auto-scaler keeps expected bucket occupancy bounded: for any
    corpus size until the 16-bit cap, n / 2^r ≤ 2 × target (the factor
    2 absorbs the ceil), with the tuned sf0.1 width as fixpoint."""
    from spype_spark.queries.llm import (
        _LSH_MAX_PLANES,
        _LSH_TARGET_BUCKET,
        lsh_planes_per_band,
    )

    assert lsh_planes_per_band(5_000) == 6  # sf0.1 fixpoint
    for n in (1, 500, 5_000, 50_000, 500_000, 5_000_000):
        r = lsh_planes_per_band(n)
        assert 4 <= r <= _LSH_MAX_PLANES
        assert n / 2**r <= 2 * _LSH_TARGET_BUCKET, (n, r)
    # beyond the cap the scaler saturates (documented IVF handoff)
    assert lsh_planes_per_band(10**9) == _LSH_MAX_PLANES


def test_lsh_bucket_p99_bounded_at_10x(spark):
    """Empirical 10× check (sf0.1, n = 5 000): the p99 band bucket
    stays within 4× the target occupancy, so the per-band candidate
    stage costs ≈ n·target pairs, not (n/2^r_fixed)² — the property
    that makes the LSH path survive another 10×."""
    from spype_spark.queries.llm import (
        _LSH_TARGET_BUCKET,
        _emb_double,
        lsh_band_signatures,
        lsh_planes_per_band,
    )
    from spype_spark.tables import load_table

    e = (
        load_table(spark, "/root/testdata/sf0.1", "embeddings")
        .repartition(32)
        .select("vec_id", _emb_double().alias("emb"))
    )
    r = lsh_planes_per_band(e.count())
    sizes = lsh_band_signatures(e, r).groupBy("band", "bucket").count()
    p99 = sizes.agg(F.percentile("count", F.lit(0.99)).alias("p")).collect()[0].p
    assert p99 <= 4 * _LSH_TARGET_BUCKET, f"p99 bucket {p99}"


def test_ivfpq_recall_floor(spark, exact_topk):
    """IVF-PQ (ADC over 64×-compressed codes + exact re-rank) must hold
    the same recall floor as plain IVF at equal nprobe — the refine
    depth (8k per query·cell; measured 0.507 vs IVF's 0.518) is what
    buys back the ADC approximation loss."""
    got = {(r.src_id, r.nbr_id) for r in _ivfpq(spark).collect()}
    recall = len(got & exact_topk) / len(exact_topk)
    assert recall >= 0.45, f"IVF-PQ recall collapsed: {recall:.3f}"


def test_ivfpq_never_beats_exact(spark, exact_topk):
    """Re-ranked cosines are TRUE dots, so rank-1 can never exceed the
    exact rank-1 (the ADC stage only selects, never scores output)."""
    exact1 = {
        r.src_id: r.cosine
        for r in REGISTRY["q_sim_cosine_topk"].fn(spark, SF).collect()
        if r.rank == 1
    }
    for r in _ivfpq(spark).collect():
        if r.rank == 1:
            assert r.cosine <= exact1[r.src_id] + 1e-9


def test_nndescent_refines_ivf_seed(spark, exact_topk):
    """One NN-descent round over the IVF seed graph must lift recall
    well above the seed (measured 0.518 → 0.723; floor 0.65 leaves
    noise margin) — the neighbor-of-a-neighbor expansion is doing real
    work, not just re-ranking the seed edges."""
    got = {(r.src_id, r.nbr_id) for r in _nnd(spark).collect()}
    recall = len(got & exact_topk) / len(exact_topk)
    assert recall >= 0.65, f"NN-descent refinement collapsed: {recall:.3f}"


def test_nndescent_never_beats_exact(spark, exact_topk):
    """Refined cosines are true dots; rank-1 bounded by exact rank-1."""
    exact1 = {
        r.src_id: r.cosine
        for r in REGISTRY["q_sim_cosine_topk"].fn(spark, SF).collect()
        if r.rank == 1
    }
    for r in _nnd(spark).collect():
        if r.rank == 1:
            assert r.cosine <= exact1[r.src_id] + 1e-9


def test_ivfpq_and_nndescent_partitioning_invariant(spark):
    """The new ANN kernels must give identical results regardless of
    input partitioning (sort_array'd tiles, deterministic tie-breaks,
    seed-set codebooks — same invariance contract as the tiled GEMM)."""
    from spype_spark.ann import ivf_pq_ann, ivf_ann, nn_descent_refine

    e1 = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    e2 = e1.repartition(7, "vec_id")

    def runs(fn):
        return [
            {(r.src_id, r.nbr_id, r.cosine, r.rank) for r in fn(e).collect()}
            for e in (e1, e2)
        ]

    a, b = runs(lambda e: ivf_pq_ann(e, n_cells=16, nprobe=4, k=3))
    assert a == b
    a, b = runs(
        lambda e: nn_descent_refine(
            e, ivf_ann(e, n_cells=16, nprobe=4, k=3), k=3, n_rounds=1
        )
    )
    assert a == b


def test_auto_blocks_tracks_vector_count(spark):
    """The auto-sized tile grid must scale with n (target ~TILE_TARGET
    vectors/tile), clamp to >=1 for tiny inputs, and cap at MAX_BLOCKS
    so the B^2 grid stays schedulable — and an explicit n_blocks must
    yield the identical answer (tiling is schedule, not semantics)."""
    from pyspark.sql import functions as F

    from spype_spark.ann import (
        MAX_BLOCKS,
        TILE_TARGET,
        _auto_blocks,
        cosine_topk_tiled,
    )
    from spype_spark.tables import load_table

    for n, want in [(1, 1), (TILE_TARGET, 1), (TILE_TARGET + 1, 2),
                    (TILE_TARGET * MAX_BLOCKS * 3, MAX_BLOCKS)]:
        e = spark.range(n).select(F.col("id").alias("vec_id"))
        assert _auto_blocks(e) == want, (n, want)

    emb = load_table(spark, SF, "embeddings")
    auto = {
        (r.src_id, r.nbr_id, r.cosine, r.rank)
        for r in cosine_topk_tiled(emb, k=3).collect()
    }
    explicit = {
        (r.src_id, r.nbr_id, r.cosine, r.rank)
        for r in cosine_topk_tiled(emb, k=3, n_blocks=7).collect()
    }
    assert auto == explicit


def test_recall_audit_primitive(spark):
    """Unit-level pin of the audit-row primitive every ANN contract now
    rides on: exact-side stats, the order-independent micro sum, and
    the floor semantics of recall_ok (hits >= pairs * floor)."""
    from spype_spark.ann import recall_audit

    exact = spark.createDataFrame(
        [(1, 2, 0.9, 1), (1, 3, 0.5, 2), (2, 1, -0.25, 1), (2, 3, -0.5, 2)],
        "src_id long, nbr_id long, cosine double, rank int",
    )
    approx = spark.createDataFrame(
        [(1, 2, 0.9, 1), (2, 1, -0.25, 1), (9, 9, 0.0, 1)],
        "src_id long, nbr_id long, cosine double, rank int",
    )
    row = recall_audit(exact, approx, floor=0.5).collect()[0]
    assert row.n_src == 2 and row.n_exact_pairs == 4
    # floor(c*1e6 + 0.5): 900000 + 500000 + (-250000) + (-500000)
    assert row.sum_cos_micro == 650000
    assert row.recall_ok  # 2 hits of 4 pairs == exactly the 0.5 floor
    row2 = recall_audit(exact, approx, floor=0.51).collect()[0]
    assert not row2.recall_ok  # just above the achieved recall -> red


def test_nndescent_on_clustered_embeddings(spark):
    """The corpus's embeddings are near-uniform (recall is data-limited,
    ROADMAP); this test builds SYNTHETIC clustered vectors — 20 tight
    clusters on the unit sphere — and measures the claims the docstrings
    make about real embedding geometry:

    1. clustered data: IVF(nprobe=2) seeds at ~0.93 recall@3 and
       NN-descent rounds climb it (0.98 round 1, 0.99 round 2) — the
       "climbs steeply on clustered corpora" claim, now measured;
    2. seed DIVERSITY is load-bearing: an nprobe=1 seed has no
       cross-cell edges, so neighbor-of-neighbor expansion can never
       reach true neighbors in adjacent cells — recall stays flat at
       its graph-reachable ceiling no matter how many rounds run. The
       production guidance (seed with multi-probe or add random
       edges) exists because of exactly this failure mode.
    """
    import numpy as np

    from spype_spark.ann import ivf_ann, nn_descent_refine

    rng = np.random.RandomState(7)
    centers = rng.normal(0, 1, (20, 16))
    pts = np.vstack([c + rng.normal(0, 0.15, (30, 16)) for c in centers])
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    n = len(pts)
    sims = pts @ pts.T
    np.fill_diagonal(sims, -2)
    exact = {i: set(np.argsort(-sims[i])[:3].tolist()) for i in range(n)}
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )

    def recall(res):
        got = {}
        for r in res.collect():
            got.setdefault(r.src_id, set()).add(r.nbr_id)
        return sum(len(got.get(i, set()) & exact[i]) for i in range(n)) / (
            3 * n
        )

    seed2 = ivf_ann(df, n_cells=16, nprobe=2, k=3)
    r_seed = recall(seed2)
    g1 = nn_descent_refine(df, seed2, k=3, n_rounds=1)
    r1 = recall(g1)
    r2 = recall(nn_descent_refine(df, g1, k=3, n_rounds=1))
    assert r_seed >= 0.90  # clusters align with cells
    assert r1 >= r_seed + 0.03  # a round genuinely climbs
    assert r2 >= 0.98  # near-exact by round 2 on clustered geometry

    # diversity failure mode: single-probe seed graph is cell-disconnected
    seed1 = ivf_ann(df, n_cells=16, nprobe=1, k=3)
    r_seed1 = recall(seed1)
    r_after = recall(nn_descent_refine(df, seed1, k=3, n_rounds=2))
    assert r_after <= r_seed1 + 0.02, (
        "nn-descent should NOT be able to climb a cell-disconnected seed"
    )


def test_semdedup_auto_k_scaling_law():
    """The clustering autoscaler holds mean cell occupancy at
    _CELL_TARGET for any corpus size: k = max(8, n // 250), with k = 8
    exactly at every committed SF (500 / 2 000 vectors — contract
    results unchanged) and k ∝ n beyond."""
    from spype_spark.queries.clustering import _CELL_TARGET, _K_MIN

    law = lambda n: max(_K_MIN, n // _CELL_TARGET)
    assert law(500) == 8 and law(2_000) == 8  # committed-SF fixpoints
    for n in (40_000, 100_000, 1_000_000, 100_000_000):
        k = law(n)
        assert n / k <= 2 * _CELL_TARGET, (n, k)


@pytest.mark.skipif(
    not os.path.exists("/tmp/spype_scale_probe/.replicas_n"),
    reason="20x replica scratch not built (tools/scale_probe.py)",
)
def test_semdedup_cell_p99_bounded_at_20x(spark):
    """Empirical 20× check (n = 40 000, auto k = 160): the weighted
    mean cell (Σ|cell|²/n — the pair stage's effective blocking factor)
    and the p99 cell both stay within 2× the 250-vector target, so
    SemDeDup's quadratic stage costs ≈ n·target pairs at scale, not
    (n/8)² — the property the k ∝ n autoscaler exists to buy.
    Measured: k=160, weighted mean 266.6, p99 388, max 420."""
    from spype_spark.queries.clustering import _CELL_TARGET, kmeans_assign

    sizes = (
        kmeans_assign(spark, "/tmp/spype_scale_probe")
        .groupBy("cell_id")
        .count()
    )
    row = sizes.agg(
        F.count("*").alias("k"),
        F.sum("count").alias("n"),
        F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
        F.percentile("count", F.lit(0.99)).alias("p99"),
    ).first()
    assert row.k == max(8, row.n // _CELL_TARGET)
    assert row.sum_sq / row.n <= 2 * _CELL_TARGET, row
    assert row.p99 <= 2 * _CELL_TARGET, row


def test_char_entropy_bounds_and_extremes(spark):
    """H ∈ [0, ln(alphabet)]: a one-char doc scores exactly 0; a
    uniform-alphabet doc scores exactly ln(k)."""
    import math

    df = spark.createDataFrame(
        [(0, "aaaaaaaa"), (1, "abcdabcdabcd"), (2, "x")],
        "doc_id long, text string",
    )
    import tempfile, os, shutil
    tmp = tempfile.mkdtemp()
    try:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {
            r["doc_id"]: r["char_entropy"]
            for r in REGISTRY["q_text_entropy"].fn(spark, tmp).collect()
        }
        assert out[0] == 0.0
        assert out[2] == 0.0
        assert abs(out[1] - math.log(4)) < 1e-5
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Clustered-corpus recall floors (VERDICT r11 task 8; ROADMAP
# known-limitation since r3). The corpus embeddings are near-uniform —
# the HARD regime for cell/bucket methods (neighbors spread across
# cells; uniform floors above sit at 0.45-0.65). Real embedding
# corpora cluster, and on clustered data the same kernels must recover
# near-exact neighbors: vectors drawn around 16 unit centers
# (deterministic RandomState(7) mixture, 500×64 like the corpus) give
# measured recall@3 of 0.931 (IVF), 0.975 (NN-descent), 0.809 (LSH)
# vs 0.518/0.68/0.688 uniform — the floors below pin that climb.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_emb(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    C, n, d = 16, 500, 64
    centers = rng.normal(size=(C, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        v = centers[i % C] + 0.18 * rng.normal(size=d)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8).localCheckpoint()


@pytest.fixture(scope="module")
def clustered_exact(spark, clustered_emb):
    from spype_spark.ann import cosine_topk_tiled

    return {
        (r.src_id, r.nbr_id)
        for r in cosine_topk_tiled(clustered_emb, k=3).collect()
        if r.rank <= 3
    }


def test_ivf_recall_climbs_on_clustered_corpus(spark, clustered_emb,
                                               clustered_exact):
    """With vec_ids round-robin over clusters, the 16 seed centroids
    land one per cluster and IVF cells ≈ true clusters — recall must
    sit near 1, far above the uniform-corpus floor (0.45)."""
    from spype_spark.ann import ivf_ann

    got = {
        (r.src_id, r.nbr_id)
        for r in ivf_ann(clustered_emb, n_cells=16, nprobe=4, k=3).collect()
    }
    recall = len(got & clustered_exact) / len(clustered_exact)
    assert recall >= 0.88, f"clustered IVF recall collapsed: {recall:.3f}"


def test_nndescent_recall_climbs_on_clustered_corpus(spark, clustered_emb,
                                                     clustered_exact):
    """One NN-descent round over the IVF seed graph on clustered data
    must push recall near exact (measured 0.975) — neighbors-of-
    neighbors is exactly the regime cluster structure rewards."""
    from spype_spark.ann import ivf_ann, nn_descent_refine

    seed = ivf_ann(clustered_emb, n_cells=16, nprobe=4, k=3)
    got = {
        (r.src_id, r.nbr_id)
        for r in nn_descent_refine(
            clustered_emb, seed, k=3, n_rounds=1
        ).collect()
    }
    recall = len(got & clustered_exact) / len(clustered_exact)
    assert recall >= 0.93, f"clustered NN-descent recall collapsed: {recall:.3f}"


def test_lsh_recall_climbs_on_clustered_corpus(spark, clustered_emb,
                                               clustered_exact):
    """Hyperplane LSH on clustered data: same-cluster vectors agree on
    most hyperplane signs, so banded buckets capture them (measured
    0.809 vs 0.688 uniform)."""
    from spype_spark.queries.llm import lsh_ann_topk

    e = clustered_emb.selectExpr("vec_id", "embedding AS emb")
    got = {(r.src_id, r.nbr_id) for r in lsh_ann_topk(e, k=3).collect()}
    recall = len(got & clustered_exact) / len(clustered_exact)
    assert recall >= 0.72, f"clustered LSH recall collapsed: {recall:.3f}"
