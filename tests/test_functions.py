"""The composable library surface (spype_spark.functions): every public
function must work on arbitrary user DataFrames — not just the test
corpus — and compose into novel pipelines (the round-1 verdict's
"library, not only a contract harness" bar)."""

import pytest
from pyspark.sql import functions as F

from spype_spark import functions as S


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 1
        (4, "completely different content about spark engines", "en"),
        (5, "short", "en"),  # fewer words than shingle k
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_word_shingles_short_doc_empty(spark, docs):
    out = docs.select("doc_id", F.size(S.word_shingles()).alias("n")).collect()
    got = {r.doc_id: r.n for r in out}
    assert got[5] == 0  # not a descending-sequence artifact
    assert got[1] == 7  # 9 words -> 7 3-shingles


def test_exact_dedup_survivors(docs):
    out = S.exact_dedup(docs)
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 2, 4, 5}  # 3 is the exact dup of 1 (min id survives)
    assert out.columns == docs.columns  # all original columns preserved


def test_near_dedup_drops_higher_id_of_verified_pair(docs):
    out = S.near_dedup(docs, min_jaccard=0.5)
    ids = {r.doc_id for r in out.collect()}
    # 2 and 3 are near/exact dups of 1 -> dropped; 1, 4, 5 survive
    assert ids == {1, 4, 5}


def test_minhash_candidates_on_user_frame(docs):
    cand = {(r.doc_a, r.doc_b) for r in S.minhash_candidates(docs).collect()}
    assert (1, 3) in cand  # exact dup always collides
    assert (1, 2) in cand  # near dup at jaccard ~0.56
    assert all(a < b for a, b in cand)


def test_ngram_jaccard_values(docs):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in S.ngram_jaccard_pairs(docs, min_jaccard=0.1).collect()
    }
    assert got[(1, 3)] == 1.0
    # docs 1/2 share 6 of their 7+7 distinct shingles: 6/(7+7-6) = 0.75
    assert abs(got[(1, 2)] - 0.75) < 1e-12


def test_asof_join_backward_semantics(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("B", 3, 7.0)],
        "sym string, qts long, px double",
    )
    trades = spark.createDataFrame(
        [("A", 0), ("A", 1), ("A", 4), ("A", 9), ("B", 2)],
        "sym string, tts long",
    )
    out = S.asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_cols=["px"],
    )
    got = {(r.sym, r.tts): r.px for r in out.collect()}
    assert got[("A", 0)] is None      # nothing at-or-before
    assert got[("A", 1)] == 10.0      # inclusive <=
    assert got[("A", 4)] == 10.0
    assert got[("A", 9)] == 11.0
    assert got[("B", 2)] is None


def test_band_join_equals_brute_force(spark):
    vals = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 0.37).alias("v")
    )
    a = vals.select(F.col("k").alias("ka"), F.col("v").alias("va"))
    b = vals.select(F.col("k").alias("kb"), F.col("v").alias("vb"))
    banded = {
        (r.ka, r.kb)
        for r in S.band_join(a, b, "va", "vb", band=1.0).collect()
    }
    brute = {
        (r.ka, r.kb)
        for r in a.crossJoin(b)
        .filter(F.abs(F.col("va") - F.col("vb")) <= 1.0)
        .collect()
    }
    assert banded == brute and len(brute) > 200


def test_cosine_topk_on_user_frame(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "my_id long, emb array<double>",
    )
    out = S.cosine_topk(df, k=1, id_col="my_id", emb_col="emb")
    got = {r.src_id: r.nbr_id for r in out.collect()}
    dots = vecs @ vecs.T
    np.fill_diagonal(dots, -np.inf)
    want = {i: int(np.argmax(dots[i])) for i in range(40)}
    assert got == want


def test_facade_only_novel_pipeline(spark, docs):
    """The docstring example shape: dedup a corpus, then rank the
    survivors' embedding neighbors — facade calls only."""
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(5, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    embs = spark.createDataFrame(
        [(i + 1, [float(x) for x in vecs[i]]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    survivors = S.near_dedup(docs, min_jaccard=0.5)
    kept_embs = embs.join(
        survivors.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    nbrs = S.cosine_topk(kept_embs, k=2)
    rows = nbrs.collect()
    ids = {r.src_id for r in rows}
    assert ids == {1, 4, 5}
    assert all(r.nbr_id in {1, 4, 5} and r.nbr_id != r.src_id for r in rows)


def test_connected_components_transitive(spark):
    """A~B, B~C must collapse into one component even though (A,C) was
    never an edge; isolated pairs and chains keep separate labels."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "src long, dst long",
    )
    got = {r.node: r.comp for r in S.connected_components(edges).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
    }


def test_connected_components_self_loop_only_node(spark):
    """Regression (round-8 ADVICE, low): a node appearing ONLY in
    self-loop edges must still get a singleton component row — the
    self-loop filter is a contraction optimization, not a membership
    decision."""
    edges = spark.createDataFrame(
        [(1, 2), (7, 7), (9, 9)], "src long, dst long"
    )
    got = {r.node: r.comp for r in S.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_connected_components_chain_converges_logarithmically(spark):
    """A path graph is the worst case for plain min-label propagation
    (rounds = diameter); pointer doubling must converge a 512-node
    chain in O(log d) rounds, with ids shuffled so label order gives
    no free shortcuts from label order. This is the 100 TB guarantee
    for transitive near-dup chains (SCALE.md dedup_components)."""
    import math
    import random

    n = 512
    ids = list(range(n))
    random.Random(7).shuffle(ids)
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)], "src long, dst long"
    ).coalesce(4)
    stats: dict = {}
    labels = S.connected_components(edges, max_iters=30, stats=stats)
    got = {r.node: r.comp for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}  # one component, min id 0
    # log2(511) ≈ 9; star contraction measures 8 cycles here. Plain
    # propagation would need 511 — anything near 30 means the
    # contraction regressed to hop-at-a-time behavior.
    assert stats["rounds"] <= 2 * math.ceil(math.log2(n)) + 2, stats


def test_dataset_split_deterministic_and_dup_safe(spark, docs):
    out1 = {(r.doc_id, r.split) for r in S.dataset_split(docs).collect()}
    out2 = {
        (r.doc_id, r.split)
        for r in S.dataset_split(docs.repartition(7)).collect()
    }
    assert out1 == out2  # stable under re-partitioning
    by_id = dict(out1)
    assert by_id[1] == by_id[3]  # byte-identical dup -> same split
    assert set(by_id.values()) <= {"train", "valid", "test"}


def test_bloom_no_false_negatives_and_fp_bounded(spark):
    """bloom_build/bloom_might_contain: every member key probes true
    (the hard guarantee); non-member false positives stay under the
    sized rate with margin."""
    from spype_spark.functions import bloom_build, bloom_might_contain

    members = spark.range(0, 5000).select(F.col("id").alias("k"))
    words = bloom_build(members, "k", m_bits=1 << 18, k=5)
    assert len(words) == (1 << 18) // 64
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    got = probe.select(
        "k", bloom_might_contain(words, "k", m_bits=1 << 18, k=5).alias("hit")
    )
    misses = got.filter((F.col("k") < 5000) & ~F.col("hit")).count()
    assert misses == 0, f"{misses} false negatives"
    fp = got.filter((F.col("k") >= 5000) & F.col("hit")).count()
    # theory: (1 - e^(-5*5000/262144))^5 ≈ 4e-6; gate at 1%
    assert fp <= 150, f"false-positive rate too high: {fp}/15000"


def test_cms_never_underestimates_and_bounded(spark):
    """cms_build/cms_estimate: estimates ≥ true counts always, and the
    total overestimate mass stays within the collision bound."""
    from spype_spark.functions import cms_build, cms_estimate

    # skewed counts: key k appears k+1 times, keys 0..199
    items = spark.range(200).select(
        F.explode(F.sequence(F.lit(0), F.col("id"))).alias("seq"),
        F.col("id").alias("k"),
    ).select("k")
    sketch = cms_build(items, "k", width=1024, depth=4)
    n_total = sum(sketch[0])
    assert n_total == items.count()
    got = (
        items.groupBy("k").agg(F.count("*").alias("n"))
        .select("k", "n", cms_estimate(sketch, "k", width=1024).alias("est"))
        .collect()
    )
    assert all(r.est >= r.n for r in got), "underestimate: impossible"
    bound = 2 * 4 * n_total // 1024 + 1
    assert all(r.est <= r.n + bound for r in got)
