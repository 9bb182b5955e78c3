"""Recall gates for the approximate similarity paths: 'correct' must mean
more than 'returns rows'.

The sf0.001 embeddings are random (near-orthogonal — the WORST case for
hyperplane LSH: true top-5 neighbors sit at ~60 deg). Measured recall@5 vs
brute force on this table: planes=8/tables=1 -> 0.02; planes=4/tables=16 ->
0.92; planes=4/tables=32 -> 1.00. The gate pins the 0.9 operating point.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_knn_lsh_recall_vs_bruteforce(spark, emb):
    from replicheck_spark.operators import similarity

    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(emb, n_queries=10, k=5).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_lsh(
            emb, dim=64, n_queries=10, k=5, n_planes=4, n_tables=16
        ).collect()
    }
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.9, f"knn_lsh recall@5 {recall:.3f} < 0.9"


def test_knn_ivf_recall_on_clustered_data(spark):
    """IVF's contract is high recall on CLUSTERED embeddings while scanning
    only nprobe/n_cells of the corpus — that is the regime real embedding
    corpora inhabit and the regime the quantizer exploits. Mixture-of-
    Gaussians data (16 planted clusters), probing 4/16 cells (25% scan):
    recall@5 must still be >= 0.9. (On near-uniform random vectors, e.g. the
    sf0.001 fixture, top-5 cosine neighbors are marginal and genuinely
    scatter across any partition of the space — no IVF can beat the
    nprobe/n_cells baseline there; that regime is covered by the full-probe
    equivalence test below.)"""
    import numpy as np

    from replicheck_spark.operators import similarity

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(16, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, 32, axis=0) + 0.15 * rng.normal(size=(512, 64))
    rows = [(i, [float(x) for x in X[i]], int(i // 32)) for i in range(512)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )

    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_bruteforce(emb, n_queries=10, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_ivf(
            emb, n_queries=10, k=5, n_cells=16, nprobe=4
        ).collect()
    }
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.9, f"knn_ivf recall@5 {recall:.3f} < 0.9 at 25% scan"


def test_knn_ivf_full_probe_equals_bruteforce(spark, emb):
    """Graceful degradation: with nprobe == n_cells every query probes every
    cell, so IVF must return EXACTLY the brute-force top-k — on any data,
    including the near-uniform sf fixture."""
    from replicheck_spark.operators import similarity

    bf = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.knn_bruteforce(emb, n_queries=10, k=5).collect()
    )
    ivf = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.knn_ivf(
            emb, n_queries=10, k=5, n_cells=16, nprobe=16
        ).collect()
    )
    assert ivf == bf


def test_knn_lsh_exhaustive_equals_bruteforce(spark, emb):
    """Graceful degradation, LSH flavor (VERDICT r6 #7): n_planes=0 puts
    every vector in ONE shared bucket, so candidates are all pairs and the
    LSH operator must return EXACTLY the brute-force top-k — on any data.
    This is the construction behind the knn_lsh_exhaustive driver face."""
    from replicheck_spark.operators import similarity

    bf = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.knn_bruteforce(emb, n_queries=10, k=5).collect()
    )
    lsh = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.knn_lsh(
            emb, dim=64, n_queries=10, k=5, n_planes=0, n_tables=1,
            bucket_cap=100_000,
        ).collect()
    )
    assert lsh == bf


def test_knn_ivf_deterministic(spark, emb):
    """Same input -> same neighbor sets on repeated builds: centroid training
    uses the xxhash64-ordered sample and a fixed seed, no runtime RNG."""
    from replicheck_spark.operators import similarity

    def run():
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in similarity.knn_ivf(emb, n_queries=5, k=3).collect()
        )

    assert run() == run()


def test_ivf_cell_occupancy_matches_planted_cells(spark):
    """The occupancy frame must report the PLANTED cell sizes: 4 well-
    separated clusters of known sizes -> spherical k-means with n_cells=4
    recovers them, and ivf_cell_occupancy counts each exactly. Also checks
    every vector lands in exactly one cell (occupancy sums to N)."""
    import numpy as np

    from replicheck_spark.operators import similarity

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sizes = [50, 100, 25, 75]
    rows, vid = [], 0
    for c, sz in zip(range(4), sizes):
        pts = centers[c] + 0.05 * rng.normal(size=(sz, 32))
        for p in pts:
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cent = similarity.train_ivf_centroids(emb, n_cells=4, sample=4096)
    occ = similarity.ivf_cell_occupancy(similarity.ivf_assign(emb, cent))
    got = sorted(r["n_vecs"] for r in occ.collect())
    assert got == sorted(sizes), got
    assert sum(got) == sum(sizes)  # every vector in exactly one cell


def test_auto_n_cells_sqrt_scaling(spark):
    """n_cells=None auto-scales ~sqrt(N) (clamped), and the auto path still
    returns a valid top-k frame."""
    from replicheck_spark.operators import similarity

    assert similarity.auto_n_cells(0) == 4           # floor
    assert similarity.auto_n_cells(100) == 10
    assert similarity.auto_n_cells(1_000_000) == 1000
    assert similarity.auto_n_cells(10**12) == 65536  # centroid-matrix ceiling

    rows = [(i, [float(i % 7), 1.0, 0.5]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.knn_ivf(emb, n_queries=3, k=2, n_cells=None, nprobe=10)
    got = out.collect()
    assert {r["query_id"] for r in got} <= {0, 1, 2}
    assert all(1 <= r["rank"] <= 2 for r in got)


def test_lsh_bucket_truncation_is_metered(spark, emb):
    """A tiny bucket_cap MUST surface overflow in the capped frame — silent
    truncation makes recall loss unattributable."""
    from replicheck_spark.operators import similarity

    pairs, capped = similarity.lsh_bucket_candidates(
        emb, dim=64, n_planes=2, bucket_cap=8, n_tables=1
    )
    total_overflow = sum(r["overflow"] for r in capped.collect())
    # 500 vectors over 4 buckets with cap 8 -> massive metered overflow
    assert total_overflow > 400
    # and the pair list respects the cap: <= C(8,2) pairs per bucket * 4
    assert pairs.count() <= 4 * 28


def test_simhash_agrees_with_hamming_on_oracle_signatures(spark):
    """SimHash contract: for every emitted pair, hamming == the Hamming
    distance between independently recomputed per-doc simhashes (pure-numpy
    path, no Spark) — strengthens the rows-only driver check."""
    import numpy as np

    from replicheck_spark.config import DedupConfig
    from replicheck_spark.functions.hashing import shingle_hash_set
    from replicheck_spark.functions.minhash import simhash_flat
    from replicheck_spark.functions.textnorm import tokenize
    from replicheck_spark.operators import dedup_ops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = DedupConfig()
    pairs = dedup_ops.simhash_pairs(docs, cfg).collect()
    assert pairs, "expected at least one simhash pair on sf0.001"
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    def sim(doc_id: int) -> int:
        sh = shingle_hash_set(tokenize(texts[doc_id]), cfg.shingle_k)
        off = np.array([0, len(sh)], dtype=np.int64)
        return int(simhash_flat(sh, off)[0])

    for r in pairs:
        expect = bin(sim(r["a"]) ^ sim(r["b"])).count("1")
        assert r["hamming"] == expect, (r["a"], r["b"], r["hamming"], expect)
        assert r["hamming"] <= cfg.hamming_max


def test_embedding_dup_pairs_lsh_branch_matches_bruteforce(spark):
    """The 10^12-scale branch of embedding_dup_pairs (LSH buckets + in-bucket
    confirm) must find the same pairs as the broadcast-BLAS branch on a
    planted corpus: broadcast_bytes_limit=1 forces the bucketed path.

    Planted near-dups sit at cos ~0.9995 (theta ~ 0.018 rad -> per-12-plane-
    table bucket-collision ~0.93; miss over 8 tables ~1e-9), and random
    32-dim background pairs sit at |cos| ~ 0.18 << 0.95 — so both branches
    deterministically (seeded planes, fixed vectors) return exactly the
    planted set.
    """
    import numpy as np

    from replicheck_spark.operators import similarity

    rs = np.random.RandomState(7)
    rows, expected, vid = [], set(), 0
    for i in range(40):
        v = rs.randn(32)
        v /= np.linalg.norm(v)
        a_id = vid
        rows.append((vid, [float(x) for x in v]))
        vid += 1
        if i % 4 == 0:
            w = v + 0.02 * rs.randn(32)
            w /= np.linalg.norm(w)
            rows.append((vid, [float(x) for x in w]))
            expected.add((a_id, vid))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    bf = {
        (r["a"], r["b"])
        for r in similarity.embedding_dup_pairs(emb, 0.95).collect()
    }
    lsh = {
        (r["a"], r["b"])
        for r in similarity.embedding_dup_pairs(
            emb, 0.95, broadcast_bytes_limit=1, n_planes=12, n_tables=8
        ).collect()
    }
    assert bf == expected
    assert lsh == bf


def test_embedding_dup_pairs_build_is_lazy(spark):
    """Building the LSH-branch query must NOT run the bucketing: round 2
    executed an eager overflow .first() at construction time (one full extra
    job per build). Only the cheap n/dim path-decision agg may run."""
    import numpy as np

    from replicheck_spark.operators import similarity

    rs = np.random.RandomState(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rs.randn(16)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = similarity.embedding_dup_pairs(emb, 0.95, broadcast_bytes_limit=1)
    mid = len(tracker.getJobIdsForGroup(None) or [])
    df.count()
    after = len(tracker.getJobIdsForGroup(None) or [])
    # construction may run the two cheap path-decision probes — a count()
    # (parquet metadata fast path on real tables) and a head(1) for dim (one
    # row) — plus the bucket table's lazy localCheckpoint, which under AQE
    # materializes the upstream exchange stages at build (one job per
    # exchange: two since the salted two-level agg; those stages are REUSED
    # by the action, so total work is unchanged — the round-2 regression
    # this test guards against was a full EXTRA job recomputing the
    # bucketing at build). Budget: 2 (count) + 1 (head) + 2 (exchanges) + 1
    # slack.
    built_jobs = mid - before
    exec_jobs = after - mid
    assert built_jobs <= 6, (
        f"embedding_dup_pairs construction ran {built_jobs} jobs"
    )
    assert exec_jobs >= 1, "confirm should execute at action time"
