"""Similarity search over an embedding column (`embeddings` table:
vec_id bigint, embedding array<float>, label int).

* brute-force cosine top-k: JVM-side zip_with/aggregate dot products — the
  correctness baseline, O(Q*N) but fully distributed (query side broadcast).
* random-hyperplane LSH buckets: a scale path — sign-bit sketch over seeded
  hyperplanes groups vectors into buckets; candidates only within a bucket.
  At 10^12 vectors the bucket join replaces the full cross product; recall is
  tunable via n_planes / n_tables.
* IVF coarse quantizer: the second scale path — spherical k-means cells
  (trained on a deterministic driver-side sample), corpus assigned to one
  cell, queries probe nprobe cells; per-query work is nprobe/n_cells of the
  corpus.
* embedding near-dup pairs: cosine >= threshold among all pairs (broadcast
  the smaller side / AQE otherwise).

Rank outputs are integer; cosine values are kept out of oracle-compared
columns (float summation order differs across engines — ranks don't).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F, types as T

from replicheck_spark.functions.hashing import U64


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(c: str):
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a: str, b: str):
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Top-k cosine neighbors for the first n_queries vectors (vec_id <
    n_queries): (query_id, neighbor_id, rank). Query side is tiny ->
    broadcast; candidate scan is one pass over the corpus."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_col("q_emb", "c_emb"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_dup_pairs(
    emb: DataFrame, threshold: float = 0.95,
    broadcast_bytes_limit: int = 256 * 1024 * 1024,
    n_planes: int = 12, n_tables: int = 4, observation=None,
) -> DataFrame:
    """Near-duplicate vector pairs: cosine >= threshold, a < b.

    Small/medium corpora (normalized float64 matrix under
    ``broadcast_bytes_limit``): pull the matrix to the driver via one Arrow
    ``toPandas`` transfer, broadcast it, and let every partition compute
    chunk x matrix cosine in one BLAS matmul — measured ~50x faster than a
    cross join with interpreted zip_with/aggregate lambdas. Beyond the limit,
    run ``lsh_bucket_candidates`` first and confirm only within buckets (the
    10^12-scale path; pytest-gated against brute force on a planted corpus).

    One metadata job decides the path: count and dim come from a single agg
    (no separate count()/first() actions), and the limit is BYTES
    (n * dim * 8), not a row count — 200k rows of 768-dim vectors is ~1.2 GB
    and must NOT go down the broadcast path.

    Threshold membership is a float comparison whose summation order differs
    across engines (numpy BLAS here vs e.g. DuckDB list_cosine_similarity in
    the oracle): a pair landing EXACTLY at the threshold can flip. Keep
    planted fixtures clear of the threshold (or compare ranks) when using
    this operator in an exact-parity gate.
    """
    import pandas as pd
    from pyspark.sql import types as T

    def _zero_observe(df: DataFrame) -> DataFrame:
        # The broadcast path has no buckets and therefore no truncation, but
        # a caller that passed an Observation will drain it after the action
        # — attach a constant-zero overflow_total so Observation.get resolves
        # instead of blocking forever on a plan it was never part of.
        if observation is None:
            return df
        return df.observe(
            observation,
            F.coalesce(F.sum(F.lit(0)), F.lit(0)).alias("overflow_total"),
        )

    # Path decision: count(*) alone stays on parquet's metadata fast path
    # (no column read); dim comes from ONE row. The former single
    # agg(count, first(size(embedding))) forced a full scan of the array
    # column — the whole table read once just to pick a branch.
    n = emb.count()
    if n == 0:
        return _zero_observe(
            emb.sparkSession.createDataFrame([], "a long, b long")
        )
    dim_row = emb.select(F.size("embedding").alias("d")).head(1)
    dim = dim_row[0]["d"]
    if n * dim * 8 > broadcast_bytes_limit:
        # the 10^12-scale path: bucketed candidates (never all-pairs),
        # exact-cosine confirm within buckets. n_tables independent plane
        # sets keep recall high for genuine near-dups: at cos >= 0.95
        # (theta <= 0.32 rad) a pair lands in the same 12-plane bucket with
        # p >= (1 - theta/pi)^12 ~ 0.28 per table -> miss <= 0.27 at 4
        # tables, and real near-dup corpora sit far above the threshold
        # (cos ~ 0.99 -> p ~ 0.57/table, miss ~ 3%). Tune n_tables up for a
        # tighter bound; tests/test_similarity_recall.py gates parity with
        # brute force on a planted corpus via this exact branch.
        cands, capped = lsh_bucket_candidates(
            emb, dim=dim, n_planes=n_planes, n_tables=n_tables,
            meter="embedding_dup_pairs", observation=observation,
        )
        a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("a_emb"))
        b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("b_emb"))
        return (
            cands.join(a, "a").join(b, "b")
            .withColumn("cos", cosine_col("a_emb", "b_emb"))
            .filter(F.col("cos") >= threshold)
            .select("a", "b")
        )

    pdf_all = emb.select("vec_id", "embedding").toPandas()  # Arrow batches
    ids = pdf_all["vec_id"].to_numpy(dtype=np.int64)
    mat = np.array(pdf_all["embedding"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat_n = mat / norms[:, None]
    spark = emb.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat_n)

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.LongType())]
    )

    def chunk(batches):
        all_ids = b_ids.value
        all_mat = b_mat.value
        for pdf in batches:
            q = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1)
            qn[qn == 0] = 1.0
            sims = (q / qn[:, None]) @ all_mat.T  # (chunk, N)
            qa = pdf["vec_id"].to_numpy()
            out_a, out_b = [], []
            for i in range(len(qa)):
                hits = all_ids[sims[i] >= threshold]
                hits = hits[hits > qa[i]]  # a < b, no self
                out_a.extend([int(qa[i])] * len(hits))
                out_b.extend(int(h) for h in hits)
            yield pd.DataFrame({"a": out_a, "b": out_b})

    return _zero_observe(
        emb.select("vec_id", "embedding").mapInPandas(chunk, schema=schema)
    )


def make_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded Gaussian hyperplanes (deterministic, built on the driver)."""
    rs = np.random.RandomState(seed)
    return rs.randn(n_planes, dim).tolist()


# Pending self-metering observations from bare-API calls (no caller-supplied
# Observation): (Observation, label) tuples, drained non-blockingly — NO
# background thread anywhere (the r4 daemon-thread fallback parked one thread
# per bare-operator build for the life of the process).
_PENDING_OVERFLOW: list = []


def _resolved_overflow_total(obs) -> int | None:
    """Non-blocking Observation read: the resolved ``overflow_total`` if the
    observed plan's first action has completed, else None. Uses the JVM
    Observation's public ``getRowOrEmpty`` (Observation.get would BLOCK until
    an action runs — unusable for a drain that must never stall the driver).
    """
    jo = getattr(obs, "_jo", None)
    if jo is None:
        return None  # never attached to a plan
    try:
        opt = jo.getRowOrEmpty()
        if opt.isEmpty():
            return None
        from pyspark.serializers import CPickleSerializer

        utils = getattr(
            obs._jvm, "org.apache.spark.sql.api.python.PythonSQLUtils"
        )
        row = CPickleSerializer().loads(utils.toPyRow(opt.get()))
        return int(row.asDict().get("overflow_total") or 0)
    except Exception:  # pragma: no cover - JVM API drift: keep pending
        return None


def drain_overflow_logs() -> int:
    """Flush resolved self-metering observations to the log (SURVEY.md §4.2
    rule 1: capped work is logged, never silent) WITHOUT blocking: each
    pending observation whose plan has executed emits its truncation warning
    (if any) and is retired; unexecuted plans stay pending. Called
    automatically at every ``lsh_bucket_candidates`` entry, so long-lived
    drivers flush as they go; callers needing promptness (tests, notebook
    use) call it directly after their action. Returns the number of
    observations resolved this call."""
    import logging

    resolved = 0
    for item in list(_PENDING_OVERFLOW):
        obs, where = item
        total = _resolved_overflow_total(obs)
        if total is None:
            continue
        _PENDING_OVERFLOW.remove(item)
        resolved += 1
        if total:
            logging.getLogger(__name__).warning(
                "%s: %d bucket members beyond bucket_cap were truncated "
                "(recall loss is attributable here; raise bucket_cap or "
                "n_planes)", where, total,
            )
    return resolved


def lsh_bucket_candidates(
    emb: DataFrame, dim: int, n_planes: int = 12, seed: int = 42,
    bucket_cap: int = 256, n_tables: int = 1, meter: str | None = None,
    observation=None, salt_buckets: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Random-hyperplane LSH: bucket = sign-bit string of `n_planes` dot
    products per hash table; candidate pairs generated within buckets only.

    -> (cand(a, b), capped(table_id, bucket, overflow)). Truncation is
    METERED, never silent — same discipline as the text path
    (operators/lsh.py candidate_pairs). ``n_tables`` independent plane sets
    (seed+t) union their candidates: recall ~ 1-(1-p)^T is tunable without
    touching bucket granularity. JVM-side throughout: the plane matrices
    enter the plan as literal arrays; dots via aggregate/zip_with; no Python.

    Metering modes (both attach the observe downstream of the bucket
    checkpoint — an observe UPSTREAM of a lazy localCheckpoint resolves to
    zero forever on Spark 4.1.2, see candidate_pairs): pass ``observation``
    (a ``pyspark.sql.Observation``) to drain ``overflow_total`` yourself
    after the first consuming action; or pass ``meter`` (a label) and the
    operator self-meters through the pending-drain registry — no background
    thread on EITHER path; resolved totals are flushed to the log
    non-blockingly at the next operator call or an explicit
    ``drain_overflow_logs()``.
    """
    drain_overflow_logs()
    def bucket_col(table: int):
        if n_planes == 0:
            # degenerate EXHAUSTIVE mode: every vector shares the one empty
            # bucket, so the candidate set is all pairs and the operator
            # equals brute force BY CONSTRUCTION — the driver-checkable
            # face (knn_lsh_exhaustive), not a production config; the
            # caller must raise bucket_cap above the corpus size or the
            # cap meter will report the truncation
            return F.lit("")
        planes = make_hyperplanes(dim, n_planes, seed + table)
        bits = []
        for p in planes:
            plane_lit = F.array(*[F.lit(float(x)) for x in p])
            dot = F.aggregate(
                F.zip_with(F.col("embedding"), plane_lit,
                           lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    # one row per (vec, table): posexplode over the per-table bucket strings
    bucketed = emb.select(
        "vec_id",
        F.posexplode(F.array(*[bucket_col(t) for t in range(n_tables)])).alias(
            "table_id", "bucket"
        ),
    )
    # two-level salted capped aggregation, same skew discipline as the text
    # LSH band stage (lsh.py candidate_pairs): clustered embedding corpora
    # produce hot sign-bit buckets, and a single-level collect_list would
    # materialize a whole hot bucket in one aggregation buffer before the
    # cap applies. Salting bounds any task at bucket_cap and the merge at
    # salt_buckets * bucket_cap; every truncation is counted.
    chunks = (
        bucketed.withColumn(
            "salt", F.pmod(F.xxhash64("vec_id"), F.lit(salt_buckets))
        )
        .groupBy("table_id", "bucket", "salt")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("chunk_ids"))
        .withColumn(
            "chunk_over", F.greatest(F.size("chunk_ids") - bucket_cap, F.lit(0))
        )
        .withColumn("chunk_ids", F.slice("chunk_ids", 1, bucket_cap))
    )
    grouped = (
        chunks.groupBy("table_id", "bucket")
        .agg(
            F.sort_array(F.flatten(F.collect_list("chunk_ids"))).alias("all_ids"),
            F.sum("chunk_over").alias("chunk_over"),
        )
        .withColumn(
            "overflow",
            F.col("chunk_over")
            + F.greatest(F.size("all_ids") - bucket_cap, F.lit(0)),
        )
        .withColumn("ids", F.slice("all_ids", 1, bucket_cap))
        .drop("all_ids", "chunk_over")
    )
    grouped = grouped.localCheckpoint(eager=False)  # reused by capped + pairs
    if observation is not None:
        grouped = grouped.observe(
            observation,
            F.coalesce(F.sum("overflow"), F.lit(0)).alias("overflow_total"),
        )
    elif meter is not None:
        from pyspark.sql import Observation

        obs = Observation()
        grouped = grouped.observe(
            obs, F.coalesce(F.sum("overflow"), F.lit(0)).alias("overflow_total")
        )
        _PENDING_OVERFLOW.append((obs, meter))
    capped = grouped.filter(F.col("overflow") > 0).select(
        "table_id", "bucket", "overflow"
    )
    from replicheck_spark.operators.lsh import intra_array_pairs

    pairs = (
        grouped.filter(F.size("ids") >= 2)
        .select(F.explode(intra_array_pairs("ids")).alias("p"))
        .select("p.a", "p.b")
        .dropDuplicates(["a", "b"])
    )
    return pairs, capped


def train_ivf_centroids(
    emb: DataFrame, n_cells: int = 64, sample: int = 4096, iters: int = 10,
    seed: int = 42,
) -> "np.ndarray":
    """Spherical k-means coarse quantizer for IVF, trained on a DETERMINISTIC
    driver-side sample: ``orderBy(xxhash64(vec_id)).limit(sample)`` is a
    seedless pseudo-random draw that is stable across partitionings (no
    runtime RNG — same discipline as the LSH hyperplanes). IVF training is
    offline-and-sampled by design in every production ANN system: only
    O(sample x dim) floats cross to the driver; the corpus pass stays fully
    distributed. Returns an (n_cells, dim) unit-norm float64 matrix."""
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id")))
        .limit(sample)
        .collect()
    )
    if not rows:
        return np.empty((0, 0), dtype=np.float64)
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True) + 1e-12
    rng = np.random.default_rng(seed)
    k = min(n_cells, len(X))
    cent = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = (X @ cent.T).argmax(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / (np.linalg.norm(v) + 1e-12)
    return cent


def _make_cell_udf(cent: "np.ndarray", nprobe: int):
    """array<float> embedding -> array<int> of the nprobe nearest cell ids.
    One Arrow-batch matmul against the broadcast centroid matrix — the
    assignment pass is O(batch x cells x dim) BLAS, no per-row Python."""
    import pandas as pd
    from pyspark.sql.pandas.functions import PandasUDFType, pandas_udf

    C = cent.T.copy()  # (dim, n_cells)
    p = min(nprobe, cent.shape[0])

    # explicit functionType: `pd` is function-local here, so stringified
    # type hints (future annotations) cannot be resolved for inference
    @pandas_udf(T.ArrayType(T.IntegerType()), PandasUDFType.SCALAR)
    def cells(emb):
        E = np.asarray(emb.tolist(), dtype=np.float64)
        E /= np.linalg.norm(E, axis=1, keepdims=True) + 1e-12
        sims = E @ C
        if p == 1:
            top = sims.argmax(axis=1)[:, None]
        else:
            top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        return pd.Series([row.astype(np.int32) for row in top])

    return cells.asNondeterministic()


def auto_n_cells(n: int, floor: int = 4, ceil: int = 65536) -> int:
    """IVF practice: n_cells ~ sqrt(N) balances cell count against cell size
    (per-query work = nprobe * N / n_cells candidates + n_cells centroid
    dots; sqrt minimizes the sum). Clamped: tiny corpora keep enough cells
    to be meaningful, and the centroid matrix stays driver/broadcast-sized
    (65536 cells x 1k dims x 8B = 0.5 GB) at any N."""
    import math

    return max(floor, min(ceil, int(math.sqrt(max(n, 1)))))


def ivf_assign(emb: DataFrame, cent: "np.ndarray") -> DataFrame:
    """Corpus -> cell assignment: (vec_id, embedding, cell), one Arrow-batch
    matmul per batch against the broadcast centroid matrix. The shared
    building block of ``knn_ivf`` (candidate equi-join side) and
    ``ivf_cell_occupancy`` (the skew meter)."""
    corpus_cell = _make_cell_udf(cent, nprobe=1)
    return emb.select(
        "vec_id",
        "embedding",
        F.element_at(corpus_cell(F.col("embedding")), 1).alias("cell"),
    )


def ivf_cell_occupancy(assigned: DataFrame) -> DataFrame:
    """Per-cell occupancy frame (cell, n_vecs) from an ``ivf_assign`` output
    — cell-size skew made inspectable instead of a docstring claim (same
    never-silent discipline as bucket truncation metering: a hot cell is the
    IVF analog of a hot LSH bucket, and at 10^12 vectors an unbalanced
    quantizer silently degrades every probe touching the fat cell). One
    partial+final hash agg; join against it or ``orderBy(desc('n_vecs'))``
    for the skew report."""
    return assigned.groupBy("cell").agg(F.count("*").alias("n_vecs"))


def knn_ivf(
    emb: DataFrame, n_queries: int = 10, k: int = 5,
    n_cells: int | None = 16, nprobe: int = 4, sample: int = 4096,
    iters: int = 10, seed: int = 42,
) -> DataFrame:
    """ANN top-k via an IVF coarse quantizer (the second scale path next to
    ``knn_lsh``): corpus vectors land in exactly one k-means cell, queries
    probe their ``nprobe`` nearest cells, and exact cosine re-ranks only the
    probed cells' members — the candidate join is an equi-join on cell id,
    never a cross product. At 10^12 vectors the per-query work is
    ``nprobe/n_cells`` of the corpus. ``n_cells=None`` auto-scales to
    ~sqrt(N) (one metadata-only count job), the standard IVF sizing; cell
    skew is surfaced by ``ivf_cell_occupancy`` over ``ivf_assign``.
    Approximate by construction -> rows-only driver check; recall@k vs brute
    force gated in tests/test_similarity_recall.py."""
    if n_cells is None:
        n_cells = auto_n_cells(emb.count())
    cent = train_ivf_centroids(
        emb, n_cells=n_cells, sample=sample, iters=iters, seed=seed
    )
    if cent.size == 0:  # empty corpus: empty top-k, same schema
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int"
        )
    query_cells = _make_cell_udf(cent, nprobe=nprobe)
    corpus = ivf_assign(emb, cent).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "cell",
    )
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(query_cells(F.col("embedding"))).alias("cell"),
    )
    scored = (
        corpus.join(F.broadcast(queries), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_col("q_emb", "c_emb"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def knn_lsh(
    emb: DataFrame, dim: int, n_queries: int = 10, k: int = 5,
    n_planes: int = 8, seed: int = 42, n_tables: int = 4, observation=None,
    bucket_cap: int = 256,
) -> DataFrame:
    """ANN top-k via hyperplane buckets: exact cosine only against same-bucket
    candidates, unioned over ``n_tables`` independent hash tables (multi-probe
    recall without coarser buckets). Rows-only check (approximate by
    construction); tests/test_similarity_recall.py gates recall@k vs brute
    force. ``n_planes=0`` with ``bucket_cap`` >= corpus size degenerates to
    exact brute force BY CONSTRUCTION (one shared bucket = all pairs, same
    JVM cosine expression) — the driver-checkable face
    (knn_lsh_exhaustive), same pattern as knn_ivf at nprobe=n_cells."""
    cands, capped = lsh_bucket_candidates(
        emb, dim, n_planes=n_planes, seed=seed, n_tables=n_tables,
        meter="knn_lsh", observation=observation, bucket_cap=bucket_cap,
    )
    pairs = cands.unionByName(
        cands.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).filter(F.col("a") < n_queries)
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("a_emb"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("b_emb"))
    scored = (
        pairs.join(a, "a").join(b, "b")
        .withColumn("cos", cosine_col("a_emb", "b_emb"))
    )
    w = Window.partitionBy("a").orderBy(F.desc("cos"), F.asc("b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("a").alias("query_id"), F.col("b").alias("neighbor_id"), "rank")
    )


def embedding_dedup_survivors(
    emb: DataFrame, threshold: float = 0.95,
    broadcast_bytes_limit: int = 256 * 1024 * 1024,
    n_planes: int = 12, n_tables: int = 4,
) -> DataFrame:
    """SemDeDup-style semantic dedup APPLIED (Abbas et al. 2023: drop all
    but one member of every embedding-cosine cluster): keep exactly one
    canonical vector per >=threshold-cosine connected component (the min
    vec_id — which IS the component label under connected_components'
    min-reachable labeling) plus every unclustered vector. The embedding
    sibling of dedup_ops.near_dedup_survivors — same closure, same
    canonical rule, different similarity kernel.

    Returns the surviving (vec_id) set only — the embedding payload is the
    table's heavy column and callers re-join it by vec_id (the same
    cheap-to-verify contract as near_dedup_survivors).

    Scale: pair generation is embedding_dup_pairs (bytes-gated
    broadcast/BLAS under the limit, bucketed LSH + in-bucket confirm
    above); components is the one-job-per-round hash-min loop; the drop
    set (clustered non-canonical vectors) is tiny relative to the corpus,
    so AQE broadcasts the anti-join probe. SQL-expressible end to end
    (DuckDB list_cosine_similarity pairs + recursive-CTE closure), so the
    whole composition is driver-checked. The threshold-membership float
    caveat of embedding_dup_pairs applies unchanged.
    """
    from replicheck_spark.operators.components import connected_components

    pairs = embedding_dup_pairs(
        emb, threshold, broadcast_bytes_limit=broadcast_bytes_limit,
        n_planes=n_planes, n_tables=n_tables,
    )
    labels = connected_components(pairs.select("a", "b"))
    dropped = labels.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("vec_id")
    )
    return emb.join(dropped, "vec_id", "left_anti").select("vec_id")
