#!/usr/bin/env python3
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

``--scaling`` mode (north-rule evidence): run the full dedup pipeline on the
same synthesized corpus at local[8] and local[32], report throughput at both
plus scaling efficiency, and write the raw result to
BENCH/SCALING_LAST.md (curated analysis: BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

# Bench working dirs live on tmpfs when available: this sandbox's single
# virtio disk ANTI-scales with concurrent writers (32 writers measured slower
# than 8 in aggregate), which corrupts the parallelism comparison with a host
# artifact. A real cluster writes checkpoints to distributed storage.
_TMPFS = "/dev/shm" if os.path.isdir("/dev/shm") else None


def _mkworkdir(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=prefix, dir=_TMPFS)


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _warmup(spark) -> None:
    """Warm the JVM (codegen, parquet reader) and the Python worker pool
    (pyspark.worker + pandas + numpy import in each of the N forked workers)
    before timing. Without this the FIRST query absorbs ~6s of JVM warmup and
    the FIRST pandas-UDF query absorbs ~8s of one-time worker spinup at 32
    cores (measured: minhash_lsh_pairs 12.1s cold vs 4.0s steady-state on
    identical data) — per-query walls then measure session start order, not
    operator cost. A real cluster job amortizes both over hours of input."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: `from __future__ import annotations` stringifies
    # the pd.Series hints, which breaks eval-type inference
    @pandas_udf("long", PandasUDFType.SCALAR)
    def _noop(s):
        return s

    spark.range(10_000, numPartitions=64).select(
        F.sum(_noop(F.col("id")))
    ).collect()


# Clean-window anchor for the calibration kernel below: measured round 7 on
# an idle window as the center of 3 fresh-JVM (warmup + min-of-2) runs at
# local[32]: [0.910, 0.987, 0.982]. host_factor = calib_sec / this — 1.0
# means the run saw the anchor window's machine, >1 a co-tenant-degraded
# window; divide a wall by its run's host_factor to compare across windows
# (VERDICT r6 #2: min-of-3 alone cannot defeat a sustained slow window).
# Only comparable at equal core counts (the driver always runs 32).
_CALIB_REF_SEC = 0.95
# Separate anchor for the WARM main session (the per-query sweep runs 17
# queries x 3 before its calibration, so the JVM is far past the fresh-JVM
# state the children see): min of 5 back-to-back in-session runs on the same
# round-7 idle window was 0.676 — using the fresh anchor there would read a
# clean window as 0.72 and mask a 1.3x-degraded one as 1.0.
_CALIB_REF_WARM_SEC = 0.68


def _calibrate(spark) -> float:
    """Fixed pure-JVM calibration kernel (VERDICT r6 #2): rows -> one hash
    exchange on a high-card key -> agg, constant size, no replicheck code and
    no Python workers — its wall is a property of the host window (CPU steal,
    memory bandwidth, GC), not of the engine. Timed inside EVERY bench child
    so each pipeline wall carries its own denominator; min-of-2 to shed the
    one-time codegen compile. ~2s on the anchor window."""
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.monotonic()
        (
            spark.range(8_000_000, numPartitions=64)
            .select(
                (F.col("id") % 500_000).alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.max("payload").alias("m"))
            .select(F.sum("n"))
            .collect()
        )
        return time.monotonic() - t0

    return round(min(once(), once()), 3)


def _bench_queries(spark, sf_dir: str) -> dict[str, float]:
    """Headline queries: the dedup/text/similarity core, timed via count()."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    _warmup(spark)
    names = [
        "exact_dedup_keep_first",
        "doc_stats",
        "quality_score",
        "top_tokens",
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs",
        "simhash_pairs",
        "simhash_confirmed_pairs",
        "cross_corpus_pairs",
        "cross_corpus_matches",
        "near_pairs_within_lang",
        "line_corpus_dedup",
        "doc_fingerprint",
        "knn_bruteforce",
        "embedding_dup_pairs",
        "events_running",
        "pricing_summary",
        # round-7 additions — the r6-comparable like-for-like subset is
        # everything ABOVE this comment (plus dedup_pipeline)
        "media_exact_dups",
        "mixture_sample",
        "embedding_dedup_survivors",
        "knn_lsh_exhaustive",
    ]
    out: dict[str, float] = {}
    cold: dict[str, float] = {}
    # Three runs per query, report the min (steady-state): the FIRST run of
    # each distinct plan pays one-time whole-stage-codegen compilation plus
    # AQE stage setup — measured ~2x on sub-10s queries at this SF, a fixed
    # cost that vanishes at production scale — and this host is a shared VM
    # whose co-tenant load swings single-run walls 2-3x (BENCH/BASELINE.md
    # round-5 status), so min-of-2 was still thin on the sub-second queries.
    # The cold wall is kept alongside so nothing is hidden.
    for name in names:
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            q[name](spark, sf_dir).count()
            walls.append(round(time.monotonic() - t0, 3))
        cold[name] = walls[0]
        out[name] = min(walls)
    return out, cold


def _run_single_child(cores, pages_path: str, workdir: str,
                      shuffle: int | None = None) -> dict:
    """Invoke this script's ``--single`` mode in a FRESH subprocess (fresh
    JVM) and parse its one-line JSON result — the shared child protocol of
    the default pipeline bench and ``--scaling`` (one implementation, so the
    child's output contract cannot silently diverge between modes)."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--single",
           "--cores", str(cores), "--pages", pages_path,
           "--workdir", workdir]
    if shuffle:
        cmd += ["--shuffle", str(shuffle)]
    proc = subprocess.run(
        cmd, capture_output=True, text=True,
        env={**os.environ,
             "PYTHONPATH": os.path.dirname(os.path.abspath(__file__))},
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench child failed (local[{cores}], rc={proc.returncode}"
            f"):\n{proc.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


def _bench_pipeline(spark, pages_path: str, ckpt: str, run_id: str) -> tuple[float, int]:
    """Full dedup pipeline wall time + doc count (fresh checkpoint)."""
    from replicheck_spark.config import DedupConfig
    from replicheck_spark.plans.pipeline import run_dedup

    pages = spark.read.parquet(pages_path)
    t0 = time.monotonic()
    result = run_dedup(
        spark, pages, DedupConfig(), ckpt, run_id=run_id,
        collect_metrics=False, checkpoint="min",
    )
    result.clusters.count()
    wall = time.monotonic() - t0
    n_docs = pages.count()
    return wall, n_docs


def main_default(args) -> None:
    from replicheck_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        "replicheck_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
    )
    queries, queries_cold = _bench_queries(spark, sf_dir)
    # window denominator for the per-query section (VERDICT r6 #2): the
    # kernel is timed AFTER the query sweep, in the same session, so it
    # samples the same co-tenant window the walls above were measured in
    calib_queries = _calibrate(spark)
    spark.stop()

    # Flagship pipeline on a synthesized corpus sized to the SF point.
    # min-of-3 FRESH-JVM subprocess runs, identical to the per-query protocol
    # (VERDICT r5 #1: a single-run wall for the headline stat could not
    # distinguish a 60% regression from co-tenant weather — same-code runs
    # measured 22-55s the same night). Fresh process per run because the py4j
    # JVM survives SparkSession.stop(): back-to-back in-process sessions
    # share a fragmented heap and stale worker daemons (measured 2x noise).
    sf = _sf_of(sf_dir)
    n_docs = max(int((sf if sf > 0 else 0.1) * 200_000), 2000)
    from replicheck_spark.corpus import write_pages_parquet

    tmp = _mkworkdir("bench_")
    pipe_walls: list[float] = []
    pipe_calibs: list[float] = []
    n = n_docs
    try:
        pages_path = os.path.join(tmp, "pages.parquet")
        write_pages_parquet(pages_path, n_docs=n_docs, seed=42)

        def one_child(i: int) -> None:
            nonlocal n
            parsed = _run_single_child(
                cpus, pages_path, os.path.join(tmp, f"pipe{i}")
            )
            pipe_walls.append(parsed["wall_sec"])
            pipe_calibs.append(parsed.get("calib_sec", -1.0))
            n = parsed["docs"]

        for i in range(3):
            one_child(i)
        # VERDICT r6 #2: a sustained slow window can defeat min-of-3 (r6's
        # driver triple spread 58-115s). When the triple's spread exceeds
        # 1.5x, buy up to 2 extra runs — the later ones may land in a
        # cleaner window; the per-run calib_sec records which window each
        # wall saw either way.
        extra = 0
        while max(pipe_walls) / min(pipe_walls) > 1.5 and extra < 2:
            extra += 1
            one_child(2 + extra)
    finally:
        # a failed child must not leak the corpus + checkpoint trees on
        # RAM-backed tmpfs — that would worsen the memory pressure that
        # likely killed it
        shutil.rmtree(tmp, ignore_errors=True)
    wall = min(pipe_walls)
    queries["dedup_pipeline"] = round(wall, 3)

    host_factors = [round(c / _CALIB_REF_SEC, 3) for c in pipe_calibs]
    # each wall divided by ITS OWN run's window denominator — the
    # cross-window-comparable pipeline stat
    norm_walls = [
        round(w / hf, 3) for w, hf in zip(pipe_walls, host_factors) if hf > 0
    ]
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "queries_cold_first_run": queries_cold,
                "agg": "min_of_3_runs_per_query (cold_first_run covers the "
                       "21 per-query entries only; the r6-comparable "
                       "like-for-like subset is the first 17 + "
                       "dedup_pipeline); dedup_pipeline min of >=3 "
                       "fresh-JVM subprocess runs, each child warmed "
                       "before timing (no cold pipeline wall is recorded); "
                       "extra runs bought when wall spread > 1.5x",
                "sf": sf,
                "pipeline_docs": n,
                "pipeline_walls_all": pipe_walls,
                "pipeline_first_run": pipe_walls[0],
                "pipeline_docs_per_sec": round(n / wall, 1),
                # window normalization (VERDICT r6 #2): host_factor 1.0 =
                # the round-7 clean-window anchor; divide a wall by its
                # run's factor to compare across co-tenant windows
                "calib_ref_sec": _CALIB_REF_SEC,
                "calib_ref_warm_sec": _CALIB_REF_WARM_SEC,
                "calib_sec_queries": calib_queries,
                "host_factor_queries": round(
                    calib_queries / _CALIB_REF_WARM_SEC, 3
                ),
                "pipeline_calib_all": pipe_calibs,
                "pipeline_host_factors": host_factors,
                "pipeline_walls_normalized": norm_walls,
                "pipeline_wall_normalized_min": (
                    min(norm_walls) if norm_walls else None
                ),
                "cpus": int(cpus),
            }
        )
    )


def main_single(args) -> None:
    """One measurement in a fresh process (invoked by --scaling): prints one
    JSON line {"cores": N, "wall_sec": W, "docs": D}."""
    from replicheck_spark.session import get_spark

    spark = get_spark(
        f"replicheck_scaling_{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.shuffle or args.cores * 2,
    )
    # warm the fresh JVM + Python worker pool BEFORE timing, so the wall
    # measures the pipeline, not process spinup — the same treatment the
    # per-query stats get (they min over runs in one warm session; a cold
    # subprocess absorbs ~6-10s of codegen + worker forks at 32 cores,
    # which is pure constant offset at any real corpus size)
    _warmup(spark)
    calib = _calibrate(spark)
    wall, n = _bench_pipeline(
        spark, args.pages, os.path.join(args.workdir, f"ckpt{args.cores}"),
        f"s{args.cores}",
    )
    print(json.dumps({
        "cores": args.cores, "wall_sec": round(wall, 2), "docs": n,
        "calib_sec": calib,
        "host_factor": round(calib / _CALIB_REF_SEC, 3),
    }))
    spark.stop()


def main_scaling(args) -> None:
    """local[8] vs local[32] on the same input -> BENCH/SCALING_LAST.md.

    Each measurement runs in a FRESH subprocess: PySpark's py4j JVM survives
    SparkSession.stop(), so back-to-back sessions in one process share a
    fragmented heap and stale worker daemons — measured 2x noise.
    """
    from replicheck_spark.corpus import write_pages_parquet

    tmp = _mkworkdir("scaling_")
    n_docs = args.docs
    # cache the (deterministic) corpus across invocations — generation is
    # pure python and costs minutes at large n
    cache_dir = os.path.join(_TMPFS or tempfile.gettempdir(), "pages_cache")
    os.makedirs(cache_dir, exist_ok=True)
    pages_path = os.path.join(cache_dir, f"pages_{n_docs}_s42.parquet")
    if not os.path.exists(pages_path):
        write_pages_parquet(pages_path + ".tmp", n_docs=n_docs, seed=42)
        os.rename(pages_path + ".tmp", pages_path)

    def measure(cores: int, tag: str) -> tuple[float, float]:
        r = _run_single_child(
            cores, pages_path, os.path.join(tmp, tag), shuffle=args.shuffle
        )
        return r["wall_sec"], r.get("host_factor", -1.0)

    # The sandbox host has noisy neighbors (identical runs measured 3x
    # apart); interleave repeats and keep the BEST wall per level — min over
    # repeats estimates the uninterfered machine. Alternating block order
    # (lo-hi, hi-lo, ...) supports any repeat count.
    walls: dict[int, list[float]] = {args.n_low: [], args.n_high: []}
    order = [
        c
        for i in range(args.repeats)
        for c in ([args.n_low, args.n_high] if i % 2 == 0
                  else [args.n_high, args.n_low])
    ]
    for i, cores in enumerate(order):
        w, hf = measure(cores, f"r{i}c{cores}")
        walls[cores].append(w)
        print(f"[scaling] local[{cores}] rep{len(walls[cores])}: {w:.1f}s  "
              f"{n_docs / w:.1f} docs/sec  host_factor={hf:.2f} "
              f"(calib kernel at local[{cores}]; anchor is local[32])")

    results = {}
    for cores, ws in walls.items():
        best = min(ws)
        results[cores] = {
            "wall_sec": best,
            "docs_per_sec": round(n_docs / best, 1),
            "all_walls": ws,
        }

    lo, hi = args.n_low, args.n_high
    speedup = results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]
    efficiency = speedup / (hi / lo)
    report = {
        "docs": n_docs,
        f"local[{lo}]": results[lo],
        f"local[{hi}]": results[hi],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
    }
    print(json.dumps(report))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SCALING_LAST.md", "w") as f:
        f.write(
            f"""# BENCH/SCALING_LAST — latest raw scaling measurement

(Curated cross-run analysis lives in BENCH/BASELINE.md.)

North-rule evidence (two-cluster-size criterion, sandbox proxy per driver
instruction: same dedup job, same {n_docs}-doc synthesized input, two
parallelism levels on this 32-core host).

| metric | value | config |
|---|---|---|
| docs/sec @ local[{lo}] | {results[lo]["docs_per_sec"]} | best wall {results[lo]["wall_sec"]}s of {results[lo]["all_walls"]}, shuffle={args.shuffle or lo * 2} |
| docs/sec @ local[{hi}] | {results[hi]["docs_per_sec"]} | best wall {results[hi]["wall_sec"]}s of {results[hi]["all_walls"]}, shuffle={args.shuffle or hi * 2} |
| speedup {lo}->{hi} | {speedup:.3f}x | ideal {hi // lo}x |
| scaling efficiency | **{efficiency:.3f}** | target >= 0.8 |

Methodology: each parallelism level runs in a fresh subprocess (fresh JVM);
levels are interleaved and repeated, best wall per level is reported — this
host is a shared VM with noisy neighbors (identical runs measured up to 3x
apart; nonzero steal time under load), so min-over-repeats estimates the
uninterfered machine. Working dirs and spark.local.dir on tmpfs: the single
virtio disk's aggregate throughput DROPS with concurrent writers, which would
corrupt a parallelism comparison with a host artifact.

Input: deterministic planted corpus (seed 42, FIXTURES.md plan), full
pipeline: extract -> exact -> signatures -> LSH -> confirm -> substr ->
connected components -> clusters, checkpointed (metrics collection off).

Reproduce: `python bench.py --scaling --docs {n_docs} --n-low {lo} \
--n-high {hi}{" --shuffle " + str(args.shuffle) if args.shuffle else ""}`
"""
        )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--single", action="store_true")
    p.add_argument("--docs", type=int, default=50_000)
    p.add_argument("--n-low", type=int, default=8)
    p.add_argument("--n-high", type=int, default=32)
    p.add_argument("--repeats", type=int, default=3,
                   help="interleaved repeats per parallelism level (best-of)")
    p.add_argument("--shuffle", type=int, default=None,
                   help="fixed shuffle-partition count for BOTH levels "
                   "(identical plan, only parallelism varies — the honest "
                   "two-cluster-size proxy); default scales with cores (2x)")
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--pages", type=str)
    p.add_argument("--workdir", type=str, default="/tmp")
    a = p.parse_args()
    if a.single:
        main_single(a)
    elif a.scaling:
        main_scaling(a)
    else:
        main_default(a)
