#!/usr/bin/env python3
"""Identical-plan campaign runner: the dedup job (jobs/dedup.py) in a FRESH
JVM per run, interleaved across levels/variants, best-of-N per cell.

Used for two kinds of committed evidence (BENCH/*.md):

* scaling: same input + same pinned plan (SPARK_GRAFT_SHUFFLE pins both
  spark.sql.shuffle.partitions and AQE initialPartitionNum, see session.py)
  at two parallelism levels — local[8] vs local[32], or the multi-JVM proxy
  local-cluster[1,8,M] vs local-cluster[4,8,M] (N -> 4N executor JVMs, each
  with its own heap/GC).
* A/B: same master, two engine variants (e.g. --variants text jvm for
  DedupConfig.shingle_source).

Interleaving (level0, level1, level0, level1, ...) makes co-tenant noise hit
both cells alike; fresh subprocesses make every run cold-JVM comparable.

Example:
  python scripts/scaling_campaign.py --pages /tmp/c1600k/pages.parquet \
      --masters 'local-cluster[1,8,16384]' 'local-cluster[4,8,16384]' \
      --shuffle 128 --repeats 2
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(master: str, variant: str | None, args, tag: str,
             envset: str = "") -> dict:
    # Checkpoints MUST live on tmpfs: this host's shared virtio disk loses
    # throughput under concurrent writers AND stalls a 1-core run harder
    # than a 4-core one (no compute to overlap I/O with), so disk-backed
    # ckpts systematically INFLATE low-parallelism walls and with them the
    # measured scaling efficiency (r5: 400k 1v4 read 0.835 with /tmp ckpts
    # vs 0.74 with tmpfs ckpts — see BENCH/SCALING_1V4_400k_r5.md).
    ckpt_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt = tempfile.mkdtemp(prefix=f"scale_{tag}_", dir=ckpt_root)
    env = {
        **os.environ,
        "SPARK_GRAFT_SHUFFLE": str(args.shuffle),
        "SPARK_GRAFT_ADVISORY_PARTITION": args.advisory,
        "SPARK_GRAFT_DRIVER_MEM": args.driver_mem,
    }
    # envset: comma-separated KEY=VAL pairs layered on top ("" = baseline).
    for kv in filter(None, envset.split(",")):
        k, _, v = kv.partition("=")
        env[k] = v
    cmd = [
        sys.executable, "jobs/dedup.py", "--pages", args.pages,
        "--ckpt", ckpt, "--run-id", tag, "--master", master,
        "--output-format", "json",
    ]
    if variant:
        cmd += ["--shingle-source", variant]
    if args.no_substr:
        cmd += ["--no-substr"]
    t0 = time.monotonic()
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    total = time.monotonic() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    if p.returncode != 0:
        print(p.stdout[-2000:], file=sys.stderr)
        print(p.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"run {tag} on {master} failed rc={p.returncode}")
    m = re.search(r"^\{.*\}$", p.stdout, re.MULTILINE | re.DOTALL)
    rep = json.loads(p.stdout[m.start():]) if m else {}
    out = {
        "master": master, "variant": variant, "tag": tag, "envset": envset,
        "wall_sec": rep.get("wall_sec"), "docs": rep.get("docs"),
        "docs_per_sec": rep.get("docs_per_sec"), "proc_sec": round(total, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--masters", nargs="+", required=True)
    ap.add_argument("--variants", nargs="*", default=[None],
                    help="shingle-source values to A/B (default: config default)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--shuffle", type=int, default=128)
    ap.add_argument("--advisory", default="16m")
    ap.add_argument("--driver-mem", default="24g")
    ap.add_argument("--no-substr", action="store_true")
    ap.add_argument("--envsets", nargs="*", default=[""],
                    help="comma-separated KEY=VAL env overlays to A/B as "
                         "interleaved variants ('' = baseline), e.g. "
                         "'' 'SPARK_GRAFT_IO_CODEC=zstd'")
    args = ap.parse_args()

    cells: dict[tuple, list] = {}
    for r in range(args.repeats):
        for master in args.masters:
            for variant in args.variants:
                for envset in args.envsets:
                    # tag from the FULL envset string (ADVICE r5 #3: two
                    # overlays sharing a trailing value, e.g. '*_CODEC=zstd'
                    # vs 'OTHER=zstd', collided when only the last value was
                    # used), plus a short hash so truncation cannot re-collide
                    etag = (
                        re.sub(r"[^A-Za-z0-9]", "", envset)[:12]
                        + hashlib.sha1(envset.encode()).hexdigest()[:4]
                        if envset else "base"
                    )
                    tag = (f"r{r}_{re.sub(r'[^A-Za-z0-9]', '', master)[:24]}_"
                           f"{variant or 'def'}_{etag}")
                    res = run_once(master, variant, args, tag, envset)
                    cells.setdefault((master, variant, envset), []).append(res)

    print("\n== best-of per cell ==")
    best = {}
    for key, runs in cells.items():
        walls = [r["wall_sec"] for r in runs if r["wall_sec"]]
        b = min(walls)
        thr = max(r["docs_per_sec"] for r in runs if r["docs_per_sec"])
        best[key] = (b, thr)
        print(f"{key}: walls={walls} best={b}s thr={thr} docs/s")

    def cores(master: str) -> int:
        m = re.fullmatch(r"local\[(\d+)\]", master)
        if m:
            return int(m.group(1))
        m = re.fullmatch(r"local-cluster\[(\d+),(\d+),\d+\]", master)
        return int(m.group(1)) * int(m.group(2)) if m else 0

    if len(args.masters) == 2 and len(args.variants) == 1:
        (m_lo, m_hi) = sorted(args.masters, key=cores)
        v = args.variants[0]
        for envset in args.envsets:
            t_lo, _ = best[(m_lo, v, envset)]
            t_hi, _ = best[(m_hi, v, envset)]
            speed = t_lo / t_hi
            ideal = cores(m_hi) / cores(m_lo)
            print(f"\n[{envset or 'baseline'}] speedup {speed:.3f}x of ideal "
                  f"{ideal:.0f}x -> efficiency {speed / ideal:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
