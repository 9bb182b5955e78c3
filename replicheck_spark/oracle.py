"""Pure-Python reference oracle — deliberately naive, Spark-free, hash-free.

Implements the exact semantics the Spark pipeline must reproduce:

* normalize -> tokenize (same ``textnorm`` functions, so extraction is
  byte-identical by construction),
* exact duplicate grouping keyed on the full token sequence — precisely the
  reference's shipped semantics (tuple(tokens) grouping with >=2 members,
  ``/root/reference/replicheck/tools/Duplication/Duplication.py:34-46``;
  min-size filter at :38-39; cross-file flag at :48-49),
* brute-force pairwise Jaccard over k-shingle STRING sets at min_similarity —
  the behavior the reference documents but never shipped
  (``/root/reference/Project.md:50,66,70-71``),
* longest-common-token-run detection for the substring stage,
* transitive closure (union-find) -> truth clusters.

Everything here is O(n^2)-ish and only ever runs on small test corpora; it is
the recall denominator for the distributed pipeline (SURVEY.md §5.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from replicheck_spark.functions.textnorm import (
    extract_text,
    host_of,
    normalize_text,
    shingle_strings,
    tokenize,
)


@dataclass
class OracleResult:
    docs: dict[str, list[str]] = field(default_factory=dict)   # url -> tokens
    norm_texts: dict[str, str] = field(default_factory=dict)   # url -> norm_text
    exact_groups: list[dict] = field(default_factory=list)
    pairs: list[tuple[str, str, str, float]] = field(default_factory=list)
    clusters: dict[str, int] = field(default_factory=dict)     # url -> cluster id


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x = p
            p = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller string wins
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def longest_common_run(a: list[str], b: list[str]) -> int:
    """Length of the longest verbatim shared token run (naive DP, small docs)."""
    if not a or not b:
        return 0
    # classic O(len(a)*len(b)) rolling DP
    prev = [0] * (len(b) + 1)
    best = 0
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        ai = a[i - 1]
        for j in range(1, len(b) + 1):
            if ai == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


def run_oracle(
    rows: list[dict],
    min_similarity: float = 0.8,
    min_size: int = 50,
    shingle_k: int = 5,
    substr_min_tokens: int = 50,
    with_substr: bool = True,
) -> OracleResult:
    """Compute truth over raw page rows (url, html, text, ...)."""
    res = OracleResult()
    for r in rows:
        norm = normalize_text(extract_text(r.get("html"), r.get("text")))
        res.norm_texts[r["url"]] = norm
        res.docs[r["url"]] = tokenize(norm)

    # eligible docs (min-size filter, Duplication.py:38-39)
    elig = {u: t for u, t in res.docs.items() if len(t) >= min_size}

    # exact groups: key = full token sequence (Duplication.py:36-46)
    by_key: dict[tuple, list[str]] = {}
    for u, toks in elig.items():
        by_key.setdefault(tuple(toks), []).append(u)
    uf = UnionFind()
    for key, urls in by_key.items():
        if len(urls) >= 2:
            urls = sorted(urls)
            res.exact_groups.append(
                {
                    "size": len(key),
                    "num_duplicates": len(urls),
                    "urls": urls,
                    "cross_host": len({host_of(u) for u in urls}) > 1,
                    "similarity": 1.0,
                }
            )
            for i in range(len(urls)):
                for j in range(i + 1, len(urls)):
                    res.pairs.append((urls[i], urls[j], "exact", 1.0))
                    uf.union(urls[i], urls[j])

    # near pairs: EXACT Jaccard over shingle string sets. An inverted shingle
    # index prunes the O(n^2) loop without losing truth: any pair sharing zero
    # shingles has Jaccard 0 < min_similarity by definition.
    urls_sorted = sorted(elig)
    shingles = {u: shingle_strings(elig[u], shingle_k) for u in urls_sorted}
    inv: dict[str, list[str]] = {}
    for u in urls_sorted:
        for s in shingles[u]:
            inv.setdefault(s, []).append(u)
    cand: set[tuple[str, str]] = set()
    for s, us in inv.items():
        if len(us) < 2:
            continue
        us = sorted(us)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                cand.add((us[i], us[j]))

    exact_pair_set = {(a, b) for a, b, _, _ in res.pairs}
    near_done: set[tuple[str, str]] = set()
    for a, b in sorted(cand):
        if (a, b) in exact_pair_set:
            continue
        jac = jaccard(shingles[a], shingles[b])
        if jac >= min_similarity:
            res.pairs.append((a, b, "near", jac))
            near_done.add((a, b))
            uf.union(a, b)

    # substring pairs: shared verbatim run >= substr_min_tokens (quadratic DP
    # per candidate pair; same candidate set).
    if with_substr:
        for a, b in sorted(cand):
            if (a, b) in exact_pair_set or (a, b) in near_done:
                continue
            # cheap lower bound: a run of L tokens contributes L-k+1 shared
            # shingles; skip pairs that cannot reach the bar.
            need = substr_min_tokens - shingle_k + 1
            if len(shingles[a] & shingles[b]) < need:
                continue
            run = longest_common_run(elig[a], elig[b])
            if run >= substr_min_tokens:
                res.pairs.append((a, b, "substr", jaccard(shingles[a], shingles[b])))
                uf.union(a, b)

    # clusters: transitive closure, id = dense int by sorted root
    roots = sorted({uf.find(u) for u in uf.parent})
    root_id = {r: i for i, r in enumerate(roots)}
    for u in list(uf.parent):
        res.clusters[u] = root_id[uf.find(u)]
    return res
