"""Text-analysis operators for training-data pipelines, over a `documents`
table (doc_id, text, lang, source, n_chars).

All JVM-side built-ins (whole-stage codegen) except the fingerprint, which is
a genuinely-custom rolling-hash op (pandas UDF). Every operator is exposed in
``__spark_entry__.queries()``; the SQL-expressible ones carry DuckDB oracles.

Reference parity: these are the web-text analogs of the reference's per-row
scalar analyses — token counting (/root/reference/replicheck/tools/
LargeDetection/LF.py:27-30 regex counting), severity bucketing
(utils.py:58-77), TODO/FIXME keyword scanning (tools/TodoFixme/TDFM.py:70-73),
top-N large files (LF.py:88-91).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.pandas.functions import pandas_udf

# Reference token-count regex for non-AST languages (LF.py:27-30): \w+|[^\s\w]
TOKEN_REGEX = r"\w+|[^\s\w]"

# deterministic per-language marker words (heuristic language ID; the fixture
# corpus is synthetic so markers are the handful of real stopwords in it)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]


def tokens_col(text_col: str = "text"):
    """Whitespace tokens of a raw text column (JVM split, no UDF)."""
    return F.split(F.col(text_col), " ")


def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-doc size stats: n_tokens, n_chars_calc, avg_token_len."""
    return docs.select(
        "doc_id",
        F.size(tokens_col()).alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
        (
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / F.size(tokens_col()).cast("double")
        ).alias("avg_token_len"),
    )


def token_count_regex(docs: DataFrame) -> DataFrame:
    """BPE-ish token counting via the reference's regex (LF.py:27-30)."""
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0)).alias(
            "n_regex_tokens"
        ),
        F.size(tokens_col()).alias("n_ws_tokens"),
    )


def large_docs_topk(docs: DataFrame, k: int = 10) -> DataFrame:
    """Top-k largest docs by token count (reference LF.py:88-91 / T1).

    Deterministic tiebreak by doc_id; Catalyst plans TakeOrderedAndProject.
    """
    return (
        docs.select("doc_id", F.size(tokens_col()).alias("n_tokens"))
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .limit(k)
    )


def severity_buckets(docs: DataFrame, threshold: int = 100) -> DataFrame:
    """Severity classification on token_count/threshold ratio — the exact
    bucket ladder of reference utils.py:58-77 (>=3 Critical, >=2 High,
    >=1.5 Medium, >=1 Low, else None)."""
    ratio = F.size(tokens_col()).cast("double") / F.lit(float(threshold))
    sev = (
        F.when(ratio >= 3.0, "Critical")
        .when(ratio >= 2.0, "High")
        .when(ratio >= 1.5, "Medium")
        .when(ratio >= 1.0, "Low")
        .otherwise("None")
    )
    return (
        docs.select(sev.alias("severity"))
        .groupBy("severity")
        .agg(F.count("*").alias("n_docs"))
    )


def keyword_scan(docs: DataFrame, keywords: tuple[str, ...] = ("dup", "slow", "fast")) -> DataFrame:
    """Keyword hit counting (TODO/FIXME analog, TDFM.py:70-73): for each
    keyword, docs containing it as a whitespace token + total occurrences.

    ONE corpus scan regardless of K: a single projection builds
    array<struct(keyword, hits)> per doc, then explode + hash agg — at 100 TB
    the K-unioned-scans alternative costs K full passes.
    """
    toks = tokens_col()
    per_kw = F.array(
        *[
            F.struct(
                F.lit(kw).alias("keyword"),
                F.size(F.filter(toks, lambda t: t == F.lit(kw))).alias("hits"),
            )
            for kw in keywords
        ]
    )
    return (
        docs.select(F.explode(per_kw).alias("h"))
        .select("h.keyword", "h.hits")
        .groupBy("keyword")
        .agg(
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0)).cast("long").alias("n_docs"),
            F.sum("hits").cast("long").alias("n_hits"),
        )
    )


def lang_summary(docs: DataFrame) -> DataFrame:
    """Per-language doc counts + mean token count."""
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(tokens_col())).alias("avg_tokens"),
    )


def lang_id_ngram(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: score = marker-token occurrences per language,
    predict argmax (ties -> lexicographically first language, 'und' if all 0).

    Fully deterministic and SQL-expressible, so it carries a DuckDB oracle.
    """
    toks = tokens_col()
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(ws))).alias(f"score_{lang}")
        for lang, ws in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select("doc_id", "lang", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    # first language (sorted) achieving the max wins; fold right-to-left
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("pred_lang")
    )


def quality_exprs(min_tokens: int = 50, max_tokens: int = 1000):
    """(n_tokens, stop_hits, quality) Columns over a `text` column — shared
    by quality_score and the fused corpus_filter projection.

    quality in [0,1]: 0.25*len_ok + 0.25*stopword_band + 0.25*wordlen_band +
    0.25*alpha_band (integer-derived arithmetic, bit-identical in SQL).
    """
    toks = tokens_col()
    n = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    alpha_chars = F.length(F.regexp_replace("text", r"[^a-zA-Z]", ""))
    nonspace = F.length(F.regexp_replace("text", " ", ""))
    stop_ratio = stop_hits.cast("double") / n.cast("double")
    mean_wlen = nonspace.cast("double") / n.cast("double")
    alpha_ratio = alpha_chars.cast("double") / F.greatest(nonspace, F.lit(1)).cast("double")
    score = (
        F.when((n >= min_tokens) & (n <= max_tokens), 0.25).otherwise(0.0)
        + F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.6), 0.25).otherwise(0.0)
        + F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), 0.25).otherwise(0.0)
        + F.when(alpha_ratio >= 0.6, 0.25).otherwise(0.0)
    )
    return n, stop_hits, score


def quality_score(docs: DataFrame, min_tokens: int = 50, max_tokens: int = 1000) -> DataFrame:
    """Web-text quality scoring: length band, stopword ratio, mean word len,
    alpha ratio — the standard heuristic-filter family, all JVM expressions."""
    n, stop_hits, score = quality_exprs(min_tokens, max_tokens)
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        score.alias("quality"),
    )


def reading_complexity(docs: DataFrame, threshold: float = 10.0) -> DataFrame:
    """Per-document complexity scalar + the reference's severity ladder —
    the web-text analog of per-function cyclomatic complexity (reference
    tools/CyclomaticComplexity/CCA.py:13-62: scalar per unit, threshold 10,
    utils.py compute_severity ratio ladder, only units >= threshold listed).

    The scalar is a Gunning-Fog-style reading complexity, fully
    deterministic and JVM/SQL-expressible (no syllable dictionary):

        fog = 0.4 * (words/sentences + 100 * complex_words/words)

    with sentences = count of [.!?] (min 1), words = whitespace tokens,
    complex_words = tokens of length >= 8 (3+-syllable proxy). Severity is
    the exact reference ladder on ratio = fog/threshold (>=3 Critical,
    >=2 High, >=1.5 Medium, else Low at >=1). Output: docs at or above the
    threshold, ordered by fog desc then doc_id — the "high complexity
    functions" report, per-doc.
    """
    toks = tokens_col()
    words = F.size(toks)
    sentences = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"[.!?]"), 0)), F.lit(1)
    )
    complex_words = F.size(F.filter(toks, lambda t: F.length(t) >= 8))
    fog = 0.4 * (
        words.cast("double") / sentences.cast("double")
        + 100.0 * complex_words.cast("double") / words.cast("double")
    )
    ratio = fog / F.lit(float(threshold))
    sev = (
        F.when(ratio >= 3.0, "Critical")
        .when(ratio >= 2.0, "High")
        .when(ratio >= 1.5, "Medium")
        .otherwise("Low")
    )
    return (
        docs.select(
            "doc_id",
            words.alias("n_words"),
            sentences.alias("n_sentences"),
            complex_words.alias("n_complex"),
            fog.alias("fog"),
            sev.alias("severity"),
        )
        .filter(F.col("fog") >= threshold)
        .orderBy(F.desc("fog"), F.asc("doc_id"))
    )


def top_tokens(docs: DataFrame, k: int = 20) -> DataFrame:
    """Global token frequency top-k (explode -> hash agg -> top-k)."""
    return (
        docs.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(k)
    )


def _repetition_stats_arrow(
    docs: DataFrame, top2gram_max: float, dup5gram_char_max: float,
    dup_line_max: float, dup_line_char_max: float, kernel: str = "counter",
) -> DataFrame:
    """Arrow-batched per-doc implementation of repetition_stats — see its
    docstring for the measured reversal rationale. Two kernels, bit-identical
    values (integer counts; the same IEEE double divisions):
    ``kernel="counter"`` (default) is the per-doc Python Counter loop —
    MEASURED WINNER of the round-7 vectorization A/B (1.65s vs 3.0s on
    10k x 300-token batches; BENCH/BASELINE.md round 7); ``kernel="numpy"``
    counts grams batch-wide with factorize + bincount (see
    _np_batch_metrics), kept as the committed loser the parity test pins
    the winner against. Semantics mirror the expression path
    token for token: single-space split keeps empty tokens, lines are
    trimmed of SPACES ONLY (``strip(" ")`` — Python's bare strip would also
    eat \\r/\\t, diverging from F.trim and the DuckDB oracle), gram char
    length is the joined-string length (token chars + single separators),
    and the most-frequent-bigram tie-break is (count, char mass), exactly
    the lexicographic struct max of the expr/oracle sides."""
    import pandas as pd
    from collections import Counter
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("top2gram_char_frac", T.DoubleType()),
        T.StructField("dup5gram_frac", T.DoubleType()),
        T.StructField("dup5gram_char_frac", T.DoubleType()),
        T.StructField("dup_line_frac", T.DoubleType()),
        T.StructField("dup_line_char_frac", T.DoubleType()),
        T.StructField("flagged", T.BooleanType()),
    ])

    def one(text: str):
        # grams are counted as TOKEN TUPLES (n pointer hashes per gram, no
        # string building); char mass = token chars + single separators ==
        # len(" ".join(gram)), computed once per DISTINCT gram — identical
        # values to the string form, measured ~3x faster. NULL text behaves
        # like the expression path (split(NULL) -> no gram rows -> all-zero
        # fractions, unflagged) instead of crashing the batch.
        text = text or ""
        toks = text.split(" ")
        top2 = 0.0
        if len(toks) >= 2:
            c2 = Counter(zip(toks, toks[1:]))
            items2 = [
                (cnt, cnt * (len(g[0]) + len(g[1]) + 1))
                for g, cnt in c2.items()
            ]
            chars2 = sum(cm for _, cm in items2)
            if chars2 > 0:
                top2 = max(items2)[1] / chars2
        d5 = d5c = 0.0
        if len(toks) >= 5:
            c5 = Counter(
                zip(toks, toks[1:], toks[2:], toks[3:], toks[4:])
            )
            total = len(toks) - 4
            dup = dup_chars = chars5 = 0
            for g, cnt in c5.items():
                gl = len(g[0]) + len(g[1]) + len(g[2]) + len(g[3]) \
                    + len(g[4]) + 4
                chars5 += cnt * gl
                if cnt > 1:
                    dup += cnt - 1
                    dup_chars += (cnt - 1) * gl
            if total > 0:
                d5 = dup / total
            if chars5 > 0:
                d5c = dup_chars / chars5
        dl = dlc = 0.0
        lines = [s for s in (l.strip(" ") for l in text.split("\n")) if s]
        if lines:
            cl = Counter(lines)
            total = len(lines)
            charsl = sum(cnt * len(g) for g, cnt in cl.items())
            dl = sum(cnt - 1 for cnt in cl.values() if cnt > 1) / total
            if charsl > 0:
                dlc = sum(
                    (cnt - 1) * len(g) for g, cnt in cl.items() if cnt > 1
                ) / charsl
        flagged = (
            top2 > top2gram_max or d5c > dup5gram_char_max
            or dl > dup_line_max or dlc > dup_line_char_max
        )
        return top2, d5, d5c, dl, dlc, flagged

    def batch(it):
        for pdf in it:
            vals = [one(t) for t in pdf["text"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "top2gram_char_frac": [v[0] for v in vals],
                "dup5gram_frac": [v[1] for v in vals],
                "dup5gram_char_frac": [v[2] for v in vals],
                "dup_line_frac": [v[3] for v in vals],
                "dup_line_char_frac": [v[4] for v in vals],
                "flagged": [v[5] for v in vals],
            })

    def _np_batch_metrics(texts):
        """Batch-wide numpy kernel (VERDICT r6 #3): ONE pd.factorize over the
        batch's flat token stream, then 64-bit avalanche-mixed (doc, gram)
        keys — the same accepted xxhash64 collision posture as _shingles_df —
        and ONE hash-based pd.factorize per gram family for counting, with
        bincount/scatter rollups. No sorts: a first draft built EXACT
        hierarchical gram codes with np.unique and measured 7x SLOWER than
        the Counter loop (np.unique's argsort + return_index dominate);
        hash factorization is O(L) and the winning shape (A/B in
        BENCH/BASELINE.md round 7). Counts are integers and every final
        division is the same IEEE double op as the Counter path, so values
        are bit-identical on collision-free inputs (parity-gated in
        tests/test_stages.py; a 64-bit in-batch gram collision — odds
        ~L^2/2^64 — merges two gram counts, the posture the engine already
        accepts for shingles). Lines use EXACT packed keys (line codes are
        always < 2^32), no hashing."""
        import numpy as np
        import pandas as pd

        n_d = len(texts)
        top2 = np.zeros(n_d, dtype=np.float64)
        d5 = np.zeros(n_d, dtype=np.float64)
        d5c = np.zeros(n_d, dtype=np.float64)
        dl = np.zeros(n_d, dtype=np.float64)
        dlc = np.zeros(n_d, dtype=np.float64)

        M1 = np.uint64(0xBF58476D1CE4E5B9)
        M2 = np.uint64(0x94D049BB133111EB)

        def mix(h, c):
            # splitmix64 finalizer over (h + c), wrapping uint64 math,
            # in-place to avoid temp arrays. The seed/doc id MUST pass
            # through a mix step ALONE before any token code joins: adding
            # two raw small ints first (did + c0 both < 2^20) collapses
            # thousands of distinct (doc, token) pairs onto equal sums
            # before any avalanche — measured 741 collisions per 10M keys
            # vs 0 with the did-first chain.
            h = h + c
            h ^= h >> np.uint64(30)
            h *= M1
            h ^= h >> np.uint64(27)
            h *= M2
            h ^= h >> np.uint64(31)
            return h

        def counts_per_key(keys, did_g, gl):
            """Occurrence counts per distinct (doc, gram) key via one hash
            factorize. did and gl are constant per key, so scatters (last
            write wins) recover them per distinct key."""
            codes_k, _ = pd.factorize(keys)
            n_u = int(codes_k.max()) + 1 if len(codes_k) else 0
            cnt = np.bincount(codes_k, minlength=n_u)
            gl_u = np.empty(n_u, dtype=np.int64)
            gl_u[codes_k] = gl
            did_u = np.empty(n_u, dtype=np.int64)
            did_u[codes_k] = did_g
            return did_u, cnt, gl_u

        # ---- token stream (split(" ") keeps empty tokens, NULL -> "") ----
        toks_per_doc = [(t if isinstance(t, str) else "").split(" ")
                        for t in texts]
        n_toks = np.fromiter(
            (len(t) for t in toks_per_doc), dtype=np.int64, count=n_d
        )
        flat = [tok for toks in toks_per_doc for tok in toks]
        L = len(flat)
        did = np.repeat(np.arange(n_d, dtype=np.int64), n_toks)
        didu = did.astype(np.uint64)
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        cu = codes.astype(np.uint64)
        uniq_lens = np.fromiter(
            (len(u) for u in uniq), dtype=np.int64, count=len(uniq)
        )
        # prefix char sums: gram char mass = token chars + separators,
        # window-summed in O(1) per position
        cs = np.concatenate((
            np.zeros(1, dtype=np.int64), np.cumsum(uniq_lens[codes])
        ))

        if L >= 2:
            v2 = did[:-1] == did[1:]
            k2 = mix(mix(mix(np.uint64(0x2222), didu[:-1]), cu[:-1]), cu[1:])
            gl2 = cs[2:] - cs[:-2] + 1
            did2, cnt2, gl2u = counts_per_key(
                k2[v2], did[:-1][v2], gl2[v2]
            )
            cm = cnt2 * gl2u
            chars2 = np.bincount(
                did2, weights=cm.astype(np.float64), minlength=n_d
            )
            # per-doc lexicographic max of (count, char mass) — the Counter
            # path's max(items2) — as two scatter-max passes: max count per
            # doc, then max char mass among the max-count grams
            mc = np.zeros(n_d, dtype=np.int64)
            np.maximum.at(mc, did2, cnt2)
            sel = cnt2 == mc[did2]
            top_cm = np.zeros(n_d, dtype=np.float64)
            np.maximum.at(top_cm, did2[sel], cm[sel].astype(np.float64))
            np.divide(top2 + top_cm, chars2, out=top2, where=chars2 > 0)

            if L >= 5:
                v5 = did[: L - 4] == did[4:]
                h = mix(mix(np.uint64(0x5555), didu[: L - 4]), cu[: L - 4])
                for j in range(1, 5):
                    h = mix(h, cu[j: L - 4 + j])
                gl5 = (cs[5:] - cs[:-5] + 4)[v5]
                did5v = did[: L - 4][v5]
                did5u, cnt5, gl5u = counts_per_key(h[v5], did5v, gl5)
                total5 = np.bincount(did5v, minlength=n_d)
                dup5 = total5 - np.bincount(did5u, minlength=n_d)
                chars5 = np.bincount(
                    did5v, weights=gl5.astype(np.float64), minlength=n_d
                )
                # sum (cnt-1)*gl over all grams = occurrences - distinct
                dup5c_chars = chars5 - np.bincount(
                    did5u, weights=gl5u.astype(np.float64), minlength=n_d
                )
                np.divide(dup5, total5, out=d5, where=total5 > 0)
                np.divide(dup5c_chars, chars5, out=d5c, where=chars5 > 0)

        # ---- lines (trim SPACES only, drop empties — mirrors F.trim) ----
        lines_per_doc = [
            [s for s in (x.strip(" ") for x in
                         (t if isinstance(t, str) else "").split("\n")) if s]
            for t in texts
        ]
        flat_lines = [x for ls in lines_per_doc for x in ls]
        if flat_lines:
            n_lines = np.fromiter(
                (len(ls) for ls in lines_per_doc), dtype=np.int64, count=n_d
            )
            ldid = np.repeat(np.arange(n_d, dtype=np.int64), n_lines)
            lcodes, luniq = pd.factorize(np.asarray(flat_lines, dtype=object))
            llens = np.fromiter(
                (len(u) for u in luniq), dtype=np.int64, count=len(luniq)
            )[lcodes]
            # exact packed key: line codes < 2^32 always, no hashing needed
            kdl = (ldid.astype(np.uint64) << np.uint64(32)) \
                | lcodes.astype(np.uint64)
            didlu, cntl, llen_u = counts_per_key(kdl, ldid, llens)
            totall = np.bincount(ldid, minlength=n_d)
            dupl = totall - np.bincount(didlu, minlength=n_d)
            charsl = np.bincount(
                ldid, weights=llens.astype(np.float64), minlength=n_d
            )
            duplc = charsl - np.bincount(
                didlu, weights=llen_u.astype(np.float64), minlength=n_d
            )
            np.divide(dupl, totall, out=dl, where=totall > 0)
            np.divide(duplc, charsl, out=dlc, where=charsl > 0)

        flagged = (
            (top2 > top2gram_max) | (d5c > dup5gram_char_max)
            | (dl > dup_line_max) | (dlc > dup_line_char_max)
        )
        return top2, d5, d5c, dl, dlc, flagged

    def batch_np(it):
        for pdf in it:
            top2, d5, d5c, dl, dlc, flagged = _np_batch_metrics(
                list(pdf["text"])
            )
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "top2gram_char_frac": top2,
                "dup5gram_frac": d5,
                "dup5gram_char_frac": d5c,
                "dup_line_frac": dl,
                "dup_line_char_frac": dlc,
                "flagged": flagged,
            })

    if kernel not in ("counter", "numpy"):
        raise ValueError(f"kernel must be 'counter' or 'numpy', got {kernel!r}")
    fn = batch_np if kernel == "numpy" else batch
    return docs.select("doc_id", "text").mapInPandas(fn, schema=schema)


def repetition_stats(
    docs: DataFrame,
    top2gram_max: float = 0.20,
    dup5gram_char_max: float = 0.15,
    dup_line_max: float = 0.30,
    dup_line_char_max: float = 0.20,
    impl: str = "arrow",
) -> DataFrame:
    """Gopher-style repetition quality metrics (Rae et al. 2021, appendix A1.1
    — the public webtext repetition filters). Per doc:

      top2gram_char_frac  characters covered by the most frequent word bigram
                          (count x gram chars; count ties broken by larger
                          char mass) / total bigram characters — the
                          CHARACTER fraction Rae et al. publish the 0.20
                          threshold for (ADVICE r5 #1; an earlier revision
                          applied it to the occurrence-count fraction).
                          Gram chars = token chars + single separators,
                          overlaps counted per occurrence — the reproducible
                          denominator when whitespace runs make raw document
                          characters tokenizer-dependent; the DuckDB oracle
                          shares the definition exactly.
      dup5gram_frac       occurrences beyond the first of repeated word
                          5-grams / total 5-grams
      dup5gram_char_frac  same, weighted by gram character length
      dup_line_frac       occurrences beyond the first of repeated non-empty
                          trimmed lines / total such lines
      dup_line_char_frac  same, weighted by line character length
      flagged             true when any metric crosses its Gopher threshold
                          (defaults are the published ones: 0.20 / 0.15 /
                          0.30 / 0.20)

    Scale design — a MEASURED REVERSAL (round 6): every metric is a pure
    per-document function, so the default ``impl="arrow"`` computes all six
    columns inside one Arrow-batched ``mapInPandas`` pass — ONE corpus scan,
    ZERO shuffles. Round 7 built a batch-wide vectorized counting kernel
    (factorize over the batch token stream + 64-bit mixed gram keys +
    hash-factorize counting, see _np_batch_metrics) expecting a win — and
    MEASURED THE REVERSE: the per-doc Counter loop is ~2x faster (1.65s vs
    3.0s per 10k x 300-token batch; the numpy floor is 4-5 full passes over
    the token stream where Counter makes one cache-resident pass). The
    Counter kernel stays the default; the numpy kernel is kept as
    ``impl="arrow_numpy"``, the committed loser the parity test pins the
    winner against (same discipline as ``impl="expr"``; A/B + the hash
    collision lesson in BENCH/BASELINE.md round 7). The previous
    expression
    implementation (kept as ``impl="expr"``, value-parity gated in
    tests/test_stages.py) looked like the "fast JVM path" but is not:
    Catalyst evaluates higher-order-function lambdas INTERPRETED — no
    whole-stage codegen, boxed per-element allocation — and jstack on a
    1.6M-doc run of ~300-token pages showed executors pinned inside
    Slice/HashExpression/CreateNamedStruct at ~100us per gram: ~75 minutes
    for the gram stage alone, vs seconds for the Arrow pass over the same
    input. The per-doc results are bit-identical either way (integer counts;
    the fractions are the same IEEE double divisions), so the DuckDB oracle
    is shared. The expr path's two shuffles (gram agg + per-doc agg) also
    simply disappear.
    """
    if impl in ("arrow", "arrow_numpy"):
        return _repetition_stats_arrow(
            docs, top2gram_max, dup5gram_char_max, dup_line_max,
            dup_line_char_max,
            kernel="numpy" if impl == "arrow_numpy" else "counter",
        )
    if impl != "expr":
        raise ValueError(
            f"impl must be 'arrow', 'arrow_numpy' or 'expr', got {impl!r}"
        )
    # kinded (doc_id, kind, gh, glen) rows; gh = xxhash64 gram key.
    # The token array is projected ONCE per row and the gram lambdas
    # reference the attribute: higher-order-function lambdas are interpreted
    # (no whole-stage codegen, no common-subexpression elimination inside),
    # so an inlined split(text) re-tokenized the document for EVERY gram
    # position — O(tokens^2) per doc, measured ~40 min for this stage alone
    # on a 1.6M-doc corpus of ~300-token pages vs ~1 min with the
    # pre-projected array (round-6 scale smoke; values bit-identical).
    def _gram_rows(n: int, kind: str) -> DataFrame:
        toked = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
        entry = F.expr(
            f"transform(sequence(0, size(t) - {n}), i -> "
            f"struct(xxhash64(slice(t, i + 1, {n})) AS gh, "
            f"aggregate(slice(t, i + 1, {n}), 0, "
            f"(a, x) -> a + length(x)) + {n - 1} AS glen))"
        )
        guarded = F.when(F.size(F.col("t")) >= n, entry).otherwise(
            F.expr("array()").cast("array<struct<gh:bigint,glen:int>>")
        )
        return toked.select(
            "doc_id", F.lit(kind).alias("kind"), F.explode(guarded).alias("g")
        ).select("doc_id", "kind", F.col("g.gh").alias("gh"), F.col("g.glen").alias("glen"))

    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    line_rows = docs.select(
        "doc_id", F.lit("line").alias("kind"), F.explode(lines).alias("line")
    ).select(
        "doc_id", "kind",
        F.xxhash64("line").alias("gh"),
        F.length("line").alias("glen"),
    )

    ex = _gram_rows(2, "g2").unionByName(_gram_rows(5, "g5")).unionByName(line_rows)
    counts = ex.groupBy("doc_id", "kind", "gh").agg(
        F.count("*").alias("c"), F.max("glen").alias("glen")
    )

    def _tot(kind):
        return F.sum(F.when(F.col("kind") == kind, F.col("c")))

    def _dup(kind):
        return F.sum(
            F.when((F.col("kind") == kind) & (F.col("c") > 1), F.col("c") - 1)
        )

    def _tot_chars(kind):
        return F.sum(F.when(F.col("kind") == kind, F.col("glen") * F.col("c")))

    def _dup_chars(kind):
        return F.sum(
            F.when(
                (F.col("kind") == kind) & (F.col("c") > 1),
                F.col("glen") * (F.col("c") - 1),
            )
        )

    per_doc = counts.groupBy("doc_id").agg(
        _tot("g2").alias("g2_total"),
        # most-frequent bigram's char mass: lexicographic struct max picks
        # max count, ties broken by larger (glen * c) — deterministic on
        # both engines (DuckDB max() orders structs the same way)
        F.max(
            F.when(
                F.col("kind") == "g2",
                F.struct(
                    F.col("c").alias("c"),
                    (F.col("glen") * F.col("c")).alias("cm"),
                ),
            )
        )["cm"].alias("g2_top_chars"),
        _tot_chars("g2").alias("g2_chars"),
        _tot("g5").alias("g5_total"),
        _dup("g5").alias("g5_dup"),
        _tot_chars("g5").alias("g5_chars"),
        _dup_chars("g5").alias("g5_dup_chars"),
        _tot("line").alias("line_total"),
        _dup("line").alias("line_dup"),
        _tot_chars("line").alias("line_chars"),
        _dup_chars("line").alias("line_dup_chars"),
    )

    def _frac(num: str, den: str):
        return F.when(
            F.col(den) > 0,
            F.coalesce(F.col(num), F.lit(0)).cast("double")
            / F.col(den).cast("double"),
        ).otherwise(F.lit(0.0))

    out = (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            _frac("g2_top_chars", "g2_chars").alias("top2gram_char_frac"),
            _frac("g5_dup", "g5_total").alias("dup5gram_frac"),
            _frac("g5_dup_chars", "g5_chars").alias("dup5gram_char_frac"),
            _frac("line_dup", "line_total").alias("dup_line_frac"),
            _frac("line_dup_chars", "line_chars").alias("dup_line_char_frac"),
        )
    )
    return out.withColumn(
        "flagged",
        (F.col("top2gram_char_frac") > top2gram_max)
        | (F.col("dup5gram_char_frac") > dup5gram_char_max)
        | (F.col("dup_line_frac") > dup_line_max)
        | (F.col("dup_line_char_frac") > dup_line_char_max),
    )


# PII patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB oracle): ASCII classes, bounded repeats, \b,
# non-capturing groups; no backrefs or lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\+?\d{1,3}[-. ]?\(?\d{2,4}\)?[-. ]?\d{3,4}[-. ]?\d{3,4}"


def pii_exprs():
    """(n_emails, n_ipv4, n_phones, clean_text) Columns over a `text` column
    — the scrub chain shared by pii_scrub and the fused corpus_filter
    projection. Each category is counted on the text as it stands at that
    point in the chain (emails -> IPs -> phones), so a digit run inside an
    email is never double-counted as a phone."""
    n_emails = F.size(F.regexp_extract_all(F.col("text"), F.lit(PII_EMAIL_RE), F.lit(0)))
    t1 = F.regexp_replace(F.col("text"), F.lit(PII_EMAIL_RE), F.lit("[EMAIL]"))
    n_ipv4 = F.size(F.regexp_extract_all(t1, F.lit(PII_IPV4_RE), F.lit(0)))
    t2 = F.regexp_replace(t1, F.lit(PII_IPV4_RE), F.lit("[IP]"))
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE_RE), F.lit(0)))
    t3 = F.regexp_replace(t2, F.lit(PII_PHONE_RE), F.lit("[PHONE]"))
    return n_emails, n_ipv4, n_phones, t3


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII detection + redaction (emails, IPv4 addresses, phone-shaped
    numbers) — the standard scrub pass a webtext training pipeline runs
    before release (cf. the C4/RefinedWeb cleanup stages).

    Returns (doc_id, n_emails, n_ipv4, n_phones, clean_text, has_pii);
    clean_text carries [EMAIL]/[IP]/[PHONE] placeholders.

    Scale design: pure JVM `regexp_replace`/`regexp_extract_all` expressions
    in one codegen'd projection — no UDF, no shuffle, one corpus pass.
    """
    n_emails, n_ipv4, n_phones, t3 = pii_exprs()
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phones.alias("n_phones"),
        t3.alias("clean_text"),
        ((n_emails + n_ipv4 + n_phones) > 0).alias("has_pii"),
    )


def corpus_filter(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """The composed keep/drop decision of a training-data curation pass:
    keep a doc iff quality >= min_quality AND no PII AND not
    repetition-flagged (Gopher thresholds). Returns every doc with its three
    signals plus the verdict: (doc_id, quality, has_pii, repetitive, keep).

    Scale design: the two per-row signal families (quality heuristics, PII
    counts) are FUSED into one codegen'd projection over a single corpus
    scan — not one scan per signal — and the only join is with the
    repetition aggregate on the unique doc_id key (AQE-planned). Dedup is
    deliberately not folded in here: near-dup survivorship is a pairwise
    corpus-level decision (see near_dedup_survivors), while this filter is
    per-doc and embarrassingly parallel.
    """
    _, _, quality = quality_exprs()
    n_emails, n_ipv4, n_phones, _ = pii_exprs()
    base = docs.select(
        "doc_id",
        quality.alias("quality"),
        ((n_emails + n_ipv4 + n_phones) > 0).alias("has_pii"),
    )
    rep = repetition_stats(docs).select(
        "doc_id", F.col("flagged").alias("repetitive")
    )
    return base.join(rep, "doc_id").withColumn(
        "keep",
        (F.col("quality") >= min_quality)
        & ~F.col("has_pii")
        & ~F.col("repetitive"),
    )


def unigram_freq_stats(docs: DataFrame, vocab_k: int = 50) -> DataFrame:
    """Unigram-LM quality proxy in integer-exact form (the CCNet idea — score
    docs by how probable their tokens are under a corpus LM — with corpus
    unigram counts standing in for model log-probs so the result is exactly
    SQL-checkable: no floats, no log). Per doc: (doc_id, n_tokens, sum_freq,
    n_oov) where sum_freq sums the corpus-wide occurrence count of each token
    INSTANCE that falls in the top-``vocab_k`` vocabulary and n_oov counts
    instances outside it. Rare-token-dominated docs (lorem noise, mojibake,
    generated junk) surface as low sum_freq / high n_oov.

    Scale design: vocabulary counting is a word-count (map-side partial agg;
    the exchange carries one row per distinct token per task); the head is a
    TakeOrderedAndProject (never a full sort) with a deterministic
    (count desc, token asc) tie-break, and is BROADCAST for the membership
    join. The per-doc aggregation's partial agg collapses each doc inside
    its own partition — explode does not repartition, so a doc's token rows
    never leave their task and the doc-id exchange carries ONE row per doc,
    not one per token.
    """
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("t"))
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("t"))
        .limit(vocab_k)
    )
    return (
        tok.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce("freq", F.lit(0))).alias("sum_freq"),
            F.sum(
                F.when(F.col("freq").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )


def fingerprint(docs: DataFrame, k: int = 5, window: int = 8) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al. '03): k-gram rolling
    hashes, keep the min hash of every `window`-sized sliding window, distinct
    + sorted, exploded to scalar rows (doc_id, fp) — array columns crash the
    driver's rows-only canonicalizer and ship poorly over Arrow anyway.

    Vectorized across the WHOLE Arrow batch: one ``hash_token_lists`` call
    (factorize + blake2b per distinct token) and one global polynomial pass;
    the per-doc remainder is numpy slicing + one sliding_window_view min.
    Non-SQL-expressible -> rows-only oracle check.
    """
    import numpy as np

    from replicheck_spark.functions import hashing

    @pandas_udf(T.ArrayType(T.LongType()))
    def _fp(texts: pd.Series) -> pd.Series:
        token_lists = [(t or "").split(" ") for t in texts.tolist()]
        flat, off = hashing.hash_token_lists(token_lists)
        # THE shared k-gram hash pass (hashing.kgram_hashes_global — same
        # definition the shingle path uses); acc[i] covers flat[i:i+k], and
        # the per-doc slice acc[s : e-k+1] never crosses a doc boundary.
        acc = hashing.kgram_hashes_global(flat, k)
        out = []
        for d in range(len(token_lists)):
            s, e = int(off[d]), int(off[d + 1])
            if e - s < k:
                out.append([])
                continue
            grams = acc[s : e - k + 1]
            if len(grams) <= window:
                sel = grams.min(keepdims=True)
            else:
                w = np.lib.stride_tricks.sliding_window_view(grams, window)
                sel = w.min(axis=1)
            out.append(np.unique(sel).astype(np.int64).tolist())
        return pd.Series(out)

    fp = docs.select("doc_id", _fp(F.col("text")).alias("fingerprint"))
    return fp.select(
        "doc_id", F.explode_outer("fingerprint").alias("fp")
    )


def mixture_sample(
    docs: DataFrame, rates: dict[str, float],
    default_rate: float = 1.0, salt: str = "mix",
) -> DataFrame:
    """Deterministic source-mixture sampling — the standard FINAL stage of a
    curation pipeline (mixture weighting: e.g. keep wiki at 1.0, common
    crawl at 0.3): each source keeps an exact, reproducible pseudo-random
    fraction of its documents.

    keep iff hash6(doc_id, salt) < rate(source) * 16^6, where hash6 is the
    first 6 hex chars of md5("<doc_id>:<salt>") as an integer. Membership is
    a pure function of (doc_id, salt) — stable across runs, partition
    layouts, and cluster sizes (Bernoulli per doc, no rank/row_number
    window, no sampleBy seed coupling to partitioning). md5 over xxhash64
    solely so the SAME expression evaluates in DuckDB
    (('0x' || substr(md5(..), 1, 6))::UBIGINT), keeping the operator
    driver-checkable end to end; 24 bits of hash give rate granularity
    ~6e-8, far finer than any mixture spec.

    Scale design: ONE projection + filter per scan — no shuffle, no window,
    nothing driver-side; Catalyst pushes the source CASE and the filter into
    the scan, so at 10^12 docs this costs exactly one pass and writes only
    survivors. Unlisted sources keep ``default_rate``. Returns the surviving
    rows minus the text payload (same cheap-to-verify contract as
    near_dedup_survivors; callers re-join text by doc_id).
    """
    for src, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {src!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(salt))
            ),
            1, 6,
        ),
        16, 10,
    ).cast("long")
    rate = F.lit(float(default_rate))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col("source") == src, F.lit(float(r))).otherwise(rate)
    return docs.filter(key.cast("double") < rate * F.lit(float(16 ** 6))).select(
        "doc_id", "lang", "source"
    )
