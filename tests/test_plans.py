"""Physical-plan assertions: the optimizer artifacts we rely on at scale are
actually present (predicate pushdown into parquet, column pruning, broadcast
join for small dims, partial+final hash aggregation, single Arrow UDF
evaluation). A regression here is a silent 10-100x cost at 100 TB even though
results stay correct.
"""

import re

import pytest
from pyspark.sql import functions as F

from replicheck_spark.config import DedupConfig

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestScanPushdown:
    def test_filter_pushed_to_parquet(self, spark, tmp_path):
        """min-size filter on a checkpointed docs table reaches the scan."""
        from replicheck_spark.operators.extract import extract_docs

        pages = spark.createDataFrame(
            [("u1", None, None, " ".join(f"t{i}" for i in range(60)), "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        path = str(tmp_path / "docs.parquet")
        extract_docs(pages).write.parquet(path)
        docs = spark.read.parquet(path).filter(F.col("n_tokens") >= 50)
        plan = _plan(docs)
        assert "PushedFilters" in plan
        assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(n_tokens,50\)", plan)

    def test_column_pruning(self, spark, tmp_path):
        """A 2-column projection must not read norm_text from the scan."""
        from replicheck_spark.operators.extract import extract_docs

        pages = spark.createDataFrame(
            [("u1", None, None, "a b c", "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        path = str(tmp_path / "docs2.parquet")
        extract_docs(pages).write.parquet(path)
        two = spark.read.parquet(path).select("doc_id", "n_tokens")
        plan = _plan(two)
        m = re.search(r"ReadSchema: ([^\n]+)", plan)
        assert m and "norm_text" not in m.group(1), m.group(1) if m else plan

    def test_html_never_read_when_text_trusted(self, spark):
        """Token-count style queries over documents must not scan `text`-
        unrelated columns; here: doc_stats reads only doc_id + text."""
        import __spark_entry__ as entry_mod

        df = entry_mod.queries()["large_docs_topk"](spark, SF_DIR)
        plan = _plan(df)
        m = re.search(r"ReadSchema: ([^\n]+)", plan)
        assert m and "lang" not in m.group(1) and "source" not in m.group(1)


class TestJoinAndAggShapes:
    def test_top_customers_broadcasts_dim(self, spark):
        import __spark_entry__ as entry_mod

        df = entry_mod.queries()["top_customers"](spark, SF_DIR)
        assert "BroadcastHashJoin" in _plan(df)

    def test_exact_groups_partial_final_hashagg(self, spark):
        """groupBy(sha256) must plan as partial+final hash agg (map-side
        combine absorbs giant identical clusters before the shuffle)."""
        from replicheck_spark.operators.exact import exact_groups
        from replicheck_spark.operators.extract import extract_docs, eligible_docs

        pages = spark.createDataFrame(
            [("u1", None, None, " ".join(f"t{i}" for i in range(60)), "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        plan = _plan(exact_groups(eligible_docs(extract_docs(pages), 50)))
        assert plan.count("HashAggregate") >= 2

    def test_top_k_plans_take_ordered(self, spark):
        """orderBy+limit must become TakeOrderedAndProject, not a full sort."""
        import __spark_entry__ as entry_mod

        df = entry_mod.queries()["large_docs_topk"](spark, SF_DIR)
        assert "TakeOrderedAndProject" in _plan(df)

    def test_unigram_vocab_take_ordered_and_broadcast(self, spark):
        """The top-K vocabulary head must be a TakeOrderedAndProject (never a
        full sort of the token-frequency table) and the membership join must
        broadcast it (map-side, no corpus-gram shuffle)."""
        import __spark_entry__ as entry_mod

        df = entry_mod.queries()["unigram_freq_stats"](spark, SF_DIR)
        plan = _plan(df)
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastHashJoin" in plan


class TestUdfEvaluation:
    def test_signature_udf_single_arrow_eval(self, spark):
        """The 3-field struct extraction must NOT triplicate the UDF: exactly
        one ArrowEvalPython node in the plan."""
        from replicheck_spark.operators.extract import extract_docs, eligible_docs
        from replicheck_spark.operators.signatures import compute_signatures

        pages = spark.createDataFrame(
            [("u1", None, None, " ".join(f"t{i}" for i in range(60)), "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        sigs = compute_signatures(eligible_docs(extract_docs(pages), 50),
                                  DedupConfig())
        plan = _plan(sigs)
        # count plan NODES (the "(n) ArrowEvalPython" detail headers; the
        # formatted output prints each node twice — tree and details)
        n_arrow = len(re.findall(r"\(\d+\) ArrowEvalPython", plan))
        # one for extract_normalize + one for the signature UDF
        assert n_arrow <= 2, f"{n_arrow} ArrowEvalPython nodes:\n{plan[:2000]}"

    def test_extract_udf_not_duplicated(self, spark):
        from replicheck_spark.operators.extract import extract_docs

        pages = spark.createDataFrame(
            [("u1", None, None, "a b", "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        plan = _plan(extract_docs(pages))
        assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1


class TestSignatureColumnPruning:
    """The signature table carries BOTH the 32-bit shingles (confirm's
    Jaccard input) and the 64-bit anchors (substring index keys). Each
    consumer must scan only its own column — reading both would undo the
    width split's entire point at the 100-TB shuffle."""

    @pytest.fixture()
    def sig_path(self, spark, tmp_path_factory):
        from replicheck_spark.operators.extract import (
            eligible_docs, extract_docs,
        )
        from replicheck_spark.operators.signatures import compute_signatures

        pages = spark.createDataFrame(
            [
                ("u1", None, None, " ".join(f"t{i}" for i in range(60)), "en"),
                ("u2", None, None, " ".join(f"s{i}" for i in range(60)), "en"),
            ],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        path = str(tmp_path_factory.mktemp("sigs") / "signatures.parquet")
        compute_signatures(
            eligible_docs(extract_docs(pages), 50), DedupConfig()
        ).write.parquet(path)
        return path

    def test_confirm_scan_excludes_anchors(self, spark, sig_path):
        from replicheck_spark.operators.confirm import confirm_pairs

        sigs = spark.read.parquet(sig_path)
        cand = spark.createDataFrame([(1, 2)], "a long, b long")
        plan = _plan(confirm_pairs(cand, sigs, DedupConfig()))
        schemas = re.findall(r"ReadSchema: ([^\n]+)", plan)
        sig_scans = [s for s in schemas if "shingles" in s or "simhash" in s]
        assert sig_scans and all("anchors" not in s for s in sig_scans), schemas

    def test_anchor_index_scan_excludes_shingles(self, spark, sig_path):
        # anchor_pairs lazily checkpoints its bucket table, which hides the
        # scan from explain — assert on the index construction it wraps
        from replicheck_spark.operators.substr import anchor_index

        sigs = spark.read.parquet(sig_path)
        plan = _plan(anchor_index(sigs, DedupConfig()))
        schemas = re.findall(r"ReadSchema: ([^\n]+)", plan)
        assert schemas and all("shingles" not in s for s in schemas), schemas


class TestRound7Plans:
    def test_mixture_sample_is_shuffle_free_single_scan(self, spark):
        """mixture_sample must compile to scan -> filter -> project with NO
        Exchange and NO Window — its whole scale contract is 'one pass,
        nothing moves'; the text column must not be read (column pruning:
        the hash keys off doc_id only)."""
        from replicheck_spark.operators.textops import mixture_sample

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = _plan(mixture_sample(docs, {"src0": 0.3}, default_rate=0.5))
        assert "Exchange" not in plan and "Window" not in plan, plan
        schemas = re.findall(r"ReadSchema: ([^\n]+)", plan)
        assert schemas and all("text" not in s for s in schemas), schemas

    def test_media_exact_dups_partial_final_agg_prunes_payload(self, spark):
        """The sha reduces the payload map-side: partial+final hash agg
        around ONE exchange, and the exchanged schema carries the 64-char
        sha, never the payload bytes."""
        from replicheck_spark.operators.multimodal import (
            media_exact_dups,
            media_from_documents,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = _plan(media_exact_dups(media_from_documents(docs, 40)))
        assert plan.count("Exchange") >= 1
        assert "partial" in plan.lower(), plan
        # payload must not appear in any exchange input (it is consumed by
        # the map-side sha2 projection)
        for m in re.finditer(r"Arguments: hashpartitioning\(([^\n]+)", plan):
            assert "payload" not in m.group(1)
