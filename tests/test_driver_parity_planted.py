"""Non-vacuous DuckDB parity for the two queries whose driver fixtures
contain no positives (sf0.001 has no byte-identical texts and no >=0.95-cosine
embedding pairs, so CORRECTNESS_r03 verified them on empty results).

These tests replicate the driver's protocol — run the ``__spark_entry__``
query callable AND its ``oracle_sql`` string side-by-side on the same parquet
files — but on a PLANTED corpus where both queries must return rows, so the
semantics (not just the empty set) are independently checked.
"""

import numpy as np
import pytest

import __spark_entry__ as entry_mod

duckdb = pytest.importorskip("duckdb")


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("planted_sf")

    # documents: one cross-source exact group of 3, one same-source group of
    # 2, the rest unique
    dup_a = "alpha beta gamma delta " * 10
    dup_b = "omega psi chi phi " * 12
    rows = []
    for i in range(20):
        if i in (3, 7, 11):
            text, source = dup_a, f"s{0 if i == 3 else 1}"
        elif i in (5, 15):
            text, source = dup_b, "s0"
        else:
            text, source = f"unique document number {i} " * 8, f"s{i % 3}"
        rows.append((i, text, "en", source, len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))

    # embeddings: ids 0-29 random (dim 32 -> random cosines stay far below
    # 0.95), plus a planted identical pair (100, 101) and a ~0.98 pair
    # (102, 103) — both clear of the threshold so float summation order
    # cannot flip membership (operator docstring caveat)
    rs = np.random.RandomState(7)
    base = rs.randn(30, 32)
    v = rs.randn(32)
    u = rs.randn(32)  # independent of v -> (100,101) and (102,103) disjoint
    u2 = u + 0.1 * rs.randn(32)  # cos(u, u2) ~ 0.98
    erows = [(i, base[i].astype(float).tolist(), 0) for i in range(30)]
    erows += [(100, v.tolist(), 1), (101, v.tolist(), 1),
              (102, u.tolist(), 1), (103, u2.tolist(), 1)]
    spark.createDataFrame(
        erows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def _oracle_rows(planted_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{planted_dir}/{t}.parquet/*.parquet')"
        )
    cur = con.execute(sql)
    cols = [c[0] for c in cur.description]
    return cols, cur.fetchall()


def _spark_rows(spark, planted_dir: str, name: str):
    df = entry_mod.queries()[name](spark, planted_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, list):
            return tuple(v)
        return v

    return sorted(cols), sorted(
        tuple(norm(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize(
    "name",
    ["exact_dup_groups", "embedding_dup_pairs", "media_exact_dups",
     "embedding_dedup_survivors"],
)
def test_planted_parity(spark, planted_dir, name):
    sql = entry_mod.oracle_sql()[name]
    scols, srows = _spark_rows(spark, planted_dir, name)
    ocols, orows = _oracle_rows(planted_dir, sql)
    assert srows, f"{name} must be NON-vacuous on the planted corpus"
    ns = _normalize(scols, srows)
    no = _normalize(ocols, orows)
    assert ns[0] == no[0], f"column mismatch: {ns[0]} vs {no[0]}"
    assert ns[1] == no[1]


def test_planted_positives_are_the_planted_ones(spark, planted_dir):
    _, rows = _spark_rows(spark, planted_dir, "exact_dup_groups")
    groups = {tuple(r[2]): (r[1], r[3]) for r in rows}
    assert groups == {(3, 7, 11): (3, True), (5, 15): (2, False)}

    _, pairs = _spark_rows(spark, planted_dir, "embedding_dup_pairs")
    assert sorted(pairs) == [(100, 101), (102, 103)]

    # SemDeDup face: exactly the non-canonical cluster members drop
    _, kept = _spark_rows(spark, planted_dir, "embedding_dedup_survivors")
    kept_ids = {r[0] for r in kept}
    assert 101 not in kept_ids and 103 not in kept_ids
    assert {100, 102} <= kept_ids and len(kept_ids) == 32
