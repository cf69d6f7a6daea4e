"""Driver-mirror correctness gate: every SQL-expressible query in
__ray_entry__.queries() must match its DuckDB oracle at sf0.001 —
row count, column names, and order-insensitive values."""

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("ERIDU_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _query_names():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    names = [n for n in entrymod.queries() if n in entrymod.oracle_sql()]
    return entrymod, names


ENTRYMOD, NAMES = _query_names()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, con):
    fn = ENTRYMOD.queries()[name]
    got = _canon(_to_pandas(fn(SF_DIR)))
    want = _canon(con.sql(ENTRYMOD.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def _parent_cases():
    """Merged-row parents: each keeps its own function + SQL even though
    the driver registry carries only the merged row (doc_profile /
    regex_transforms)."""
    from eridu_ray.pipelines import relational, textstats

    return [
        ("quality_scores", relational.q_quality_scores,
         relational.ORACLE_SQL["quality_scores"]),
        ("doc_fingerprint", relational.q_doc_fingerprint,
         relational.ORACLE_SQL["doc_fingerprint"]),
        ("url_canon", relational.q_url_canon,
         relational.ORACLE_SQL["url_canon"]),
        ("redact_numbers", textstats.q_redact_numbers,
         textstats.ORACLE_SQL["redact_numbers"]),
    ]


@pytest.mark.parametrize("name,fn,sql",
                         _parent_cases(),
                         ids=[c[0] for c in _parent_cases()])
def test_merged_row_parent_matches_oracle(name, fn, sql, con):
    got = _canon(_to_pandas(fn(SF_DIR)))
    want = _canon(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_registry_fits_driver_window():
    """The driver checks at most 50 queries() entries in registration
    order (VERDICT r3 #1) — every registered operator must land inside
    that window, and every oracle key must pair with a registered
    query."""
    qs = ENTRYMOD.queries()
    assert len(qs) <= 50, len(qs)
    assert set(ENTRYMOD.oracle_sql()) <= set(qs)


def test_rows_only_queries_run():
    """Quick smoke of rows-only entries NOT exercised by dedicated tests
    (text dedup family -> test_ops; flagship/component_split ->
    test_pipeline/test_evaluate; ANN -> test_ops; multimodal decode ->
    test_ops).  The driver sweeps every entry at sf0.01 regardless."""
    qs = ENTRYMOD.queries()
    for name in ("multimodal_decode", "checks_conformance"):
        df = _to_pandas(qs[name](SF_DIR))
        assert len(df) >= 0 and len(df.columns) > 0, name
    # the merged text-dedup entry must exercise all variant paths that
    # produce pairs at this sf (exact-dup pairs are 0 by construction)
    td = _to_pandas(qs["text_dedup_pairs"](SF_DIR))
    assert set(td.columns) == {"method", "doc_id_a", "doc_id_b"}
    assert {"minhash", "simhash", "ngram_jaccard"} <= set(td["method"]), \
        sorted(set(td["method"]))
