"""Text-statistics operator tests (textstats.py): DuckDB oracle parity at
sf0.001 plus adversarial edge fixtures (empty docs, double spaces, ties)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from eridu_ray.pipelines.textstats import (ORACLE_SQL, TEXTSTATS_QUERIES,
                                           _bigrams_batch, _doc_token_tf,
                                           _RarestTermScorer)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(TEXTSTATS_QUERIES))
def test_oracle_parity(ray_session, name):
    con = duckdb.connect()
    con.sql("create view documents as select * from "
            f"read_parquet('{SF}/documents.parquet')")
    got = TEXTSTATS_QUERIES[name](SF).to_pandas()
    want = con.sql(ORACLE_SQL[name]).df()
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    a = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = want[cols].sort_values(cols).reset_index(drop=True).astype(str)
    pd.testing.assert_frame_equal(a, b)


def test_bigrams_respect_doc_boundaries():
    b = pa.table({"text": ["a b c", "d e", "f", ""]})
    got = sorted(_bigrams_batch(b).to_pylist())
    # no cross-doc bigram ("c d"), single-token and empty docs emit none
    # ("" doc splits to one '' token -> no pair)
    assert got == ["a b", "b c", "d e"]


def test_bigrams_keep_empty_token_forms():
    # double space yields an empty middle token — kept, matching the SQL
    got = sorted(_bigrams_batch(pa.table({"text": ["a  b"]})).to_pylist())
    assert got == [" b", "a "]


def test_doc_token_tf_counts_and_filters():
    d, t, tf = _doc_token_tf(pa.table({"text": ["x x y", "", "y"]}))
    rows = sorted(zip(d.tolist(), t.tolist(), tf.tolist()))
    assert rows == [(0, "x", 2), (0, "y", 1), (2, "y", 1)]


def test_rarest_term_tie_breaks(ray_session):
    """df asc, then tf desc, then token asc."""
    import ray

    # docs: 'q' appears in 1 doc (rarest), 'a'/'b' in 2
    df_table = pa.table({"token": ["a", "b", "q"],
                         "df": pa.array([2, 2, 1], pa.int64())})
    scorer = _RarestTermScorer(ray.put(df_table))
    out = scorer(pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": ["a b q", "b b a"]})).to_pandas().set_index("doc_id")
    assert out.loc[10, "token"] == "q"      # min df wins
    assert out.loc[11, "token"] == "b"      # df tie -> max tf
    # all-tie case: token asc
    out2 = scorer(pa.table({"doc_id": pa.array([12], pa.int64()),
                            "text": ["b a"]})).to_pandas()
    assert out2["token"][0] == "a"


def test_rarest_term_path_selection():
    from eridu_ray.pipelines.textstats import (BROADCAST_MAX_VOCAB,
                                               rarest_term_path)

    assert rarest_term_path(100, BROADCAST_MAX_VOCAB) == "broadcast"
    assert rarest_term_path(BROADCAST_MAX_VOCAB, BROADCAST_MAX_VOCAB) \
        == "broadcast"
    assert rarest_term_path(BROADCAST_MAX_VOCAB + 1, BROADCAST_MAX_VOCAB) \
        == "join"


def test_rarest_term_join_path_matches_oracle(ray_session):
    """Force the scale fallback (broadcast_max_vocab=0 -> join path) and
    assert it produces the same oracle-green result as the broadcast
    path (VERDICT r3 #5)."""
    from eridu_ray.pipelines.textstats import q_rarest_term

    con = duckdb.connect()
    con.sql("create view documents as select * from "
            f"read_parquet('{SF}/documents.parquet')")
    got = q_rarest_term(SF, broadcast_max_vocab=0,
                        num_partitions=4).to_pandas()
    want = con.sql(ORACLE_SQL["rarest_term"]).df()
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    a = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = want[cols].sort_values(cols).reset_index(drop=True).astype(str)
    pd.testing.assert_frame_equal(a, b)


def test_redact_is_re2_exact(ray_session):
    # redact_numbers left TEXTSTATS_QUERIES when the driver registry
    # merged it into relational.q_regex_transforms; the function and its
    # SQL stay importable and gated here
    from eridu_ray.pipelines.textstats import q_redact_numbers

    got = q_redact_numbers(SF).to_pandas().set_index("doc_id")
    import pyarrow.parquet as pq
    import re

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    pat = re.compile(r"[0-9]+")
    for _, r in docs.head(50).iterrows():
        assert got.loc[r.doc_id, "red"] == pat.sub("#", r.text)
        assert got.loc[r.doc_id, "n_nums"] == len(pat.findall(r.text))


def test_pctl_kernel_merges_partials_and_matches_duckdb():
    """The partition kernel must merge duplicate (lang, v) histogram
    partials before the cumsum walk, and its rank rule must equal
    DuckDB's percentile_disc on adversarial sizes (n=1, ties, n where
    q*n is a float edge)."""
    from eridu_ray.pipelines.textstats import PCTL_QS, _pctl_partition

    # lang 'a': values 1..100 split into two partial rows per value;
    # lang 'b': single doc of length 7; lang 'c': all-equal lengths
    langs, vs, ns = [], [], []
    for v in range(1, 101):
        langs += ["a", "a"]
        vs += [v, v]
        ns += [1, 1]          # merged: n=2 per value, total 200
    langs += ["b", "c", "c"]
    vs += [7, 5, 5]
    ns += [1, 3, 2]
    g = pa.table({"lang": pa.array(langs), "v": pa.array(vs, pa.int64()),
                  "n": pa.array(ns, pa.int64())})
    got = _pctl_partition(g).to_pandas().set_index("lang")
    con = duckdb.connect()
    rows = [("a", v) for v in range(1, 101) for _ in range(2)] \
        + [("b", 7)] + [("c", 5)] * 5
    con.sql("create table t (lang varchar, v bigint)")
    con.executemany("insert into t values (?, ?)", rows)
    want = con.sql(
        "SELECT lang, "
        + ", ".join(
            f"percentile_disc({q}) WITHIN GROUP (ORDER BY v)::BIGINT "
            f"AS {c}" for q, c in PCTL_QS)
        + ", count(*)::BIGINT AS n_docs FROM t GROUP BY lang"
    ).df().set_index("lang")
    for lang in ("a", "b", "c"):
        for _, c in PCTL_QS:
            assert got.loc[lang, c] == want.loc[lang, c], (lang, c)
        assert got.loc[lang, "n_docs"] == want.loc[lang, "n_docs"]


def test_length_percentiles_width_independent(ray_session):
    """Identical results at shuffle widths 1 and 7 (pid is a pure
    function of lang; the kernel is partition-local)."""
    from eridu_ray.pipelines.textstats import q_length_percentiles

    a = (q_length_percentiles(SF, num_pid=1).to_pandas()
         .sort_values("lang").reset_index(drop=True))
    b = (q_length_percentiles(SF, num_pid=7).to_pandas()
         .sort_values("lang").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_vocab_topk_partial_combine_shrinks(ray_session):
    """The per-batch partial must emit <= distinct tokens, not one row per
    token occurrence (the pre-shuffle combiner the module promises)."""
    from eridu_ray.pipelines.textstats import (_flat_tokens,
                                               _partial_counts_batch)

    b = pa.table({"text": ["w w w w w z"] * 100})
    part = _partial_counts_batch(_flat_tokens(b), "token")
    assert part.num_rows == 2  # {w, z}, not 600
    assert dict(zip(part["token"].to_pylist(),
                    part["n"].to_pylist())) == {"w": 500, "z": 100}
