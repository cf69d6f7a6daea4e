"""Curation-family gates: the _doc_ngrams kernel vs a Python reference
(including '' tokens and sub-n docs), C4 verdict semantics on crafted
docs, and source_ngram_overlap vs brute force on a corpus with KNOWN
overlap structure.  Oracle parity at sf0.001 is covered by the
parametrized test in test_relational_oracle.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from eridu_ray.pipelines.curation import (_doc_ngrams, q_c4_quality_filter,
                                          q_source_ngram_overlap)


def _ref_ngrams(texts, n):
    out = []
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w != ""]
        for j in range(len(ws) - n + 1):
            out.append((i, " ".join(ws[j:j + n])))
    return out


def test_doc_ngrams_matches_reference():
    texts = ["a b c d e f",          # 2 five-grams
             "x  y   z",             # '' tokens dropped -> too short
             "",                     # empty doc
             "p q r s t",            # exactly one
             "one two"]              # below n
    b = pa.table({"text": pa.array(texts, pa.string())})
    d, g = _doc_ngrams(b, 5)
    got = sorted(zip(d.tolist(), g.to_pylist()))
    assert got == sorted(_ref_ngrams(texts, 5))
    # trigram order too (the boilerplate/overlap ops are order-generic)
    d3, g3 = _doc_ngrams(b, 3)
    assert sorted(zip(d3.tolist(), g3.to_pylist())) == \
        sorted(_ref_ngrams(texts, 3))


def _write_docs(tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string()),
                  "source": pa.array([r[2] for r in rows], pa.string())}),
        str(d / "documents.parquet"))
    return str(d)


def test_c4_quality_filter_verdicts(ray_session, tmp_path):
    stop_doc = "the " + " ".join(f"w{i}" for i in range(30))  # keep
    no_stop = " ".join(f"w{i}" for i in range(30))            # no stopword
    short = "the small doc"                                   # < MIN_WORDS
    longword = ("the " + " ".join(f"w{i}" for i in range(25))
                + " superduperlongword")                      # word > 12
    repeated = "the " + "dup " * 40                           # distinct/total low
    sf = _write_docs(tmp_path, [(0, stop_doc, "s"), (1, no_stop, "s"),
                                (2, short, "s"), (3, longword, "s"),
                                (4, repeated, "s")])
    got = (q_c4_quality_filter(sf).to_pandas()
           .set_index("doc_id").sort_index())
    assert got.loc[0, "keep"] == 1
    assert got.loc[1, "keep"] == 0 and got.loc[1, "has_stop"] == 0
    assert got.loc[2, "keep"] == 0 and got.loc[2, "n_words"] == 3
    assert got.loc[3, "keep"] == 0 and got.loc[3, "max_word_len"] > 12
    assert got.loc[4, "keep"] == 0 and \
        2 * got.loc[4, "n_distinct"] < got.loc[4, "n_words"]
    # exact stats on doc 0: 31 words, all distinct, has_stop
    assert got.loc[0, "n_words"] == 31 and got.loc[0, "n_distinct"] == 31


def test_source_ngram_overlap_brute_force(ray_session, tmp_path):
    """Known overlap structure: srcA and srcB share exactly the grams of
    one common sentence; srcC shares nothing.  The u64-hash pipeline
    must reproduce the string-level brute-force counts."""
    common = "alpha beta gamma delta epsilon zeta"   # 2 five-grams
    rows = [(0, common + " one two three", "srcA"),
            (1, common + " four five six", "srcB"),
            (2, "totally different words here now and then more", "srcC"),
            # a second doc per source must NOT inflate the distinct count
            (3, common, "srcA")]
    sf = _write_docs(tmp_path, rows)
    got = (q_source_ngram_overlap(sf, num_pid=3).to_pandas()
           .sort_values(["source_a", "source_b"]).reset_index(drop=True))

    grams = {}
    for _, text, src in rows:
        ws = text.split(" ")
        grams.setdefault(src, set()).update(
            " ".join(ws[j:j + 5]) for j in range(len(ws) - 4))
    want = []
    srcs = sorted(grams)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            n = len(grams[a] & grams[b])
            if n:
                want.append((a, b, n))
    want_df = pd.DataFrame(want, columns=["source_a", "source_b",
                                          "n_shared"])
    pd.testing.assert_frame_equal(got, want_df, check_dtype=False)
    assert got["n_shared"].sum() == 2  # the two shared five-grams


def test_boilerplate_ngrams_distinct_doc_semantics(ray_session, tmp_path):
    """ndocs counts DISTINCT documents — a gram repeated inside one doc
    does not reach min_docs."""
    from eridu_ray.pipelines.curation import q_boilerplate_ngrams

    g = "b1 b2 b3 b4 b5"
    rows = [(0, g + " " + g, "s"),          # repeated within ONE doc
            (1, "c1 c2 c3 c4 c5 x y z", "s"),
            (2, "c1 c2 c3 c4 c5 p q r", "s")]  # shared across two docs
    sf = _write_docs(tmp_path, rows)
    got = q_boilerplate_ngrams(sf, min_docs=2).to_pandas()
    assert list(got["ngram"]) == ["c1 c2 c3 c4 c5"]
    assert list(got["ndocs"]) == [2]


def test_curation_oracle_sql_keys_match():
    from eridu_ray.pipelines.curation import CURATION_QUERIES, ORACLE_SQL

    assert set(CURATION_QUERIES) == set(ORACLE_SQL)
