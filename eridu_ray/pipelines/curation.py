"""Corpus-curation operators for LLM training-data pipelines.

Beyond-reference family (the reference stops at near-dup detection,
eridu/etl/*; these are the standard curation passes that run beside it
on a web corpus — C4/Gopher heuristic filtering, CCNet-style boilerplate
detection, and cross-source overlap analysis):

- ``c4_quality_filter`` — per-document heuristic quality verdict in the
  C4 / Gopher style: word count in range, max word length cap,
  duplicate-word fraction cap (integer cross-multiplied so the oracle
  matches bit-for-bit), and stopword presence.  Fully vectorized per
  batch, zero shuffle — embarrassingly parallel at any corpus size.
- ``boilerplate_ngrams`` — word-5-grams appearing in >= K DISTINCT
  documents (the n-gram analog of CCNet's repeated-paragraph
  boilerplate detection, adapted to the corpus' single-line documents).
  Per-batch DISTINCT (doc, gram) partials combine before one
  gram-keyed groupby, so the all-to-all exchange is proportional to the
  distinct-gram vocabulary, not the corpus token stream — the same
  shape as ``textstats.q_vocab_topk``.
- ``source_ngram_overlap`` — for every pair of sources, the number of
  distinct word-5-grams present in both (dump-to-dump overlap analysis:
  the signal used to decide whether two crawls/dumps are worth
  deduplicating against each other).  Grams travel as u64 hashes
  (8 B/row; same collision posture as exact dedup's content hash —
  documented, not silent), pair counting is pid-bucketed partition-local
  work, and the final exchange is <= |sources|^2 rows.

Scale notes: no stage materializes the corpus on the driver; the only
all-to-all exchanges are vocabulary-sized (boilerplate) or
source-pair-sized (overlap).  Documents whose token list is empty after
dropping '' tokens are excluded from c4_quality_filter (matches the
oracle's ``len(ts) > 0`` guard; a zero-token doc has no max word
length).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: c4_quality_filter thresholds (integer/exact so DuckDB agrees
#: bit-for-bit): word count in [MIN_WORDS, MAX_WORDS], max word length
#: <= MAX_WORD_LEN, distinct/total word ratio >= 1/DUP_RATIO_DEN
#: (cross-multiplied: DUP_RATIO_NUM * n_distinct >= n_words), and at
#: least one stopword token present
MIN_WORDS = 20
MAX_WORDS = 100
MAX_WORD_LEN = 12
DUP_RATIO_NUM = 2  # n_distinct >= n_words / 2
STOPWORDS = ("the", "a")

#: boilerplate_ngrams: gram order and the min distinct-doc count
NGRAM_N = 5
MIN_DOCS = 2


def _rp(sf_dir: str, cols):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)


def _doc_ngrams(b: pa.Table, n: int):
    """(doc_idx, gram) for every word-n-gram of every doc in the batch,
    vectorized from the Arrow list offsets ('' tokens dropped first, the
    list_filter the oracle applies).  Returns (np.int64 doc indices,
    pa.StringArray grams)."""
    toks = pc.split_pattern(b["text"], " ")
    la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = la.flatten()
    offsets = la.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offsets)
    tok_doc = np.repeat(np.arange(b.num_rows), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    new_lens = np.bincount(tok_doc[keep], minlength=b.num_rows)
    starts = np.r_[0, np.cumsum(new_lens)[:-1]]
    # grouped arange: each doc contributes max(len - n + 1, 0) left
    # positions, all inside its own token run
    cnt = np.maximum(new_lens - (n - 1), 0)
    if cnt.sum() == 0:
        return (np.array([], np.int64), pa.array([], pa.string()))
    ends = np.cumsum(cnt)
    within = np.arange(ends[-1]) - np.repeat(ends - cnt, cnt)
    idx = np.repeat(starts, cnt) + within
    doc_idx = np.repeat(np.arange(b.num_rows), cnt)
    parts = [flat.take(pa.array(idx + k)) for k in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    return doc_idx, grams


def q_c4_quality_filter(sf_dir: str):
    """Per-document C4/Gopher-style quality verdict: (doc_id, n_words,
    n_distinct, max_word_len, has_stop, keep) — exact integers only, so
    the oracle hash matches bit-for-bit.  Zero shuffle."""
    from eridu_ray.pipelines.textstats import _doc_token_tf

    ds = _rp(sf_dir, ["doc_id", "text"])

    schema = pa.schema([("doc_id", pa.int64()), ("n_words", pa.int64()),
                        ("n_distinct", pa.int64()),
                        ("max_word_len", pa.int64()),
                        ("has_stop", pa.int64()), ("keep", pa.int64())])

    def f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return schema.empty_table()
        d, t, tf = _doc_token_tf(b)  # per-doc DISTINCT tokens + tf
        if len(d) == 0:
            return schema.empty_table()
        ts = pd.Series(t)
        g = (pd.DataFrame({
                "d": d, "tf": tf,
                "wl": ts.str.len().to_numpy(),
                "stop": ts.isin(STOPWORDS).to_numpy()})
             .groupby("d", sort=True)
             .agg(n_words=("tf", "sum"), n_distinct=("tf", "size"),
                  max_word_len=("wl", "max"), has_stop=("stop", "any")))
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False)[g.index]
        nw = g["n_words"].to_numpy(np.int64)
        nd = g["n_distinct"].to_numpy(np.int64)
        mw = g["max_word_len"].to_numpy(np.int64)
        hs = g["has_stop"].to_numpy(bool)
        keep = ((nw >= MIN_WORDS) & (nw <= MAX_WORDS)
                & (mw <= MAX_WORD_LEN)
                & (DUP_RATIO_NUM * nd >= nw) & hs)
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "n_words": pa.array(nw),
                         "n_distinct": pa.array(nd),
                         "max_word_len": pa.array(mw),
                         "has_stop": pa.array(hs.astype(np.int64)),
                         "keep": pa.array(keep.astype(np.int64))})

    return ds.map_batches(f, batch_format="pyarrow")


def q_boilerplate_ngrams(sf_dir: str, n: int = NGRAM_N,
                         min_docs: int = MIN_DOCS):
    """Word-n-grams shared by >= ``min_docs`` distinct documents:
    (ngram, ndocs).  Per-batch DISTINCT (doc, gram) partials combine
    before the gram groupby — exchange ∝ distinct grams."""
    ds = _rp(sf_dir, ["text"])

    def partial(b: pa.Table) -> pa.Table:
        doc_idx, grams = _doc_ngrams(b, n)
        if len(doc_idx) == 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        # distinct (doc, gram) within the batch, then docs-per-gram
        df = pd.DataFrame({"d": doc_idx,
                           "g": grams.to_numpy(zero_copy_only=False)})
        dg = df.drop_duplicates()
        vc = dg["g"].value_counts(sort=False)
        return pa.table({"ngram": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("ngram").sum("n")
            .rename_columns({"sum(n)": "ndocs"})
            .filter(expr=f"ndocs >= {min_docs}"))


def q_source_ngram_overlap(sf_dir: str, n: int = NGRAM_N,
                           num_pid: int | None = None):
    """Distinct shared word-n-grams per source pair: (source_a,
    source_b, n_shared), source_a < source_b.

    Grams are hashed to u64 before the exchange (8 B/row vs the gram
    string; a collision would merge two grams — p ~ |grams|²/2⁶⁵, the
    exact-dedup posture).  One pid(gram-hash) shuffle of DISTINCT
    (hash, source) partials; each partition dedups globally, self-pairs
    the sources of each gram (≤ |sources| per gram), and emits partial
    pair counts; the final exchange is ≤ |sources|² rows."""
    if num_pid is None:
        from eridu_ray.config import DEFAULT_CONFIG

        num_pid = DEFAULT_CONFIG.num_partitions
    from eridu_ray.kernels.hashing import hash_strings_u64

    ds = _rp(sf_dir, ["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        doc_idx, grams = _doc_ngrams(b, n)
        empty = pa.table({"h": pa.array([], pa.uint64()),
                          "source": pa.array([], pa.string()),
                          "pid": pa.array([], pa.int32())})
        if len(doc_idx) == 0:
            return empty
        src = b["source"].to_numpy(zero_copy_only=False)[doc_idx]
        # hash only the batch-distinct grams (factorize → one blake2b
        # per unique), then fan the codes back out
        codes, uniq = pd.factorize(grams.to_numpy(zero_copy_only=False))
        h = hash_strings_u64(list(uniq))[codes]
        df = pd.DataFrame({"h": h, "source": src}).drop_duplicates()
        return pa.table({
            "h": pa.array(df["h"].to_numpy(np.uint64)),
            "source": pa.array(df["source"], pa.string()),
            "pid": pa.array((df["h"].to_numpy(np.uint64)
                             % np.uint64(num_pid)).astype(np.int32))})

    def pair_part(g: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"h": g["h"].to_numpy(zero_copy_only=False),
                            "source": g["source"].to_pandas()})
              .drop_duplicates())
        m = df.merge(df, on="h")
        m = m[m["source_x"] < m["source_y"]]
        pc_ = (m.groupby(["source_x", "source_y"], sort=False)
               .size().reset_index(name="n"))
        return pa.table({
            "source_a": pa.array(pc_["source_x"], pa.string()),
            "source_b": pa.array(pc_["source_y"], pa.string()),
            "n": pa.array(pc_["n"].to_numpy(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("pid").map_groups(pair_part, batch_format="pyarrow")
            .groupby(["source_a", "source_b"]).sum("n")
            .rename_columns({"sum(n)": "n_shared"}))


CURATION_QUERIES = {
    "c4_quality_filter": q_c4_quality_filter,
    "boilerplate_ngrams": q_boilerplate_ngrams,
    "source_ngram_overlap": q_source_ngram_overlap,
}

_TS = "list_filter(string_split(text, ' '), x -> x <> '')"
_GRAMS = ("list_transform(range(1, len(ts) - 3), "
          "i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || "
          "ts[i+3] || ' ' || ts[i+4])")

ORACLE_SQL = {
    "c4_quality_filter": (
        f"WITH t AS (SELECT doc_id, {_TS} AS ts FROM documents), "
        "s AS (SELECT doc_id, len(ts)::BIGINT AS n_words, "
        "len(list_distinct(ts))::BIGINT AS n_distinct, "
        "list_max(list_transform(ts, x -> length(x)))::BIGINT "
        "AS max_word_len, "
        "(list_contains(ts, 'the') OR list_contains(ts, 'a'))::BIGINT "
        "AS has_stop FROM t WHERE len(ts) > 0) "
        "SELECT doc_id, n_words, n_distinct, max_word_len, has_stop, "
        f"(n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS} "
        f"AND max_word_len <= {MAX_WORD_LEN} "
        f"AND {DUP_RATIO_NUM} * n_distinct >= n_words "
        "AND has_stop = 1)::BIGINT AS keep FROM s"),
    "boilerplate_ngrams": (
        f"WITH t AS (SELECT doc_id, {_TS} AS ts FROM documents), "
        f"g AS (SELECT doc_id, unnest({_GRAMS}) AS ngram FROM t) "
        "SELECT ngram, count(DISTINCT doc_id)::BIGINT AS ndocs "
        f"FROM g GROUP BY ngram HAVING ndocs >= {MIN_DOCS}"),
    "source_ngram_overlap": (
        f"WITH t AS (SELECT source, {_TS} AS ts FROM documents), "
        f"g AS (SELECT DISTINCT source, unnest({_GRAMS}) AS ngram "
        "FROM t) "
        "SELECT a.source AS source_a, b.source AS source_b, "
        "count(*)::BIGINT AS n_shared FROM g a "
        "JOIN g b ON a.ngram = b.ngram AND a.source < b.source "
        "GROUP BY 1, 2"),
}
