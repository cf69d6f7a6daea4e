"""Lexical retrieval over the documents corpus: BM25 top-k.

Beyond-reference similarity-search family (the embedding side lives in
stages/ann.py; this is the sparse/lexical baseline a training-data
pipeline pairs with it — e.g. BM25 mining of hard negatives ahead of
the reference's sentence-transformer fine-tune, eridu/train/*):

- ``bm25_topk`` — Okapi BM25 (k1=1.2, b=0.75, the Lucene-style
  ``ln(1 + (N - df + .5)/(df + .5))`` idf) of a fixed query over every
  document, top-k by score with a deterministic doc_id tie-break.

Two passes, both streaming:

1. **Corpus statistics**: one ``map_batches`` emits a per-batch partial
   row (n_docs, sum_dl, df per query term); the driver folds the
   per-block partials — a bounded artifact, one slim row per block, the
   same posture as the flagship's hot-key list — into idf weights and
   avgdl, broadcast once via ``ray.put``.
2. **Scoring**: one ``map_batches`` computes every doc's score fully
   vectorized (term tf via one flatten + isin over the Arrow token
   buffer, no per-row Python), keeps each batch's local top-k, and a
   final ``sort(desc).limit(k)`` over the per-batch survivors (≤ k ×
   n_blocks slim rows) resolves the global top-k — the corpus never
   re-sorts.

Oracle parity: scores are IEEE doubles on both sides — every
arithmetic step is written in the SAME operand order as the SQL
(ln/ * / / are correctly-rounded or shared-libm, integer-valued inputs
are exact), and the gate hashes ``floor(score * 1e6)`` so the driver
compares integers.  At 100 TB the only exchange is the ≤ k×blocks
survivor sort; pass-1 partials are one row per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: BM25 parameters; TF_SCALE is (k1 + 1) pre-folded as one literal so
#: both engines multiply by the SAME double constant
K1 = 1.2
TF_SCALE = 2.2
ONE_MINUS_B = 0.25   # 1 - b with b = 0.75
B = 0.75

#: fixed query (terms chosen with distinct document frequencies so the
#: idf weights differ: 'dup' is rare, the others near-ubiquitous)
QUERY_TERMS = ("dup", "vector", "merge")
TOPK = 20


def _rp(sf_dir: str, cols):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)


def _doc_term_stats(b: pa.Table, terms=QUERY_TERMS):
    """Vectorized per-doc (dl, tf-per-query-term) from one split pass:
    dl = token count after dropping '' (the oracle's list_filter), tf
    via bincount over the flat token stream masked per term."""
    toks = pc.split_pattern(b["text"], " ")
    la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = la.flatten()
    offsets = la.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offsets)
    tok_doc = np.repeat(np.arange(b.num_rows), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    dl = np.bincount(tok_doc[nonempty], minlength=b.num_rows)
    tfs = []
    for t in terms:
        m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
        tfs.append(np.bincount(tok_doc[m], minlength=b.num_rows))
    return dl.astype(np.int64), [tf.astype(np.int64) for tf in tfs]


def q_bm25_topk(sf_dir: str, k: int = TOPK, terms=QUERY_TERMS):
    """Top-k documents by BM25 score of ``terms``: (doc_id,
    score_micro), score_micro = floor(score * 1e6), tie-break doc_id.
    The driver registry runs the QUERY_TERMS default (oracle-paired);
    the CLI ``search`` command passes arbitrary terms."""
    import ray

    ds = _rp(sf_dir, ["doc_id", "text"])

    stat_schema = pa.schema(
        [("n_docs", pa.int64()), ("sum_dl", pa.int64())]
        + [(f"df{i}", pa.int64()) for i in range(len(terms))])

    def stats_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return stat_schema.empty_table()
        dl, tfs = _doc_term_stats(b, terms)
        row = {"n_docs": [b.num_rows], "sum_dl": [int(dl.sum())]}
        for i, tf in enumerate(tfs):
            row[f"df{i}"] = [int((tf > 0).sum())]
        return pa.table(row, schema=stat_schema)

    # bounded driver artifact: ONE slim row per input block
    part_list = list(
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None))
    parts = (pa.concat_tables(part_list) if part_list
             else stat_schema.empty_table())
    n = float(pc.sum(parts["n_docs"]).as_py() or 0)
    if n == 0:
        # empty corpus: a schema-stable 0-row DATASET (ADVICE r4) — the
        # CLI search path calls .take_all(), which a bare pa.Table lacks.
        # take_all()/schema() preserve the columns; only .to_pandas()
        # drops them on 0 rows (Ray 2.49 quirk, verified), and no caller
        # of the empty branch goes through to_pandas.
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "score_micro": pa.array([], pa.int64())}))
    sum_dl = float(pc.sum(parts["sum_dl"]).as_py())
    avgdl = sum_dl / n
    idfs = []
    for i in range(len(terms)):
        df = float(pc.sum(parts[f"df{i}"]).as_py() or 0)
        # SAME operand order as the SQL: ln(((n - df + .5)/(df + .5)) + 1)
        idfs.append(np.log((n - df + 0.5) / (df + 0.5) + 1.0))
    bref = ray.put((idfs, avgdl))

    def score(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "score_micro": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        idf, ad = ray.get(bref)
        dl, tfs = _doc_term_stats(b, terms)
        dlf = dl.astype(np.float64)
        # k1 * (1 - b + (b * dl) / avgdl), operand order mirrors the SQL
        denom_base = K1 * (ONE_MINUS_B + (B * dlf) / ad)
        s = np.zeros(b.num_rows, np.float64)
        for i, tf in enumerate(tfs):  # loop over QUERY TERMS, not rows
            tff = tf.astype(np.float64)
            s = s + idf[i] * ((tff * TF_SCALE) / (tff + denom_base))
        micro = np.floor(s * 1_000_000.0).astype(np.int64)
        keep = micro > 0
        if not keep.any():
            return empty
        doc = b["doc_id"].to_numpy(zero_copy_only=False)[keep]
        micro = micro[keep]
        # per-batch local top-k: (-score, doc_id) lexsort
        order = np.lexsort((doc, -micro))[:k]
        return pa.table({"doc_id": pa.array(doc[order], pa.int64()),
                         "score_micro": pa.array(micro[order], pa.int64())})

    return (ds.map_batches(score, batch_format="pyarrow")
            .sort(["score_micro", "doc_id"], descending=[True, False])
            .limit(k))


RETRIEVAL_QUERIES = {"bm25_topk": q_bm25_topk}

_TS = "list_filter(string_split(text, ' '), x -> x <> '')"
_TFS = ", ".join(
    f"len(list_filter(ts, x -> x = '{t}'))::DOUBLE AS tf{i}"
    for i, t in enumerate(QUERY_TERMS))
_DFS = ", ".join(
    f"sum((tf{i} > 0)::INT)::DOUBLE AS df{i}"
    for i in range(len(QUERY_TERMS)))
_SCORE = " + ".join(
    f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0) * ((tf{i} * {TF_SCALE}) "
    f"/ (tf{i} + {K1} * ({ONE_MINUS_B} + ({B} * dl) / (sumdl / n))))"
    for i in range(len(QUERY_TERMS)))

ORACLE_SQL = {
    "bm25_topk": (
        f"WITH t AS (SELECT doc_id, {_TS} AS ts FROM documents), "
        f"f AS (SELECT doc_id, len(ts)::DOUBLE AS dl, {_TFS} FROM t), "
        f"g AS (SELECT count(*)::DOUBLE AS n, sum(dl) AS sumdl, {_DFS} "
        "FROM f), "
        f"s AS (SELECT doc_id, {_SCORE} AS score FROM f, g) "
        "SELECT doc_id, CAST(floor(score * 1000000.0) AS BIGINT) "
        "AS score_micro FROM s "
        "WHERE CAST(floor(score * 1000000.0) AS BIGINT) > 0 "
        f"ORDER BY score_micro DESC, doc_id LIMIT {TOPK}"),
}
