"""Training-example preparation operators (beyond-reference, SURVEY §2.9).

Two operators a training-data pipeline needs between "curated corpus"
and "tokenizer-ready shards", both oracle-paired:

``chunk_docs`` — fixed-size overlapping character chunks (1→N explode):
every document is split into windows of ``CHUNK_CHARS`` codepoints with
stride ``CHUNK_STRIDE`` (overlap = chunk − stride), the standard
context-window chunking step ahead of tokenization.  Scale shape: a
stateless ``map_batches`` explode with NO shuffle; the per-batch kernel
is vectorized per CHUNK INDEX, not per row — iteration count is the max
chunk count in the batch (longest doc / stride), and each iteration is
one full-column ``pc.utf8_slice_codeunits`` over the rows still long
enough, so a 100 TB corpus pays a handful of Arrow kernel calls per
block regardless of row count.

``pack_sequences`` — concat-and-chunk sequence packing (GPT-style):
documents are assigned to a training shard (``doc_id % NUM_SHARDS``,
the deterministic analog of a seeded global shuffle), ordered within
the shard, and packed by START OFFSET in the shard's concatenated
stream: ``pack_id = floor((running_sum − own_len) / PACK_BUDGET)`` —
i.e. each example lands in the pack where its first character falls
when the shard is concatenated and cut every ``PACK_BUDGET`` chars.
This is a running-window (prefix-scan) aggregate, an operator class
Ray Data's groupby/aggregate cannot express; it is implemented as ONE
``groupby(shard)`` exchange + a vectorized per-shard cumsum.
Partitioning assumption (documented per the custom-operator rule): a
single training shard fits one task — which holds by construction,
because NUM_SHARDS is chosen ≥ cluster parallelism precisely so that
shards are worker-sized (that is what an output training shard IS); at
100 TB one raises NUM_SHARDS, never the per-task volume.

Reference anchor: the reference's nearest analogs are the per-epoch
resample/split machinery (eridu/train/dataset.py:54-99,
fine_tune_sbert.py:217-227) — batch construction for training — but it
has no chunking/packing because its rows are short names; these become
load-bearing exactly at web-page scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CHUNK_CHARS = 120
CHUNK_STRIDE = 90
NUM_SHARDS = 16
PACK_BUDGET = 2048


def _rp(sf_dir: str, name: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def chunk_batch(b: pa.Table, chunk: int = CHUNK_CHARS,
                stride: int = CHUNK_STRIDE) -> pa.Table:
    """Explode one Arrow batch into overlapping character chunks.

    Chunk count per doc: 1 if len <= chunk else
    ceil((len - chunk) / stride) + 1 — i.e. window starts 0, stride,
    2*stride, ... until the window covers the tail.  Codepoint-based on
    both sides (pc.utf8_* and DuckDB length/substr count codepoints).
    """
    lens = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False)
    nc = np.where(lens <= chunk, 1,
                  (lens - chunk + stride - 1) // stride + 1).astype(np.int64)
    out = []
    max_nc = int(nc.max()) if nc.size else 0
    for i in range(max_nc):
        sel = np.flatnonzero(nc > i)
        if sel.size == 0:
            break
        sub = b.take(pa.array(sel))
        piece = pc.utf8_slice_codeunits(sub["text"], start=i * stride,
                                        stop=i * stride + chunk)
        out.append(pa.table({
            "doc_id": sub["doc_id"],
            "chunk_index": pa.array(np.full(sel.size, i, np.int64)),
            "chunk_text": piece,
            "chunk_len": pc.cast(pc.utf8_length(piece), pa.int64()),
        }))
    if not out:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "chunk_index": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.string()),
                         "chunk_len": pa.array([], pa.int64())})
    return pa.concat_tables(out)


def q_chunk_docs(sf_dir: str, chunk: int = CHUNK_CHARS,
                 stride: int = CHUNK_STRIDE):
    """Overlapping fixed-size chunk explode over documents (oracle-paired
    at the default chunk/stride — the module constants the SQL mirrors;
    both are parameters, not baked literals)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(chunk_batch, batch_format="pyarrow",
                          fn_kwargs={"chunk": chunk, "stride": stride})


def pack_shard(g: pa.Table, budget: int = PACK_BUDGET) -> pa.Table:
    """Pack one shard: order by doc_id, running char sum, start-offset bin."""
    order = np.argsort(g["doc_id"].to_numpy(zero_copy_only=False),
                       kind="stable")
    t = g.take(pa.array(order))
    lens = t["chars"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(lens)
    return pa.table({
        "doc_id": t["doc_id"],
        "shard": t["shard"],
        "cum_chars": pa.array(cum.astype(np.int64)),
        "pack_id": pa.array(((cum - lens) // budget).astype(np.int64)),
    })


def q_pack_sequences(sf_dir: str, num_shards: int = NUM_SHARDS,
                     budget: int = PACK_BUDGET):
    """Shard assignment + per-shard prefix-scan packing (oracle-paired at
    the default shard count / budget).  ``num_shards`` is SEMANTIC (shard
    ids are part of the result), not a parallelism knob: at scale one
    raises it so each shard stays worker-sized, and the oracle constant
    moves with it."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"],
            "shard": pa.array((did % num_shards).astype(np.int64)),
            "chars": pc.cast(pc.utf8_length(b["text"]), pa.int64()),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(pack_shard, batch_format="pyarrow",
                        fn_kwargs={"budget": budget}))


TRAINING_QUERIES = {
    "chunk_docs": q_chunk_docs,
    "pack_sequences": q_pack_sequences,
}

ORACLE_SQL = {
    "chunk_docs": f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS L FROM documents
), n AS (
  SELECT doc_id, text,
         CASE WHEN L <= {CHUNK_CHARS} THEN 1
              ELSE (L - {CHUNK_CHARS} + {CHUNK_STRIDE} - 1)
                   // {CHUNK_STRIDE} + 1 END AS nc
  FROM d
), e AS (
  SELECT doc_id, text, unnest(range(nc)) AS chunk_index FROM n
)
SELECT doc_id, chunk_index,
       substr(text, CAST(chunk_index * {CHUNK_STRIDE} + 1 AS BIGINT),
              {CHUNK_CHARS}) AS chunk_text,
       length(substr(text, CAST(chunk_index * {CHUNK_STRIDE} + 1 AS BIGINT),
                     {CHUNK_CHARS})) AS chunk_len
FROM e
""",
    "pack_sequences": f"""
WITH d AS (
  SELECT doc_id, length(text) AS L,
         doc_id % {NUM_SHARDS} AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(sum(L) OVER w AS BIGINT) AS cum_chars,
       CAST((sum(L) OVER w - L) // {PACK_BUDGET} AS BIGINT) AS pack_id
FROM d
WINDOW w AS (PARTITION BY shard ORDER BY doc_id)
""",
}
