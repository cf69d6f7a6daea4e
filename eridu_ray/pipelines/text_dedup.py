"""Dedup operator family over a plain text table (documents.parquet).

Each function is a standalone ``queries()`` entry exposing one dedup
technique from the global inventory — exact-hash, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine — as its own pipeline over
``documents(doc_id, text, ...)``.  They reuse the flagship stage library
(signatures/candidates/verify) with ``url = str(doc_id)``; rows-only
correctness checks at the driver, brute-force oracles in tests/.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from eridu_ray.config import PipelineConfig
from eridu_ray.stages import candidates as cand
from eridu_ray.stages.signatures import SignatureStage
from eridu_ray.stages.verify import verify_pairs_reduce


def _documents_as_pages(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(b["doc_id"], pa.string()),
            "text": b["text"],
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _signatures(sf_dir: str, cfg: PipelineConfig, winnow_only: bool = False):
    # winnow_only: the substring family needs node ids + text + winnow
    # fps only — skipping the 128-perm minhash / simhash / verify-blob
    # compute (VERDICT r4 next #6; winnow fps identical between modes)
    stage = SignatureStage(cfg, winnow_only=winnow_only)
    return _documents_as_pages(sf_dir).map_batches(
        lambda b: stage(b), batch_format="pyarrow",
        batch_size=cfg.batch_size)


def make_dedup_full_pairs_fn(winnow_min_hits: int = 1):
    """Cross-band (node_a, node_b) dedup over one pair-pid partition,
    KEEPING the url columns (the slim kernel drops them): vectorized
    run detection, singles pass through zero-copy, duplicate runs merge
    src tags (sorted union) and take the max non-null est — identical
    semantics to candidates.dedup_pairs_fn without its one-group-per-
    distinct-pair groupby (Ray's sort aggregate over millions of
    distinct keys is the measured slow path; pid buckets amortize it).

    ``winnow_min_hits`` > 1 applies the flagship's winnow junk-pair
    guard (candidates.make_dedup_pairs_partition_fn): pairs tagged
    EXACTLY "winnow" that shared fewer than that many distinct
    fingerprints drop.  Callers must size the guard to their span
    contract — a true non-repetitive span of >= 3·window + k - 1 chars
    shares >= 2 bigram fingerprints, so min_hits=2 is complete only
    when min_span >= that bound (substring_spans computes this).  No
    sketch-estimate rescue here: estimates are near-dup signals, and
    on dense-shared-vocab corpora they are high for junk pairs too.
    """
    def fn(group: pa.Table) -> pa.Table:
        a = group["node_a"].to_numpy(zero_copy_only=False)
        b = group["node_b"].to_numpy(zero_copy_only=False)
        n = a.shape[0]
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        new_run = np.concatenate(
            [[True], (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])])
        starts = np.nonzero(new_run)[0]
        ends = np.concatenate([starts[1:], [n]])
        lens = ends - starts
        srcs = None
        singles = order[starts[lens == 1]]
        parts = []
        if singles.size:
            if winnow_min_hits > 1:
                srcs = group["src"].to_pylist()
                singles = np.array(
                    [i for i in singles if srcs[i] != "winnow"],
                    dtype=np.int64)
            if singles.size:
                parts.append(group.take(pa.array(np.sort(singles))))
        multi = np.nonzero(lens >= 2)[0]
        if multi.size:
            if srcs is None:
                srcs = group["src"].to_pylist()
            est_np = group["est"].to_numpy(
                zero_copy_only=False).astype(np.float64)
            keep_idx, ms, me = [], [], []
            for r in multi:
                rows = order[int(starts[r]):int(ends[r])]
                tags = set()
                best = None
                for i in rows:
                    tags.update(srcs[i].split(","))
                    v = est_np[i]
                    if v == v and (best is None or v > best):
                        best = v
                if tags == {"winnow"} and len(rows) < winnow_min_hits:
                    continue
                keep_idx.append(int(rows[0]))
                ms.append(",".join(sorted(tags)))
                me.append(best)
            if keep_idx:
                t = group.take(pa.array(keep_idx)).drop_columns(
                    ["src", "est"])
                t = t.append_column("src", pa.array(ms, pa.string()))
                t = t.append_column("est", pa.array(me, pa.float64()))
                parts.append(t.select(group.column_names))
        if not parts:
            return group.slice(0, 0)
        return pa.concat_tables(parts)

    return fn


_dedup_full_pairs_fn = make_dedup_full_pairs_fn()


def _salted_candidate_pairs(sigs, cfg: PipelineConfig, exploder, key_col: str,
                            src: str, est_min: float | None,
                            max_hamming: int | None = None,
                            stats: dict | None = None,
                            dedup: bool = True,
                            winnow_min_hits: int = 1):
    """Explode -> hot-bucket pre-count -> salted explode -> exact pairs.

    Pair-emitting ops must not lose pairs in hot buckets, so instead of
    the flagship's star fallback the buckets over ``band_group_cap`` are
    triangle-salted (candidates.make_salted_explode): every pair of the
    original bucket is enumerated exactly once, split across s(s+1)/2
    bounded sub-buckets.  ``stats`` (optional) records the hot-bucket
    count and the (always-zero-by-construction) SALT-dropped-pair
    counter.  Note the counter is salting-only: with ``est_min`` set,
    the sketch-estimate prefilter still prunes pairs whose 128-slot
    MinHash estimate falls below it — a noisy-estimate recall tradeoff
    bounded by cfg.prefilter_margin (~3 sigma), not a salting loss.

    ``dedup=True`` collapses cross-band copies via a pair-pid-bucketed
    partition dedup (group-count amortization — NOT one Ray group per
    distinct pair).  Ops that feed verify_pairs_reduce pass
    ``dedup=False`` and fuse the dedup into verify pass 1 instead
    (``dedup_winnow_min_hits=1``), skipping this sort entirely.
    """
    exploded = (sigs.filter(expr="n_shingles > 0")
                .map_batches(lambda b: exploder(b), batch_format="pyarrow",
                             batch_size=cfg.batch_size)).materialize()
    salts = cand.hot_bucket_salts(exploded, key_col, cfg.band_group_cap)
    if stats is not None:
        stats["hot_buckets"] = len(salts)
        stats["salt_dropped_pairs"] = 0  # salting enumerates every pair
        stats["est_prefilter_active"] = est_min is not None
    salted = exploded.map_batches(
        cand.make_salted_explode(key_col, salts, cfg.seed),
        batch_format="pyarrow", batch_size=cfg.batch_size)
    pairs = (salted.groupby("salt_key")
             .map_groups(cand.make_salted_pairs_fn(
                 src, est_min=est_min, max_hamming=max_hamming),
                 batch_format="pyarrow"))
    if not dedup:
        return pairs
    return (cand.add_pair_pid(pairs, cfg.bucket_partitions)
            .groupby("pid")
            .map_groups(make_dedup_full_pairs_fn(winnow_min_hits),
                        batch_format="pyarrow")
            .drop_columns(["pid"]))


def minhash_lsh_pairs(sf_dir: str, cfg: PipelineConfig | None = None,
                      stats: dict | None = None):
    """MinHash-LSH near-dup pairs with exact-Jaccard verification:
    (doc_id_a, doc_id_b, jaccard) for jaccard >= cfg.dup_jaccard.

    Hot LSH buckets are salted (no silent star fallback — pair-level
    recall holds even when a bucket exceeds band_group_cap), and the
    co-located sketch estimate prunes pairs far below the verify
    threshold before the shingle-blob joins."""
    cfg = cfg or PipelineConfig(num_partitions=8)
    sigs = _signatures(sf_dir, cfg).materialize()
    pairs = _salted_candidate_pairs(
        sigs, cfg, cand.BandExploder(cfg), "band_key", "minhash",
        est_min=cfg.dup_jaccard - cfg.prefilter_margin, stats=stats,
        dedup=False)
    # join-free verify (union + pid-groupby): the salted pairs arrive
    # from a groupby, whose schema-less empty blocks crash Ray's
    # JoinOperator (see verify.attach_texts note).  Cross-band dedup is
    # fused into verify pass 1 (dedup_winnow_min_hits=1 = no winnow
    # junk-guard, plain pair dedup) — the standalone pair sort vanishes.
    verified = verify_pairs_reduce(
        pairs.select_columns(["node_a", "node_b", "src", "est"]),
        sigs, cfg, dedup_winnow_min_hits=1)
    out = verified.filter(expr=f"jaccard >= {cfg.dup_jaccard}")
    return _pairs_out(out)


def simhash_pairs(sf_dir: str, cfg: PipelineConfig | None = None,
                  stats: dict | None = None):
    """SimHash near-exact pairs: hamming(simhash) <= cfg.simhash_max_hamming
    via chunked pigeonhole buckets -> (doc_id_a, doc_id_b); hot chunk
    buckets salted like the LSH path."""
    cfg = cfg or PipelineConfig(num_partitions=8)
    sigs = _signatures(sf_dir, cfg).materialize()
    pairs = _salted_candidate_pairs(
        sigs, cfg, cand.SimhashChunkExploder(cfg), "chunk_key", "simhash",
        est_min=None, max_hamming=cfg.simhash_max_hamming, stats=stats)
    return _pairs_out(pairs, with_jaccard=False)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                        cfg: PipelineConfig | None = None):
    """n-gram Jaccard pairs above ``threshold``: LSH candidates verified by
    exact char-5-gram Jaccard (lower threshold than the dup cut — the
    'weaker similarity join' operator)."""
    cfg = cfg or PipelineConfig(num_partitions=8)
    sigs = _signatures(sf_dir, cfg).materialize()
    pairs = _salted_candidate_pairs(
        sigs, cfg, cand.BandExploder(cfg), "band_key", "minhash",
        est_min=threshold - cfg.prefilter_margin, dedup=False)
    verified = verify_pairs_reduce(
        pairs.select_columns(["node_a", "node_b", "src", "est"]),
        sigs, cfg, dedup_winnow_min_hits=1)
    return _pairs_out(verified.filter(expr=f"jaccard >= {threshold}"))


def exact_hash_pairs(sf_dir: str, cfg: PipelineConfig | None = None):
    """Exact dedup via content hash -> (doc_id_a, doc_id_b) star pairs."""
    cfg = cfg or PipelineConfig(num_partitions=8)
    sigs = _signatures(sf_dir, cfg)
    tagged = sigs.groupby("chash").map_groups(
        cand.exact_groups_fn, batch_format="pyarrow")
    dup = tagged.filter(expr="is_rep == False")

    schema = pa.schema([("doc_id_a", pa.int64()),
                        ("doc_id_b", pa.int64())])

    def out(b: pa.Table) -> pa.Table:
        a = [int(u) for u in b["rep_url"].to_pylist()]
        c = [int(u) for u in b["url"].to_pylist()]
        lo = np.minimum(a, c) if len(a) else np.array([], np.int64)
        hi = np.maximum(a, c) if len(a) else np.array([], np.int64)
        return pa.table({"doc_id_a": pa.array(lo, pa.int64()),
                         "doc_id_b": pa.array(hi, pa.int64())})

    pairs = dup.map_batches(out, batch_format="pyarrow")
    # exact-dup pair sets are tiny; collect with an explicit schema so an
    # all-empty result still carries columns (Ray drops empty schemas)
    return pa.concat_tables(
        [schema.empty_table()]
        + [b.cast(schema)
           for b in pairs.iter_batches(batch_format="pyarrow")])


def _pairs_out(ds, with_jaccard: bool = True):
    def f(b: pa.Table) -> pa.Table:
        a = np.array([int(u) for u in b["url_a"].to_pylist()], np.int64)
        c = np.array([int(u) for u in b["url_b"].to_pylist()], np.int64)
        lo, hi = np.minimum(a, c), np.maximum(a, c)
        cols = {"doc_id_a": pa.array(lo), "doc_id_b": pa.array(hi)}
        if with_jaccard and "jaccard" in b.column_names:
            cols["jaccard"] = b["jaccard"]
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def text_dedup_pairs(sf_dir: str) -> pa.Table:
    """Driver registry entry: the four pair-emitting text-dedup variants
    (MinHash-LSH verified, SimHash pigeonhole, n-gram Jaccard join,
    exact content hash) merged into ONE tagged result so all four paths
    execute inside a single CORRECTNESS row (the 50-query driver window;
    same consolidation pattern as ``multimodal_decode``).  Columns:
    (method, doc_id_a, doc_id_b) — jaccard is dropped here (engine
    -defined float; the individual queries keep it and stay importable,
    tested against brute-force oracles in tests/test_ops.py).

    The variants run SEQUENTIALLY and each pair set (tiny by design —
    near-dup pairs, not the corpus) is collected and tagged driver-side:
    a lazy ``Dataset.union`` would execute all three multi-shuffle DAGs
    concurrently, and their groupby aggregators livelock each other on
    small CPU budgets (the reserve-a-CPU hazard bench.py documents)."""
    schema = pa.schema([("method", pa.string()),
                        ("doc_id_a", pa.int64()), ("doc_id_b", pa.int64())])

    def collect(res, method: str) -> pa.Table:
        t = res if isinstance(res, pa.Table) else pa.concat_tables(
            [schema.empty_table().select(["doc_id_a", "doc_id_b"])]
            + [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
               else b
               for b in res.select_columns(["doc_id_a", "doc_id_b"])
               .iter_batches(batch_format="pyarrow")])
        tag = pa.array(np.full(t.num_rows, method, dtype=object),
                       pa.string())
        return pa.table({"method": tag, "doc_id_a": t["doc_id_a"],
                         "doc_id_b": t["doc_id_b"]}).cast(schema)

    return pa.concat_tables([
        collect(minhash_lsh_pairs(sf_dir), "minhash"),
        collect(simhash_pairs(sf_dir), "simhash"),
        collect(ngram_jaccard_pairs(sf_dir), "ngram_jaccard"),
        collect(exact_hash_pairs(sf_dir), "exact")])
