"""Property-based tests (hypothesis) over the pure kernels.

The reference has no property-based testing (SURVEY §5: "No
property-based testing"); these pin the algebraic invariants the
pipeline's correctness arguments lean on, over randomized inputs:

- MinHash slot membership under set union (exact, not statistical):
  every slot of sig(A ∪ B) equals the corresponding slot of sig(A) or
  sig(B) — the property that makes per-band LSH keys meaningful.
- LSH banding locality: a signature edit confined to band j can change
  only band j's key.
- SimHash set semantics (order invariance) + the chunk pigeonhole the
  near-exact candidate stage relies on.
- The winnowing shared-span guarantee over random spans/contexts.
- Rolling-hash shared_run_length == exact difflib LCS.
- components_from_edges == brute-force BFS partition with min-node
  canonical labels (the rule all three CC paths share).
- Codec roundtrips (BMP, WAV) over random payloads.
- jaccard/jaccard32 algebra (symmetry, bounds, identity, projection).

Pure numpy — no Ray objects are touched (the session fixture still owns
the cluster for the rest of the suite).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from eridu_ray.kernels.codecs import (decode_bmp, decode_wav, encode_bmp,
                                      encode_wav)
from eridu_ray.kernels.hashing import hash_str_u64, hash_strings_u64
from eridu_ray.kernels.minhash import (band_keys, estimate_jaccard,
                                       minhash_params, minhash_signature)
from eridu_ray.kernels.shingle import (jaccard, jaccard32,
                                       longest_common_substring_len,
                                       shared_run_length, shingle_set,
                                       to_verify_set32, winnow_fingerprints)
from eridu_ray.kernels.simhash import (hamming_u64, simhash_chunks,
                                       simhash_from_shingles)
from eridu_ray.kernels.unionfind import components_from_edges

_SETTINGS = settings(max_examples=40, deadline=None, derandomize=True)

u64_sets = st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                    min_size=0, max_size=80).map(
    lambda xs: np.unique(np.array(xs, dtype=np.uint64)))

texts = st.text(alphabet="abcdef ghijé中", min_size=0, max_size=120)


def _naive_kgram_jaccard(a: str, b: str, k: int = 5) -> float:
    sa = {a[i:i + k] for i in range(len(a) - k + 1)}
    sb = {b[i:i + k] for i in range(len(b) - k + 1)}
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@_SETTINGS
@given(texts, texts)
def test_jaccard_matches_naive_kgrams(a, b):
    ja = jaccard(shingle_set(a), shingle_set(b))
    assert 0.0 <= ja <= 1.0
    assert ja == jaccard(shingle_set(b), shingle_set(a))
    # hash collisions between distinct 5-grams have probability ~2^-64
    assert ja == _naive_kgram_jaccard(a, b)
    if len(a) >= 5:
        assert jaccard(shingle_set(a), shingle_set(a)) == 1.0


@_SETTINGS
@given(u64_sets, u64_sets)
def test_minhash_union_slot_membership(sa, sb):
    """sig(A ∪ B)[i] ∈ {sig(A)[i], sig(B)[i]} — exact, every slot.

    min over the union is min(min(A), min(B)) per permutation, and the
    final splitmix64 is an elementwise bijection, so each united slot
    must literally equal one side's slot."""
    if sa.size == 0 or sb.size == 0:
        return
    a, b = minhash_params(seed=31337, num_perms=32)
    su = np.unique(np.concatenate([sa, sb]))
    siga = minhash_signature(sa, a, b)
    sigb = minhash_signature(sb, a, b)
    sigu = minhash_signature(su, a, b)
    assert bool(np.all((sigu == siga) | (sigu == sigb)))
    # estimate_jaccard algebra on the same sigs
    assert estimate_jaccard(siga, siga) == 1.0
    assert 0.0 <= estimate_jaccard(siga, sigb) <= 1.0


@_SETTINGS
@given(u64_sets, st.integers(min_value=0, max_value=7),
       st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_band_keys_locality(s, band_j, new_val):
    """Editing signature coordinates inside band j changes no other
    band's key; identical signatures give identical keys everywhere."""
    if s.size == 0:
        return
    a, b = minhash_params(seed=7, num_perms=32)
    sig = minhash_signature(s, a, b)[None, :]     # (1, 32)
    bands, rows = 8, 4
    k1 = band_keys(sig, bands, rows, seed=1)
    assert np.array_equal(k1, band_keys(sig.copy(), bands, rows, seed=1))
    sig2 = sig.copy()
    sig2[0, band_j * rows] = np.uint64(new_val)
    k2 = band_keys(sig2, bands, rows, seed=1)
    other = np.delete(np.arange(bands), band_j)
    assert np.array_equal(k1[0, other], k2[0, other])


@_SETTINGS
@given(u64_sets)
def test_simhash_order_invariance_and_hamming(s):
    if s.size == 0:
        return
    perm = np.random.default_rng(0).permutation(s.size)
    assert simhash_from_shingles(s) == simhash_from_shingles(s[perm])
    v = np.uint64(simhash_from_shingles(s))
    assert hamming_u64(v, v) == 0
    w = v ^ np.uint64(0b1011)
    assert hamming_u64(v, w) == int(v ^ w).bit_count()


@_SETTINGS
@given(st.integers(min_value=0, max_value=(1 << 64) - 1),
       st.lists(st.integers(min_value=0, max_value=63), min_size=0,
                max_size=3, unique=True))
def test_simhash_chunk_pigeonhole(value, flip_bits):
    """≤ nchunks-1 flipped bits leave at least one of the 4 16-bit
    chunks untouched — the guarantee behind SimHash chunk bucketing."""
    v = np.uint64(value)
    w = v
    for bit in flip_bits:
        w = w ^ (np.uint64(1) << np.uint64(bit))
    ch = simhash_chunks(np.array([v, w], dtype=np.uint64), nchunks=4)
    assert bool(np.any(ch[0] == ch[1]))


@_SETTINGS
@given(st.text(alphabet="abcdef", min_size=36, max_size=90),
       st.text(alphabet="uvwxyz", min_size=0, max_size=60),
       st.text(alphabet="uvwxyz", min_size=0, max_size=60))
def test_winnow_shared_span_guarantee(span, prefix, suffix):
    """Texts sharing a span ≥ 2·window + k - 1 share ≥1 fingerprint
    (bigram-winnowing guarantee, kernels/shingle.py docstring), for any
    surrounding context."""
    k, window = 5, 16                      # bound: 2*16 + 5 - 1 = 36
    fa = winnow_fingerprints(prefix + span, k=k, window=window)
    fb = winnow_fingerprints(span + suffix, k=k, window=window)
    assert np.intersect1d(fa, fb).size > 0


@_SETTINGS
@given(st.text(alphabet="abc", min_size=0, max_size=60),
       st.text(alphabet="abc", min_size=0, max_size=60))
def test_shared_run_length_matches_difflib(a, b):
    """The rolling-hash span verifier agrees with exact difflib LCS
    (collision probability ~2^-64 per window pair)."""
    assert shared_run_length(a, b) == longest_common_substring_len(a, b)


@_SETTINGS
@given(texts, texts)
def test_suffix_array_longest_span_exact(a, b):
    """The generalized-SA verifier returns the exact LCS length AND
    offsets that really address a shared span (collision-free, unlike
    the rolling hash) — over mixed-width unicode text."""
    from eridu_ray.kernels.suffix import pair_longest_span

    ln, xa, xb = pair_longest_span(a, b)
    assert ln == longest_common_substring_len(a, b)
    if ln:
        assert a[xa:xa + ln] == b[xb:xb + ln]
    else:
        assert (xa, xb) == (-1, -1)


@_SETTINGS
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=30),
                          st.integers(min_value=0, max_value=30)),
                min_size=0, max_size=40))
def test_components_match_bruteforce(edges):
    """Vectorized CC == brute-force BFS partition, with the canonical
    min-node-id labels every CC path (driver, distributed) must share."""
    if not edges:
        return
    na = np.array([e[0] for e in edges], dtype=np.int64)
    nb = np.array([e[1] for e in edges], dtype=np.int64)
    nodes, labels = components_from_edges(na, nb)
    # brute force: adjacency BFS
    adj: dict[int, set[int]] = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    expected: dict[int, int] = {}
    for start in sorted(adj):
        if start in expected:
            continue
        seen, stack = {start}, [start]
        while stack:
            cur = stack.pop()
            for nxt in adj[cur]:
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        lbl = min(seen)
        for n in seen:
            expected[n] = lbl
    got = dict(zip(nodes.tolist(), labels.tolist()))
    assert got == expected


@_SETTINGS
@given(st.lists(st.text(min_size=0, max_size=20), min_size=1, max_size=20),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_hash_strings_vectorized_matches_scalar(strings, seed):
    vec = hash_strings_u64(strings, seed=seed)
    assert vec.dtype == np.uint64
    assert vec.tolist() == [hash_str_u64(s, seed=seed) for s in strings]
    other = hash_strings_u64(strings, seed=seed + 1)
    assert not np.array_equal(vec, other)


@_SETTINGS
@given(u64_sets, u64_sets)
def test_verify_set32_projection(sa, sb):
    """The 32-bit verify projection: deterministic, sorted-unique,
    identity maps to Jaccard 1, and (collisions only ever MERGE
    elements) the projected union is the union of projections."""
    pa_, pb_ = to_verify_set32(sa), to_verify_set32(sb)
    assert pa_.dtype == np.uint32
    assert np.array_equal(pa_, np.unique(pa_))
    if sa.size:
        assert jaccard32(pa_, pa_) == 1.0
    pu = to_verify_set32(np.unique(np.concatenate([sa, sb])))
    assert np.array_equal(pu, np.union1d(pa_, pb_))


@_SETTINGS
@given(st.integers(min_value=1, max_value=8),
       st.integers(min_value=1, max_value=8),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_bmp_roundtrip(h, w, seed):
    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@_SETTINGS
@given(st.integers(min_value=1, max_value=64),
       st.integers(min_value=1, max_value=2),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_wav_roundtrip(n, ch, seed):
    smp = np.random.default_rng(seed).integers(
        -32768, 32768, size=(n, ch)).astype(np.int16)
    rate, out = decode_wav(encode_wav(smp, sample_rate=8000))
    assert rate == 8000
    assert np.array_equal(out, smp)


# --- round-4 additions: trigram sets, chunk explode, pack prefix scan ------

@_SETTINGS
@given(st.lists(texts, min_size=0, max_size=12))
def test_string_trigram_sets_match_bruteforce(strs):
    import pyarrow as pa

    from eridu_ray.kernels.text import string_trigram_sets

    cat, sizes = string_trigram_sets(pa.array(strs, pa.string()))
    assert sizes.shape[0] == len(strs)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    for i, s in enumerate(strs):
        b = s.encode("utf-8")
        want = sorted({(b[j] << 16) | (b[j + 1] << 8) | b[j + 2]
                       for j in range(max(0, len(b) - 2))})
        assert cat[offs[i]:offs[i + 1]].tolist() == want


@_SETTINGS
@given(st.lists(texts, min_size=0, max_size=8))
def test_chunk_batch_covers_and_reconstructs(strs):
    import pyarrow as pa

    from eridu_ray.pipelines.training import (CHUNK_CHARS, CHUNK_STRIDE,
                                              chunk_batch)

    b = pa.table({"doc_id": pa.array(range(len(strs)), pa.int64()),
                  "text": pa.array(strs, pa.string())})
    out = chunk_batch(b)
    per = {}
    for d, i, t in zip(out["doc_id"].to_pylist(),
                       out["chunk_index"].to_pylist(),
                       out["chunk_text"].to_pylist()):
        per.setdefault(d, {})[i] = t
    for d, s in enumerate(strs):
        idx = per.get(d, {0: ""})
        assert set(idx) == set(range(len(idx)))  # dense chunk indices
        for i, t in idx.items():
            assert t == s[i * CHUNK_STRIDE:i * CHUNK_STRIDE + CHUNK_CHARS]
        # windows cover the whole doc
        assert (len(idx) - 1) * CHUNK_STRIDE + CHUNK_CHARS >= len(s)


@_SETTINGS
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=10_000),
                          st.integers(min_value=0, max_value=5_000)),
                min_size=1, max_size=60, unique_by=lambda t: t[0]))
def test_pack_shard_is_exact_prefix_scan(rows):
    import pyarrow as pa

    from eridu_ray.pipelines.training import PACK_BUDGET, pack_shard

    g = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "shard": pa.array([0] * len(rows), pa.int64()),
                  "chars": pa.array([r[1] for r in rows], pa.int64())})
    out = pack_shard(g)
    srt = sorted(rows)
    cum = 0
    want_cum, want_pack = [], []
    for _, ln in srt:
        want_pack.append(cum // PACK_BUDGET)
        cum += ln
        want_cum.append(cum)
    assert out["doc_id"].to_pylist() == [r[0] for r in srt]
    assert out["cum_chars"].to_pylist() == want_cum
    assert out["pack_id"].to_pylist() == want_pack


@_SETTINGS
@given(st.lists(
    st.tuples(st.sampled_from(["A", "B", "C"]),
              st.integers(min_value=-50_000, max_value=50_000),
              st.integers(min_value=1, max_value=5)),
    min_size=1, max_size=50))
def test_trimmed_partition_matches_duckdb(rows):
    """relational._trimmed_partition (histogram-resolved quantile_disc +
    trimmed sum) == DuckDB's quantile_disc-based winsorized aggregate on
    the expanded multiset — 2-decimal values, arbitrary groups/counts."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from eridu_ray.pipelines.relational import _trimmed_partition

    # histogram partial rows (may contain duplicate (et, v) partials —
    # the kernel must merge them); values are exact 2-decimal doubles
    g = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "v": pa.array([r[1] / 100.0 for r in rows], pa.float64()),
        "n": pa.array([r[2] for r in rows], pa.int64()),
        "pid": pa.array([0] * len(rows), pa.int32())})
    got = (_trimmed_partition(g).to_pandas()
           .sort_values("event_type").reset_index(drop=True))

    expanded = pd.DataFrame(
        [(et, cents / 100.0) for et, cents, n in rows for _ in range(n)],
        columns=["event_type", "value"])
    con = duckdb.connect()
    con.register("events_t", expanded)
    want = con.sql(
        "WITH b AS (SELECT event_type, quantile_disc(value, 0.05) AS lo, "
        "quantile_disc(value, 0.95) AS hi FROM events_t GROUP BY 1) "
        "SELECT e.event_type, CAST(round(lo * 100) AS BIGINT) AS lo_cents, "
        "CAST(round(hi * 100) AS BIGINT) AS hi_cents, count(*) AS n_kept, "
        "sum(CAST(round(e.value * 100) AS BIGINT))::BIGINT AS sum_cents "
        "FROM events_t e JOIN b USING (event_type) "
        "WHERE e.value >= lo AND e.value <= hi "
        "GROUP BY e.event_type, lo, hi ORDER BY e.event_type").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@_SETTINGS
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=6),
              st.integers(min_value=0, max_value=6),
              st.sampled_from(["winnow", "simhash", "minhash"])),
    min_size=0, max_size=60))
def test_dedup_full_pairs_guard_matches_bruteforce(rows):
    """make_dedup_full_pairs_fn(min_hits=2): per distinct (a, b) pair,
    kept iff its tag union is not exactly {winnow} OR it has >= 2
    copies; surviving rows carry the sorted tag union."""
    import pyarrow as pa

    from eridu_ray.pipelines.text_dedup import make_dedup_full_pairs_fn

    rows = [(min(a, b), max(a, b) + 7, s) for a, b, s in rows]
    g = pa.table({
        "node_a": pa.array([r[0] for r in rows], pa.int64()),
        "node_b": pa.array([r[1] for r in rows], pa.int64()),
        "url_a": pa.array([str(r[0]) for r in rows], pa.string()),
        "url_b": pa.array([str(r[1]) for r in rows], pa.string()),
        "src": pa.array([r[2] for r in rows], pa.string()),
        "est": pa.array([float("nan")] * len(rows), pa.float64())})
    out = make_dedup_full_pairs_fn(2)(g)
    got = {(int(a), int(b)): s for a, b, s in
           zip(out["node_a"].to_pylist(), out["node_b"].to_pylist(),
               out["src"].to_pylist())}
    want = {}
    for a, b, s in rows:
        want.setdefault((a, b), []).append(s)
    want = {k: ",".join(sorted(set(v))) for k, v in want.items()
            if not (set(v) == {"winnow"} and len(v) < 2)}
    assert got == want
