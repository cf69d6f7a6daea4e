"""Unit tests for the pure kernels (SURVEY.md §5: kernels first —
normalization drift breaks recall, so these pin the semantics)."""

import numpy as np
import pytest

from eridu_ray.kernels import hashing, minhash, shingle, simhash, text
from eridu_ray.kernels.unionfind import connected_components


# --- hashing --------------------------------------------------------------

def test_hash_stability_and_seed():
    assert hashing.hash_str_u64("abc") == hashing.hash_str_u64("abc")
    assert hashing.hash_str_u64("abc") != hashing.hash_str_u64("abd")
    assert hashing.hash_str_u64("abc", seed=1) != hashing.hash_str_u64("abc", seed=2)


def test_hash_strings_matches_scalar():
    arr = hashing.hash_strings_u64(["a", "b", "ab"], seed=7)
    assert arr.dtype == np.uint64
    assert arr[0] == hashing.hash_str_u64("a", seed=7)
    assert arr[2] == hashing.hash_str_u64("ab", seed=7)


def test_splitmix_bijective_ish():
    x = np.arange(1000, dtype=np.uint64)
    y = hashing.splitmix64(x)
    assert len(np.unique(y)) == 1000


def test_combine_rows():
    m = np.arange(12, dtype=np.uint64).reshape(3, 4)
    h = hashing.combine_rows_u64(m)
    assert h.shape == (3,)
    assert len(np.unique(h)) == 3
    # row order within matters
    m2 = m[:, ::-1].copy()
    assert hashing.combine_rows_u64(m2)[0] != h[0]


# --- shingles -------------------------------------------------------------

def test_shingle_set_basic():
    s = shingle.shingle_set("abcdef", k=5)
    # "abcde", "bcdef" -> 2 unique shingles
    assert s.size == 2
    assert shingle.shingle_set("abcd", k=5).size == 0
    assert shingle.shingle_set("", k=5).size == 0


def test_shingle_known_equalities():
    # same text -> same set; shared 5-grams across texts hash identically
    a = shingle.shingle_set("hello world", k=5)
    b = shingle.shingle_set("hello world", k=5)
    assert np.array_equal(a, b)
    c = shingle.shingle_set("xxhello worldxx", k=5)
    inter = np.intersect1d(a, c).size
    assert inter == a.size  # all of a's shingles appear in c


def test_jaccard():
    a = shingle.shingle_set("the quick brown fox jumps over the lazy dog", k=5)
    assert shingle.jaccard(a, a) == 1.0
    b = shingle.shingle_set("completely different text with no overlap!", k=5)
    assert shingle.jaccard(a, b) < 0.05
    assert shingle.jaccard(np.empty(0, np.uint64), np.empty(0, np.uint64)) == 1.0
    assert shingle.jaccard(a, np.empty(0, np.uint64)) == 0.0


def test_unicode_shingles():
    a = shingle.shingle_set("Евгений Пригожин", k=5)
    b = shingle.shingle_set("Евгений Пригожин", k=5)
    assert a.size > 0 and np.array_equal(a, b)


# --- minhash --------------------------------------------------------------

def test_minhash_identical_sets_identical_sigs():
    a, b = minhash.minhash_params(seed=31337, num_perms=128)
    s = shingle.shingle_set("some document text for minhash testing", k=5)
    sig1 = minhash.minhash_signature(s, a, b)
    sig2 = minhash.minhash_signature(s.copy(), a, b)
    assert np.array_equal(sig1, sig2)
    assert sig1.shape == (128,)


def test_minhash_batch_matches_single():
    a, b = minhash.minhash_params(seed=31337, num_perms=128)
    texts = ["first document here", "second doc text", "", "third unique one"]
    sets = [shingle.shingle_set(t, k=5) for t in texts]
    batch = minhash.minhash_signatures_batch(sets, a, b)
    for i, s in enumerate(sets):
        assert np.array_equal(batch[i], minhash.minhash_signature(s, a, b)), i


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 2**63, 1000).astype(np.uint64)
    # overlap 80%
    other = np.concatenate([base[:800],
                            rng.integers(0, 2**63, 200).astype(np.uint64)])
    a, b = minhash.minhash_params(seed=1, num_perms=128)
    s1 = minhash.minhash_signature(np.unique(base), a, b)
    s2 = minhash.minhash_signature(np.unique(other), a, b)
    true_j = shingle.jaccard(np.unique(base), np.unique(other))
    est = minhash.estimate_jaccard(s1, s2)
    assert abs(est - true_j) < 0.15


def test_band_keys_shape_and_collision():
    a, b = minhash.minhash_params(seed=31337, num_perms=128)
    s = shingle.shingle_set("a document that is long enough to shingle", k=5)
    sigs = minhash.minhash_signatures_batch([s, s], a, b)
    bk = minhash.band_keys(sigs, bands=16, rows=8, seed=31337)
    assert bk.shape == (2, 16)
    assert np.array_equal(bk[0], bk[1])  # identical docs share every band
    # different bands of the same doc (salted) differ
    assert len(np.unique(bk[0])) > 1


# --- simhash --------------------------------------------------------------

def test_simhash_batch_matches_single():
    texts = ["one example document", "", "another example document text"]
    sets = [shingle.shingle_set(t, k=5) for t in texts]
    batch = simhash.simhash_batch(sets)
    # single-doc path uses a different bit order only if implementations
    # diverge — they must agree
    for i, s in enumerate(sets):
        got = simhash.simhash_from_shingles(s)
        # both use little-endian positional shifts
        assert int(batch[i]) == got, i


def test_simhash_small_edit_small_hamming():
    t1 = " ".join(f"token{i} filler{i * 7 % 113}" for i in range(150))
    t2 = t1.replace("token75", "tokenZZ", 1)  # one-word edit
    h1 = simhash.simhash_from_shingles(shingle.shingle_set(t1, k=5))
    h2 = simhash.simhash_from_shingles(shingle.shingle_set(t2, k=5))
    assert simhash.hamming_u64(h1, h2) <= 6
    t3 = " ".join(f"zed{i} qux{i * 11 % 97}" for i in range(150))
    h3 = simhash.simhash_from_shingles(shingle.shingle_set(t3, k=5))
    assert simhash.hamming_u64(h1, h3) > 10


def test_simhash_chunks_pigeonhole():
    v = np.array([0x0123456789ABCDEF], dtype=np.uint64)
    ch = simhash.simhash_chunks(v, nchunks=4)
    assert ch.shape == (1, 4)
    assert ch[0, 0] == 0x9ABCDEF & 0xFFFF
    assert ch[0, 3] == 0x0123


# --- winnowing ------------------------------------------------------------

def test_winnowing_shared_span_guarantee():
    k, w = 5, 64
    shared = ("this is a long shared span of text that appears verbatim in "
              "both documents and easily exceeds the bigram window length "
              "guarantee threshold of two windows plus k minus one chars")
    assert len(shared) >= 2 * w + k - 1
    a = "AAAA prefix junk " * 5 + shared + " trailing junk AAAA"
    b = "BBBB other start " * 7 + shared + " different tail BBBB"
    fa = shingle.winnow_fingerprints(a, k=k, window=w)
    fb = shingle.winnow_fingerprints(b, k=k, window=w)
    assert np.intersect1d(fa, fb).size >= 1
    # fingerprints are sparse: far fewer than one per position
    assert fa.size < len(a) / 8


def test_winnowing_no_common_vocab_collision():
    # docs built from a shared vocabulary but no long shared span must
    # share no bigram fingerprints (the 135k-junk-pairs regression)
    k, w = 5, 64
    vocab = [f"word{i}" for i in range(40)]
    a = " ".join(vocab[(i * 7) % 40] for i in range(200))
    b = " ".join(vocab[(i * 11 + 3) % 40] for i in range(200))
    fa = shingle.winnow_fingerprints(a, k=k, window=w)
    fb = shingle.winnow_fingerprints(b, k=k, window=w)
    assert np.intersect1d(fa, fb).size == 0


def test_winnowing_repetitive_span_markers():
    # A long span repeating a short motif collapses to <2 distinct bigram
    # fingerprints (consecutive duplicate minima are collapsed), which the
    # winnow_min_hits=2 junk-pair guard would eat (ADVICE r2).  The
    # repetition markers must give two docs sharing such a span >= 2
    # shared fingerprints.
    k, w = 5, 64
    span = "résumé " * 40                      # 280 chars, 7-char motif
    a = "AAAA unique prefix " * 6 + span + " aftermath alpha " * 6
    b = "BBBB other opening " * 8 + span + " closing words beta " * 5
    fa = shingle.winnow_fingerprints(a, k=k, window=w)
    fb = shingle.winnow_fingerprints(b, k=k, window=w)
    assert np.intersect1d(fa, fb).size >= 2
    # a short repetition (well under ~2*window chars) must NOT trigger
    sel, runs = shingle.winnow_select_runs(
        shingle.shingle_hashes("xy " * 20, k=k), window=w)
    assert shingle.repetition_marker_fps(sel, runs, w).size == 0


def test_winnow_select_runs_matches_select():
    h = shingle.shingle_hashes("some ordinary text " * 30, k=5)
    vals, runs = shingle.winnow_select_runs(h, window=64)
    assert np.array_equal(vals, shingle.winnow_select(h, window=64))
    assert runs.sum() == max(h.size - 64 + 1, 1)
    assert (runs > 0).all()


def test_longest_common_substring():
    assert shingle.longest_common_substring_len("abcdef", "zzabczz") == 3
    assert shingle.longest_common_substring_len("", "abc") == 0


# --- text kernels ---------------------------------------------------------

def test_html_roundtrip_byte_identity():
    texts = ["plain text body", "with <angle> & amp; entities",
             "unicode Пригожин 罗瑞卡 ümlaut", ""]
    for t in texts:
        html = text.render_html(t, title="T", boiler="NAVNAV")
        assert text.extract_text(html) == t  # byte-identical per url contract


def test_normalize_text():
    assert text.normalize_text("  Hello\t\nWORLD  ") == "hello world"
    # NFC: combining sequence == precomposed
    assert text.normalize_text("é") == text.normalize_text("é")


def test_detect_language():
    assert text.detect_language("the cat sat on the mat and it is a test of the system") == "en"
    assert text.detect_language("der Hund ist nicht mit der Katze und das ist gut") == "de"
    assert text.detect_language("Евгений Пригожин родился в Ленинграде") == "ru"
    assert text.detect_language("中文文本处理系统测试") == "zh"
    assert text.detect_language("") == "und"


def test_token_counts_and_quality():
    t = "Hello, world! This is a test."
    assert text.token_count(t) == 6
    assert text.bpe_token_count(t) == 9  # Hello , world ! This is a test .
    q = text.quality_features(t)
    assert q["n_chars"] == len(t)
    assert q["n_tokens"] == 6
    assert 0 < q["punct_ratio"] < 0.2
    assert q["stopword_ratio"] > 0


def test_content_md5_matches_duckdb():
    import duckdb
    t = "some text ünicode 罗"
    got = text.content_md5(t)
    want = duckdb.sql("select md5(?) h", params=[t]).fetchone()[0]
    assert got == want


# --- union-find -----------------------------------------------------------

def test_connected_components_oracle():
    comp = connected_components([(2, 1), (2, 3), (5, 4)], nodes=[9])
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[4] == comp[5] == 4
    assert comp[9] == 9


def test_verify_set32_projection():
    """u32 verify sets: deterministic projection of the u64 sets, shared
    by the pipeline blob format and the ground-truth kernel."""
    from eridu_ray.kernels import shingle

    t1 = "the quick brown fox jumps over the lazy dog " * 5
    t2 = "the quick brown fox jumps over the lazy cat " * 5
    a64 = shingle.shingle_set(t1, k=5, seed=31337)
    a32 = shingle.shingle_set32(t1, k=5, seed=31337)
    assert a32.dtype == np.uint32
    assert np.array_equal(a32, shingle.to_verify_set32(a64))
    assert np.array_equal(a32, np.sort(a32))
    # projection preserves Jaccard to within the collision bound
    b64 = shingle.shingle_set(t2, k=5, seed=31337)
    b32 = shingle.shingle_set32(t2, k=5, seed=31337)
    j64 = shingle.jaccard(a64, b64)
    j32 = shingle.jaccard32(a32, b32)
    assert abs(j64 - j32) < 1e-3
    assert shingle.jaccard32(a32, a32) == 1.0
    empty = np.empty(0, dtype=np.uint32)
    assert shingle.jaccard32(empty, empty) == 1.0
    assert shingle.jaccard32(a32, empty) == 0.0


def test_malloc_pool_applied_and_idempotent():
    """ensure_malloc_pool must report success on glibc (this container)
    and stay True on repeat calls — the verify/candidate kernels rely on
    it to keep large scratch on the reusable heap (BASELINE.md round-4
    scaling section)."""
    from eridu_ray.kernels.mem import ensure_malloc_pool

    assert ensure_malloc_pool() is True
    assert ensure_malloc_pool() is True
