"""URL canonicalization + fuzzy-similarity scorer blend
(kernels/text.py canonicalize_urls/string_trigram_sets,
stages/scorer.py PairScorer.url_sim_weight — the north-star
"title/url fuzzy matching" clause)."""

import numpy as np
import pyarrow as pa
import pytest

from eridu_ray.config import PipelineConfig
from eridu_ray.kernels.text import canonicalize_urls, string_trigram_sets
from eridu_ray.stages.scorer import PairScorer


@pytest.mark.parametrize("raw,canon", [
    ("https://www.Example.com/a/b/", "example.com/a/b"),
    ("http://example.com/a?utm_source=x&utm_medium=y", "example.com/a"),
    ("https://example.com/a?id=3&utm_source=x", "example.com/a?id=3"),
    ("example.com/a#frag", "example.com/a"),
    ("ftp://mirror.example.com/pub/", "mirror.example.com/pub"),
    ("https://example.com/?fbclid=abc123", "example.com"),
])
def test_canonicalize_urls(raw, canon):
    got = canonicalize_urls(pa.array([raw], pa.string())).to_pylist()[0]
    assert got == canon


def _brute_tri(s: str) -> set:
    b = s.encode("utf-8")
    return {b[i:i + 3] for i in range(max(0, len(b) - 2))}


def test_string_trigram_sets_matches_bruteforce():
    strs = ["", "ab", "abc", "abcabcabc", "example.com/a/b",
            "example.com/a/c", "héllo.example.org/päge"]
    cat, sizes = string_trigram_sets(pa.array(strs, pa.string()))
    offs = np.concatenate([[0], np.cumsum(sizes)])
    for i, s in enumerate(strs):
        want = sorted((g[0] << 16) | (g[1] << 8) | g[2]
                      for g in _brute_tri(s))
        got = cat[offs[i]:offs[i + 1]]
        assert np.array_equal(got, np.array(want, np.uint32)), (i, s)
        # per-row sets are sorted and unique
        assert np.all(np.diff(got.astype(np.int64)) > 0)


def _pair_batch(url_a, url_b):
    # identical shingle blobs => content similarity exactly 1.0
    blob = np.arange(8, dtype=np.uint32).tobytes()
    return pa.table({
        "node_a": pa.array([1], pa.int64()),
        "node_b": pa.array([2], pa.int64()),
        "url_a": pa.array([url_a], pa.string()),
        "url_b": pa.array([url_b], pa.string()),
        "sh_a": pa.array([blob], pa.binary()),
        "sh_b": pa.array([blob], pa.binary()),
    })


def test_scorer_blends_url_similarity():
    # content cosine of identical blobs is ~1.0 (float32 norm rounding),
    # so assert the exact blend against the MEASURED content score
    same = _pair_batch("https://www.example.com/a/",
                       "http://example.com/a")  # canonically identical
    content = PairScorer(PipelineConfig())(same)["similarity"].to_pylist()[0]
    blended = PairScorer(
        PipelineConfig(url_sim_weight=0.5))(same)["similarity"].to_pylist()[0]
    # identical canonical urls: url_sim = 1.0
    assert blended == pytest.approx(0.5 * content + 0.5 * 1.0, abs=1e-12)

    far = _pair_batch("https://alpha.example.com/x",
                      "https://omega.other.org/y")
    w2 = PairScorer(
        PipelineConfig(url_sim_weight=0.5))(far)["similarity"].to_pylist()[0]
    assert w2 < content                   # url disagreement pulls it down
    ta, tb = _brute_tri("alpha.example.com/x"), _brute_tri("omega.other.org/y")
    uj = len(ta & tb) / len(ta | tb)
    assert w2 == pytest.approx(0.5 * content + 0.5 * uj, abs=1e-12)


def test_scorer_blends_title_similarity():
    """Pipelines that carry title_a/title_b get the same trigram blend;
    with both url and title present each contributes half the weight."""
    b = _pair_batch("https://www.example.com/a/", "http://example.com/a")
    content = PairScorer(PipelineConfig())(b)["similarity"].to_pylist()[0]
    bt = b.append_column(
        "title_a", pa.array(["Breaking News Today"], pa.string())
    ).append_column(
        "title_b", pa.array(["Breaking News Update"], pa.string()))
    got = PairScorer(
        PipelineConfig(url_sim_weight=0.4))(bt)["similarity"].to_pylist()[0]
    # titles blend RAW (no canonicalization): brute sets over raw bytes
    ta, tb = _brute_tri("Breaking News Today"), _brute_tri("Breaking News Update")
    tj = len(ta & tb) / len(ta | tb)
    want = 0.6 * content + 0.4 * (0.5 * (1.0 + tj))  # urls canonically equal
    assert got == pytest.approx(want, abs=1e-12)


def test_default_weight_keeps_flagship_byte_identical():
    """url_sim_weight=0.0 must not touch the similarity column at all:
    the scorer output must be bit-equal to one computed with the url
    columns absent entirely."""
    b = _pair_batch("https://a.example.com/1", "https://b.example.org/2")
    s0 = PairScorer(PipelineConfig())(b)["similarity"].to_pylist()
    no_urls = b.drop_columns(["url_a", "url_b"])
    s1 = PairScorer(PipelineConfig())(no_urls)["similarity"].to_pylist()
    assert s0 == s1
