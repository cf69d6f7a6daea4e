"""Evaluation-operator tests: confusion counts vs sklearn-style math,
threshold sweep, entity-aware split leakage invariant (D5 analog)."""

import numpy as np
import pyarrow as pa
import pytest

from eridu_ray.stages.evaluate import (best_threshold,
                                       classification_metrics,
                                       component_split, confusion_counts)


def _scored_ds(scores, labels):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "similarity": pa.array(scores, pa.float64()),
        "label": pa.array(labels, pa.float64())}))


def test_confusion_and_metrics():
    ds = _scored_ds([0.9, 0.8, 0.3, 0.6, 0.95], [1, 0, 0, 1, 1])
    c = confusion_counts(ds, threshold=0.7)
    assert c == {"tp": 2, "fp": 1, "tn": 1, "fn": 1}
    m = classification_metrics(c)
    assert m["precision"] == pytest.approx(2 / 3)
    assert m["recall"] == pytest.approx(2 / 3)
    assert m["accuracy"] == pytest.approx(3 / 5)


def test_best_threshold_separable():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0.7, 1.0, 500)
    neg = rng.uniform(0.0, 0.6, 500)
    ds = _scored_ds(np.concatenate([pos, neg]),
                    np.concatenate([np.ones(500), np.zeros(500)]))
    res = best_threshold(ds)
    assert res["f1"] == pytest.approx(1.0)
    assert 0.6 < res["threshold"] <= 0.71


def test_best_threshold_deterministic_with_sampling():
    rng = np.random.default_rng(1)
    s = rng.random(5000)
    y = (s + rng.normal(0, 0.2, 5000) > 0.5).astype(float)
    ds = _scored_ds(s, y)
    r1 = best_threshold(ds, max_sample=1000)
    r2 = best_threshold(ds, max_sample=1000)
    assert r1 == r2 and r1["n"] == 1000


def test_component_split_no_leakage():
    import ray.data as rd

    comps = [f"https://c{i % 37}.example/base" for i in range(500)]
    urls = [f"https://c{i % 37}.example/page{i}" for i in range(500)]
    labels = rd.from_arrow(pa.table({
        "url": pa.array(urls), "component": pa.array(comps)}))
    out = component_split(labels).to_pandas()
    # D5 invariant: one split per component
    assert (out.groupby("component")["split"].nunique() == 1).all()
    # all three splits occur over 37 components
    assert set(out["split"].unique()) == {"train", "val", "test"}
    # deterministic
    out2 = component_split(labels).to_pandas()
    assert out.equals(out2)


def test_best_threshold_streaming_bounded():
    """Feeding far more rows than max_sample must keep driver accumulation
    bounded (~max_sample + one batch) and reproduce the same threshold as
    an unbounded run restricted to the same hash sample."""
    rng = np.random.default_rng(2)
    n = 300_000
    s = rng.random(n)
    y = (s + rng.normal(0, 0.3, n) > 0.5).astype(float)
    ds = _scored_ds(s, y)
    stats = {}
    r = best_threshold(ds, max_sample=20_000, _debug_stats=stats)
    assert stats["total_seen"] == n
    assert r["n"] == 20_000
    # peak accumulation stays within max_sample + one 65536-row batch
    assert stats["peak_rows"] <= 20_000 + 65_536
    # reference computation: full materialize + smallest-hash selection
    mult = np.uint64(0x9E3779B97F4A7C15)
    k = np.ascontiguousarray(s, dtype=np.float64).view(np.uint64) * mult
    idx = np.argsort(k, kind="stable")[:20_000]
    ss, yy = s[idx], y[idx]
    order = np.argsort(-ss, kind="stable")
    ssd, yyd = ss[order], yy[order]
    tp = np.cumsum(yyd)
    fp = np.cumsum(1.0 - yyd)
    prec = tp / (tp + fp)
    rec = tp / yyd.sum()
    f1 = np.where(prec + rec > 0, 2 * prec * rec / (prec + rec), 0.0)
    assert r["threshold"] == pytest.approx(float(ssd[int(np.argmax(f1))]))
    assert r["f1"] == pytest.approx(float(f1.max()))
