"""Evaluation operators: confusion counts, metrics, threshold search,
entity-aware splits.

Reference semantics: TP/FP/TN/FN boolean-mask counts
(eridu/etl/evaluate.py:210-214), accuracy/P/R/F1 (evaluate.py:202-215),
optimal-threshold sweep via the precision-recall curve
(evaluate.py:192-197, fine_tune_sbert.py:601-617), and the cluster-aware
split where every member of an entity cluster lands in one partition
(eridu/etl/cluster_split.py:171-209, GroupShuffleSplit
fine_tune_sbert.py:217-227).

Scale shape: confusion counts are per-batch partials summed in a tiny
groupby; the threshold sweep collects a BOUNDED (score, label) sample to
the driver (the reference collects everything).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def confusion_counts(scored, threshold: float,
                     score_col: str = "similarity",
                     label_col: str = "label") -> dict:
    """Global TP/FP/TN/FN via per-batch partial counts + driver sum."""
    tp = fp = tn = fn = 0
    for b in scored.select_columns([score_col, label_col]).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        s = b[score_col].to_numpy(zero_copy_only=False)
        y = b[label_col].to_numpy(zero_copy_only=False).astype(bool)
        pred = s >= threshold
        tp += int((pred & y).sum())
        fp += int((pred & ~y).sum())
        tn += int((~pred & ~y).sum())
        fn += int((~pred & y).sum())
    return {"tp": tp, "fp": fp, "tn": tn, "fn": fn}


def classification_metrics(counts: dict) -> dict:
    tp, fp, tn, fn = (counts[k] for k in ("tp", "fp", "tn", "fn"))
    total = tp + fp + tn + fn
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"accuracy": (tp + tn) / total if total else 0.0,
            "precision": prec, "recall": rec, "f1": f1, **counts}


def best_threshold(scored, score_col: str = "similarity",
                   label_col: str = "label",
                   max_sample: int = 200_000, seed: int = 31337) -> dict:
    """F1-optimal threshold via a bounded driver-side sweep.

    Collects at most ``max_sample`` (score, label) rows (hash-deterministic
    subsample when larger), sorts by score and evaluates F1 at every
    distinct score — the reference's precision_recall_curve argmax
    (eridu/etl/evaluate.py:192-197) without materializing the full table.
    """
    scores, labels = [], []
    seen = 0
    for b in scored.select_columns([score_col, label_col]).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        s = b[score_col].to_numpy(zero_copy_only=False)
        y = b[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
        seen += s.size
        scores.append(s)
        labels.append(y)
    s = np.concatenate(scores) if scores else np.empty(0)
    y = np.concatenate(labels) if labels else np.empty(0)
    if s.size > max_sample:
        # deterministic subsample: stable hash of the score bits
        idx = np.argsort(
            (s.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)),
            kind="stable")[:max_sample]
        s, y = s[idx], y[idx]
    if s.size == 0:
        return {"threshold": 0.5, "f1": 0.0, "n": 0}
    order = np.argsort(-s, kind="stable")
    s_sorted, y_sorted = s[order], y[order]
    tp_cum = np.cumsum(y_sorted)
    fp_cum = np.cumsum(1.0 - y_sorted)
    pos = y_sorted.sum()
    prec = tp_cum / (tp_cum + fp_cum)
    rec = tp_cum / pos if pos else np.zeros_like(tp_cum)
    f1 = np.where(prec + rec > 0, 2 * prec * rec / (prec + rec), 0.0)
    best = int(np.argmax(f1))
    return {"threshold": float(s_sorted[best]), "f1": float(f1[best]),
            "n": int(s.size)}


def component_split(labels, train_pct: int = 80, val_pct: int = 10,
                    seed: int = 31337):
    """Entity-aware split: every url of a component gets the SAME split.

    hash(component) buckets 0..99 -> train/val/test — the shuffle-free
    deterministic equivalent of GroupShuffleSplit by cluster
    (eridu/etl/cluster_split.py:171-209; leakage invariant D5:
    no component spans two splits, asserted in tests)."""
    from eridu_ray.kernels.hashing import hash_strings_u64

    def f(b: pa.Table) -> pa.Table:
        comps = b["component"].to_pylist()
        buckets = (hash_strings_u64(comps, seed=seed) % np.uint64(100)
                   ).astype(np.int64)
        split = np.select(
            [buckets < train_pct, buckets < train_pct + val_pct],
            ["train", "val"], default="test")
        return b.append_column(
            "split", pa.array(split.tolist(), pa.string()))

    return labels.map_batches(f, batch_format="pyarrow")
