"""Conformance-checks corpus + evaluation (reference checks.yml parity).

The reference downloads a nomenklatura checks corpus and scores each
query/candidate pair, reporting accuracy/P/R/F1 and categorized TP/FP/TN/FN
(eridu/etl/checks_evaluation.py:22-68 corpus shape, :71-177 evaluation,
:277-334 categorized export).  Here the corpus is a curated in-repo list of
document pairs covering dedup edge cases (FIXTURES.md F4); evaluation runs
the real pipeline kernels end-to-end: normalize -> shingle -> exact
Jaccard -> threshold, plus the span check for substring cases.
"""

from __future__ import annotations

import pyarrow as pa

from eridu_ray.config import PipelineConfig

_LOREM = ("data pipelines shuffle partitioned blocks across the cluster "
          "while backpressure keeps the object store from overfilling and "
          "spilled blocks stream back in order for the next stage to "
          "consume without ever materializing the whole table ")

CHECKS: list[dict] = [
    # identical text, different urls -> dup
    {"name": "identical", "a": _LOREM * 3, "b": _LOREM * 3,
     "match": True},
    # boilerplate-only difference (trailing whitespace/case) -> dup
    {"name": "case-and-space", "a": _LOREM * 3,
     "b": (_LOREM * 3).upper() + "   ", "match": True},
    # one-token edit in a long doc -> dup
    {"name": "one-token-edit", "a": _LOREM * 4,
     "b": (_LOREM * 4).replace("cluster", "fleet", 1), "match": True},
    # ~half shared -> not dup (tails are NON-repetitive: shingle sets are
    # sets, repeated filler collapses and inflates jaccard)
    {"name": "half-shared",
     "a": _LOREM * 2 + " ".join(f"newtail{i} coda{i * 7}"
                                for i in range(120)),
     "b": _LOREM * 2 + " ".join(f"endingx{i} outro{i * 5}"
                                for i in range(120)),
     "match": False},
    # disjoint -> not dup
    {"name": "disjoint", "a": "alpha beta gamma delta " * 30,
     "b": "epsilon zeta eta theta " * 30, "match": False},
    # short identical -> dup
    {"name": "short-identical", "a": "tiny page", "b": "tiny page",
     "match": True},
    # short different -> not dup
    {"name": "short-different", "a": "tiny page", "b": "other page",
     "match": False},
    # empty vs empty -> dup (both vacuous)
    {"name": "both-empty", "a": "", "b": "", "match": True},
    # empty vs text -> not dup
    {"name": "one-empty", "a": "", "b": _LOREM, "match": False},
    # unicode normalization forms of the same text -> dup
    {"name": "nfc-nfd", "a": "résumé " * 60,
     "b": "résumé " * 60, "match": True},
    # cyrillic identical -> dup
    {"name": "cyrillic", "a": "привет мир " * 50,
     "b": "привет мир " * 50,
     "match": True},
    # long shared span inside different docs -> NOT a full dup, but span
    {"name": "substring",
     "a": " ".join(f"heada{i} intro{i * 3}" for i in range(150))
     + " " + _LOREM,
     "b": " ".join(f"otherb{i} lead{i * 9}" for i in range(150))
     + " " + _LOREM + " "
     + " ".join(f"tailc{i} extra{i * 11}" for i in range(150)),
     "match": False, "span": True},
    # hard negative: same vocabulary, different order
    {"name": "shuffled-vocab",
     "a": " ".join(_LOREM.split()[i % 28] for i in range(0, 300, 1)),
     "b": " ".join(_LOREM.split()[(i * 11 + 5) % 28] for i in range(300)),
     "match": False},
]


def evaluate_checks(cfg: PipelineConfig | None = None) -> pa.Table:
    """Score every check with the pipeline kernels; returns per-check rows
    (name, expected, jaccard, predicted, span_len, correct)."""
    from eridu_ray.kernels.shingle import (jaccard, shared_run_length,
                                           shingle_set)
    from eridu_ray.kernels.text import normalize_text

    cfg = cfg or PipelineConfig()
    rows = []
    for c in CHECKS:
        na, nb = normalize_text(c["a"]), normalize_text(c["b"])
        sa = shingle_set(na, cfg.shingle_k, cfg.seed)
        sb = shingle_set(nb, cfg.shingle_k, cfg.seed)
        j = jaccard(sa, sb)
        pred = j >= cfg.dup_jaccard
        span = shared_run_length(c["a"], c["b"],
                                 min_len=cfg.min_shared_span)
        rows.append({
            "name": c["name"], "expected": c["match"],
            "jaccard": j, "predicted": bool(pred),
            "span_len": int(span),
            "span_expected": bool(c.get("span", False)),
            "correct": bool(pred) == c["match"],
        })
    return pa.Table.from_pylist(rows)


def checks_metrics(results: pa.Table) -> dict:
    """Accuracy/P/R/F1 over the checks corpus (checks_evaluation.py:144-177)."""
    exp = results["expected"].to_pylist()
    pred = results["predicted"].to_pylist()
    tp = sum(1 for e, p in zip(exp, pred) if e and p)
    fp = sum(1 for e, p in zip(exp, pred) if not e and p)
    tn = sum(1 for e, p in zip(exp, pred) if not e and not p)
    fn = sum(1 for e, p in zip(exp, pred) if e and not p)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return {"accuracy": (tp + tn) / len(exp) if exp else 0.0,
            "precision": prec, "recall": rec,
            "f1": 2 * prec * rec / (prec + rec) if prec + rec else 0.0,
            "tp": tp, "fp": fp, "tn": tn, "fn": fn}
