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

import os

import pyarrow as pa

from eridu_ray.config import PipelineConfig

DEFAULT_CHECKS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "checks.yml")


def load_checks(path: str | None = None) -> list[dict]:
    """S10: YAML checks reader (yaml.safe_load(...)["checks"] — the
    reference's corpus ingestion, eridu/etl/checks_evaluation.py:22-34).

    Each check carries name, schema, match, and nested query/candidate
    text fields mirroring the reference's checks.yml shape
    (checks_evaluation.py:52-68)."""
    import yaml

    with open(path or DEFAULT_CHECKS_PATH, encoding="utf-8") as f:
        return yaml.safe_load(f)["checks"]


def filter_checks_by_schema(checks: list[dict],
                            schemas: set[str] | None) -> list[dict]:
    """M13: keep checks whose schema is in ``schemas`` (None = all) —
    reference semantics eridu/etl/checks_evaluation.py:37-49."""
    if schemas is None:
        return list(checks)
    return [c for c in checks if c.get("schema") in schemas]


def checks_dataset(path: str | None = None,
                   schemas: set[str] | None = None):
    """Checks corpus as a Ray Dataset (driver-side YAML load →
    ``from_items``; SURVEY.md §2 S10 mapping) with pair extraction
    (M12: check["query"]["text"], check["candidate"]["text"])."""
    import ray.data as rd

    rows = [{"name": c["name"], "schema": c.get("schema", ""),
             "match": bool(c["match"]),
             "a": c["query"]["text"], "b": c["candidate"]["text"],
             "span": bool(c.get("span", False))}
            for c in filter_checks_by_schema(load_checks(path), schemas)]
    return rd.from_items(rows)


def evaluate_checks(cfg: PipelineConfig | None = None,
                    schemas: set | None = None) -> pa.Table:
    """Score every check with the pipeline kernels; returns per-check rows
    (name, schema, expected, jaccard, predicted, span_len, correct).
    ``schemas`` applies the M13 schema filter before evaluation."""
    from eridu_ray.kernels.shingle import (jaccard32, shared_run_length,
                                           shingle_set32)
    from eridu_ray.kernels.text import normalize_text

    cfg = cfg or PipelineConfig()
    rows = []
    for c in filter_checks_by_schema(load_checks(), schemas):
        a, b = c["query"]["text"], c["candidate"]["text"]
        na, nb = normalize_text(a), normalize_text(b)
        sa = shingle_set32(na, cfg.shingle_k, cfg.seed)
        sb = shingle_set32(nb, cfg.shingle_k, cfg.seed)
        j = jaccard32(sa, sb)
        pred = j >= cfg.dup_jaccard
        span = shared_run_length(a, b, min_len=cfg.min_shared_span)
        rows.append({
            "name": c["name"], "schema": c.get("schema", ""),
            "expected": c["match"],
            "jaccard": j, "predicted": bool(pred),
            "span_len": int(span),
            "span_expected": bool(c.get("span", False)),
            "correct": bool(pred) == c["match"],
        })
    return pa.Table.from_pylist(rows)


def checks_metrics_by_schema(results: pa.Table) -> dict[str, dict]:
    """Per-schema accuracy/P/R/F1 — the reference evaluates the checks
    corpus per schema category (Person/Company/Address/Location filter,
    eridu/etl/checks_evaluation.py:37-49, metrics :144-177); our corpus'
    categories are Page/Snippet/Empty/Unicode/Paragraph.  Built on the
    M13 schema filter semantics: each schema's metrics are exactly
    ``checks_metrics`` of that schema's row subset."""
    import pyarrow.compute as pc

    out = {}
    for schema in sorted(set(results["schema"].to_pylist())):
        sub = results.filter(pc.equal(results["schema"], schema))
        out[schema] = checks_metrics(sub)
    return out


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
