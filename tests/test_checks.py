"""Conformance-checks corpus: every curated edge case must classify
correctly at the fixed thresholds (reference checks.yml evaluation,
eridu/etl/checks_evaluation.py:71-177)."""

from eridu_ray.pipelines.checks import (checks_metrics, evaluate_checks)


def test_all_checks_correct():
    res = evaluate_checks()
    wrong = [r for r in res.to_pylist() if not r["correct"]]
    assert not wrong, wrong


def test_span_checks_detected():
    res = evaluate_checks()
    for r in res.to_pylist():
        if r["span_expected"]:
            assert r["span_len"] >= 200, r
            assert not r["predicted"], r  # span pair is not a full dup


def test_checks_metrics_perfect():
    m = checks_metrics(evaluate_checks())
    assert m["accuracy"] == 1.0 and m["f1"] == 1.0
