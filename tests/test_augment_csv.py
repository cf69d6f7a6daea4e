"""Tests for the augmentation family (M8/M9/M10), CSV source/sink
(S3/S8/S9), YAML checks corpus (S10/M13), column-convention detection
(M14) and the single-file Parquet writer (S6)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# --- augmentation (mirrors /root/reference/tests/etl/test_acronyms.py) ----

def test_stop_words_contains_reference_members():
    from eridu_ray.stages.augment import STOP_WORDS

    assert {"the", "and", "of", "es"} <= STOP_WORDS


def test_get_corporate_ending():
    from eridu_ray.stages.augment import get_corporate_ending

    assert get_corporate_ending("Apple Inc.") == "Inc."
    assert get_corporate_ending("Microsoft Corporation") == "Corporation"
    assert get_corporate_ending("Google LLC") == "LLC"
    assert get_corporate_ending("IBM") == ""
    assert get_corporate_ending("") == ""
    assert get_corporate_ending(None) == ""


@pytest.mark.parametrize("name,expected", [
    ("International Business Machines Corporation", [
        {"original": "International Business Machines Corporation",
         "abbreviated": "IBM"},
        {"original": "International Business Machines Corporation",
         "abbreviated": "IBM Corporation"},
        {"original": "International Business Machines Corporation",
         "abbreviated": "I.B.M."},
        {"original": "International Business Machines Corporation",
         "abbreviated": "I.B.M. Corporation"},
    ]),
    ("Apple Inc.", []),          # single-word basename
    ("Johnson & Johnson Inc.", [
        {"original": "Johnson & Johnson Inc.", "abbreviated": "JJ"},
        {"original": "Johnson & Johnson Inc.", "abbreviated": "JJ Inc."},
        {"original": "Johnson & Johnson Inc.", "abbreviated": "J.J."},
        {"original": "Johnson & Johnson Inc.", "abbreviated": "J.J. Inc."},
    ]),
])
def test_abbreviation_pairs(name, expected):
    from eridu_ray.stages.augment import abbreviation_pairs

    got = abbreviation_pairs(name)
    for e in expected:
        assert e in got
    if not expected:
        assert got == []


def test_abbreviation_pairs_empty_inputs():
    from eridu_ray.stages.augment import abbreviation_pairs

    assert abbreviation_pairs(None) == []
    assert abbreviation_pairs("") == []
    assert abbreviation_pairs("ABC") == []


def test_nested_variant_column_and_explode():
    """M10: the mid-pipeline column really is list<struct<...>>; M9: the
    explode drops empty-variant rows (flat_map semantics)."""
    import ray.data as rd

    from eridu_ray.stages.augment import (VARIANT_TYPE, add_abbreviations,
                                          explode_abbreviations)

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "name": pa.array(["General Dynamics Corp", "Apple Inc."]),
    }))
    with_v = add_abbreviations(ds)
    schema = with_v.schema()
    vtype = schema.base_schema.field("variants").type
    assert vtype == VARIANT_TYPE
    rows = explode_abbreviations(with_v).to_pandas()
    assert set(rows.doc_id) == {1}  # Apple Inc. yields no variants
    assert "GD" in set(rows.abbreviated)


# --- CSV ------------------------------------------------------------------

def test_csv_roundtrip_values(tmp_path):
    import ray.data as rd

    from eridu_ray.sources.csv_io import read_csv, write_csv

    tab = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "s": pa.array(['plain', 'with,comma', 'with "quote"']),
    })
    out = str(tmp_path / "csv")
    write_csv(rd.from_arrow(tab), out)
    back = read_csv(out).to_pandas().sort_values("k").reset_index(drop=True)
    assert back.k.tolist() == [1, 2, 3]
    assert back.s.tolist() == ['plain', 'with,comma', 'with "quote"']


def test_gzip_csv_to_parquet(tmp_path):
    from eridu_ray.sources.csv_io import (gzip_csv_to_parquet,
                                          write_gzip_csv_fixture)
    import ray.data as rd

    tab = pa.table({"a": pa.array(range(100), pa.int64()),
                    "b": pa.array([f"v{i}" for i in range(100)])})
    gz = str(tmp_path / "in" / "data.csv.gz")
    write_gzip_csv_fixture(tab, gz)
    out = str(tmp_path / "pq")
    gzip_csv_to_parquet(gz, out)
    back = rd.read_parquet(out).to_pandas().sort_values("a")
    assert back.a.tolist() == list(range(100))
    assert back.b.tolist() == [f"v{i}" for i in range(100)]


# --- YAML checks corpus (S10/M13) -----------------------------------------

def test_load_checks_yaml_shape():
    from eridu_ray.pipelines.checks import load_checks

    checks = load_checks()
    assert len(checks) >= 10
    for c in checks:
        assert {"name", "schema", "match", "query", "candidate"} <= set(c)
        assert "text" in c["query"] and "text" in c["candidate"]


def test_schema_filter_and_dataset():
    from eridu_ray.pipelines.checks import (checks_dataset,
                                            filter_checks_by_schema,
                                            load_checks)

    checks = load_checks()
    snippets = filter_checks_by_schema(checks, {"Snippet"})
    assert all(c["schema"] == "Snippet" for c in snippets)
    assert 0 < len(snippets) < len(checks)
    ds = checks_dataset(schemas={"Snippet", "Empty"})
    rows = ds.to_pandas()
    assert set(rows["schema"]) == {"Snippet", "Empty"}


def test_evaluate_checks_schema_subset():
    from eridu_ray.pipelines.checks import evaluate_checks

    all_rows = evaluate_checks()
    page = evaluate_checks(schemas={"Page"})
    assert 0 < page.num_rows < all_rows.num_rows
    assert all(r["correct"] for r in page.to_pylist())


def test_checks_per_schema_metrics():
    """The corpus must span >= 4 schema categories (the reference
    evaluates per schema: Person/Company/Address/Location,
    eridu/etl/checks_evaluation.py:37-49), each with >= 2 checks and
    perfect accuracy under the pipeline kernels — VERDICT r2 next #7."""
    from eridu_ray.pipelines.checks import (checks_metrics,
                                            checks_metrics_by_schema,
                                            evaluate_checks)

    res = evaluate_checks()
    per = checks_metrics_by_schema(res)
    assert len(per) >= 4, sorted(per)
    for schema, m in per.items():
        n = m["tp"] + m["fp"] + m["tn"] + m["fn"]
        assert n >= 2, schema
        assert m["accuracy"] == 1.0, (schema, m)
    # the per-schema counts tile the global confusion counts
    g = checks_metrics(res)
    for k in ("tp", "fp", "tn", "fn"):
        assert sum(m[k] for m in per.values()) == g[k]


# --- schema conventions (M14) + single-file writer (S6) -------------------

def test_detect_pair_columns():
    from eridu_ray.schema import detect_pair_columns

    got = detect_pair_columns(["name1", "name2", "label", "x"])
    assert (got["a"], got["b"], got["label"]) == ("name1", "name2", "label")
    got = detect_pair_columns(["left_name", "right_name"])
    assert got["a"] == "left_name" and not got["has_label"]
    with pytest.raises(ValueError):
        detect_pair_columns(["foo", "bar"])


def test_detect_text_column():
    from eridu_ray.schema import detect_text_column

    assert detect_text_column(["url", "html", "text"]) == "html"
    assert detect_text_column(["url", "text"]) == "text"
    with pytest.raises(ValueError):
        detect_text_column(["url"])


def test_write_single_parquet(tmp_path):
    import ray.data as rd

    from eridu_ray.state.checkpoint import write_single_parquet

    ds = rd.range(1000).repartition(8)
    out = str(tmp_path / "single")
    write_single_parquet(ds, out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 1
    assert pq.read_table(out).num_rows == 1000
