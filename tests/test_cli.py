"""CLI surface tests (reference CLI shape: eridu/cli/main.py:82-660).

Driver-side commands run through click's CliRunner in-process; the
Ray-owning commands reuse the session fixture's Ray (the CLI only shuts
down sessions it created)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from click.testing import CliRunner

from eridu_ray.cli import cli


def _last_json(output: str):
    """Parse the last JSON object in CLI output (Ray Data's dataset logger
    interleaves INFO lines into captured stdout)."""
    lines = [ln for ln in output.strip().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


@pytest.fixture(scope="module")
def runner():
    return CliRunner()


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    """Small pages parquet for the dedup CLI (100 docs of sf0.001)."""
    from eridu_ray.sources.synth import expand_documents_batch

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet").slice(0, 100)
    pages = expand_documents_batch(docs, seed=31337)
    p = str(tmp_path_factory.mktemp("cli_corpus") / "pages.parquet")
    pq.write_table(pages, p)
    return {"pages": p, "n_pages": pages.num_rows}


def test_help_lists_commands_in_order(runner):
    res = runner.invoke(cli, ["--help"])
    assert res.exit_code == 0
    cmds = res.output.split("Commands:", 1)[1]
    pos = [cmds.index("\n  " + c) for c in
           ("ingest", "report", "synth", "dedup", "compare",
            "evaluate", "encode")]
    assert pos == sorted(pos)  # OrderedGroup preserves registration order


def test_compare_scores_pair(runner):
    res = runner.invoke(cli, ["compare",
                              "the quick brown fox jumps over the lazy dog",
                              "the quick brown fox jumped over the lazy dog"])
    assert res.exit_code == 0
    sim = float(res.output.splitlines()[0])
    assert 0.0 <= sim <= 1.0 and sim > 0.8
    assert "match: True" in res.output
    # disjoint texts score low
    res2 = runner.invoke(cli, ["compare", "alpha beta gamma delta epsilon",
                               "zxcv qwer asdf uiop hjkl"])
    assert float(res2.output.splitlines()[0]) < 0.8


def test_evaluate_checks_overall_and_per_schema(runner):
    res = runner.invoke(cli, ["evaluate", "checks"])
    assert res.exit_code == 0
    out = json.loads(res.output)
    assert out["overall"]["accuracy"] == 1.0
    assert len(out["per_schema"]) >= 4  # Page/Snippet/Unicode/Paragraph/...
    res2 = runner.invoke(cli, ["evaluate", "checks", "--schema", "Page"])
    assert set(json.loads(res2.output)["per_schema"]) == {"Page"}


def test_ingest_report_roundtrip(runner, ray_session, tmp_path):
    gz = str(tmp_path / "fix.csv.gz")
    from eridu_ray.sources.csv_io import write_gzip_csv_fixture

    write_gzip_csv_fixture(
        pa.table({"k": [1, 2, 2, 3], "v": ["a", "b", "b", "c"]}), gz)
    out = str(tmp_path / "pq")
    res = runner.invoke(cli, ["ingest", "--csv-path", gz,
                              "--output-dir", out])
    assert res.exit_code == 0, res.output
    assert pq.read_table(out).num_rows == 4
    rep = runner.invoke(cli, ["report", "--parquet-path", out])
    assert rep.exit_code == 0, rep.output
    assert "rows: 4" in rep.output and "'b': 2" in rep.output


def test_evaluate_test_reports_metrics(runner, ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n = 400
    y = rng.random(n) < 0.5
    s = np.where(y, rng.normal(0.85, 0.05, n),
                 rng.normal(0.2, 0.05, n)).clip(0, 1)
    p = str(tmp_path / "scored.parquet")
    pq.write_table(pa.table({"similarity": s, "label": y.astype(int)}), p)
    res = runner.invoke(cli, ["evaluate", "test", "--scored-path", p])
    assert res.exit_code == 0, res.output
    metrics = _last_json(res.output)
    assert metrics["f1"] > 0.99  # well-separated fixture
    # explicit threshold path
    res2 = runner.invoke(cli, ["evaluate", "test", "--scored-path", p,
                               "--threshold", "0.5"])
    assert _last_json(res2.output)["accuracy"] > 0.99


def test_dedup_cli_end_to_end(runner, ray_session, tmp_path, small_corpus):
    out = str(tmp_path / "labels")
    res = runner.invoke(cli, ["dedup", "--input", small_corpus["pages"],
                              "--output", out])
    assert res.exit_code == 0, res.output
    info = _last_json(res.output)
    labels = pq.read_table(out)
    assert labels.num_rows == info["labels_rows"] > 0
    assert {"url", "component", "component_size"} <= set(
        labels.column_names)


def test_fold_cli_matches_full_dedup(runner, ray_session, tmp_path,
                                     small_corpus):
    """dedup --save-state on a prior split, fold the rest in, and the
    combined labels must equal a full-dedup run over all pages; with
    --update-state the state rolls forward and the manifest survives."""
    import pandas as pd

    from eridu_ray.kernels.hashing import hash_strings_u64

    pages = pq.read_table(small_corpus["pages"])
    h = hash_strings_u64(pages["url"].to_pylist(), seed=7)
    mask = (h % np.uint64(2)).astype(bool)
    prior_p = str(tmp_path / "prior.parquet")
    new_p = str(tmp_path / "new.parquet")
    pq.write_table(pages.filter(pa.array(~mask)), prior_p)
    pq.write_table(pages.filter(pa.array(mask)), new_p)

    full_out = str(tmp_path / "full")
    assert runner.invoke(cli, ["dedup", "--input", small_corpus["pages"],
                               "--output", full_out]).exit_code == 0
    state = str(tmp_path / "state")
    prior_out = str(tmp_path / "prior_labels")
    res = runner.invoke(cli, ["dedup", "--input", prior_p, "--output",
                              prior_out, "--save-state", state])
    assert res.exit_code == 0, res.output
    fold_out = str(tmp_path / "fold_labels")
    res = runner.invoke(cli, ["fold", "--state", state, "--input", new_p,
                              "--output", fold_out, "--update-state",
                              "--state-update-mode", "append-compact"])
    assert res.exit_code == 0, res.output
    # append-compact left every family partition as ONE sorted file
    import glob

    for d in glob.glob(os.path.join(state, "*", "pid=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d
    # standalone out-of-band `compact` command: runs clean and is
    # idempotent on an already-compacted state (the work-doing path is
    # gated by test_incremental.test_compact_fold_state_preserves_labels)
    res = runner.invoke(cli, ["compact", "--state", state])
    assert res.exit_code == 0, res.output
    fams = _last_json(res.output)["families"]
    assert set(fams) == {"band", "simhash", "winnow", "exact"}
    for d in glob.glob(os.path.join(state, "*", "pid=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1, d
    a = pq.read_table(full_out).to_pandas().sort_values(
        "url").reset_index(drop=True)
    b = pq.read_table(fold_out).to_pandas().sort_values(
        "url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert os.path.isfile(os.path.join(state, "manifest.json"))
    # rolled-forward state covers the combined corpus
    assert pq.read_table(os.path.join(
        state, "labels")).num_rows == pages.num_rows


def test_fold_cli_checkpoint_resume(runner, ray_session, tmp_path,
                                    small_corpus):
    """fold --checkpoint-dir: a rerun of the same fold resumes from the
    committed stages (verified.resumed counter) with identical labels."""
    import pandas as pd

    from eridu_ray.kernels.hashing import hash_strings_u64

    pages = pq.read_table(small_corpus["pages"])
    h = hash_strings_u64(pages["url"].to_pylist(), seed=7)
    mask = (h % np.uint64(2)).astype(bool)
    prior_p = str(tmp_path / "prior.parquet")
    new_p = str(tmp_path / "new.parquet")
    pq.write_table(pages.filter(pa.array(~mask)), prior_p)
    pq.write_table(pages.filter(pa.array(mask)), new_p)

    state = str(tmp_path / "state")
    prior_out = str(tmp_path / "prior_labels")
    assert runner.invoke(cli, ["dedup", "--input", prior_p, "--output",
                               prior_out, "--save-state", state]
                         ).exit_code == 0
    ck = str(tmp_path / "fold_ck")
    out1 = str(tmp_path / "fold1")
    res1 = runner.invoke(cli, ["fold", "--state", state, "--input", new_p,
                               "--output", out1,
                               "--checkpoint-dir", ck])
    assert res1.exit_code == 0, res1.output
    assert os.path.isfile(os.path.join(ck, "verified", "_manifest.json"))
    out2 = str(tmp_path / "fold2")
    res2 = runner.invoke(cli, ["fold", "--state", state, "--input", new_p,
                               "--output", out2,
                               "--checkpoint-dir", ck])
    assert res2.exit_code == 0, res2.output
    assert _last_json(res2.output)["counters"].get("verified.resumed") == 1
    a = pq.read_table(out1).to_pandas().sort_values(
        "url").reset_index(drop=True)
    b = pq.read_table(out2).to_pandas().sort_values(
        "url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_encode_cli(runner, ray_session, tmp_path):
    out = str(tmp_path / "emb")
    res = runner.invoke(cli, ["encode", "--sf-dir", "/root/testdata/sf0.001",
                              "--out-dir", out, "--dim", "64"])
    assert res.exit_code == 0, res.output
    t = pq.read_table(out)
    assert t.num_rows == _last_json(res.output)["rows"] > 0
    emb = np.asarray(t["embedding"].to_pylist())
    assert emb.shape[1] == 64
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_substring_cli(runner, ray_session, tmp_path):
    spans_out = str(tmp_path / "spans")
    res = runner.invoke(cli, ["substring", "--sf-dir",
                              "/root/testdata/sf0.001",
                              "--out-dir", spans_out, "--spans-only"])
    assert res.exit_code == 0, res.output
    spans = pq.read_table(spans_out)
    assert _last_json(res.output)["rows"] == spans.num_rows > 0
    assert (np.asarray(spans["span_len"].to_pylist()) >= 100).all()

    cut_out = str(tmp_path / "cut")
    res = runner.invoke(cli, ["substring", "--sf-dir",
                              "/root/testdata/sf0.001",
                              "--out-dir", cut_out])
    assert res.exit_code == 0, res.output
    cut = pq.read_table(cut_out)
    assert _last_json(res.output)["rows"] == cut.num_rows > 0
    # every victim is some span's higher doc id, and the excision is real
    victims = set(spans["doc_id_b"].to_pylist())
    assert set(cut["doc_id"].to_pylist()) <= victims
    assert all(rc > 0 for rc in cut["removed_chars"].to_pylist())


def test_cli_does_not_kill_foreign_ray_session(runner, ray_session):
    """The CLI must not shut down a Ray session it didn't create."""
    import ray

    assert ray.is_initialized()
    runner.invoke(cli, ["report", "--parquet-path",
                        "/root/testdata/sf0.001/region.parquet"])
    assert ray.is_initialized()


def test_search_cli(runner, ray_session):
    res = runner.invoke(cli, ["search", "--sf-dir",
                              "/root/testdata/sf0.001",
                              "--terms", "dup,vector", "--top-k", "5"])
    assert res.exit_code == 0, res.output
    out = _last_json(res.output)
    assert out["terms"] == ["dup", "vector"] and out["k"] == 5
    assert len(out["hits"]) == 5
    scores = [h["score_micro"] for h in out["hits"]]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0
