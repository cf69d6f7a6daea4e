"""Checkpoint / resume tests: kill-and-resume reproduces identical labels
(BASELINE.md resumability row; SURVEY.md §4 checkpoint design)."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from eridu_ray.config import PipelineConfig
from eridu_ray.pipelines.dedup import run_dedup
from eridu_ray.sources.synth import expand_documents_batch

N_DOCS = 120


@pytest.fixture()
def pages_table():
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(
        0, N_DOCS)
    return expand_documents_batch(docs, seed=31337)


def test_resume_reproduces_labels(pages_table, tmp_path):
    import ray.data as rd

    ck = str(tmp_path / "run")
    cfg = PipelineConfig(num_partitions=2, checkpoint_dir=ck)
    res1 = run_dedup(rd.from_arrow(pages_table), cfg)
    labels1 = res1.labels.to_pandas().sort_values("url").reset_index(
        drop=True)

    # stage checkpoints + manifests exist
    for stage in ("signatures", "verified", "edges", "labels"):
        mp = os.path.join(ck, stage, "_manifest.json")
        assert os.path.exists(mp), stage
        with open(mp) as f:
            assert json.load(f)["config_hash"] == cfg.config_hash()

    # simulate a crash after 'verified': drop later checkpoints, resume
    shutil.rmtree(os.path.join(ck, "edges"))
    shutil.rmtree(os.path.join(ck, "labels"))
    res2 = run_dedup(rd.from_arrow(pages_table), cfg)
    assert res2.counters.get("signatures.resumed") == 1
    assert res2.counters.get("verified.resumed") == 1
    labels2 = res2.labels.to_pandas().sort_values("url").reset_index(
        drop=True)
    assert labels1.equals(labels2)


def test_stale_config_invalidates_checkpoint(pages_table, tmp_path):
    import ray.data as rd

    ck = str(tmp_path / "run")
    cfg = PipelineConfig(num_partitions=2, checkpoint_dir=ck)
    run_dedup(rd.from_arrow(pages_table), cfg)
    # different semantic config must NOT resume from these checkpoints
    cfg2 = PipelineConfig(num_partitions=2, checkpoint_dir=ck,
                          dup_jaccard=0.9)
    res = run_dedup(rd.from_arrow(pages_table), cfg2)
    assert "signatures.resumed" not in res.counters
    assert res.counters.get("signatures.computed") == 1


def test_partial_tmp_dir_discarded(pages_table, tmp_path):
    """A torn .tmp stage dir from a killed run must not break a restart."""
    import ray.data as rd

    ck = str(tmp_path / "run")
    os.makedirs(os.path.join(ck, "signatures.tmp"))
    with open(os.path.join(ck, "signatures.tmp", "garbage.parquet"),
              "w") as f:
        f.write("not parquet")
    cfg = PipelineConfig(num_partitions=2, checkpoint_dir=ck)
    res = run_dedup(rd.from_arrow(pages_table), cfg)
    assert res.labels.count() == pages_table.num_rows
    assert not os.path.exists(os.path.join(ck, "signatures.tmp"))


def test_fold_resume_reproduces_labels(pages_table, tmp_path):
    """Fold checkpoint/resume (VERDICT r4 next #4): a killed
    incremental fold resumes from its last committed stage and
    reproduces byte-identical labels — and the checkpointed fold
    matches the un-checkpointed fold exactly."""
    import dataclasses

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from eridu_ray.kernels.hashing import hash_strings_u64
    from eridu_ray.pipelines.incremental import run_dedup_incremental

    cfg0 = PipelineConfig(num_partitions=2)
    h = hash_strings_u64(pages_table["url"].to_pylist(), seed=7)
    mask = (h % np.uint64(2)).astype(bool)
    prior_pages = pages_table.filter(pa.array(~mask))
    new_tab = pages_table.filter(pa.array(mask))
    inc_dir = tmp_path / "increment"
    inc_dir.mkdir()
    pq.write_table(new_tab, str(inc_dir / "pages.parquet"))

    prior = run_dedup(rd.from_arrow(prior_pages), cfg0)
    plain = run_dedup_incremental(
        rd.read_parquet(str(inc_dir)), prior,
        cfg0).labels.to_pandas().sort_values("url").reset_index(drop=True)

    ck = str(tmp_path / "fold_run")
    cfg = dataclasses.replace(cfg0, checkpoint_dir=ck)
    res1 = run_dedup_incremental(rd.read_parquet(str(inc_dir)), prior, cfg)
    labels1 = res1.labels.to_pandas().sort_values("url").reset_index(
        drop=True)
    assert labels1.equals(plain)
    for stage in ("fold_new_sigs", "verify_sigs", "verified", "edges",
                  "labels"):
        assert os.path.exists(os.path.join(ck, stage, "_manifest.json")), \
            stage

    # simulate a crash after 'verified': later checkpoints gone, resume
    shutil.rmtree(os.path.join(ck, "edges"))
    shutil.rmtree(os.path.join(ck, "labels"))
    res2 = run_dedup_incremental(rd.read_parquet(str(inc_dir)), prior, cfg)
    assert res2.counters.get("verified.resumed") == 1
    assert res2.counters.get("verify_sigs.resumed") == 1
    labels2 = res2.labels.to_pandas().sort_values("url").reset_index(
        drop=True)
    assert labels1.equals(labels2)


def test_fold_checkpoint_invalidated_by_changed_increment(pages_table,
                                                          tmp_path):
    """Same checkpoint_dir + same config but a DIFFERENT increment must
    recompute (fold fingerprint covers the increment's files)."""
    import dataclasses

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from eridu_ray.kernels.hashing import hash_strings_u64
    from eridu_ray.pipelines.incremental import run_dedup_incremental

    cfg0 = PipelineConfig(num_partitions=2)
    h = hash_strings_u64(pages_table["url"].to_pylist(), seed=7)
    mask = (h % np.uint64(2)).astype(bool)
    prior = run_dedup(rd.from_arrow(pages_table.filter(pa.array(~mask))),
                      cfg0)
    new_tab = pages_table.filter(pa.array(mask))
    d1, d2 = tmp_path / "inc1", tmp_path / "inc2"
    d1.mkdir()
    d2.mkdir()
    pq.write_table(new_tab, str(d1 / "pages.parquet"))
    pq.write_table(new_tab.slice(0, new_tab.num_rows - 5),
                   str(d2 / "pages.parquet"))

    ck = str(tmp_path / "fold_run")
    cfg = dataclasses.replace(cfg0, checkpoint_dir=ck)
    run_dedup_incremental(rd.read_parquet(str(d1)), prior, cfg)
    res = run_dedup_incremental(rd.read_parquet(str(d2)), prior, cfg)
    assert "verified.resumed" not in res.counters
    assert res.counters.get("verified.computed") == 1


def test_changed_input_invalidates_checkpoint(pages_table, tmp_path):
    """Same config + same checkpoint_dir but DIFFERENT input files must
    recompute, not resume stale results (input fingerprint in manifest)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    p1 = tmp_path / "in1"
    p2 = tmp_path / "in2"
    p1.mkdir()
    p2.mkdir()
    pq.write_table(pages_table.slice(0, 150), str(p1 / "pages.parquet"))
    pq.write_table(pages_table.slice(50, 150), str(p2 / "pages.parquet"))
    ck = str(tmp_path / "run")
    cfg = PipelineConfig(num_partitions=2, checkpoint_dir=ck)
    run_dedup(rd.read_parquet(str(p1)), cfg)
    res = run_dedup(rd.read_parquet(str(p2)), cfg)
    assert "signatures.resumed" not in res.counters
    assert res.counters.get("signatures.computed") == 1
    assert res.labels.count() == 150
