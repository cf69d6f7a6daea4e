"""Per-stage Parquet checkpoints with manifests (SURVEY.md §4 'design').

The reference's only resume story is manual artifacts written mid-run
(test_split.parquet, eridu/train/fine_tune_sbert.py:256-259).  Here every
wide stage can commit its output as partitioned Parquet plus a manifest
recording the semantic config hash, row count and lineage; a restarted run
with the same config hash reads the checkpoint instead of recomputing
(kill-and-resume reproduces identical labels — BASELINE.md).

Commit protocol (idempotent under retry):
  1. write blocks to   <dir>/<stage>.tmp/
  2. atomic rename to  <dir>/<stage>/
  3. write             <dir>/<stage>/_manifest.json   (commit marker)
A partially written .tmp dir is simply discarded on restart.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field


def write_single_parquet(ds, out_dir: str) -> str:
    """S6: single-file Parquet writer — ``repartition(1).write_parquet``
    (reference: ``coalesce(1).write.parquet``, eridu/etl/filter.py:86-88).

    ONLY for tiny outputs (reports, metrics): one file means one writer
    task and no read parallelism, so every large-scale sink in this
    engine keeps N files (SURVEY.md §4 output-layout row).
    """
    ds.repartition(1).write_parquet(out_dir)
    return out_dir


@dataclass
class CheckpointManager:
    root: str | None
    config_hash: str
    counters: dict = field(default_factory=dict)
    # fingerprint of the run's INPUT (source files); a checkpoint written
    # from different input files is invalid even under the same config —
    # without this, rerunning with the same checkpoint_dir but new pages
    # would silently resume stale results
    input_fingerprint: str = ""

    def _stage_dir(self, stage: str) -> str:
        assert self.root is not None
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "_manifest.json")

    def has(self, stage: str) -> bool:
        if self.root is None:
            return False
        mp = self._manifest_path(stage)
        if not os.path.exists(mp):
            return False
        with open(mp) as f:
            m = json.load(f)
        return (m.get("config_hash") == self.config_hash
                and m.get("input_fingerprint", "") == self.input_fingerprint)

    def load(self, stage: str):
        import ray.data

        return ray.data.read_parquet(self._stage_dir(stage))

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)

    def save(self, stage: str, ds, lineage: dict | None = None):
        """Write ds as the stage checkpoint; returns the re-read Dataset.

        Re-reading (rather than handing back the in-memory dataset) keeps
        downstream lineage rooted at the files — a retried downstream task
        re-reads blocks instead of re-running the producing stage.
        """
        final = self._stage_dir(stage)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        os.replace(tmp, final)
        import ray.data

        out = ray.data.read_parquet(final)
        meta = {
            "stage": stage,
            "config_hash": self.config_hash,
            "input_fingerprint": self.input_fingerprint,
            # row count from the committed files' parquet metadata (cheap)
            "rows": out.count(),
            "created_unix": time.time(),
            "lineage": lineage or {},
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(meta, f)
        return out

    def stage(self, name: str, builder, lineage: dict | None = None):
        """Run-or-resume: load the checkpoint if valid, else build+commit."""
        if self.root is None:
            return builder()
        if self.has(name):
            self.counters[f"{name}.resumed"] = 1
            return self.load(name)
        ds = builder()
        out = self.save(name, ds, lineage=lineage)
        self.counters[f"{name}.computed"] = 1
        return out

    def write_counters(self, extra: dict | None = None) -> None:
        if self.root is None:
            return
        os.makedirs(self.root, exist_ok=True)
        payload = dict(self.counters)
        if extra:
            payload.update(extra)
        with open(os.path.join(self.root, "_counters.json"), "w") as f:
            json.dump(payload, f, indent=2, default=str)
