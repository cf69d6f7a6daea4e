"""Exact-Jaccard verification of candidate pairs.

Candidates re-acquire both sides' retained shingle sets via two
hash-partitioned joins keyed on node id (SURVEY.md §7.1 SHUFFLE #3; the
reference's analog is the map-side lookup join, eridu/etl/cluster_split.py:249),
then exact Jaccard is computed per pair.  Join shuffles only the shingle
sets of urls that actually appear in candidates (inner-join semi-join
effect); the full corpus text never moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from eridu_ray.config import PipelineConfig


def blob_to_u64(buf) -> np.ndarray:
    return (np.frombuffer(buf, dtype=np.uint64) if buf is not None
            else np.empty(0, dtype=np.uint64))


def attach_shingles(candidates, signatures, cfg: PipelineConfig,
                    column: str = "shingles"):
    """pairs (node_a, node_b, ...) join signatures twice -> + sh_a, sh_b.

    sh_a/sh_b are binary uint64-LE blobs (the signature stage's native
    shingle format — decode with blob_to_u64).
    """
    side = signatures.select_columns(["node_id", column])
    a_side = side.rename_columns({column: "sh_a", "node_id": "na_key"})
    b_side = side.rename_columns({column: "sh_b", "node_id": "nb_key"})
    out = candidates.join(a_side, join_type="inner",
                          num_partitions=cfg.num_partitions,
                          on=("node_a",), right_on=("na_key",))
    out = out.join(b_side, join_type="inner",
                   num_partitions=cfg.num_partitions,
                   on=("node_b",), right_on=("nb_key",))
    return out  # join drops the right-side key columns itself


def jaccard_batch(batch: pa.Table, keep_lo: float | None = None,
                  keep_hi: float | None = None) -> pa.Table:
    """Add exact 'jaccard' column from sh_a/sh_b (uint64-LE blobs).

    When (keep_lo, keep_hi) is given, sh_a/sh_b are retained (nulled
    outside the [keep_lo, keep_hi) window) so the borderline scorer stage
    can consume them directly without re-joining the signature table —
    two shuffles saved per run.  Otherwise the blobs are dropped.
    """
    n = batch.num_rows
    out = np.empty(n, dtype=np.float64)
    blobs_a = batch["sh_a"].to_pylist() if n else []
    blobs_b = batch["sh_b"].to_pylist() if n else []
    for i in range(n):
        a = blob_to_u64(blobs_a[i])
        b = blob_to_u64(blobs_b[i])
        if a.size == 0 and b.size == 0:
            out[i] = 1.0
        elif a.size == 0 or b.size == 0:
            out[i] = 0.0
        else:
            inter = np.intersect1d(a, b, assume_unique=True).size
            out[i] = inter / (a.size + b.size - inter)
    if keep_lo is None:
        batch = batch.drop_columns(["sh_a", "sh_b"])
    else:
        keep = (out >= keep_lo) & (out < keep_hi)
        kept_a = [blobs_a[i] if keep[i] else None for i in range(n)]
        kept_b = [blobs_b[i] if keep[i] else None for i in range(n)]
        batch = batch.drop_columns(["sh_a", "sh_b"])
        batch = batch.append_column("sh_a", pa.array(kept_a, pa.binary()))
        batch = batch.append_column("sh_b", pa.array(kept_b, pa.binary()))
    return batch.append_column("jaccard", pa.array(out))
