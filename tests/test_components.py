"""Connected-components: distributed label propagation vs exact union-find
on random graphs, plus the scale-dispatch equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from eridu_ray.config import PipelineConfig
from eridu_ray.kernels.unionfind import connected_components
from eridu_ray.stages.components import (connected_components_auto,
                                         label_propagation)


def _random_edges(seed, n_nodes=200, n_edges=150):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    return a[keep], b[keep]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_label_propagation_matches_union_find(seed):
    import ray.data as rd

    a, b = _random_edges(seed)
    edges = rd.from_arrow(pa.table({"node_a": pa.array(a),
                                    "node_b": pa.array(b)}))
    cfg = PipelineConfig(num_partitions=2, cc_partitions=2)
    got = {r["node"]: r["label"]
           for r in label_propagation(edges, cfg).take_all()}
    want = connected_components(list(zip(a.tolist(), b.tolist())))
    assert got == want


def test_label_propagation_chain_converges():
    """A long path graph needs several propagation rounds."""
    import ray.data as rd

    n = 40
    edges = rd.from_arrow(pa.table({
        "node_a": pa.array(np.arange(n - 1, dtype=np.int64)),
        "node_b": pa.array(np.arange(1, n, dtype=np.int64))}))
    cfg = PipelineConfig(num_partitions=2, cc_partitions=2,
                         max_cc_rounds=64)
    got = {r["node"]: r["label"]
           for r in label_propagation(edges, cfg).take_all()}
    assert set(got.values()) == {0}


def test_chain_round_count_is_logarithmic():
    """Regression guard on pointer jumping (VERDICT r3 #3): a 1024-node
    path (diameter 1023) must converge in O(log diameter) rounds — a
    plain min-propagation would need ~1023 and hit the round cap."""
    import ray.data as rd

    n = 1024
    edges = rd.from_arrow(pa.table({
        "node_a": pa.array(np.arange(n - 1, dtype=np.int64)),
        "node_b": pa.array(np.arange(1, n, dtype=np.int64))}))
    cfg = PipelineConfig(num_partitions=2, cc_partitions=2,
                         max_cc_rounds=16)
    rounds = []
    got = {r["node"]: r["label"]
           for r in label_propagation(
               edges, cfg,
               on_round=lambda i, ds, s: rounds.append(i)).take_all()}
    assert set(got.values()) == {0}
    assert len(rounds) <= 13, rounds   # log2(1023) ~ 10 + slack


def test_auto_dispatch_equivalence():
    import ray.data as rd

    a, b = _random_edges(7)
    edges = rd.from_arrow(pa.table({"node_a": pa.array(a),
                                    "node_b": pa.array(b)}))
    driver_cfg = PipelineConfig(num_partitions=2, cc_partitions=2)
    dist_cfg = PipelineConfig(num_partitions=2, cc_partitions=2,
                              cc_driver_max_edges=0)  # force distributed
    got_driver = {r["node"]: r["label"]
                  for r in connected_components_auto(
                      edges, driver_cfg).take_all()}
    got_dist = {r["node"]: r["label"]
                for r in connected_components_auto(
                    edges, dist_cfg).take_all()}
    assert got_driver == got_dist


def test_empty_edges():
    import ray.data as rd

    edges = rd.from_arrow(pa.table({"node_a": pa.array([], pa.int64()),
                                    "node_b": pa.array([], pa.int64())}))
    cfg = PipelineConfig(num_partitions=2)
    assert connected_components_auto(edges, cfg).count() == 0
