"""Iterative min-label-propagation connected components on Ray Data.

MR-CC style (PAPERS.md: "Finding connected components in map-reduce in
logarithmic rounds", ICDE 2013), expressed as repeated hash-partitioned
join + groupby-min rounds until fixpoint (SURVEY.md §7.1 SHUFFLE #4..#4+k):

    labels(node, label)     # init: label = node  (only edge-touched nodes)
    repeat:
        msgs  = edges_bidir JOIN labels on src -> (dst, label_src)
        labels' = (labels UNION msgs).groupby(node).min(label)
    until sum(label) unchanged   # labels only decrease -> monotone fixpoint

The per-node min (and the distinct-node init) run as
``groupby(pid(node)).map_groups`` with a vectorized lexsort/run kernel
per partition — the same group-count-amortization pattern as the
candidate stages.  A direct ``groupby(node).min(label)`` pays Ray's
sort-based aggregate over millions of DISTINCT keys per round: measured
127 s vs 10-13 s for the pid form on a 2M-node / 4M-edge graph at 32
CPUs (round-4 profiling; init 169 s -> 2.5-6 s).

Each round's labels are materialized (iterative algorithms must cut the
lazy lineage or round k re-executes rounds 1..k-1).  Label ids are
non-negative int64 node hashes, so canonical component id = min node id is
order-independent: runs at any parallelism produce identical labels —
BASELINE.md's cross-parallelism correctness requirement.  Isolated nodes
never enter the loop; the caller unions them back as singletons.

The convergence check compares the int64 wrapping sum of labels between
rounds: per-node labels are strictly non-increasing, so any change
strictly decreases the true sum; a wrapped collision would need the total
decrease to be an exact multiple of 2^64 (probability ~2^-64, and bounded
by the max_cc_rounds hard cap anyway).
"""

from __future__ import annotations

import pyarrow as pa

from eridu_ray.config import PipelineConfig
from eridu_ray.kernels.mem import ensure_malloc_pool

ensure_malloc_pool()


def _bidirect(edges):
    """(node_a, node_b) edge list -> (src, dst) in both directions.

    NB: Dataset.union matches columns by POSITION; select_columns after the
    rename forces both sides into (src, dst) order.
    """
    fwd = edges.select_columns(["node_a", "node_b"]).rename_columns(
        {"node_a": "src", "node_b": "dst"}).select_columns(["src", "dst"])
    rev = edges.select_columns(["node_a", "node_b"]).rename_columns(
        {"node_b": "src", "node_a": "dst"}).select_columns(["src", "dst"])
    return fwd.union(rev)


def _add_node_pid(ds, col: str, num_pid: int):
    """pid = splitmix64(node) % num_pid (equal node -> equal pid)."""
    import numpy as np

    from eridu_ray.kernels.hashing import splitmix64

    def f(b: pa.Table) -> pa.Table:
        k = b[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        pid = (splitmix64(k) % np.uint64(num_pid)).astype(np.int32)
        return b.append_column("pid", pa.array(pid))

    return ds.map_batches(f, batch_format="pyarrow")


def _part_distinct_label(g: pa.Table) -> pa.Table:
    """Partition kernel: distinct nodes, label = own node id."""
    import numpy as np

    node = np.unique(g["node"].to_numpy(zero_copy_only=False))
    return pa.table({"node": pa.array(node, pa.int64()),
                     "label": pa.array(node, pa.int64())})


def _part_min_label(g: pa.Table) -> pa.Table:
    """Partition kernel: per-node min label (lexsort + run firsts)."""
    import numpy as np

    node = g["node"].to_numpy(zero_copy_only=False)
    lab = g["label"].to_numpy(zero_copy_only=False)
    order = np.lexsort((lab, node))
    n_s, l_s = node[order], lab[order]
    first = np.flatnonzero(np.r_[True, n_s[1:] != n_s[:-1]])
    return pa.table({"node": pa.array(n_s[first], pa.int64()),
                     "label": pa.array(l_s[first], pa.int64())})


def _init_labels(edges_bidir, cfg: PipelineConfig):
    """One label row per distinct edge endpoint, label = own node id."""
    nodes = edges_bidir.select_columns(["src"]).rename_columns(
        {"src": "node"})
    return (_add_node_pid(nodes, "node", cfg.bucket_partitions)
            .groupby("pid")
            .map_groups(_part_distinct_label, batch_format="pyarrow"))


def label_propagation(edges, cfg: PipelineConfig,
                      on_round=None):
    """edges (node_a:int64, node_b:int64) -> labels (node, label) Dataset.

    Returns the materialized fixpoint labels over edge-touched nodes.
    ``on_round(i, labels_ds, label_sum)`` is the per-round lineage hook
    (checkpointing/counters).
    """
    import pyarrow.compute as pc

    edges_bidir = _bidirect(edges).materialize()
    if edges_bidir.count() == 0:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "label": pa.array([], pa.int64())}))
    labels = _init_labels(edges_bidir, cfg).materialize()

    def _part_sum(b: pa.Table) -> pa.Table:
        # per-batch wrapped partial: sum mod 2^64 is associative, so
        # combining block partials on the driver is exact
        s = pc.sum(b["label"]).as_py()
        return pa.table({"s": pa.array([0 if s is None else s], pa.int64())})

    def wrapped_sum(ds) -> int:
        # int64 wrapping sum of the label column (see module docstring),
        # computed as distributed per-block partials — the driver pulls
        # ONE int64 per block, not the label table (a plain iter_batches
        # sum ships O(nodes) to the driver EVERY round, which is the
        # 10^12-doc regime's entire label volume)
        total = 0
        for b in ds.map_batches(_part_sum, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
            for s in b["s"].to_pylist():
                total = (total + s) & 0xFFFFFFFFFFFFFFFF
        return total

    prev_sum = wrapped_sum(labels)
    converged = False
    # NOTE on the per-round Dataset.joins below: Ray's hash-shuffle
    # JoinOperator crashes if a probe partition receives only a
    # schema-less 0-row block (see verify.attach_texts).  l1 comes from
    # groupby.map_groups, which emits such blocks for EMPTY pid
    # partitions — possible only when nodes ≪ bucket_partitions, i.e.
    # graphs far below cc_driver_max_edges, which the driver union-find
    # regime absorbs; at distributed-CC sizes every pid partition is
    # populated.  The forced-distributed tests (200 docs) pin this.
    for rnd in range(cfg.max_cc_rounds):
        msgs = (edges_bidir
                .join(labels, join_type="inner",
                      num_partitions=cfg.cc_partitions,
                      on=("src",), right_on=("node",))
                .select_columns(["dst", "label"])
                .rename_columns({"dst": "node"}))
        merged = labels.select_columns(["node", "label"]).union(msgs)
        # materialized: l1 feeds BOTH sides of the jump self-join below —
        # unmaterialized, each round executed the propagate-aggregate
        # twice (lazy lineage duplicated into both join inputs)
        l1 = (_add_node_pid(merged, "node", cfg.bucket_partitions)
              .groupby("pid")
              .map_groups(_part_min_label, batch_format="pyarrow")
              .materialize())
        # pointer jumping: label <- label(label).  Every label value is a
        # node id present in l1 (labels are mins over node ids), so the
        # inner self-join is total.  Turns diameter-many rounds into
        # O(log diameter) — a plain min-propagation silently missed
        # fixpoint on sparse high-diameter graphs within the round cap.
        jump_map = l1.rename_columns(
            {"node": "jkey", "label": "jlabel"}).select_columns(
            ["jkey", "jlabel"])
        new_labels = (l1.join(jump_map, join_type="inner",
                              num_partitions=cfg.cc_partitions,
                              on=("label",), right_on=("jkey",))
                      .select_columns(["node", "jlabel"])
                      .rename_columns({"jlabel": "label"})
                      .materialize())
        new_sum = wrapped_sum(new_labels)
        if on_round is not None:
            on_round(rnd, new_labels, new_sum)
        converged = new_sum == prev_sum
        labels, prev_sum = new_labels, new_sum
        if converged:
            break
    if not converged:
        raise RuntimeError(
            f"label propagation did not converge within "
            f"{cfg.max_cc_rounds} rounds (graph diameter > 2^rounds?)")
    return labels


def connected_components_auto(edges, cfg: PipelineConfig,
                              n_edges: int | None = None):
    """Scale-dispatched CC: (node_a, node_b) -> (node, label) Dataset.

    The deduped dup-edge list is orders of magnitude smaller than the
    corpus (only true duplicates), so below ``cc_driver_max_edges`` the
    exact union-find runs driver-side on two int64 columns (16 B/edge —
    80 MB at the 5M default) and skips ~6 rounds of join+groupby barriers;
    the labels are identical by construction (canonical min node id).
    Above the threshold — the 10^12-doc regime — the distributed
    label-propagation path runs.  Both paths are covered by tests.
    """
    if n_edges is None:
        n_edges = edges.count()
    if n_edges > cfg.cc_driver_max_edges:
        return label_propagation(edges, cfg)

    import numpy as np

    from eridu_ray.kernels.unionfind import components_from_edges

    # vectorized numpy CC (same kernel as the flagship's driver path —
    # the r3 per-edge Python uf.union loop is gone, VERDICT r3 #6);
    # identical min-node labels by construction, gated by the existing
    # path-equivalence tests
    a_parts, b_parts = [], []
    for b in edges.select_columns(["node_a", "node_b"]).iter_batches(
            batch_format="pyarrow", batch_size=262144):
        a_parts.append(b["node_a"].to_numpy(zero_copy_only=False))
        b_parts.append(b["node_b"].to_numpy(zero_copy_only=False))
    node_a = (np.concatenate(a_parts) if a_parts
              else np.array([], dtype=np.int64))
    node_b = (np.concatenate(b_parts) if b_parts
              else np.array([], dtype=np.int64))
    nodes, labels = components_from_edges(node_a, node_b)
    import ray.data

    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes), "label": pa.array(labels)}))


def relabel_by_min_url(labels_with_urls, cfg: PipelineConfig):
    """(url, label) -> (url, component, component_size).

    Canonical, human-stable component id = lexicographic min url in the
    component (FIXTURES.md F3).  One vectorized grouped aggregate
    (min url + count per label) joined back — NOT per-group Python
    (tens of thousands of groups = tens of thousands of interpreter
    calls under map_groups).
    """
    def _part_minurl_count(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"label_key": g["label"].to_numpy(
            zero_copy_only=False), "url": g["url"].to_pandas()})
        agg = (df.groupby("label_key", sort=False)["url"]
               .agg(["min", "size"]).reset_index())
        return pa.table({"label_key": pa.array(agg["label_key"],
                                               pa.int64()),
                         "component": pa.array(agg["min"], pa.string()),
                         "component_size": pa.array(
                             agg["size"].astype("int64"))})

    # per-label min url + size via pid-bucketed map_groups (labels are
    # distinct per component — a direct groupby(label).aggregate pays the
    # sort-based aggregate over #components keys; see module docstring)
    per_label = (_add_node_pid(labels_with_urls.select_columns(
        ["label", "url"]), "label", cfg.bucket_partitions)
        .groupby("pid")
        .map_groups(_part_minurl_count, batch_format="pyarrow"))
    joined = labels_with_urls.join(
        per_label, join_type="inner", num_partitions=cfg.cc_partitions,
        on=("label",), right_on=("label_key",))
    return joined.select_columns(["url", "component", "component_size"])
