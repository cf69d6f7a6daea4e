"""Driver-side union-find — the *oracle* for connected components.

The distributed pipeline computes components via iterative min-label
propagation (groupby-aggregate rounds, SURVEY.md §7.1 / MR-CC ICDE'13);
this tiny exact union-find verifies those labels on test-sized graphs and
is also used by the ground-truth generator.  Never used on big data.
"""

from __future__ import annotations


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # canonical root = min — matches the pipeline's min-label rule
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo

    def components(self) -> dict:
        """node -> canonical (minimum) member of its component."""
        return {x: self.find(x) for x in list(self.parent)}


def connected_components(edges, nodes=()) -> dict:
    """Exact components from an edge list [(a, b), ...] (+ isolated nodes)."""
    uf = UnionFind()
    for n in nodes:
        uf.find(n)
    for a, b in edges:
        uf.union(a, b)
    return uf.components()


def components_from_edges(node_a, node_b):
    """Vectorized exact connected components over int64 edge arrays.

    Returns ``(nodes_sorted, labels)``: the sorted distinct edge endpoints
    and, aligned with them, the canonical component id = **minimum node id**
    in each component (the same rule as :class:`UnionFind` and the
    distributed min-label propagation, so all three paths produce identical
    labels).  Pure numpy min-label propagation with pointer jumping — no
    per-edge Python; the driver-CC regime ingests its bounded
    (``cc_driver_max_edges``) list in milliseconds instead of dict-loop
    seconds.
    """
    import numpy as np

    node_a = np.asarray(node_a, dtype=np.int64)
    node_b = np.asarray(node_b, dtype=np.int64)
    nodes = np.unique(np.concatenate([node_a, node_b]))
    if nodes.size == 0:
        return nodes, nodes
    ea = np.searchsorted(nodes, node_a)
    eb = np.searchsorted(nodes, node_b)

    def _flatten(parent: np.ndarray) -> np.ndarray:
        while True:
            pp = parent[parent]
            if np.array_equal(pp, parent):
                return parent
            parent = pp

    # Hook-to-min with full compression per round (Shiloach–Vishkin
    # style): every round, each still-live edge proposes hooking the
    # larger of its two roots onto the smaller; conflicts resolve to the
    # MINIMUM proposal via one lexsort (no np.minimum.at — the unbuffered
    # ufunc path is ~20x slower at millions of edges).  Satisfied edges
    # drop out, so per-round work shrinks geometrically; O(log n) rounds.
    # The component minimum can never be hooked (strictly-decreasing
    # hooks), so the final root IS the min compact index — and nodes is
    # sorted, so min compact index == min node id.
    parent = np.arange(nodes.size, dtype=np.int64)
    while ea.size:
        parent = _flatten(parent)
        ra = parent[ea]
        rb = parent[eb]
        live = ra != rb
        if not live.any():
            break
        ea, eb = ea[live], eb[live]
        ra, rb = ra[live], rb[live]
        lo = np.minimum(ra, rb)
        hi = np.maximum(ra, rb)
        order = np.lexsort((lo, hi))
        hi_s = hi[order]
        lo_s = lo[order]
        firsts = np.concatenate([[True], hi_s[1:] != hi_s[:-1]])
        parent[hi_s[firsts]] = lo_s[firsts]
    parent = _flatten(parent)
    return nodes, nodes[parent]
