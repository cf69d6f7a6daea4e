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
