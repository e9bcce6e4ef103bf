"""Union-find (disjoint set) for entity canonicalization.

Connected components is the one operator with no direct Ray Data primitive
(SURVEY.md §7.4). The candidate alias-edge set is small relative to the corpus
(it is bounded by the number of DISTINCT surface forms, not by row count), so
the engine aggregates distinct surfaces via a salted/partial groupby and runs
union-find on the driver. For edge sets too large for one machine, the
documented fallback is iterated min-label propagation via ``groupby`` (each
round: node takes min component label of its neighborhood) — same fixpoint,
O(diameter) rounds.
"""

from __future__ import annotations


class UnionFind:
    """Path-compressed, union-by-size disjoint sets over hashable keys."""

    def __init__(self) -> None:
        self.parent: dict = {}
        self.size: dict = {}

    def add(self, x) -> None:
        if x not in self.parent:
            self.parent[x] = x
            self.size[x] = 1

    def find(self, x):
        self.add(x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def components(self) -> dict:
        """key -> sorted tuple of members (deterministic)."""
        groups: dict = {}
        for x in self.parent:
            groups.setdefault(self.find(x), []).append(x)
        return {root: sorted(members) for root, members in groups.items()}
