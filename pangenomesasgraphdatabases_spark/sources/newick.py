"""Newick phylogenetic-tree source (SURVEY.md S10/F18/J10).

The reference reads the tree with Bio.Phylo and calls
tree.distance(s1, s2) inside a nested loop (RGPs.ipynb:1618, :1655).
Strategy here: parse the Newick text driver-side (it is one small
string — 770 leaves), materialize the FULL pairwise leaf-distance
table once (O(n^2) rows, ~600k for 770 strains — tiny), and broadcast
it into feature-level joins.  A pure-python recursive-descent parser
replaces Biopython (not available in this container).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class _Node:
    name: str | None = None
    length: float = 0.0
    children: list["_Node"] = field(default_factory=list)


def parse_newick(text: str) -> _Node:
    """Minimal Newick parser: names, branch lengths, nesting."""
    s = text.strip().rstrip(";")
    pos = 0

    def parse_node() -> _Node:
        nonlocal pos
        node = _Node()
        if pos < len(s) and s[pos] == "(":
            pos += 1
            while True:
                node.children.append(parse_node())
                if pos < len(s) and s[pos] == ",":
                    pos += 1
                    continue
                break
            if pos >= len(s) or s[pos] != ")":
                raise ValueError(f"unbalanced newick at {pos}")
            pos += 1
        # optional label
        start = pos
        while pos < len(s) and s[pos] not in ",():;":
            pos += 1
        label = s[start:pos]
        if label:
            node.name = label
        if pos < len(s) and s[pos] == ":":
            pos += 1
            start = pos
            while pos < len(s) and s[pos] not in ",()":
                pos += 1
            node.length = float(s[start:pos])
        return node

    root = parse_node()
    if pos != len(s):
        raise ValueError(f"trailing newick input at {pos}: {s[pos:pos+20]!r}")
    return root


def leaf_distances(root: _Node) -> dict[tuple[str, str], float]:
    """All-pairs path distances between leaves (sum of branch lengths
    through the lowest common ancestor)."""
    out: dict[tuple[str, str], float] = {}

    def walk(node: _Node) -> list[tuple[str, float]]:
        if not node.children:
            return [(node.name or "", node.length)]
        merged: list[tuple[str, float]] = []
        for child in node.children:
            sub = walk(child)
            for n1, d1 in merged:
                for n2, d2 in sub:
                    a, b = sorted((n1, n2))
                    out[(a, b)] = d1 + d2
            merged.extend(sub)
        return [(n, d + node.length) for n, d in merged]

    walk(root)
    return out


def tree_distance_table(spark: SparkSession, newick_text: str) -> DataFrame:
    """S10 -> (strain1, strain2, distance) DataFrame, symmetric closure
    included so joins need no orientation logic; broadcast at use sites
    (J10)."""
    dists = leaf_distances(parse_newick(newick_text))
    rows = []
    for (a, b), d in dists.items():
        rows.append((a, b, float(d)))
        rows.append((b, a, float(d)))
    return spark.createDataFrame(rows, ["strain1", "strain2", "distance"])
