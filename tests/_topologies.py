"""Shared test topology builders."""

import numpy as np


def kary_tree(K: int, depth: int):
    """Uniform K-ary tree DiGraph: boundary inlet 0 -> stem -> K-ary fan
    with ``depth`` bifurcation levels."""
    import networkx as nx

    G = nx.DiGraph()
    G.add_node(0, pos=np.array([0.0, -1.0]))
    G.add_node(1, pos=np.array([0.0, 0.0]))
    G.add_edge(0, 1)
    next_id = 2
    frontier = [(1, 0.0)]  # (node, x position)
    for d in range(depth + 1):
        new_frontier = []
        width = float(K ** (depth - d))
        for node, x in frontier:
            for j in range(K):
                child = next_id
                next_id += 1
                cx = x + (j - (K - 1) / 2.0) * width
                G.add_node(child, pos=np.array([cx, float(d + 1)]))
                G.add_edge(node, child)
                new_frontier.append((child, cx))
        frontier = new_frontier
    return G
