"""Deterministic Leiden community detection (Traag, Waltman & van Eck,
"From Louvain to Leiden: guaranteeing well-connected communities",
Scientific Reports 9, 5233 (2019) — public algorithm).

The reference indexer clusters with graspologic ``hierarchical_leiden``
(/root/reference/verbs/community_detection/clustering/leiden.py:45-61);
graspologic is not installed in this sandbox, so this module implements
the Leiden loop itself — fast local move, refinement phase, aggregation
constrained by the unrefined partition — over a networkx graph, with the
modularity quality function (resolution ``gamma``).  It is the
``clustering_algorithm="leiden"`` strategy behind
``stages/community.detect_communities``; the engine default remains the
seeded networkx Louvain (identical outputs to all pinned rounds).

Determinism: node visit order is a seeded Fisher-Yates shuffle of the
sorted node list (``random.Random(seed)``), every tie in a gain argmax
breaks toward the candidate community with the smallest minimum node,
and aggregation orders communities by their minimum original member —
the same partition comes out for the same (graph, seed) on every run
and on every worker.

Unlike Louvain, the refinement phase guarantees every returned
community induces a CONNECTED subgraph (paper §"Guarantees"), which is
the property the hierarchy recursion in ``stages/community`` relies on
when it re-clusters an oversized community's induced subgraph.
"""

from __future__ import annotations

import random
from collections import deque
from typing import Hashable, Iterable


def _graph_arrays(nodes: list, adj: dict) -> tuple[list[float], float]:
    """Weighted degrees (self-loops counted twice, networkx convention)
    and the doubled total weight m2 = sum(deg)."""
    deg = []
    for v in nodes:
        d = 0.0
        for u, w in adj[v].items():
            d += 2.0 * w if u == v else w
        deg.append(d)
    return deg, sum(deg)


def _local_move(
    n: int, adj: list[dict], deg: list[float], m2: float,
    membership: list[int], gamma: float, order: list[int],
) -> bool:
    """Queue-based fast local move (paper Alg. 3).  Mutates
    ``membership`` in place; returns True if any node moved."""
    tot = {}
    for v in range(n):
        c = membership[v]
        tot[c] = tot.get(c, 0.0) + deg[v]
    queue = deque(order)
    in_queue = [True] * n
    moved = False
    while queue:
        v = queue.popleft()
        in_queue[v] = False
        c_old = membership[v]
        tot[c_old] -= deg[v]
        # edge weight from v into each neighbouring community (self-loops
        # belong to every candidate equally — drop them, standard form)
        k_vc: dict[int, float] = {c_old: 0.0}
        for u, w in adj[v].items():
            if u != v:
                k_vc[membership[u]] = k_vc.get(membership[u], 0.0) + w
        best_c, best_gain = c_old, k_vc.get(c_old, 0.0) - gamma * deg[v] * tot[c_old] / m2
        for c, k in sorted(k_vc.items()):
            gain = k - gamma * deg[v] * tot.get(c, 0.0) / m2
            if gain > best_gain + 1e-12:
                best_c, best_gain = c, gain
        membership[v] = best_c
        tot[best_c] = tot.get(best_c, 0.0) + deg[v]
        if best_c != c_old:
            moved = True
            for u in adj[v]:
                if u != v and membership[u] != best_c and not in_queue[u]:
                    queue.append(u)
                    in_queue[u] = True
    return moved


def _refine(
    n: int, adj: list[dict], deg: list[float], m2: float,
    membership: list[int], gamma: float, order: list[int],
) -> list[int]:
    """Refinement phase (paper Alg. 4, theta -> 0 argmax variant):
    within each community of ``membership``, grow sub-communities from
    singletons; only singleton, well-connected nodes may merge, and only
    into well-connected sub-communities.  Returns the refined
    membership (indices into 0..n-1 space, one label per node)."""
    refined = list(range(n))
    sub_tot = list(deg)  # degree total per refined community
    sub_size = [1] * n  # node count per refined community
    comm_tot = {}
    for v in range(n):
        c = membership[v]
        comm_tot[c] = comm_tot.get(c, 0.0) + deg[v]
    # E(refined community D, C - D): running external-edge weight of D
    # within its parent community.  For a singleton v this is k(v, C-v).
    ext = [0.0] * n
    for v in range(n):
        for u, w in adj[v].items():
            if u != v and membership[u] == membership[v]:
                ext[v] += w
    for v in order:
        if sub_size[refined[v]] != 1:
            continue  # only nodes still alone may move (paper)
        c = membership[v]
        kc = comm_tot[c]
        if ext[v] < gamma * deg[v] * (kc - deg[v]) / m2 - 1e-12:
            continue  # v is not well-connected within its community
        # candidate sub-communities: those of v's same-community
        # neighbours; track v's edge weight into each
        k_vd: dict[int, float] = {}
        for u, w in adj[v].items():
            if u != v and membership[u] == c:
                d = refined[u]
                k_vd[d] = k_vd.get(d, 0.0) + w
        best_d, best_gain = refined[v], 0.0
        for d, k in sorted(k_vd.items()):
            if ext[d] < gamma * sub_tot[d] * (kc - sub_tot[d]) / m2 - 1e-12:
                continue  # candidate sub-community not well-connected
            gain = k - gamma * deg[v] * sub_tot[d] / m2
            if gain > best_gain + 1e-12:
                best_d, best_gain = d, gain
        if best_d != refined[v]:
            old = refined[v]
            # maintain ext for the merged sub-community: internal edges
            # between v and best_d stop being external for both sides
            ext[best_d] = ext[best_d] + ext[old] - 2.0 * k_vd[best_d]
            sub_tot[best_d] += deg[v]
            sub_size[best_d] += 1
            sub_size[old] = 0
            refined[v] = best_d
    return refined


def leiden_communities(
    graph, weight: str = "weight", seed: int = 6969, resolution: float = 1.0,
) -> list[set]:
    """Partition ``graph`` (networkx, undirected, optionally weighted)
    into communities with the Leiden algorithm; modularity quality at
    ``resolution``.  Returns a list of node sets sorted by smallest
    member — the same output contract as
    ``networkx.community.louvain_communities`` so callers can swap the
    two (stages/community._cluster_component does exactly that)."""
    nodes = sorted(graph.nodes())
    n = len(nodes)
    if n == 0:
        return []
    index = {v: i for i, v in enumerate(nodes)}
    adj: list[dict] = [dict() for _ in range(n)]
    for u, v, data in graph.edges(data=True):
        w = float(data.get(weight, 1.0))
        iu, iv = index[u], index[v]
        adj[iu][iv] = adj[iu].get(iv, 0.0) + w
        if iu != iv:
            adj[iv][iu] = adj[iv].get(iu, 0.0) + w
    deg, m2 = _graph_arrays(list(range(n)), {i: a for i, a in enumerate(adj)})
    if m2 <= 0.0:
        return [{v} for v in nodes]  # no edges: all singletons

    rng = random.Random(seed)
    # groups[i] = original-node indices inside current aggregate node i
    groups: list[list[int]] = [[i] for i in range(n)]
    membership = list(range(len(groups)))
    while True:
        cur_n = len(groups)
        order = list(range(cur_n))
        rng.shuffle(order)
        _local_move(cur_n, adj, deg, m2, membership, resolution, order)
        labels = sorted(set(membership))
        if len(labels) == cur_n:
            break  # every aggregate node is its own community: converged
        order = list(range(cur_n))
        rng.shuffle(order)
        refined = _refine(cur_n, adj, deg, m2, membership, resolution, order)
        rlabels = sorted(set(refined))
        if len(rlabels) == cur_n:
            break  # refinement kept all singletons: aggregation would loop
        # aggregate on the REFINED partition; the next local move starts
        # from the UNREFINED partition's assignment (Leiden's key step).
        # Order aggregate nodes by smallest original member: determinism.
        rmap = {lab: i for i, lab in enumerate(sorted(
            rlabels, key=lambda lab: min(
                min(groups[v]) for v in range(cur_n) if refined[v] == lab
            )
        ))}
        new_n = len(rlabels)
        new_groups: list[list[int]] = [[] for _ in range(new_n)]
        new_membership = [0] * new_n
        new_adj: list[dict] = [dict() for _ in range(new_n)]
        for v in range(cur_n):
            a = rmap[refined[v]]
            new_groups[a].extend(groups[v])
            new_membership[a] = membership[v]
            for u, w in adj[v].items():
                if u < v:
                    continue  # visit each undirected edge once (incl. self)
                b = rmap[refined[u]]
                new_adj[a][b] = new_adj[a].get(b, 0.0) + w
                if a != b:
                    new_adj[b][a] = new_adj[b].get(a, 0.0) + w
        groups = [sorted(g) for g in new_groups]
        adj = new_adj
        membership = new_membership
        deg, m2 = _graph_arrays(
            list(range(new_n)), {i: a for i, a in enumerate(new_adj)}
        )
    out: dict[int, set] = {}
    for v, c in enumerate(membership):
        out.setdefault(c, set()).update(nodes[i] for i in groups[v])
    return sorted(out.values(), key=min)
