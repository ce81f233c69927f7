"""Leiden clustering strategy: algorithmic guarantees (connectivity,
determinism, quality), hierarchy contract, and driver-vs-distributed
regime equality under ``detect_communities(algorithm="leiden")``.

The Leiden implementation (functions/leiden.py) reproduces the
algorithm the reference actually clusters with (graspologic
hierarchical_leiden, reference leiden.py:45-61) from the published
description; the engine default stays louvain, so these tests exercise
the option without touching pinned outputs.
"""

import networkx as nx
import networkx.algorithms.community as nxc
import pandas as pd
import pytest
import ray.data

from knowledge_graph_ray.functions.leiden import leiden_communities
from knowledge_graph_ray.stages.community import (
    _cluster_component,
    detect_communities,
)
from knowledge_graph_ray.stages.components import connected_components


def _clique_pair():
    g = nx.Graph()
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                g.add_edge(f"n{base + i:02d}", f"n{base + j:02d}", weight=1.0)
    g.add_edge("n00", "n10", weight=1.0)
    return g


def test_two_cliques_split():
    comms = leiden_communities(_clique_pair(), seed=6969)
    assert sorted(sorted(c) for c in comms) == [
        [f"n{i:02d}" for i in range(5)],
        [f"n{i:02d}" for i in range(10, 15)],
    ]


def test_edge_cases():
    assert leiden_communities(nx.Graph()) == []
    g = nx.Graph()
    g.add_nodes_from(["a", "b", "c"])
    assert leiden_communities(g) == [{"a"}, {"b"}, {"c"}]
    # self-loops follow the networkx degree convention (counted twice):
    # a heavy loop inflates n00's degree penalty and isolates it —
    # exactly what louvain_communities does on the same graph — while a
    # light loop leaves the two-clique answer intact
    g = _clique_pair()
    g.add_edge("n00", "n00", weight=5.0)
    heavy = leiden_communities(g, seed=1)
    assert heavy == nx.community.louvain_communities(
        g, weight="weight", seed=1
    ) and {"n00"} in heavy
    g["n00"]["n00"]["weight"] = 0.5
    assert len(leiden_communities(g, seed=1)) == 2


def test_weight_sensitivity():
    # a--b--c chain; heavy a-b edge groups (a,b) together
    g = nx.Graph()
    g.add_edge("a", "b", weight=10.0)
    g.add_edge("b", "c", weight=0.1)
    g.add_edge("c", "d", weight=10.0)
    comms = leiden_communities(g, seed=3)
    assert {"a", "b"} in comms and {"c", "d"} in comms


@pytest.mark.parametrize("n,m,seed", [(200, 600, 1), (500, 1200, 2), (500, 900, 3)])
def test_every_community_connected(n, m, seed):
    """Leiden's refinement guarantee: every community induces a
    connected subgraph (the property the hierarchy recursion relies on
    when re-clustering an oversized community)."""
    g = nx.gnm_random_graph(n, m, seed=seed)
    comms = leiden_communities(g, seed=seed)
    assert sorted(len(c) for c in comms)  # non-empty
    for c in comms:
        assert nx.is_connected(g.subgraph(c))
    # partition property: every node exactly once
    assert sorted(v for c in comms for v in c) == sorted(g.nodes())


def test_deterministic_per_seed():
    g = nx.gnm_random_graph(300, 900, seed=9)
    a = leiden_communities(g, seed=6969)
    b = leiden_communities(g, seed=6969)
    assert a == b


def test_quality_floor_karate():
    g = nx.karate_club_graph()
    comms = leiden_communities(g, seed=1)
    assert nxc.modularity(g, comms) >= 0.38  # optimum ~0.445


def test_hierarchy_contract_with_leiden():
    """_cluster_component(algorithm='leiden'): level 0 partitions all
    nodes, oversized clusters recurse, every community stays within its
    parent."""
    g = nx.gnm_random_graph(60, 180, seed=4)
    g = nx.relabel_nodes(g, {i: f"v{i:02d}" for i in g.nodes()})
    for u, v in g.edges():
        g[u][v]["weight"] = 1.0
    rows = pd.DataFrame(
        _cluster_component(g, "comp", max_cluster_size=8, seed=6969,
                           algorithm="leiden")
    )
    lvl0 = rows[rows.level == 0]
    assert sorted(lvl0.name) == sorted(g.nodes())
    assert rows.groupby(["level", "name"]).size().max() == 1
    # terminal communities are all within the size budget
    max_level = rows.level.max()
    sizes = rows[rows.level == max_level].groupby("community").size()
    assert (sizes <= 8).all()
    # child communities refine their parent: every (level L+1) member
    # set is a subset of one level-L community
    for lvl in range(int(max_level)):
        parent_of = dict(zip(rows[rows.level == lvl].name,
                             rows[rows.level == lvl].community))
        child = rows[rows.level == lvl + 1]
        parents = child.assign(parent=child.name.map(parent_of))
        assert parents.groupby("community").parent.nunique().max() == 1


def test_unknown_algorithm_raises():
    g = nx.path_graph(3)
    with pytest.raises(ValueError, match="unknown clustering algorithm"):
        _cluster_component(g, "c", 10, 1, algorithm="metis")


def test_detect_communities_leiden_regime_parity():
    """detect_communities(algorithm='leiden') emits identical rows via
    the driver fast path and the distributed map_groups path."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.RandomState(11)
    nodes = [f"N{i:03d}" for i in range(120)]
    pairs = {(i, (i + 1) % 120) for i in range(120)}
    for a, b in rng.randint(0, 120, size=(150, 2)):
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    edges = [(nodes[a], nodes[b], 1.0 + ((a + b) % 3))
             for a, b in sorted((min(p), max(p)) for p in pairs)]
    ents = ray.data.from_arrow(
        pa.Table.from_pydict({"name": nodes})).repartition(4)
    rels = ray.data.from_arrow(pa.Table.from_pydict(
        {
            "src": [e[0] for e in edges],
            "dst": [e[1] for e in edges],
            "weight": [e[2] for e in edges],
        }
    )).repartition(4)
    comps = connected_components(ents, rels, num_partitions=4).materialize()
    kw = dict(max_cluster_size=10, num_partitions=4, use_lcc=False,
              algorithm="leiden")
    a = detect_communities(comps, rels, **kw).to_pandas()
    b = detect_communities(comps, rels, driver_threshold=0, **kw).to_pandas()
    key = ["level", "community", "name"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    assert set(a[a.level == 0].name) == set(nodes)
