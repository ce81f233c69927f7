"""triangle_count (stages/graphops.py) vs networkx brute force."""

import networkx as nx
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from knowledge_graph_ray.stages.graphops import _pair_expand, triangle_count


def test_pair_expand_vectorized():
    codes = np.array([0, 0, 0, 1, 2, 2], dtype=np.int64)
    i, j = _pair_expand(codes)
    pairs = sorted(zip(i.tolist(), j.tolist()))
    assert pairs == [(0, 1), (0, 2), (1, 2), (4, 5)]
    i0, j0 = _pair_expand(np.array([], dtype=np.int64))
    assert len(i0) == 0 and len(j0) == 0


def _count(df: pd.DataFrame) -> int:
    g = nx.Graph()
    g.add_edges_from(zip(df.src, df.dst))
    g.remove_edges_from(nx.selfloop_edges(g))
    return sum(nx.triangles(g).values()) // 3


def test_triangle_count_random_graphs():
    rng = np.random.default_rng(7)
    for n_nodes, n_edges in ((20, 60), (60, 300)):
        df = pd.DataFrame({
            "src": [f"n{v}" for v in rng.integers(0, n_nodes, n_edges)],
            "dst": [f"n{v}" for v in rng.integers(0, n_nodes, n_edges)],
        })
        got = triangle_count(rd.from_pandas(df).repartition(4)) \
            .to_pandas().triangles.iloc[0]
        assert got == _count(df)


def test_triangle_count_normalization_and_edges():
    # duplicates, reversed duplicates and self-loops collapse
    df = pd.DataFrame({
        "src": ["a", "b", "c", "a", "a", "a"],
        "dst": ["b", "c", "a", "b", "c", "a"],
    })
    got = triangle_count(rd.from_pandas(df)).to_pandas().triangles.iloc[0]
    assert got == 1
    # triangle-free graph and empty graph
    path = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
    assert triangle_count(rd.from_pandas(path)) \
        .to_pandas().triangles.iloc[0] == 0
    empty = rd.from_arrow(pa.table({
        "src": pa.array([], type=pa.string()),
        "dst": pa.array([], type=pa.string()),
    }))
    assert triangle_count(empty).to_pandas().triangles.iloc[0] == 0


def test_bipartite_bfs_hops_alternates_and_excludes_visited():
    from knowledge_graph_ray.stages.graphops import bipartite_bfs_hops

    # c1-{s1,s2}, c2-{s2,s3}, c3-{s3}, c4 isolated via s9
    edges = rd.from_arrow(pa.table({
        "c": pa.array([1, 1, 2, 2, 3, 4], type=pa.int64()),
        "s": pa.array([1, 2, 2, 3, 3, 9], type=pa.int64()),
    })).materialize()
    seed = rd.from_arrow(pa.table({"c": pa.array([1], type=pa.int64())}))
    counts = bipartite_bfs_hops(edges, seed, hops=4)
    # hop1: s1,s2 -> 2; hop2: c2 (c1 visited) -> 1; hop3: s3 -> 1;
    # hop4: c3 -> 1 (c4/s9 unreachable)
    assert counts == [(1, 2), (2, 1), (3, 1), (4, 1)]


def test_bipartite_bfs_hops_match_networkx_distances():
    """Hop counts == number of nodes at exactly distance h from the
    seed in the bipartite graph, over randomized edge sets."""
    from knowledge_graph_ray.stages.graphops import bipartite_bfs_hops

    rng = np.random.RandomState(17)
    for trial in range(5):
        n_edges = rng.randint(5, 40)
        cs = rng.randint(0, 8, size=n_edges)
        ss = rng.randint(100, 108, size=n_edges)
        edges = rd.from_arrow(pa.table({
            "c": pa.array(cs, type=pa.int64()),
            "s": pa.array(ss, type=pa.int64()),
        })).materialize()
        seed_val = int(cs[0])
        seed = rd.from_arrow(pa.table({
            "c": pa.array([seed_val], type=pa.int64())}))
        got = bipartite_bfs_hops(edges, seed, hops=4)

        g = nx.Graph()
        g.add_edges_from((("c", int(a)), ("s", int(b)))
                         for a, b in zip(cs, ss))
        dist = nx.single_source_shortest_path_length(g, ("c", seed_val))
        for h in range(1, 5):
            want = sum(1 for d in dist.values() if d == h)
            assert got[h - 1] == (h, want), (trial, h, got, dist)


def test_multi_source_bfs_chain_and_disconnect():
    """Chain a-b-c-d-e plus isolated pair x-y: min-hop distances per
    seed, absent seeds dropped, unreachable components never appear."""
    import pandas as pd
    import ray.data as rd

    from knowledge_graph_ray.stages.graphops import multi_source_bfs

    edges = pd.DataFrame({
        "src": ["a", "b", "c", "d", "x"],
        "dst": ["b", "c", "d", "e", "y"],
    })
    got = multi_source_bfs(rd.from_pandas(edges), ["a", "d", "zzz"],
                           hops=4).to_pandas()
    dist = {(s, n): d for s, n, d in
            zip(got["seed"], got["name"], got["dist"])}
    assert dist[("a", "a")] == 0 and dist[("a", "e")] == 4
    assert dist[("a", "c")] == 2
    assert dist[("d", "a")] == 3 and dist[("d", "e")] == 1
    # absent seed dropped entirely; other component unreachable
    assert not any(s == "zzz" for s, _ in dist)
    assert not any(n in ("x", "y") for _, n in dist)
    # hop cap respected
    got2 = multi_source_bfs(rd.from_pandas(edges), ["a"], hops=2).to_pandas()
    assert set(got2["name"]) == {"a", "b", "c"}


def test_luby_mis_regime_equality_and_validity():
    """Driver fast path vs distributed regime produce IDENTICAL rows,
    and the result is a valid MIS: independent (no edge inside) and
    maximal (every excluded/undecided node has an MIS neighbour or
    was never decided within the round budget)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from knowledge_graph_ray.stages.graphops import luby_mis

    rng = np.random.default_rng(7)
    n = 60
    src = rng.integers(0, n, 220)
    dst = rng.integers(0, n, 220)
    keep = src != dst
    df = pd.DataFrame({"u": [f"n{v}" for v in src[keep]],
                       "v": [f"n{v}" for v in dst[keep]]})
    both = pd.concat([df, df.rename(columns={"u": "v", "v": "u"})],
                     ignore_index=True).drop_duplicates()
    ds = rd.from_pandas(both).repartition(4)
    a = (luby_mis(ds, rounds=4, driver_threshold=10_000)
         .to_pandas().sort_values(["name"]).reset_index(drop=True))
    b = (luby_mis(ds, rounds=4, driver_threshold=0)
         .to_pandas().sort_values(["name"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    mis = set(a[a.state == "mis"].name)
    nbr = {}
    for x, y in zip(both.u, both.v):
        nbr.setdefault(x, set()).add(y)
    # independence
    assert all(not (nbr.get(m, set()) & mis) for m in mis)
    # every excluded node has an MIS neighbour
    for e in a[a.state == "excluded"].name:
        assert nbr.get(e, set()) & mis
