"""pagerank (stages/pagerank.py) vs a numpy power-method brute force,
and broadcast-regime vs distributed-regime equality."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from knowledge_graph_ray.stages.pagerank import pagerank


def _brute(edges: pd.DataFrame, iterations: int, damping: float,
           undirected: bool) -> pd.DataFrame:
    e = edges.copy()
    if undirected:
        e = pd.concat([e, e.rename(columns={"src": "dst", "dst": "src"})],
                      ignore_index=True)
    nodes = sorted(set(e.src) | set(e.dst))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    s = e.groupby("src").w.sum()
    pr = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1 - damping) / n)
        contrib = pr[[idx[u] for u in e.src]] * e.w.to_numpy() / \
            s[e.src].to_numpy()
        np.add.at(nxt, [idx[v] for v in e.dst], damping * contrib)
        pr = nxt
    return pd.DataFrame({"name": nodes, "pr": pr})


def _random_graph(seed: int, n_nodes: int = 40, n_edges: int = 150):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "src": [f"n{v}" for v in rng.integers(0, n_nodes, n_edges)],
        "dst": [f"n{v}" for v in rng.integers(0, n_nodes, n_edges)],
        "w": rng.integers(1, 5, n_edges).astype("float64"),
    })
    return df[df.src != df.dst].drop_duplicates(["src", "dst"])


def test_pagerank_matches_bruteforce_weighted_undirected():
    df = _random_graph(1)
    got = (
        pagerank(rd.from_pandas(df).repartition(4), weight="w",
                 iterations=3)
        .to_pandas().sort_values("name").reset_index(drop=True)
    )
    exp = _brute(df, 3, 0.85, undirected=True) \
        .sort_values("name").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_exact=False, rtol=1e-12)
    # probabilities: non-dangling-redistribution keeps sum <= 1
    assert got.pr.between(0, 1).all()


def test_pagerank_directed_unweighted():
    df = _random_graph(2)[["src", "dst"]]
    df["w"] = 1.0
    got = (
        pagerank(rd.from_pandas(df[["src", "dst"]]), iterations=2,
                 undirected=False)
        .to_pandas().sort_values("name").reset_index(drop=True)
    )
    exp = _brute(df, 2, 0.85, undirected=False) \
        .sort_values("name").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_exact=False, rtol=1e-12)


def test_pagerank_regime_equivalence():
    """Broadcast driver state vs all-shuffle Dataset iteration."""
    df = _random_graph(3)
    b = (pagerank(rd.from_pandas(df), weight="w", iterations=2)
         .to_pandas().sort_values("name").reset_index(drop=True))
    d = (pagerank(rd.from_pandas(df), weight="w", iterations=2,
                  broadcast_nodes_max=0)
         .to_pandas().sort_values("name").reset_index(drop=True))
    pd.testing.assert_frame_equal(b, d, check_exact=False, rtol=1e-12)


def test_pagerank_empty_and_star():
    import pyarrow as pa

    empty = rd.from_arrow(pa.table({
        "src": pa.array([], type=pa.string()),
        "dst": pa.array([], type=pa.string()),
    }))
    assert pagerank(empty, iterations=1).count() == 0
    # star: center must outrank leaves
    star = pd.DataFrame({"src": ["hub"] * 4,
                         "dst": [f"leaf{i}" for i in range(4)]})
    got = pagerank(rd.from_pandas(star), iterations=3).to_pandas()
    hub = got[got.name == "hub"].pr.iloc[0]
    assert (got[got.name != "hub"].pr < hub).all()


# ------------------------------------------------------------------- HITS


def test_hits_hand_star():
    from knowledge_graph_ray.stages.pagerank import hits

    df = pd.DataFrame({"src": ["a", "b"], "dst": ["x", "x"]})
    out = hits(rd.from_pandas(df), iterations=3).to_pandas()
    got = {(n, s): round(v, 9) for n, s, v in
           zip(out.node, out.side, out.score)}
    r = round(1 / np.sqrt(2), 9)
    assert got == {("a", "hub"): r, ("b", "hub"): r, ("x", "auth"): 1.0}


def test_hits_regimes_equal():
    from knowledge_graph_ray.stages.pagerank import hits

    rng = np.random.default_rng(5)
    e = pd.DataFrame({"src": [f"u{i}" for i in rng.integers(0, 20, 80)],
                      "dst": [f"v{i}" for i in rng.integers(0, 15, 80)]})
    key = ["side", "node"]
    b1 = hits(rd.from_pandas(e)).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    b2 = hits(rd.from_pandas(e), broadcast_nodes_max=1).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    assert b1.node.tolist() == b2.node.tolist()
    assert b1.side.tolist() == b2.side.tolist()
    assert np.allclose(b1.score, b2.score, atol=1e-12)
    # L2 norm of each side is 1 after the final half-steps
    for side in ("hub", "auth"):
        assert abs((b1[b1.side == side].score ** 2).sum() - 1.0) < 1e-9


def test_hits_empty_edges():
    from knowledge_graph_ray.stages.pagerank import hits

    empty = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string())})
    assert hits(rd.from_arrow(empty)).count() == 0


# -------------------------------------------------- personalized PageRank


def _brute_ppr(edges: pd.DataFrame, seeds: list, iterations: int,
               damping: float, undirected: bool) -> pd.DataFrame:
    from knowledge_graph_ray.stages.pagerank import personalized_pagerank  # noqa: F401

    e = edges.copy()
    if undirected:
        e = pd.concat([e, e.rename(columns={"src": "dst", "dst": "src"})],
                      ignore_index=True)
    nodes = sorted(set(e.src) | set(e.dst))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    s = e.groupby("src").w.sum()
    present = [x for x in seeds if x in idx]
    t = np.zeros(n)
    for x in present:
        t[idx[x]] = 1.0 / len(present)
    pr = t.copy()
    for _ in range(iterations):
        nxt = (1 - damping) * t
        contrib = pr[[idx[u] for u in e.src]] * e.w.to_numpy() / \
            s[e.src].to_numpy()
        np.add.at(nxt, [idx[v] for v in e.dst], damping * contrib)
        pr = nxt
    return pd.DataFrame({"name": nodes, "ppr": pr})


def test_ppr_matches_bruteforce():
    from knowledge_graph_ray.stages.pagerank import personalized_pagerank

    df = _random_graph(11)
    seeds = ["n0", "n1", "not_in_graph"]
    got = (personalized_pagerank(rd.from_pandas(df).repartition(4), seeds,
                                 weight="w", iterations=3)
           .to_pandas().sort_values("name").reset_index(drop=True))
    exp = _brute_ppr(df, seeds, 3, 0.85, undirected=True) \
        .sort_values("name").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_exact=False, rtol=1e-12)
    # teleport restriction: total mass <= 1, seeds dominate their leaves
    assert got.ppr.sum() <= 1.0 + 1e-9


def test_ppr_regime_equivalence_and_no_seed():
    import pytest

    from knowledge_graph_ray.stages.pagerank import personalized_pagerank

    df = _random_graph(12)
    seeds = ["n2", "n3"]
    b = (personalized_pagerank(rd.from_pandas(df), seeds, weight="w",
                               iterations=2)
         .to_pandas().sort_values("name").reset_index(drop=True))
    d = (personalized_pagerank(rd.from_pandas(df), seeds, weight="w",
                               iterations=2, broadcast_nodes_max=0)
         .to_pandas().sort_values("name").reset_index(drop=True))
    pd.testing.assert_frame_equal(b, d, check_exact=False, rtol=1e-12)
    with pytest.raises(ValueError):
        personalized_pagerank(rd.from_pandas(df), ["zz_missing"],
                              weight="w", iterations=1)


def test_ppr_zero_outside_reach():
    """Nodes unreachable from the seed set hold exactly zero mass."""
    from knowledge_graph_ray.stages.pagerank import personalized_pagerank

    df = pd.DataFrame({"src": ["a", "c"], "dst": ["b", "d"],
                       "w": [1.0, 1.0]})
    got = personalized_pagerank(rd.from_pandas(df), ["a"],
                                iterations=3).to_pandas()
    assert set(got[got.ppr > 0].name) == {"a", "b"}
    assert (got[got.name.isin(["c", "d"])].ppr == 0).all()


# ------------------------------------------------------- label spreading


def test_label_spread_matches_bruteforce():
    from knowledge_graph_ray.stages.pagerank import label_spread

    df = _random_graph(21)
    seeds = {"n0": "red", "n5": "blue", "zz_absent": "green"}
    got = (label_spread(rd.from_pandas(df), seeds, weight="w", rounds=3)
           .to_pandas().sort_values("name").reset_index(drop=True))

    # brute force: dense score matrix, same clamping schedule
    e = pd.concat([df, df.rename(columns={"src": "dst", "dst": "src"})],
                  ignore_index=True)
    nodes = sorted(set(e.src) | set(e.dst))
    idx = {n: i for i, n in enumerate(nodes)}
    labels = sorted({v for k, v in seeds.items() if k in idx})
    lidx = {v: i for i, v in enumerate(labels)}
    s = e.groupby("src").w.sum()
    S = np.zeros((len(nodes), len(labels)))
    present = {k: v for k, v in seeds.items() if k in idx}
    for k, v in present.items():
        S[idx[k], lidx[v]] = 1.0
    for _ in range(3):
        nxt = np.zeros_like(S)
        contrib = S[[idx[u] for u in e.src]] * \
            (e.w.to_numpy() / s[e.src].to_numpy())[:, None]
        np.add.at(nxt, [idx[v] for v in e.dst], contrib)
        for k, v in present.items():
            nxt[idx[k]] = 0.0
            nxt[idx[k], lidx[v]] = 1.0
        S = nxt
    rows = []
    for n in nodes:
        sc = S[idx[n]]
        if sc.max() <= 0:
            continue
        li = int(np.argmax(sc))  # ties: lowest index = lexicographic min
        rows.append({"name": n, "label": labels[li],
                     "score": sc[li]})
    exp = pd.DataFrame(rows).sort_values("name").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["name", "label", "score"]], exp,
        check_exact=False, rtol=1e-12)
    # seeds stay clamped at exactly 1.0 with their own label
    g = got.set_index("name")
    assert g.loc["n0", "label"] == "red" and g.loc["n0", "score"] == 1.0
    assert g.loc["n5", "label"] == "blue" and g.loc["n5", "score"] == 1.0


def test_label_spread_no_seed_raises():
    import pytest

    from knowledge_graph_ray.stages.pagerank import label_spread

    df = _random_graph(22)
    with pytest.raises(ValueError):
        label_spread(rd.from_pandas(df), {"zz": "red"}, weight="w")
