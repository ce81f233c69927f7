"""Distributed triangle counting (degree-ordered edge orientation).

The classic scale-safe algorithm: orient every undirected edge from its
lower-(degree, name) endpoint to its higher one — every triangle then
has exactly ONE wedge vertex whose two out-edges cover it, and the
maximum out-degree is O(sqrt(m)), which bounds the wedge explosion
that a naive neighbor self-join suffers on hub nodes.

    triangles = |{(u,v,w) : u->v, u->w, v "before" w, v->w}|

Pipeline shape: one distinct pass over the edges, one node-degree
aggregate (broadcast — node-count-sized, the same size-adaptive rule as
the engine's other broadcasts), one shuffle on the wedge vertex for the
VECTORIZED pair expansion (no per-node Python pair loop), and one
semi hash-join of wedges against the oriented edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _pair_expand(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For sorted group codes, all within-group index pairs (i, j) with
    i < j — fully vectorized (np.repeat + prefix arithmetic)."""
    n = len(codes)
    if n == 0:
        return (np.array([], dtype=np.int64),) * 2
    change = np.r_[True, codes[1:] != codes[:-1]]
    starts = np.flatnonzero(change)
    sizes = np.diff(np.r_[starts, n])
    gidx = np.cumsum(change) - 1
    # j ranges over every index whose group has >= 1 earlier member
    pos_in_group = np.arange(n) - starts[gidx]
    reps = pos_in_group  # index j pairs with its pos_in_group predecessors
    j = np.repeat(np.arange(n), reps)
    # i enumerates start..j-1 for each j: offsets = position within each
    # j's run (vectorized exclusive-cumsum subtraction, no Python loop)
    total = int(reps.sum())
    excl = np.repeat(np.cumsum(reps) - reps, reps)
    offsets = np.arange(total) - excl
    i = starts[gidx][j] + offsets
    return i.astype(np.int64), j.astype(np.int64)


def triangle_count(edges, src: str = "src", dst: str = "dst",
                   broadcast_nodes_max: int = 5_000_000,
                   num_buckets: int = 32):
    """-> Dataset[{"triangles": int64}] — one row, the exact triangle
    count of the undirected simple graph induced by ``edges``
    (self-loops and duplicate/reverse edges are normalized away)."""
    import ray

    from knowledge_graph_ray.functions.agg import distinct_rows, grouped_agg
    from knowledge_graph_ray.functions.grouping import bucketed_bucket_map
    from knowledge_graph_ray.functions.joins import hash_join, project

    def canon(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a = b.column(src).cast(pa.string())
        c = b.column(dst).cast(pa.string())
        lo = pc.min_element_wise(a, c)
        hi = pc.max_element_wise(a, c)
        t = pa.table({"a": lo, "b": hi})
        return t.filter(pc.not_equal(t.column("a"), t.column("b")))

    und = distinct_rows(
        edges.select_columns([src, dst]).map_batches(
            canon, batch_format="pyarrow"),
        ["a", "b"],
        empty_schema=pa.schema([("a", pa.string()), ("b", pa.string())]),
    ).materialize()

    ends = und.map_batches(
        lambda b: pa.concat_tables([pa.table({"v": b.column("a")}),
                                    pa.table({"v": b.column("b")})]),
        batch_format="pyarrow",
    )
    deg = grouped_agg(ends, ["v"], [("d", None, "count")])
    ddf = deg.limit(broadcast_nodes_max + 1).to_pandas()
    if len(ddf) > broadcast_nodes_max:
        raise ValueError(
            "triangle_count: node set exceeds broadcast_nodes_max; "
            "shard the degree table (hash_join orientation) first"
        )
    import ray.data as rd

    if len(ddf) == 0:
        return rd.from_arrow(pa.table({"triangles":
                                       pa.array([0], pa.int64())}))
    deg_ref = ray.put(dict(zip(ddf.v, ddf.d)))

    def orient(b: pa.Table) -> pa.Table:
        dm = ray.get(deg_ref)
        df = b.to_pandas()
        da = df.a.map(dm).to_numpy()
        db = df.b.map(dm).to_numpy()
        # lower (degree, name) endpoint becomes the wedge source
        a_first = (da < db) | ((da == db) & (df.a < df.b).to_numpy())
        out = pd.DataFrame({
            "u": np.where(a_first, df.a, df.b),
            "w_deg": np.where(a_first, db, da),
            "v": np.where(a_first, df.b, df.a),
        })
        return pa.Table.from_pandas(out[["u", "v", "w_deg"]],
                                    preserve_index=False)

    oriented = und.map_batches(orient, batch_format="pyarrow").materialize()

    def wedge_body(g: pd.DataFrame) -> pa.Table:
        # orientation order among out-neighbors = (degree, name): the
        # wedge pair (x, y) must itself be an oriented edge candidate
        g = g.sort_values(["u", "w_deg", "v"], kind="stable")
        codes, _ = pd.factorize(g.u, use_na_sentinel=False)
        i, j = _pair_expand(codes.astype(np.int64))
        vs = g.v.to_numpy()
        return pa.table({
            "x": pa.array(vs[i], type=pa.string()),
            "y": pa.array(vs[j], type=pa.string()),
        })

    wedges = bucketed_bucket_map(
        oriented, ["u"], wedge_body, num_buckets=num_buckets,
        empty_schema=pa.schema([("x", pa.string()), ("y", pa.string())]),
    )
    closing = hash_join(
        wedges,
        project(oriented, {"u": "x", "v": "y"}),
        on=["x", "y"], how="left_semi",
    )
    n_tri = closing.count()
    return rd.from_arrow(pa.table({"triangles":
                                   pa.array([n_tri], pa.int64())}))


def sssp_weighted(edges, seed: str, src: str = "src", dst: str = "dst",
                  weight: str = "w", max_rounds: int = 64,
                  broadcast_max: int = 5_000_000):
    """Dataset[{node: string, dist: int64}] — exact single-source
    shortest paths over a positively-integer-weighted DIRECTED edge set
    (symmetrize upstream for undirected graphs), the north-star's
    "iterative groupby-min label propagation" realized as distributed
    Bellman-Ford with frontier pruning.

    Scale shape: per round, ONE size-adaptive join of the edge set
    against the improved-frontier (node, dist) table emits candidate
    distances (frontier broadcasts while small, flips to a partitioned
    hash join past the budget), then ONE groupby-min folds candidates
    into the running distance table; the next frontier is the anti-join
    of new vs old on (node, dist) — only nodes whose distance actually
    improved relax again, so total relaxations track the queue-based
    Bellman-Ford, not rounds × |E|.  State tables hold (node, dist)
    pairs only; the per-round convergence probe is one count() on the
    frontier.  Rounds = hop length of the longest shortest path.
    Pass a MATERIALIZED edge dataset — it is re-joined every round.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from knowledge_graph_ray.functions.agg import grouped_agg
    from knowledge_graph_ray.functions.joins import (
        project,
        size_adaptive_join,
    )

    dist = rd.from_arrow(pa.table({
        "node": pa.array([str(seed)], type=pa.string()),
        "dist": pa.array([0], type=pa.int64()),
    })).materialize()
    frontier = dist
    for _ in range(max_rounds):
        hit = size_adaptive_join(
            edges, project(frontier, {"node": src, "dist": "dist"}),
            on=[src], how="inner", broadcast_max=broadcast_max,
        )
        cand = hit.map_batches(
            lambda t: pa.table({
                "node": t.column(dst).cast(pa.string()),
                "dist": pc.add(t.column("dist").cast(pa.int64()),
                               t.column(weight).cast(pa.int64())),
            }),
            batch_format="pyarrow",
        )
        merged = grouped_agg(dist.union(cand), ["node"],
                             [("dist", "dist", "min")]).materialize()
        improved = size_adaptive_join(
            merged, dist, on=["node", "dist"], how="left_anti",
            broadcast_max=broadcast_max,
        ).materialize()
        dist = merged
        if improved.count() == 0:
            break
        frontier = improved
    return dist


def kcore(edges, k: int, src: str = "src", dst: str = "dst",
          max_rounds: int = 64, broadcast_max: int = 5_000_000):
    """Dataset[{node: string, deg: int64}] — every node of the k-core
    (the maximal subgraph where all degrees are >= k) of the simple
    undirected graph induced by ``edges``, with its in-core degree.

    Iterative peel: normalize to a symmetric distinct edge list once,
    then each round (a) one groupby-count gives current degrees,
    (b) nodes below k form the peel set, (c) TWO size-adaptive
    anti-joins drop edges touching peeled nodes.  The peel set is
    degree-table-sized (broadcasts while small); edges stream every
    round and only shrink.  Converges in core-number rounds (typically
    a handful on real graphs); exact by construction.
    """
    import pyarrow.compute as pc

    from knowledge_graph_ray.functions.agg import distinct_rows, grouped_agg
    from knowledge_graph_ray.functions.joins import project, size_adaptive_join

    def canon(b: pa.Table) -> pa.Table:
        a = b.column(src).cast(pa.string())
        c = b.column(dst).cast(pa.string())
        t = pa.table({"a": a, "b": c})
        return t.filter(pc.not_equal(t.column("a"), t.column("b")))

    half = distinct_rows(
        edges.select_columns([src, dst]).map_batches(
            canon, batch_format="pyarrow"),
        ["a", "b"],
        empty_schema=pa.schema([("a", pa.string()), ("b", pa.string())]),
    )
    # symmetric closure so one groupby on "a" counts full degrees
    sym = distinct_rows(
        half.map_batches(
            lambda t: pa.concat_tables([
                t.select(["a", "b"]),
                pa.table({"a": t.column("b"), "b": t.column("a")}),
            ]),
            batch_format="pyarrow",
        ),
        ["a", "b"],
        empty_schema=pa.schema([("a", pa.string()), ("b", pa.string())]),
    ).materialize()

    for _ in range(max_rounds):
        deg = grouped_agg(sym, ["a"], [("deg", None, "count")])
        low = deg.filter(
            expr=f"deg < {int(k)}"
        ).select_columns(["a"]).materialize()
        if low.count() == 0:
            break
        sym = size_adaptive_join(sym, low, on=["a"], how="left_anti",
                                 broadcast_max=broadcast_max)
        sym = size_adaptive_join(sym, project(low, {"a": "b"}), on=["b"],
                                 how="left_anti",
                                 broadcast_max=broadcast_max).materialize()
    return project(
        grouped_agg(sym, ["a"], [("deg", None, "count")]),
        {"a": "node", "deg": "deg"},
    )


def bipartite_bfs_hops(edges, seed_left, hops: int = 3,
                       left: str = "c", right: str = "s",
                       broadcast_max: int = 5_000_000):
    """Breadth-first frontier expansion over a bipartite edge set —
    hop h alternates sides (odd hops discover right nodes, even hops
    left nodes).  Returns [(hop, n_new)] for h = 1..hops.

    Scale shape: each hop is ONE size-adaptive semi-join of the edge
    set against the current frontier (frontier broadcasts while small,
    flips to a partitioned hash_join when it outgrows the budget) plus
    one anti-join against the visited side — the classic distributed
    BFS; edges stream every round, frontiers/visited sets hold node
    keys only.  The edge dataset is re-read per hop, so pass a
    materialized dataset when hops > 1."""
    from knowledge_graph_ray.functions.joins import (
        project,
        size_adaptive_join,
    )

    def distinct(ds, col):
        from knowledge_graph_ray.functions.agg import grouped_agg

        return grouped_agg(ds, [col], [("__n", None, "count")]) \
            .select_columns([col])

    frontier = seed_left          # Dataset[left] (node keys, one column)
    visited = {left: seed_left, right: None}
    side_in, side_out = left, right
    counts = []
    for hop in range(1, hops + 1):
        hit = size_adaptive_join(edges, frontier, on=[side_in],
                                 how="left_semi",
                                 broadcast_max=broadcast_max)
        nxt = distinct(project(hit.select_columns([side_out]),
                               [side_out]), side_out)
        if visited[side_out] is not None:
            nxt = size_adaptive_join(nxt, visited[side_out],
                                     on=[side_out], how="left_anti",
                                     broadcast_max=broadcast_max)
        nxt = nxt.materialize()
        counts.append((hop, nxt.count()))
        visited[side_out] = (
            nxt if visited[side_out] is None
            else visited[side_out].union(nxt).materialize()
        )
        frontier = nxt
        side_in, side_out = side_out, side_in
    return counts


def link_prediction(edges, src: str = "src", dst: str = "dst",
                    min_common: int = 1, degree_cap: "int | None" = None,
                    exclude_existing: bool = True, num_buckets: int = 32,
                    broadcast_max: int = 5_000_000):
    """Dataset[{a, b, common: int64, aa: float64}] — common-neighbor
    count and Adamic-Adar score (Liben-Nowell & Kleinberg 2003) for
    node pairs at distance 2 in the simple undirected graph induced by
    ``edges`` (self-loops / duplicate / reverse edges normalized away).

    Every shared neighbor w contributes 1 to ``common`` and
    ``1/ln(deg(w))`` to ``aa``; pairs with fewer than ``min_common``
    shared neighbors are dropped, and already-adjacent pairs are
    anti-joined away when ``exclude_existing`` (the "prediction" part).
    Output pairs are canonical (``a < b``).

    Scale shape: one symmetrize exchange, one groupby-w VECTORIZED
    pair expansion (O(deg(w)^2) candidate rows per neighbor w —
    ``degree_cap`` drops hub nodes above the cap, the standard
    web-scale approximation for scale-free graphs; ``None`` = exact),
    one groupby-pair partial-sum aggregate, one size-adaptive
    anti-join.  Candidate pairs stream through the shuffle; nothing
    pair-shaped ever touches the driver.
    """
    import pyarrow.compute as pc

    from knowledge_graph_ray.functions.agg import distinct_rows, grouped_agg
    from knowledge_graph_ray.functions.grouping import bucketed_bucket_map
    from knowledge_graph_ray.functions.joins import size_adaptive_join

    def canon(b: pa.Table) -> pa.Table:
        a = b.column(src).cast(pa.string())
        c = b.column(dst).cast(pa.string())
        lo = pc.min_element_wise(a, c)
        hi = pc.max_element_wise(a, c)
        t = pa.table({"a": lo, "b": hi})
        return t.filter(pc.not_equal(t.column("a"), t.column("b")))

    half = distinct_rows(
        edges.select_columns([src, dst]).map_batches(
            canon, batch_format="pyarrow"),
        ["a", "b"],
        empty_schema=pa.schema([("a", pa.string()), ("b", pa.string())]),
    ).materialize()

    # symmetric (w, n) incidence: half is distinct with a < b, so the
    # two orientations are distinct by construction — no second pass
    sym = half.map_batches(
        lambda t: pa.concat_tables([
            pa.table({"w": t.column("a"), "n": t.column("b")}),
            pa.table({"w": t.column("b"), "n": t.column("a")}),
        ]),
        batch_format="pyarrow",
    )

    cap = degree_cap

    def body(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["w", "n"], kind="stable")
        codes = pd.factorize(g.w, use_na_sentinel=False)[0].astype(np.int64)
        sizes = np.bincount(codes) if len(codes) else np.array([], np.int64)
        if cap is not None and len(codes) and sizes.max(initial=0) > cap:
            keep = sizes[codes] <= cap
            g = g[keep]
            codes = pd.factorize(g.w, use_na_sentinel=False)[0] \
                .astype(np.int64)
            sizes = np.bincount(codes) if len(codes) else \
                np.array([], np.int64)
        i, j = _pair_expand(codes)
        ns = g.n.to_numpy()
        # group size IS deg(w): distinct symmetric incidence rows
        dw = sizes[codes[j]].astype(np.float64)
        return pa.table({
            "a": pa.array(ns[i], type=pa.string()),
            "b": pa.array(ns[j], type=pa.string()),
            "aa_w": pa.array(1.0 / np.log(dw), type=pa.float64()),
        })

    pairs = bucketed_bucket_map(
        sym, ["w"], body, num_buckets=num_buckets,
        empty_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                                ("aa_w", pa.float64())]),
    )
    scored = grouped_agg(
        pairs, ["a", "b"],
        [("common", None, "count"), ("aa", "aa_w", "sum")],
    )
    if min_common > 1:
        scored = scored.filter(expr=f"common >= {int(min_common)}")
    if exclude_existing and half.count() > 0:
        # count() is metadata on the materialized handle; a fully-empty
        # edge set both needs no anti-join and (being schema-less once
        # materialized empty) cannot serve as a join side
        scored = size_adaptive_join(scored, half, on=["a", "b"],
                                    how="left_anti",
                                    broadcast_max=broadcast_max)
    return scored



def _canon_distinct(edges, src: str, dst: str):
    """Canonical (a < b) distinct simple-graph edge set, materialized."""
    import pyarrow.compute as pc

    from knowledge_graph_ray.functions.agg import distinct_rows

    def canon(b: pa.Table) -> pa.Table:
        a = b.column(src).cast(pa.string())
        c = b.column(dst).cast(pa.string())
        lo = pc.min_element_wise(a, c)
        hi = pc.max_element_wise(a, c)
        t = pa.table({"a": lo, "b": hi})
        return t.filter(pc.not_equal(t.column("a"), t.column("b")))

    return distinct_rows(
        edges.select_columns([src, dst]).map_batches(
            canon, batch_format="pyarrow"),
        ["a", "b"],
        empty_schema=pa.schema([("a", pa.string()), ("b", pa.string())]),
    ).materialize()


def _closed_triangles(und, broadcast_nodes_max: int = 5_000_000,
                      num_buckets: int = 32):
    """Dataset[{u, x, y}] — every triangle of the canonical distinct
    edge set ``und`` exactly once (u = the degree-ordered wedge corner,
    (x, y) its oriented closing edge).  The shared core of
    triangle_count / clustering_coefficient / ktruss: one broadcast
    degree orientation, one wedge-vertex shuffle with vectorized pair
    expansion, one semi hash-join."""
    import ray
    import ray.data as rd

    from knowledge_graph_ray.functions.agg import grouped_agg
    from knowledge_graph_ray.functions.grouping import bucketed_bucket_map
    from knowledge_graph_ray.functions.joins import hash_join, project

    empty = pa.table({"u": pa.array([], pa.string()),
                      "x": pa.array([], pa.string()),
                      "y": pa.array([], pa.string())})
    ends = und.map_batches(
        lambda b: pa.concat_tables([pa.table({"v": b.column("a")}),
                                    pa.table({"v": b.column("b")})]),
        batch_format="pyarrow",
    )
    deg = grouped_agg(ends, ["v"], [("d", None, "count")])
    ddf = deg.limit(broadcast_nodes_max + 1).to_pandas()
    if len(ddf) > broadcast_nodes_max:
        raise ValueError(
            "_closed_triangles: node set exceeds broadcast_nodes_max; "
            "shard the degree table (hash_join orientation) first"
        )
    if len(ddf) == 0:
        return rd.from_arrow(empty)
    deg_ref = ray.put(dict(zip(ddf.v, ddf.d)))

    def orient(b: pa.Table) -> pa.Table:
        dm = ray.get(deg_ref)
        df = b.to_pandas()
        da = df.a.map(dm).to_numpy()
        db = df.b.map(dm).to_numpy()
        a_first = (da < db) | ((da == db) & (df.a < df.b).to_numpy())
        out = pd.DataFrame({
            "u": np.where(a_first, df.a, df.b),
            "w_deg": np.where(a_first, db, da),
            "v": np.where(a_first, df.b, df.a),
        })
        return pa.Table.from_pandas(out[["u", "v", "w_deg"]],
                                    preserve_index=False)

    oriented = und.map_batches(orient, batch_format="pyarrow").materialize()

    def wedge_body(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["u", "w_deg", "v"], kind="stable")
        codes, _ = pd.factorize(g.u, use_na_sentinel=False)
        i, j = _pair_expand(codes.astype(np.int64))
        vs = g.v.to_numpy()
        us = g.u.to_numpy()
        return pa.table({
            "u": pa.array(us[i], type=pa.string()),
            "x": pa.array(vs[i], type=pa.string()),
            "y": pa.array(vs[j], type=pa.string()),
        })

    wedges = bucketed_bucket_map(
        oriented, ["u"], wedge_body, num_buckets=num_buckets,
        empty_schema=pa.schema([("u", pa.string()), ("x", pa.string()),
                                ("y", pa.string())]),
    )
    return hash_join(
        wedges,
        project(oriented, {"u": "x", "v": "y"}),
        on=["x", "y"], how="left_semi",
    )


def clustering_coefficient(edges, src: str = "src", dst: str = "dst",
                           broadcast_nodes_max: int = 5_000_000,
                           num_buckets: int = 32):
    """Dataset[{node, deg: int64, triangles: int64, cc: float64}] —
    per-node triangle count and local clustering coefficient
    cc = 2 T_v / (d_v (d_v - 1)) (0.0 below degree 2) of the simple
    undirected graph induced by ``edges``.

    Scale shape: _closed_triangles (degree-ordered wedge closure
    CARRYING the wedge corner) + one flat-map/groupby per triangle
    corner + one left_outer join onto the degree table closing the
    coefficient vectorized."""
    import ray.data as rd

    from knowledge_graph_ray.functions.agg import grouped_agg
    from knowledge_graph_ray.functions.joins import hash_join, project

    und = _canon_distinct(edges, src, dst)
    empty = pa.table({"node": pa.array([], pa.string()),
                      "deg": pa.array([], pa.int64()),
                      "triangles": pa.array([], pa.int64()),
                      "cc": pa.array([], pa.float64())})
    if und.count() == 0:
        return rd.from_arrow(empty)
    ends = und.map_batches(
        lambda b: pa.concat_tables([pa.table({"v": b.column("a")}),
                                    pa.table({"v": b.column("b")})]),
        batch_format="pyarrow",
    )
    deg = grouped_agg(ends, ["v"], [("d", None, "count")]).materialize()
    closed = _closed_triangles(und, broadcast_nodes_max, num_buckets)
    corners = closed.map_batches(
        lambda b: pa.concat_tables([
            pa.table({"node": b.column("u")}),
            pa.table({"node": b.column("x")}),
            pa.table({"node": b.column("y")}),
        ]),
        batch_format="pyarrow",
    )
    tri = grouped_agg(corners, ["node"], [("nt", None, "count")])
    joined = hash_join(
        project(deg, {"v": "node", "d": "deg"}), tri,
        on=["node"], how="left_outer",
    )

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = b.column("deg").cast(pa.int64())
        t = pc.fill_null(b.column("nt"), 0).cast(pa.int64())
        dn = d.to_numpy(zero_copy_only=False).astype(np.float64)
        tn = t.to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            cc = np.where(dn >= 2, 2.0 * tn / (dn * (dn - 1.0)), 0.0)
        return pa.table({"node": b.column("node"), "deg": d,
                         "triangles": t,
                         "cc": pa.array(cc, pa.float64())})

    return joined.map_batches(finish, batch_format="pyarrow")


def ktruss(edges, k: int, src: str = "src", dst: str = "dst",
           max_rounds: int = 64, broadcast_nodes_max: int = 5_000_000,
           num_buckets: int = 32):
    """Dataset[{a, b, support: int64}] — the k-truss of the simple
    undirected graph induced by ``edges``: the maximal subgraph whose
    every edge closes >= k-2 triangles WITHIN the subgraph (the
    edge-level cohesion primitive one step above k-core; Cohen 2008).
    Output edges are canonical (a < b) with their in-truss support.

    Iterative peel: per round _closed_triangles enumerates triangles of
    the surviving edge set (one orientation broadcast + one wedge
    shuffle + one semi-join), a flat-map emits each triangle's three
    canonical edges, one groupby counts per-edge support, and one semi
    hash-join keeps edges at support >= k-2.  Edges only shrink;
    converges in cascade-depth rounds (kcore's discipline), fixpoint
    asserted under ``max_rounds`` by pytest."""
    import pyarrow.compute as pc

    import ray.data as rd

    from knowledge_graph_ray.functions.agg import grouped_agg
    from knowledge_graph_ray.functions.joins import hash_join

    need = max(int(k) - 2, 0)
    und = _canon_distinct(edges, src, dst)
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "support": pa.array([], pa.int64())})
    support = None
    for _ in range(max_rounds):
        n_before = und.count()
        if n_before == 0:
            return rd.from_arrow(empty)
        tri = _closed_triangles(und, broadcast_nodes_max, num_buckets)

        def edges3c(b: pa.Table) -> pa.Table:
            # all three edges canonicalized (x, y are in degree-ordered
            # orientation order, not necessarily name order)
            u, x, y = b.column("u"), b.column("x"), b.column("y")
            t = pa.concat_tables([pa.table({"p": u, "q": x}),
                                  pa.table({"p": u, "q": y}),
                                  pa.table({"p": x, "q": y})])
            return pa.table({
                "a": pc.min_element_wise(t.column("p"), t.column("q")),
                "b": pc.max_element_wise(t.column("p"), t.column("q")),
            })

        support = grouped_agg(
            tri.map_batches(edges3c, batch_format="pyarrow"),
            ["a", "b"], [("support", None, "count")],
        ).materialize()
        strong = support.filter(expr=f"support >= {need}")             .select_columns(["a", "b"]).materialize()
        if strong.count() == 0:
            return rd.from_arrow(empty)
        kept = hash_join(und, strong, on=["a", "b"],
                         how="left_semi").materialize()
        if kept.count() == n_before:
            und = kept
            break
        und = kept
    return hash_join(und, support, on=["a", "b"], how="inner")


def multi_source_bfs(edges, seeds: "list[str]", hops: int = 4,
                     src: str = "src", dst: str = "dst",
                     broadcast_max: int = 5_000_000):
    """Unweighted BFS distances from EVERY seed at once over the
    undirected simple graph — Dataset[(seed, name, dist)] with dist in
    0..hops, one row per (seed, reachable node), minimum-hop distance.

    Scale shape: the classic distributed frontier iteration run for all
    seeds simultaneously (state keyed by (seed, node), bounded by
    |seeds| x |V|): per hop ONE size-adaptive join of the edge set
    against the frontier plus one anti-join against the visited set —
    edges stream every round and never accumulate; early-exits when a
    frontier empties.  Seeds absent from the node set are dropped
    (distance semantics need a graph vertex to start from)."""
    from knowledge_graph_ray.functions.agg import distinct_rows, grouped_agg
    from knowledge_graph_ray.functions.joins import (
        project,
        size_adaptive_join,
    )

    canon = _canon_distinct(edges, src, dst)
    und = canon.map_batches(
        lambda b: pa.concat_tables([
            pa.table({"src": b.column("a"), "dst": b.column("b")}),
            pa.table({"src": b.column("b"), "dst": b.column("a")}),
        ]),
        batch_format="pyarrow",
    ).materialize()

    import ray.data as rd

    if und.count() == 0:
        return rd.from_arrow(pa.table({
            "seed": pa.array([], pa.string()),
            "name": pa.array([], pa.string()),
            "dist": pa.array([], pa.int64()),
        }))
    nodes = distinct_rows(
        und.select_columns(["src"]),
        ["src"], empty_schema=pa.schema([("src", pa.string())]),
    )
    seed_tbl = rd.from_arrow(pa.table({
        "src": pa.array(sorted(set(seeds)), type=pa.string()),
    }))
    present = size_adaptive_join(seed_tbl, nodes, on=["src"],
                                 how="left_semi",
                                 broadcast_max=broadcast_max)

    def as_state(b: pa.Table, dist: int) -> pa.Table:
        return pa.table({
            "seed": b.column("src"),
            "name": b.column("src"),
            "dist": pa.array(np.full(len(b), dist), type=pa.int64()),
        })

    frontier = present.map_batches(
        lambda b: as_state(b, 0), batch_format="pyarrow").materialize()
    reached = frontier
    for hop in range(1, hops + 1):
        if frontier.count() == 0:
            break
        hit = size_adaptive_join(
            und, project(frontier, {"seed": "seed", "name": "src"}),
            on=["src"], how="inner", broadcast_max=broadcast_max,
        )
        nxt = grouped_agg(
            project(hit.select_columns(["seed", "dst"]),
                    {"seed": "seed", "dst": "name"}),
            ["seed", "name"], [("__n", None, "count")],
        ).select_columns(["seed", "name"])
        nxt = size_adaptive_join(
            nxt, reached.select_columns(["seed", "name"]),
            on=["seed", "name"], how="left_anti",
            broadcast_max=broadcast_max,
        ).map_batches(
            lambda b, h=hop: b.append_column(
                "dist", pa.array(np.full(len(b), h), type=pa.int64())),
            batch_format="pyarrow",
        ).materialize()
        reached = reached.union(nxt).materialize()
        frontier = nxt
    return reached


def luby_mis(edges, rounds: int = 4, src: str = "u", dst: str = "v",
             driver_threshold: "int | None" = 4_000_000,
             broadcast_max: int = 5_000_000):
    """Luby's maximal independent set with md5(node|round) consistent-
    hash priorities — Dataset[(name, state, round)], state in
    {mis, excluded, undecided} (undecided rows stamped with the last
    round).  The edge input must already be SYMMETRIC (both
    directions present).

    Size-adaptive: at or below ``driver_threshold`` edges the whole
    protocol runs as one local pandas pass (iterative rounds at toy
    scale are pure fixed cost — ~10 dataset executions per round);
    above it the distributed regime keeps the edge set STATIC and per
    round runs one broadcast hash join + one grouped min + two
    anti/semi joins (pytest-gated equality between regimes; the
    1M-node/3M-edge check clears 4 rounds in 51 s)."""
    import hashlib

    import ray.data as rd

    from knowledge_graph_ray.functions.agg import distinct_rows, grouped_agg
    from knowledge_graph_ray.functions.joins import (
        project,
        size_adaptive_join,
    )

    out_schema = pa.schema([("name", pa.string()), ("state", pa.string()),
                            ("round", pa.int64())])
    edges = edges.select_columns([src, dst])
    if src != "u" or dst != "v":
        edges = project(edges, {src: "u", dst: "v"})
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(out_schema.empty_table())

    if driver_threshold is not None and n_edges <= driver_threshold:
        # threshold-guarded driver fast path — the SAME per-round
        # dataflow (hash, min-neighbour, decide, exclude) as one
        # vectorized pandas pass per round; md5 stays the only
        # per-row primitive (C hashlib), computed once per round over
        # the shrinking undecided set
        e = edges.to_pandas()
        undec = pd.Index(pd.unique(
            pd.concat([e["u"], e["v"]], ignore_index=True)))
        parts = []
        for rnd in range(1, rounds + 1):
            if len(undec) == 0:
                break
            h = pd.Series(
                [hashlib.md5(f"{n}|{rnd}".encode()).hexdigest()
                 for n in undec], index=undec)
            live = e[e["u"].isin(undec) & e["v"].isin(undec)]
            mn = h.reindex(live["v"]).to_numpy()
            mn = pd.Series(mn, index=live["u"].to_numpy())                 .groupby(level=0).min()
            own = h.reindex(undec)
            nb_min = mn.reindex(undec)
            win = nb_min.isna() | (own < nb_min)
            mis = undec[win.to_numpy()]
            nbrs = pd.Index(pd.unique(
                live.loc[live["u"].isin(mis), "v"]))
            excl = nbrs[~nbrs.isin(mis)]
            parts.append(pd.DataFrame({
                "name": sorted(mis), "state": "mis", "round": rnd}))
            parts.append(pd.DataFrame({
                "name": sorted(excl), "state": "excluded",
                "round": rnd}))
            undec = undec[~undec.isin(mis.union(excl))]
        parts.append(pd.DataFrame({
            "name": sorted(undec), "state": "undecided",
            "round": rounds}))
        out = pd.concat(parts, ignore_index=True)
        return rd.from_arrow(pa.table({
            "name": pa.array(out["name"], pa.string()),
            "state": pa.array(out["state"], pa.string()),
            "round": pa.array(out["round"], pa.int64()),
        }))

    undec = distinct_rows(
        edges.select_columns(["u"]), ["u"],
        empty_schema=pa.schema([("u", pa.string())]),
    ).materialize()
    decided = []
    for rnd in range(1, rounds + 1):
        if undec.count() == 0:
            break

        def with_hash(b: pa.Table, r=rnd) -> pa.Table:
            names = b.column("u").to_pylist()
            h = [hashlib.md5(f"{n}|{r}".encode()).hexdigest()
                 for n in names]
            return pa.table({"u": b.column("u"),
                             "h": pa.array(h, type=pa.string())})

        hs = undec.map_batches(with_hash,
                               batch_format="pyarrow").materialize()
        ewh = size_adaptive_join(
            edges, project(hs, {"u": "v", "h": "nh"}), on=["v"],
            how="inner", broadcast_max=broadcast_max)
        minnb = grouped_agg(ewh.select_columns(["u", "nh"]), ["u"],
                            [("mn", "nh", "min")])
        joined = size_adaptive_join(hs, minnb.materialize(), on=["u"],
                                    how="left_outer",
                                    broadcast_max=broadcast_max)

        def decide(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mn = b.column("mn")
            if not pa.types.is_string(mn.type):
                mn = pc.cast(mn, pa.string())
            win = pc.or_kleene(pc.is_null(mn),
                               pc.less(b.column("h"), mn))
            return b.filter(pc.fill_null(win, True)).select(["u"])

        mis = joined.map_batches(decide,
                                 batch_format="pyarrow").materialize()
        nb = distinct_rows(
            size_adaptive_join(edges, mis, on=["u"], how="left_semi",
                               broadcast_max=broadcast_max)
            .select_columns(["v"]).map_batches(
                lambda b: pa.table({"u": b.column("v")}),
                batch_format="pyarrow"),
            ["u"], empty_schema=pa.schema([("u", pa.string())]),
        )
        excl = size_adaptive_join(
            size_adaptive_join(nb, undec, on=["u"], how="left_semi",
                               broadcast_max=broadcast_max),
            mis, on=["u"], how="left_anti",
            broadcast_max=broadcast_max,
        ).materialize()

        def tag(ds, state, r=rnd):
            return ds.map_batches(
                lambda b: pa.table({
                    "name": b.column("u"),
                    "state": pa.array([state] * len(b)),
                    "round": pa.array(
                        np.full(len(b), r, dtype=np.int64)),
                }),
                batch_format="pyarrow",
            )

        decided.append(tag(mis, "mis"))
        decided.append(tag(excl, "excluded"))
        gone = mis.union(excl).materialize()
        undec = size_adaptive_join(undec, gone, on=["u"],
                                   how="left_anti",
                                   broadcast_max=broadcast_max
                                   ).materialize()
    out = undec.map_batches(
        lambda b: pa.table({
            "name": b.column("u"),
            "state": pa.array(["undecided"] * len(b)),
            "round": pa.array(np.full(len(b), rounds, dtype=np.int64)),
        }),
        batch_format="pyarrow",
    )
    for d in decided:
        out = out.union(d)
    return out
