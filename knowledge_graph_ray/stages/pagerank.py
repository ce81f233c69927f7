"""Distributed (weighted) PageRank over an edge Dataset.

Fixed-iteration power method, the form a SQL oracle can unroll exactly:

    pr_0(v)   = 1 / N
    pr_k+1(v) = (1-d)/N + d * sum_{(u,v) in E} pr_k(u) * w(u,v) / S(u)

with S(u) = sum of u's outgoing edge weights.  Dangling mass is NOT
redistributed (documented; the oracle mirrors this).  ``undirected=True``
mirrors every edge before iterating.

Scale shape: the EDGES never move.  The rank vector is node-sized; per
iteration the engine computes (dst, contribution) partials inside
``map_batches`` over the edges and merges them with the grouped_agg
combiner — one small shuffle of groups x batches rows per iteration.

* nodes <= ``broadcast_nodes_max``: ranks + out-strengths live in one
  pandas frame broadcast via ``ray.put`` per iteration (the same
  size-adaptive broadcast rule the engine's joins use); the per-edge
  lookup is a vectorized merge.
* larger graphs: the rank vector stays a Dataset and each iteration is
  a ``hash_join`` (edges x ranks on src) + grouped_agg by dst +
  left_outer join back onto the node set — all-shuffle, no driver
  state.  Both regimes compute identical math (pytest-gated equality).

Reference parity note: the reference embeds graphs via node2vec
(embedding.py:15-38, dead code there); PageRank is the beyond-reference
centrality the query layer exposes (kg_degree covers degree centrality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pagerank(edges, src: str = "src", dst: str = "dst",
             weight: "str | None" = None, iterations: int = 3,
             damping: float = 0.85, undirected: bool = True,
             node_col: str = "name", out_col: str = "pr",
             broadcast_nodes_max: int = 5_000_000):
    """-> Dataset[node_col, out_col] — one row per node."""
    import ray

    from knowledge_graph_ray.functions.agg import grouped_agg
    from knowledge_graph_ray.functions.joins import hash_join, project

    w_in = [weight] if weight else []
    edges = edges.select_columns([src, dst] + w_in)

    def normalize(b: pa.Table) -> pa.Table:
        cols = {
            "src": b.column(src).cast(pa.string()),
            "dst": b.column(dst).cast(pa.string()),
            "w": (b.column(weight).cast(pa.float64()) if weight
                  else pa.array(np.ones(len(b)), type=pa.float64())),
        }
        return pa.table(cols)

    fwd = edges.map_batches(normalize, batch_format="pyarrow")
    if undirected:
        def flip(b: pa.Table) -> pa.Table:
            return pa.table({"src": b.column("dst"), "dst": b.column("src"),
                             "w": b.column("w")})

        fwd = fwd.union(fwd.map_batches(flip, batch_format="pyarrow"))
    fwd = fwd.materialize()

    from knowledge_graph_ray.functions.agg import distinct_rows

    node_union = fwd.map_batches(
        lambda b: pa.concat_tables([
            pa.table({"name": b.column("src")}),
            pa.table({"name": b.column("dst")}),
        ]),
        batch_format="pyarrow",
    )
    nodes = distinct_rows(
        node_union, ["name"],
        empty_schema=pa.schema([("name", pa.string())]),
    ).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: b.append_column(out_col,
                                      pa.array([], type=pa.float64())),
            batch_format="pyarrow",
        )
    strength = grouped_agg(fwd, ["src"], [("s", "w", "sum")]).materialize()
    base = (1.0 - damping) / n_nodes

    if n_nodes <= broadcast_nodes_max:
        ndf = nodes.to_pandas()
        sdf = strength.to_pandas()
        state = ndf.merge(sdf, left_on="name", right_on="src", how="left")
        state = state[["name", "s"]]
        state[out_col] = 1.0 / n_nodes
        for _ in range(iterations):
            ref = ray.put(state)

            def contribs(b: pa.Table) -> pa.Table:
                st = ray.get(ref)
                df = b.to_pandas().merge(
                    st, left_on="src", right_on="name", how="left"
                )
                return pa.table({
                    "dst": pa.array(df["dst"], type=pa.string()),
                    "c": pa.array(df[out_col] * df["w"] / df["s"],
                                  type=pa.float64()),
                })

            agg = grouped_agg(
                fwd.map_batches(contribs, batch_format="pyarrow"),
                ["dst"], [("c", "c", "sum")],
            ).to_pandas()  # node-sized, bounded by broadcast_nodes_max
            state = state.drop(columns=[out_col]).merge(
                agg, left_on="name", right_on="dst", how="left"
            )[["name", "s", "c"]]
            state[out_col] = base + damping * state.pop("c").fillna(0.0)
        out = state[["name", out_col]]
        import ray.data as rd

        result = rd.from_pandas(out)
    else:
        ranks = nodes.map_batches(
            lambda b: b.append_column(
                out_col, pa.array(np.full(len(b), 1.0 / n_nodes))),
            batch_format="pyarrow",
        ).materialize()
        for _ in range(iterations):
            ranked = hash_join(
                fwd, project(ranks, {"name": "src", out_col: "rpr"}),
                on=["src"], how="inner",
            )
            with_s = hash_join(ranked, strength, on=["src"], how="inner")

            def contrib(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return pa.table({
                    "dst": b.column("dst"),
                    "c": pc.divide(pc.multiply(b.column("rpr"),
                                               b.column("w")),
                                   b.column("s")),
                })

            agg = grouped_agg(
                with_s.map_batches(contrib, batch_format="pyarrow"),
                ["dst"], [("c", "c", "sum")],
            )
            joined = hash_join(
                nodes, project(agg, {"dst": "name", "c": "c"}),
                on=["name"], how="left_outer",
            )

            def finish(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                c = pc.fill_null(b.column("c"), 0.0)
                pr = pc.add(pc.multiply(c, damping), base)
                return pa.table({"name": b.column("name"), out_col: pr})

            ranks = joined.map_batches(
                finish, batch_format="pyarrow").materialize()
        result = ranks

    if node_col != "name":
        result = project(result, {"name": node_col, out_col: out_col})
    return result


def hits(edges, src: str = "src", dst: str = "dst", iterations: int = 4,
         node_col: str = "node", broadcast_nodes_max: int = 5_000_000):
    """-> Dataset[{node, side, score}] — HITS hubs & authorities
    (Kleinberg 1999) after a FIXED number of mutual-reinforcement
    rounds, L2-normalized each half-step — the form a SQL oracle can
    unroll exactly:

        hub_0(u) = 1
        auth(v)  = sum_{(u,v) in E} hub(u);  auth /= ||auth||_2
        hub(u)   = sum_{(u,v) in E} auth(v); hub  /= ||hub||_2

    Directed simple graph (duplicate edges deduped).  Output: one
    side='hub' row per node with >= 1 out-edge, one side='auth' row per
    node with >= 1 in-edge.

    Scale shape: pagerank's discipline — the EDGES never move; the
    score vector is node-sized and either broadcast per half-step
    (<= broadcast_nodes_max, ray.put + vectorized merge) or kept a
    Dataset (all-shuffle regime: hash_join + grouped_agg per
    half-step, L2 norm via a one-scalar global aggregate).  Both
    regimes compute identical math (pytest-gated equality).
    """
    import ray
    import ray.data as rd

    from knowledge_graph_ray.functions.agg import distinct_rows, grouped_agg
    from knowledge_graph_ray.functions.joins import hash_join, project

    def normalize(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column(src).cast(pa.string()),
                         "dst": b.column(dst).cast(pa.string())})

    und = distinct_rows(
        edges.select_columns([src, dst]).map_batches(
            normalize, batch_format="pyarrow"),
        ["src", "dst"],
        empty_schema=pa.schema([("src", pa.string()),
                                ("dst", pa.string())]),
    ).materialize()
    empty = pa.table({node_col: pa.array([], pa.string()),
                      "side": pa.array([], pa.string()),
                      "score": pa.array([], pa.float64())})
    if und.count() == 0:
        return rd.from_arrow(empty)

    srcs = grouped_agg(und, ["src"], [("n", None, "count")]) \
        .select_columns(["src"]).materialize()
    n_src = srcs.count()

    if n_src <= broadcast_nodes_max:
        hub = srcs.to_pandas().rename(columns={"src": "u"})
        hub["h"] = 1.0
        auth = None
        for _ in range(iterations):
            ref = ray.put(hub)

            def c_auth(b: pa.Table) -> pa.Table:
                st = ray.get(ref)
                df = b.to_pandas().merge(st, left_on="src", right_on="u",
                                         how="inner")
                return pa.table({"dst": pa.array(df["dst"], pa.string()),
                                 "c": pa.array(df["h"], pa.float64())})

            auth = grouped_agg(
                und.map_batches(c_auth, batch_format="pyarrow"),
                ["dst"], [("s", "c", "sum")],
            ).to_pandas()  # node-sized, bounded by broadcast_nodes_max
            auth["a"] = auth["s"] / np.sqrt((auth["s"] ** 2).sum())
            aref = ray.put(auth[["dst", "a"]])

            def c_hub(b: pa.Table) -> pa.Table:
                st = ray.get(aref)
                df = b.to_pandas().merge(st, on="dst", how="inner")
                return pa.table({"u": pa.array(df["src"], pa.string()),
                                 "c": pa.array(df["a"], pa.float64())})

            hub = grouped_agg(
                und.map_batches(c_hub, batch_format="pyarrow"),
                ["u"], [("s", "c", "sum")],
            ).to_pandas()
            hub["h"] = hub["s"] / np.sqrt((hub["s"] ** 2).sum())
        out = pd.concat([
            pd.DataFrame({node_col: hub["u"], "side": "hub",
                          "score": hub["h"]}),
            pd.DataFrame({node_col: auth["dst"], "side": "auth",
                          "score": auth["a"]}),
        ])
        return rd.from_pandas(out.reset_index(drop=True))

    # all-shuffle regime: score vectors stay Datasets
    hub = srcs.map_batches(
        lambda b: pa.table({"u": b.column("src"),
                            "h": pa.array(np.ones(len(b)), pa.float64())}),
        batch_format="pyarrow",
    ).materialize()
    auth = None

    def _l2_normalize(ds, key, val, out):
        ssq = ds.map_batches(
            lambda b: pa.table({"s2": pa.compute.multiply(
                b.column(val), b.column(val))}),
            batch_format="pyarrow",
        ).sum("s2")  # ONE driver scalar
        norm = float(np.sqrt(ssq))
        return ds.map_batches(
            lambda b: pa.table({key: b.column(key),
                                out: pa.compute.divide(b.column(val),
                                                       norm)}),
            batch_format="pyarrow",
        ).materialize()

    for _ in range(iterations):
        joined = hash_join(und, project(hub, {"u": "src", "h": "h"}),
                           on=["src"], how="inner")
        sums = grouped_agg(joined, ["dst"], [("s", "h", "sum")])
        auth = _l2_normalize(sums, "dst", "s", "a")
        joined = hash_join(und, auth, on=["dst"], how="inner")
        sums = grouped_agg(joined, ["src"], [("s", "a", "sum")])
        hub = _l2_normalize(project(sums, {"src": "u", "s": "s"}),
                            "u", "s", "h")
    hub_rows = hub.map_batches(
        lambda b: pa.table({node_col: b.column("u"),
                            "side": pa.array(["hub"] * len(b)),
                            "score": b.column("h")}),
        batch_format="pyarrow",
    )
    auth_rows = auth.map_batches(
        lambda b: pa.table({node_col: b.column("dst"),
                            "side": pa.array(["auth"] * len(b)),
                            "score": b.column("a")}),
        batch_format="pyarrow",
    )
    return hub_rows.union(auth_rows)


def personalized_pagerank(edges, seeds: "list[str]", src: str = "src",
                          dst: str = "dst", weight: "str | None" = None,
                          iterations: int = 3, damping: float = 0.85,
                          undirected: bool = True, node_col: str = "name",
                          out_col: str = "ppr",
                          broadcast_nodes_max: int = 5_000_000):
    """Personalized PageRank: teleport mass restricted to ``seeds``.

        t(v)      = 1/|S|  if v in S else 0      (S = seeds present)
        pr_0(v)   = t(v)
        pr_k+1(v) = (1-d)*t(v) + d * sum_{(u,v)} pr_k(u) * w(u,v) / S(u)

    The random-walk-with-restart node relevance score (Jeh & Widom
    2003); with ``seeds = all nodes`` this degenerates to ``pagerank``.
    Seeds not present in the edge set are dropped from S (teleport is
    over present seeds only, keeping the node universe = edge
    endpoints, same as ``pagerank``); raises if none remain.

    Scale shape identical to ``pagerank``: edges never move, the rank
    vector is node-sized, one grouped_agg combiner shuffle of
    (dst, contribution) partials per iteration, size-adaptive
    broadcast-vs-join regimes (pytest-gated equality).  The seed SET
    itself ships by closure — it is query-sized (a handful of anchor
    entities), not data-sized.
    """
    import ray

    from knowledge_graph_ray.functions.agg import distinct_rows, grouped_agg
    from knowledge_graph_ray.functions.joins import hash_join, project

    w_in = [weight] if weight else []
    edges = edges.select_columns([src, dst] + w_in)

    def normalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b.column(src).cast(pa.string()),
            "dst": b.column(dst).cast(pa.string()),
            "w": (b.column(weight).cast(pa.float64()) if weight
                  else pa.array(np.ones(len(b)), type=pa.float64())),
        })

    fwd = edges.map_batches(normalize, batch_format="pyarrow")
    if undirected:
        def flip(b: pa.Table) -> pa.Table:
            return pa.table({"src": b.column("dst"), "dst": b.column("src"),
                             "w": b.column("w")})

        fwd = fwd.union(fwd.map_batches(flip, batch_format="pyarrow"))
    fwd = fwd.materialize()

    node_union = fwd.map_batches(
        lambda b: pa.concat_tables([
            pa.table({"name": b.column("src")}),
            pa.table({"name": b.column("dst")}),
        ]),
        batch_format="pyarrow",
    )
    nodes = distinct_rows(
        node_union, ["name"],
        empty_schema=pa.schema([("name", pa.string())]),
    ).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: b.append_column(out_col,
                                      pa.array([], type=pa.float64())),
            batch_format="pyarrow",
        )
    seed_set = set(seeds)
    present = nodes.map_batches(
        lambda b: b.filter(
            pa.array([v in seed_set for v in b.column("name").to_pylist()])),
        batch_format="pyarrow",
    )
    n_seeds = present.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: no seed present in graph")
    t_hit = 1.0 / n_seeds
    strength = grouped_agg(fwd, ["src"], [("s", "w", "sum")]).materialize()

    if n_nodes <= broadcast_nodes_max:
        state = nodes.to_pandas().merge(
            strength.to_pandas(), left_on="name", right_on="src", how="left"
        )[["name", "s"]]
        t = np.where(state["name"].isin(seed_set), t_hit, 0.0)
        state["t"] = t
        state[out_col] = t
        for _ in range(iterations):
            # broadcast frame carries (name, pr, s) so the per-edge
            # kernel is a single vectorized merge computing pr*w/s in
            # the SAME left-to-right float order as the distributed
            # regime and the SQL oracle (bit-comparable at e9 scale)
            ref = ray.put(state[["name", "s", out_col]])

            def contribs(b: pa.Table) -> pa.Table:
                st = ray.get(ref)
                df = b.to_pandas().merge(
                    st, left_on="src", right_on="name", how="left")
                return pa.table({
                    "dst": pa.array(df["dst"], type=pa.string()),
                    "c": pa.array(df[out_col] * df["w"] / df["s"],
                                  type=pa.float64()),
                })

            agg = grouped_agg(
                fwd.map_batches(contribs, batch_format="pyarrow"),
                ["dst"], [("c", "c", "sum")],
            ).to_pandas()  # node-sized, bounded by broadcast_nodes_max
            state = state.drop(columns=[out_col]).merge(
                agg, left_on="name", right_on="dst", how="left"
            )[["name", "s", "t", "c"]]
            state[out_col] = (1.0 - damping) * state["t"] + \
                damping * state.pop("c").fillna(0.0)
        import ray.data as rd

        result = rd.from_pandas(state[["name", out_col]])
    else:
        def with_t(b: pa.Table) -> pa.Table:
            t = pa.array([t_hit if v in seed_set else 0.0
                          for v in b.column("name").to_pylist()],
                         type=pa.float64())
            return b.append_column("t", t)

        nodes_t = nodes.map_batches(with_t,
                                    batch_format="pyarrow").materialize()
        ranks = nodes_t.map_batches(
            lambda b: pa.table({"name": b.column("name"),
                                out_col: b.column("t")}),
            batch_format="pyarrow",
        ).materialize()
        for _ in range(iterations):
            ranked = hash_join(
                fwd, project(ranks, {"name": "src", out_col: "rpr"}),
                on=["src"], how="inner",
            )
            with_s = hash_join(ranked, strength, on=["src"], how="inner")

            def contrib(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return pa.table({
                    "dst": b.column("dst"),
                    "c": pc.divide(pc.multiply(b.column("rpr"),
                                               b.column("w")),
                                   b.column("s")),
                })

            agg = grouped_agg(
                with_s.map_batches(contrib, batch_format="pyarrow"),
                ["dst"], [("c", "c", "sum")],
            )
            joined = hash_join(
                nodes_t, project(agg, {"dst": "name", "c": "c"}),
                on=["name"], how="left_outer",
            )

            def finish(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                c = pc.fill_null(b.column("c"), 0.0)
                pr = pc.add(pc.multiply(pc.multiply(b.column("t"),
                                                    1.0 - damping),
                                        1.0),
                            pc.multiply(c, damping))
                return pa.table({"name": b.column("name"), out_col: pr})

            ranks = joined.map_batches(
                finish, batch_format="pyarrow").materialize()
        result = ranks

    if node_col != "name":
        result = project(result, {"name": node_col, out_col: out_col})
    return result


def label_spread(edges, seed_labels: "dict[str, str]", src: str = "src",
                 dst: str = "dst", weight: "str | None" = None,
                 rounds: int = 3, undirected: bool = True,
                 broadcast_max: int = 5_000_000):
    """Seeded label spreading (Zhu & Ghahramani 2002 with clamping):
    a handful of anchor nodes carry known labels; per round every node
    receives the strength-normalized weighted sum of its neighbours'
    label scores, then seed nodes are clamped back to their one-hot.
    Returns Dataset[(name, label, score)] — each reached node's argmax
    label (ties broken by ascending label, mirroring a SQL
    row_number() ORDER BY score DESC, label).

    Scale shape: the score state is SPARSE — only (node, label) pairs
    with nonzero mass exist, bounded by |V| x |labels|; per round one
    hash_join of the edge set against the state + one grouped_agg
    combiner by (node, label), the same edges-never-move discipline as
    ``pagerank``.  The seed mapping ships by closure (query-sized).
    Seeds absent from the node set are dropped."""
    from knowledge_graph_ray.functions.agg import grouped_agg
    from knowledge_graph_ray.functions.joins import (
        project,
        size_adaptive_join,
    )

    import ray.data as rd

    w_in = [weight] if weight else []
    edges = edges.select_columns([src, dst] + w_in)

    def normalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b.column(src).cast(pa.string()),
            "dst": b.column(dst).cast(pa.string()),
            "w": (b.column(weight).cast(pa.float64()) if weight
                  else pa.array(np.ones(len(b)), type=pa.float64())),
        })

    fwd = edges.map_batches(normalize, batch_format="pyarrow")
    if undirected:
        fwd = fwd.union(fwd.map_batches(
            lambda b: pa.table({"src": b.column("dst"),
                                "dst": b.column("src"),
                                "w": b.column("w")}),
            batch_format="pyarrow"))
    fwd = fwd.materialize()
    strength = grouped_agg(fwd, ["src"], [("s", "w", "sum")]).materialize()

    seed_set = dict(seed_labels)
    node_src = strength.select_columns(["src"])

    seed_names_arr = pa.array(sorted(seed_set), type=pa.string())

    def seed_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hit = b.filter(pc.is_in(b.column("src"), value_set=seed_names_arr))
        names = hit.column("src")
        labels = pa.array(pd.Series(names.to_pandas()).map(seed_set),
                          type=pa.string())
        return pa.table({
            "name": names.cast(pa.string()),
            "label": labels,
            "score": pa.array(np.ones(len(hit)), type=pa.float64()),
        })

    # every node appears as src in the undirected edge set, so the
    # strength keys ARE the node universe
    clamp = node_src.map_batches(seed_rows,
                                 batch_format="pyarrow").materialize()
    if clamp.count() == 0:
        raise ValueError("label_spread: no seed present in graph")
    scores = clamp
    for _ in range(rounds):
        # the state (scores, strength) is node-sized: broadcast it
        # while it fits (size_adaptive_join) so the EDGES never
        # shuffle — only beyond broadcast_max does the partitioned
        # hash_join regime kick in (pagerank's discipline)
        ranked = size_adaptive_join(
            fwd, project(scores, {"name": "src", "label": "label",
                                  "score": "sc"}).materialize(),
            on=["src"], how="inner", broadcast_max=broadcast_max,
        )
        with_s = size_adaptive_join(ranked, strength, on=["src"],
                                    how="inner",
                                    broadcast_max=broadcast_max)

        def contrib(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "name": b.column("dst"),
                "label": b.column("label"),
                "c": pc.divide(pc.multiply(b.column("sc"), b.column("w")),
                               b.column("s")),
            })

        agg = grouped_agg(
            with_s.map_batches(contrib, batch_format="pyarrow"),
            ["name", "label"], [("score", "c", "sum")],
        )
        def drop_seeds(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(pc.invert(pc.is_in(
                b.column("name"), value_set=seed_names_arr)))

        spread = agg.map_batches(drop_seeds, batch_format="pyarrow")
        scores = spread.union(clamp).materialize()

    # argmax per node, ties -> lexicographically smallest label
    mx = grouped_agg(scores, ["name"], [("mx", "score", "max")])
    def keep_max(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b.column("score"), b.column("mx")))
        return b.select(["name", "label", "score"])

    at_max = size_adaptive_join(
        scores, mx.materialize(), on=["name"], how="inner",
        broadcast_max=broadcast_max).map_batches(
        keep_max, batch_format="pyarrow").materialize()
    win = grouped_agg(at_max, ["name"], [("label", "label", "min")])
    return size_adaptive_join(win, at_max, on=["name", "label"],
                              how="inner", broadcast_max=broadcast_max)
