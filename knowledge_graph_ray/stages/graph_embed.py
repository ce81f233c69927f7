"""Graph-structure node embeddings, component-parallel (SURVEY A7).

Reference: ``embed_nod2vec`` — graspologic ``node2vec_embed(dimensions,
num_walks, walk_length, window_size, iterations, random_seed=6969)``
over the whole graph (/root/reference/graph/embedding/embedding.py:15-38;
imported but never called by the reference workflow).  graspologic and
gensim are not in this sandbox, so the strategy is the classic
random-projection approximation of the same object: node2vec's SGNS
factorizes a window-averaged random-walk co-occurrence matrix (Qiu et
al., "Network Embedding as Matrix Factorization", WSDM'18 — public
result), and a seeded Johnson-Lindenstrauss projection of that matrix's
rows preserves its geometry without training:

    P = D^-1 W            (degree-weighted transition matrix)
    M = mean_{t=1..window} P^t
    X = M @ R             (R: seeded N(0,1/sqrt(d)) projection)
    rows L2-normalized

Same knobs (``dimensions``, ``window_size``, ``random_seed``), fully
deterministic: the per-node projection rows are derived from
``blake2b(name, seed)`` so the embedding is independent of execution
order, partitioning, and node numbering.

Scale shape: like community detection this is component-parallel —
``groupby(component).map_groups``, one task per component, the walk
powers computed with numpy scatter-adds over the component's edge list
(O(window x edges x dims) flops, no dense N x N matrix).  The giant
component lands on one task; give that stage memory headroom at extreme
scale (same contract as stages/community.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.functions.joins import hash_join, project

EMBED_SCHEMA = None  # built lazily


def _embed_schema(dim: int) -> pa.Schema:
    return pa.schema(
        [("name", pa.string()), ("component", pa.string()),
         ("graph_embedding", pa.list_(pa.float32(), dim))]
    )


def _seeded_rows(names: list[str], dim: int, seed: int) -> np.ndarray:
    """Deterministic per-node N(0, 1/sqrt(dim)) projection rows keyed by
    node NAME (not index): stable under any node ordering.

    Vectorized: per (name, column-pair) seeded polars hashes -> uniforms
    -> Box-Muller normals — O(dim) vectorized passes instead of a
    per-node Python loop with a RandomState construction each (measured
    ~5-10us/node, i.e. seconds per million-node component).  blake2b
    row loop kept as the no-polars fallback."""
    try:
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        s = pl.Series("n", list(names), dtype=pl.Utf8)
        out = np.empty((len(names), dim), dtype=np.float64)
        inv53 = 1.0 / (1 << 53)
        for j in range(0, dim, 2):
            h1 = s.hash(seed=(seed * 1_000_003 + 2 * j) & 0xFFFFFFFF).to_numpy()
            h2 = s.hash(seed=(seed * 1_000_003 + 2 * j + 1) & 0xFFFFFFFF).to_numpy()
            u1 = np.clip((h1 >> np.uint64(11)) * inv53, 1e-12, 1 - 1e-12)
            u2 = (h2 >> np.uint64(11)) * inv53
            r = np.sqrt(-2.0 * np.log(u1))
            out[:, j] = r * np.cos(2.0 * np.pi * u2)
            if j + 1 < dim:
                out[:, j + 1] = r * np.sin(2.0 * np.pi * u2)
        return out / np.sqrt(dim)
    except ImportError:
        out = np.empty((len(names), dim), dtype=np.float64)
        for i, name in enumerate(names):
            digest = hashlib.blake2b(
                f"{seed}|{name}".encode(), digest_size=8
            ).digest()
            rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
            out[i] = rng.standard_normal(dim)
        return out / np.sqrt(dim)


def _embed_component(
    names: "pd.Series", src: "pd.Series", dst: "pd.Series",
    weight: "pd.Series", dimensions: int, window_size: int, seed: int,
) -> np.ndarray:
    """-> (len(names), dimensions) float32 embedding matrix."""
    order = sorted(names)
    index = {n: i for i, n in enumerate(order)}
    n = len(order)
    x0 = _seeded_rows(order, dimensions, seed)

    si = np.fromiter((index[s] for s in src), dtype=np.int64, count=len(src))
    di = np.fromiter((index[d] for d in dst), dtype=np.int64, count=len(dst))
    w = np.asarray(weight, dtype=np.float64)
    # undirected: each edge contributes both directions
    rows = np.concatenate([si, di])
    cols = np.concatenate([di, si])
    vals = np.concatenate([w, w])
    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, rows, vals)
    deg[deg == 0.0] = 1.0  # isolated node: P row = 0 (handled below)
    pvals = vals / deg[rows]  # D^-1 W, row-stochastic

    acc = np.zeros_like(x0)
    xt = x0
    for _ in range(max(1, window_size)):
        nxt = np.zeros_like(x0)
        # nxt[r] += pvals * xt[c]  — sparse matvec via scatter-add
        np.add.at(nxt, rows, pvals[:, None] * xt[cols])
        acc += nxt
        xt = nxt
    acc /= max(1, window_size)
    norms = np.linalg.norm(acc, axis=1, keepdims=True)
    zero = norms[:, 0] == 0.0
    if zero.any():
        # isolated node: its walk never leaves the node, so the
        # word2vec analog would emit the node's (seeded) initial
        # vector — use its deterministic projection row, unit-
        # normalized, so EVERY output row is unit-norm and downstream
        # cosine math stays finite (no zero embeddings)
        x0n = np.linalg.norm(x0[zero], axis=1, keepdims=True)
        x0n[x0n == 0.0] = 1.0
        acc[zero] = x0[zero] / x0n
        norms[zero] = 1.0
    out = (acc / norms).astype(np.float32)
    # return in the caller's (unsorted) name order
    perm = np.fromiter((index[nm] for nm in names), dtype=np.int64, count=len(names))
    return out[perm]


def embed_graph(
    components,
    relationships,
    dimensions: int = 64,
    window_size: int = 2,
    seed: int = 6969,
    num_partitions: int = 32,
    driver_threshold: int = 100_000,
):
    """-> Dataset[(name, component, graph_embedding: list<float32, dim>)].

    ``components``: Dataset[(name, component)] from connected_components;
    ``relationships``: canonical (src, dst, weight) edge table.  The
    reference defaults (dimensions=1536, window_size=2, random_seed=6969,
    embedding.py:17-23) are supported; the default here is 64 dims —
    right-sized for the deterministic projection.

    Size-adaptive like detect_communities: a graph provably under
    ``driver_threshold`` nodes+edges embeds on the driver (per-component
    numpy work; shuffle rounds dominate small graphs), larger graphs run
    component-parallel.
    """
    schema = _embed_schema(dimensions)

    def _table(names, comps, mat) -> pa.Table:
        flat = pa.array(np.asarray(mat, dtype=np.float32).ravel(),
                        type=pa.float32())
        return pa.Table.from_arrays(
            [pa.array(list(names), type=pa.string()),
             pa.array(list(comps), type=pa.string()),
             pa.FixedSizeListArray.from_arrays(flat, dimensions).cast(
                 pa.list_(pa.float32(), dimensions))],
            schema=schema,
        )

    if (components.count() <= driver_threshold
            and relationships.count() <= driver_threshold):
        import ray.data as rd

        comp_pdf = components.to_pandas()
        if comp_pdf.empty:
            return rd.from_arrow(schema.empty_table())
        comp_of = dict(zip(comp_pdf["name"], comp_pdf["component"]))
        rels = relationships.select_columns(["src", "dst", "weight"]).to_pandas()
        rels = rels.assign(component=rels["src"].map(comp_of))
        rels = rels[rels["component"].notna()
                    & (rels["dst"].map(comp_of) == rels["component"])]
        edges_by_comp = dict(tuple(rels.groupby("component", sort=False)))
        tables = []
        for component, sub in comp_pdf.groupby("component"):
            e = edges_by_comp.get(component)
            empty = pd.Series([], dtype=object)
            mat = _embed_component(
                sub["name"],
                e["src"] if e is not None else empty,
                e["dst"] if e is not None else empty,
                e["weight"] if e is not None else pd.Series([], dtype=float),
                dimensions, window_size, seed,
            )
            tables.append(_table(sub["name"], sub["component"], mat))
        return rd.from_arrow(pa.concat_tables(tables))

    # distributed: same union-of-markers shape as detect_communities —
    # edge rows tagged with their src's component join node rows in one
    # groupby(component)
    edges = hash_join(
        relationships.select_columns(["src", "dst", "weight"]),
        project(components, {"name": "src", "component": "component"}),
        on=["src"],
        how="inner",
        num_partitions=num_partitions,
    )
    edge_rows = edges.map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "component": b.column("component"),
                "src": b.column("src"),
                "dst": b.column("dst"),
                "weight": b.column("weight"),
                "name": pa.nulls(len(b), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    node_rows = components.map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "component": b.column("component"),
                "src": pa.nulls(len(b), pa.string()),
                "dst": pa.nulls(len(b), pa.string()),
                "weight": pa.nulls(len(b), pa.float64()),
                "name": b.column("name"),
            }
        ),
        batch_format="pyarrow",
    )

    def embed_group(group: pd.DataFrame) -> pa.Table:
        component = group["component"].iloc[0]
        nodes = group.loc[group["name"].notna(), "name"]
        node_set = set(nodes)
        # drop edges with an endpoint outside this component's node set
        # (cross-component edges cannot exist post-CC; belt and braces)
        em = (group["src"].notna()
              & group["src"].isin(node_set) & group["dst"].isin(node_set))
        mat = _embed_component(
            nodes, group.loc[em, "src"], group.loc[em, "dst"],
            group.loc[em, "weight"], dimensions, window_size, seed,
        )
        return _table(nodes, [component] * len(nodes), mat)

    return edge_rows.union(node_rows).groupby("component").map_groups(
        embed_group, batch_format="pandas"
    )
