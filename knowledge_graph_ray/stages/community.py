"""Hierarchical community detection, component-parallel.

Reference: graspologic ``hierarchical_leiden(max_cluster_size=10,
seed=6969)`` on the largest connected component only
(/root/reference/verbs/community_detection/clustering/leiden.py:45-61,
use_lcc=True default).  graspologic is not available in this sandbox, so
the strategy is networkx ``louvain_communities`` with recursive
re-clustering of clusters larger than ``max_cluster_size`` — the same
hierarchy contract (level L+1 refines oversized level-L clusters; parity
is asserted on community granularity, SURVEY.md §7.5).

Scale shape: hierarchical Leiden/Louvain is not data-parallel, but it IS
component-parallel (SURVEY.md §4) — components are computed first via
distributed label propagation (stages/components.py), then each
component's subgraph is clustered independently inside
``groupby(component).map_groups``.  The giant component lands on one
task; at extreme scale give that stage a high-memory resource request.
Community ids are content-derived (md5 of component + path), so they are
stable under any execution order.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import pandas as pd

if TYPE_CHECKING:  # imported lazily at use sites: ~0.5s import per
    import networkx as nx  # worker process, paid only by clustering tasks

from knowledge_graph_ray.config import MAX_CLUSTER_SIZE, SEED
from knowledge_graph_ray.functions.joins import hash_join

COMMUNITY_COLUMNS = ["level", "community", "name"]

COMMUNITY_SCHEMA = None  # built lazily to avoid importing pyarrow at module scope


def _community_schema():
    import pyarrow as pa

    return pa.schema(
        [("level", pa.int64()), ("community", pa.string()), ("name", pa.string())]
    )


def _cid(component: str, path: str) -> str:
    digest = hashlib.md5(f"{component}|{path}".encode()).hexdigest()[:12]
    return f"c{digest}"


def rd_empty_communities():
    import ray.data as rd

    return rd.from_arrow(_community_schema().empty_table())


# above this node count a single component skips modularity Louvain (one
# task would hold the whole subgraph) and uses the deterministic ordered
# bisection only — the hierarchy contract survives, memory stays bounded
MAX_LOUVAIN_COMPONENT_NODES = 500_000


def _cluster_component(
    graph: nx.Graph, component: str, max_cluster_size: int, seed: int,
    max_louvain_nodes: int = MAX_LOUVAIN_COMPONENT_NODES,
) -> list[dict]:
    """Hierarchical louvain: rows (level, community, name)."""
    import networkx as nx

    rows: list[dict] = []

    def recurse(subgraph: nx.Graph, level: int, path: str) -> None:
        if subgraph.number_of_nodes() <= 1 or subgraph.number_of_edges() == 0:
            clusters = [set(subgraph.nodes())] if subgraph.number_of_nodes() else []
        elif subgraph.number_of_nodes() > max_louvain_nodes:
            # giant-component guard: modularity Louvain on a graph this
            # size would dominate one task's memory/time — descend via a
            # deterministic ordered bisection until Louvain is affordable
            import logging

            logging.getLogger(__name__).warning(
                "component %s level %d: %d nodes > max_louvain_nodes=%d, "
                "using ordered bisection for this level",
                component, level, subgraph.number_of_nodes(), max_louvain_nodes,
            )
            ordered = sorted(subgraph.nodes())
            half = (len(ordered) + 1) // 2
            clusters = [set(ordered[:half]), set(ordered[half:])]
        else:
            clusters = [
                set(c)
                for c in nx.community.louvain_communities(
                    subgraph, weight="weight", seed=seed
                )
            ]
        if len(clusters) <= 1 and subgraph.number_of_nodes() > max_cluster_size:
            # no modularity split — force a deterministic bisection so the
            # hierarchy terminates (graspologic bisects internally too)
            ordered = sorted(subgraph.nodes())
            clusters = [
                set(ordered[i : i + max_cluster_size])
                for i in range(0, len(ordered), max_cluster_size)
            ]
        for ci, cluster in enumerate(sorted(clusters, key=min)):
            cid = _cid(component, f"{path}/{ci}")
            for node in cluster:
                rows.append({"level": level, "community": cid, "name": node})
            if len(cluster) > max_cluster_size:
                recurse(subgraph.subgraph(cluster).copy(), level + 1, f"{path}/{ci}")

    recurse(graph, 0, "")
    return rows


def detect_communities(
    components,
    relationships,
    max_cluster_size: int = MAX_CLUSTER_SIZE,
    seed: int = SEED,
    use_lcc: bool = True,
    num_partitions: int = 32,
    max_louvain_nodes: int = MAX_LOUVAIN_COMPONENT_NODES,
    clustering_num_cpus: float | None = None,
    clustering_memory: float | None = None,
    driver_threshold: int = 100_000,
):
    """-> Dataset[(level:int, community:str, name:str)].

    ``components``: Dataset[(name, component)] from connected_components.
    ``use_lcc`` mirrors the reference default (cluster only the largest
    connected component, leiden.py:51-52).

    Size-adaptive (same pattern as connected_components): graphs whose
    clustered node count is provably <= ``driver_threshold`` run the
    hierarchy locally on the driver — clustering is per-component
    sequential work anyway, and the shuffle rounds cost more than the
    computation for small graphs.  Larger graphs take the distributed
    component-parallel path.
    """
    import pyarrow as pa

    if use_lcc:
        # dataset-side top-1: with singleton components for every isolated
        # entity the size table is entity-scale — never to_pandas() it,
        # and never full-sort it: a per-batch local top-1 combiner bounds
        # the final pull to one row per block (ties broken by smallest
        # component id, matching the previous sort order)
        def local_top1(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            df = df.sort_values(["count()", "component"],
                                ascending=[False, True], kind="stable")
            return pa.Table.from_pandas(df.head(1), preserve_index=False)

        top = (
            components.groupby("component")
            .count()
            .map_batches(local_top1, batch_format="pyarrow")
            .to_pandas()
        )
        if top.empty:
            return rd_empty_communities()
        top = top.sort_values(["count()", "component"],
                              ascending=[False, True], kind="stable")
        largest = top["component"].iloc[0]
        components = components.filter(
            expr=f"component == {largest!r}"
        )

    if (components.count() <= driver_threshold
            and relationships.count() <= driver_threshold):
        # driver fast path: pull the (PROVABLY bounded — both counts
        # checked) node/edge lists once, cluster locally, return the
        # table — zero shuffle rounds
        import ray.data as rd

        comp_pdf = components.to_pandas()
        comp_of = dict(zip(comp_pdf["name"], comp_pdf["component"]))
        rels_pdf = relationships.select_columns(
            ["src", "dst", "weight"]
        ).to_pandas()
        # stamp each edge's component ONCE (was an O(components x edges)
        # re-scan per component); both endpoints must map to the same
        # component — under use_lcc, out-of-LCC endpoints map to NaN and
        # the edge drops, matching the old `dst in g` check
        rels_pdf = rels_pdf.assign(component=rels_pdf["src"].map(comp_of))
        rels_pdf = rels_pdf[
            rels_pdf["component"].notna()
            & (rels_pdf["dst"].map(comp_of) == rels_pdf["component"])
        ]
        edges_by_comp = dict(tuple(rels_pdf.groupby("component", sort=False)))
        rows: list[dict] = []
        import networkx as nx

        for component, sub in comp_pdf.groupby("component"):
            g = nx.Graph()
            # sorted insertion: louvain tie-breaks depend on node/edge
            # iteration order, so graph build must not inherit upstream
            # row order (which differs between shuffle strategies)
            g.add_nodes_from(sorted(sub["name"]))
            e = edges_by_comp.get(component)
            if e is not None:
                e = e.sort_values(["src", "dst"], kind="stable")
                g.add_weighted_edges_from(zip(e["src"], e["dst"], e["weight"]))
            rows.extend(
                _cluster_component(g, component, max_cluster_size, seed,
                                   max_louvain_nodes)
            )
        return rd.from_arrow(pa.Table.from_pylist(rows, schema=_community_schema()))

    # tag edges with the component of their src (dst is in the same component)
    from knowledge_graph_ray.functions.joins import project

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

    def cluster_group(group: pd.DataFrame):
        import networkx as nx

        component = group["component"].iloc[0]
        g = nx.Graph()
        # sorted insertion — see the driver path: louvain tie-breaks
        # depend on node/edge iteration order
        g.add_nodes_from(
            sorted(n for n in group["name"] if isinstance(n, str))
        )
        edges = group.loc[
            group["src"].notna(), ["src", "dst", "weight"]
        ].sort_values(["src", "dst"], kind="stable")
        for src, dst, w in zip(edges["src"], edges["dst"], edges["weight"]):
            g.add_edge(src, dst, weight=w)
        rows = _cluster_component(
            g, component, max_cluster_size, seed, max_louvain_nodes
        )
        return pa.Table.from_pylist(rows, schema=_community_schema())

    # clustering_num_cpus/memory: resource annotation for the clustering
    # tasks — the giant component lands on one task, so at scale give it
    # headroom (e.g. clustering_memory=32e9) and the scheduler will place
    # it on a node with room
    remote_args = {}
    if clustering_num_cpus is not None:
        remote_args["num_cpus"] = clustering_num_cpus
    if clustering_memory is not None:
        remote_args["memory"] = clustering_memory
    return edge_rows.union(node_rows).groupby("component").map_groups(
        cluster_group, batch_format="pandas", **remote_args
    )


def community_hierarchy(communities, num_partitions: int = 32):
    """G5 hierarchy table: (community, level, sub_community,
    sub_community_size) — each level-L community paired with the level-L+1
    communities whose members it contains (reference
    verbs/community_summarization/prepare_report/community_hierachy.py:22-74,
    which does the same subset scan in pandas on the driver).

    Distributed: one self-join on name restricted to adjacent levels,
    then pair-scale aggregates; the subset condition (all of the
    sub-community's members appear under the parent) is enforced by
    comparing the shared-member count with the sub-community size.
    """
    import pyarrow as pa

    from knowledge_graph_ray.functions.joins import project

    parent = project(
        communities, {"community": "community", "level": "level", "name": "name"}
    )
    child = project(
        communities,
        {"community": "sub_community", "level": "sub_level", "name": "name"},
    )
    joined = hash_join(parent, child, on=["name"], how="inner",
                       num_partitions=num_partitions)

    # NOT filter(expr="sub_level == level + 1"): Ray 2.49 evaluates
    # column-vs-column arithmetic exprs to no rows silently
    def adjacent_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(
            pc.equal(b.column("sub_level"),
                     pc.add(b.column("level"), pa.scalar(1, pa.int64())))
        )

    adjacent = joined.map_batches(adjacent_only, batch_format="pyarrow")
    hierarchy_schema = pa.schema(
        [("community", pa.string()), ("level", pa.int64()),
         ("sub_community", pa.string()), ("sub_community_size", pa.int64())]
    )

    # one shuffle keyed by the sub-community: parent-pair rows from the
    # adjacency join union'd with member-marker rows; the group body
    # counts members (size) and keeps parents sharing ALL of them —
    # fully lazy (no mid-pipeline materialize) and empty-safe
    def pair_rows(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_pydict(
            {
                "sub_community": b.column("sub_community"),
                "sub_level": b.column("sub_level").cast(pa.int64()),
                "p_community": b.column("community"),
                "p_level": b.column("level").cast(pa.int64()),
                "is_member": pa.array([0] * n, type=pa.int8()),
            }
        )

    def member_rows(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_pydict(
            {
                "sub_community": b.column("community"),
                "sub_level": b.column("level").cast(pa.int64()),
                "p_community": pa.nulls(n, pa.string()),
                "p_level": pa.nulls(n, pa.int64()),
                "is_member": pa.array([1] * n, type=pa.int8()),
            }
        )

    unioned = adjacent.map_batches(pair_rows, batch_format="pyarrow").union(
        communities.map_batches(member_rows, batch_format="pyarrow")
    )

    def emit_parents(group: pd.DataFrame) -> pa.Table:
        size = int((group["is_member"] == 1).sum())
        pairs = group[group["is_member"] == 0]
        if size == 0 or pairs.empty:
            return hierarchy_schema.empty_table()
        counts = pairs.groupby(["p_community", "p_level"]).size()
        rows = [
            {
                "community": pc_,
                "level": int(pl),
                "sub_community": group["sub_community"].iloc[0],
                "sub_community_size": size,
            }
            for (pc_, pl), n_shared in counts.items()
            if n_shared == size
        ]
        return pa.Table.from_pylist(rows, schema=hierarchy_schema)

    from knowledge_graph_ray.functions.grouping import bucketed_group_map

    return bucketed_group_map(
        unioned, ["sub_community", "sub_level"], emit_parents,
        num_buckets=num_partitions, empty_schema=hierarchy_schema,
    )


def assign_clusters(entities, communities, level: int = 0, num_partitions: int = 32):
    """Stamp each entity with its community at ``level`` (reference
    cluster_graph.py:49-53 applies level==0 only); entities outside the
    clustered component get null cluster."""
    from knowledge_graph_ray.functions.joins import project

    at_level = project(
        communities.filter(expr=f"level == {level}"),
        {"name": "name", "community": "cluster"},
    )
    return hash_join(
        entities, at_level, on=["name"], how="left_outer", num_partitions=num_partitions
    )
