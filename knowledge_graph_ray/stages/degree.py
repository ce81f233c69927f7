"""Node degrees + edge rank (SURVEY.md G4 / J1).

Reference: node degree from the global graph
(/root/reference/verbs/community_detection/cluster_graph.py:55-57); edge
rank = source_degree + target_degree with fillna(0) after two left joins
(/root/reference/verbs/community_summarization/prepare_report/compute_edge_degree.py:11-54).

Ray-Data-native: degrees are a partial-count per batch (both endpoints)
followed by a small groupby-sum — no global graph.  Attaching degrees to
the entity/edge tables uses hash-partitioned ``Dataset.join`` (left
outer, fillna 0), which scales to entity tables that don't fit one node.
"""

from __future__ import annotations

import pyarrow as pa

from knowledge_graph_ray.functions.joins import hash_join, project


def degree_partials_batch(batch: pa.Table) -> pa.Table:
    """relationship rows -> partial (name, cnt) for both endpoints
    (vectorized arrow value_counts, no Python row loop)."""
    src = batch.column("src").combine_chunks()
    dst = batch.column("dst").combine_chunks()
    both = pa.chunked_array([src, dst])
    vc = both.value_counts()  # StructArray<values, counts>
    return pa.Table.from_pydict(
        {
            "name": vc.field("values"),
            "cnt": vc.field("counts").cast(pa.int64()),
        }
    )


def compute_degrees(relationships):
    """Dataset[relationship] -> Dataset[(name, degree)].

    Degree = number of distinct canonical edges incident to the entity
    (matches nx.Graph.degree on the merged graph: one undirected edge per
    endpoint pair, self-loop-free by construction of the canonical key).
    """
    from knowledge_graph_ray.functions.agg import grouped_agg

    partials = relationships.select_columns(["src", "dst"]).map_batches(
        degree_partials_batch, batch_format="pyarrow"
    )
    return grouped_agg(partials, ["name"], [("degree", "cnt", "sum")])


def attach_entity_degrees(entities, degrees, num_partitions: int = 32):
    """entities ⟕ degrees on name; missing -> degree 0."""
    joined = hash_join(
        entities, degrees, on=["name"], how="left_outer", num_partitions=num_partitions
    )

    def fill(batch: pa.Table) -> pa.Table:
        deg = batch.column("degree").fill_null(0)
        return batch.set_column(
            batch.schema.get_field_index("degree"), "degree", deg
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def attach_edge_degrees(relationships, degrees, num_partitions: int = 32):
    """edges ⟕ degrees on src, then dst; rank = source_degree + target_degree
    (compute_edge_degree.py:11-54)."""
    # project() not rename_columns: two projected branches of `degrees`
    # land in one DAG — Project ops can be dropped by fusion (joins.project)
    with_src = hash_join(
        relationships,
        project(degrees, {"name": "src", "degree": "source_degree"}),
        on=["src"],
        how="left_outer",
        num_partitions=num_partitions,
    )
    with_both = hash_join(
        with_src,
        project(degrees, {"name": "dst", "degree": "target_degree"}),
        on=["dst"],
        how="left_outer",
        num_partitions=num_partitions,
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sd = batch.column("source_degree").fill_null(0)
        td = batch.column("target_degree").fill_null(0)
        batch = batch.set_column(
            batch.schema.get_field_index("source_degree"), "source_degree", sd
        )
        batch = batch.set_column(
            batch.schema.get_field_index("target_degree"), "target_degree", td
        )
        return batch.append_column("rank", pc.add(sd, td))

    return with_both.map_batches(finish, batch_format="pyarrow")
