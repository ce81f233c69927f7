"""Graph change-log artifacts: what a new run added or changed.

Reference: ``GraphCheckpointManager.save_checkpoint`` walks two in-memory
nx.Graphs and dumps ``new_nodes.json`` / ``new_edges.json``
(/root/reference/checkpoints/graph.py:13-33; checkpoints/file.py:7-51
persists the full tables per run_id).  A downstream consumer diffs runs
through those artifacts.

Ray-Data-native: the diff is two distributed anti-joins (new keys) plus
an inner join with a vectorized payload comparison (updated keys) — no
driver-side graph walk, no full-table JSON.  Artifacts are partitioned
Parquet checkpoints (resumable, shardable) plus a small
``_diff_summary.json`` with the counts — the JSON carries the summary a
human reads, the Parquet carries the data at any scale.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from knowledge_graph_ray.functions.joins import hash_join, project

ENTITY_KEY = ["name"]
EDGE_KEY = ["src", "dst"]
_CMP_SUFFIX = "__prev"


def _new_rows(current, prev, keys: list[str], num_partitions: int):
    """Rows of ``current`` whose key is absent from ``prev`` (anti-join).
    ``project`` (opaque map_batches) rather than select_columns: prev
    feeds two differently-projected join branches and Ray 2.49 can elide
    native Project ops on branched DAGs."""
    prev_keys = project(prev, keys)
    return hash_join(current, prev_keys, on=keys, how="left_anti",
                     num_partitions=num_partitions)


def _updated_rows(current, prev, keys: list[str], compare: list[str],
                  num_partitions: int):
    """Rows present in BOTH whose ``compare`` payload changed."""
    prev_proj = project(
        prev,
        {**{k: k for k in keys}, **{c: c + _CMP_SUFFIX for c in compare}},
    )
    joined = hash_join(current, prev_proj, on=keys, how="inner",
                       num_partitions=num_partitions)

    def changed_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        diff = None
        for c in compare:
            neq = pc.fill_null(
                pc.not_equal(b.column(c), b.column(c + _CMP_SUFFIX)), True
            )
            both_null = pc.and_(
                pc.is_null(b.column(c)), pc.is_null(b.column(c + _CMP_SUFFIX))
            )
            neq = pc.and_(neq, pc.invert(both_null))
            diff = neq if diff is None else pc.or_(diff, neq)
        out = b.filter(diff)
        return out.drop_columns([c + _CMP_SUFFIX for c in compare])

    return joined.map_batches(changed_only, batch_format="pyarrow")


def graph_diff(prev_entities, prev_relationships, entities, relationships,
               entity_compare: list[str] | None = None,
               edge_compare: list[str] | None = None,
               num_partitions: int = 32) -> dict:
    """-> {"new_entities", "updated_entities", "new_relationships",
    "updated_relationships"}: lazy Datasets.

    ``*_compare`` default to the canonical payload columns — an entity is
    "updated" when its merged type/description/source set or mention
    count changed; an edge when weight/description/source set changed
    (the reference only tracks NEW keys, graph.py:18-26 — updated rows
    are the natural extension its consumers diff for by hand).
    """
    entity_compare = entity_compare or [
        "type", "description", "source_id", "n_mentions"
    ]
    edge_compare = edge_compare or [
        "weight", "description", "source_id", "n_mentions"
    ]
    return {
        "new_entities": _new_rows(
            entities, prev_entities, ENTITY_KEY, num_partitions),
        "updated_entities": _updated_rows(
            entities, prev_entities, ENTITY_KEY, entity_compare,
            num_partitions),
        "new_relationships": _new_rows(
            relationships, prev_relationships, EDGE_KEY, num_partitions),
        "updated_relationships": _updated_rows(
            relationships, prev_relationships, EDGE_KEY, edge_compare,
            num_partitions),
    }


def write_graph_diff(diff: dict, out_dir: str, fingerprint: str = "none") -> dict:
    """Persist the four diff tables as Parquet checkpoints + a summary
    JSON (the reference's new_nodes.json/new_edges.json role).  Returns
    the summary dict."""
    from knowledge_graph_ray.state.checkpoint import write_checkpoint

    os.makedirs(out_dir, exist_ok=True)
    summary: dict = {"fingerprint": fingerprint, "counts": {}}
    for name, ds in diff.items():
        manifest = write_checkpoint(
            ds, os.path.join(out_dir, name), fingerprint=fingerprint,
            stage=name,
        )
        summary["counts"][name] = manifest.get("rows")
    with open(os.path.join(out_dir, "_diff_summary.json"), "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    return summary
