"""Query-side local-search context assembly (data ops only, no LLM).

The reference's local GraphRAG search (/root/reference/search_test.py:36-147,
query/system_prompt_builder/combine_context.py:78-223) builds a context
from: vector top-k entity match (entity_extraction.py:30-81, k*2
oversample), top relationships by combined rank
(query/inputs/retrieval/relationships.py:12-59), and the matched
entities' text units under a token budget.  The final LLM call is out of
scope (north_rule: no serving layer); everything BEFORE it — the data
retrieval — is reproduced here over the exported tables, deterministic
and testable.

Shapes: the corpus-sized scans are Dataset ops (cosine scoring inside
map_batches against a broadcast query vector; broadcast-set filters for
the semi-joins); the final context tables are top-k-small and return as
pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from knowledge_graph_ray.functions.text import token_count


def _top_entities(entities, query_vector: np.ndarray, k: int):
    """Vector top-k over the entity embedding column (k*2 oversample like
    the reference, then exact re-rank)."""
    from knowledge_graph_ray.stages.similarity import brute_force_topk

    top = brute_force_topk(
        entities, query_vector[None, :], k=k * 2, vec_column="embedding",
        id_column="name",
    ).to_pandas()
    return top.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)


def build_local_context(
    entities,
    relationships,
    text_units,
    query_vector: np.ndarray,
    k: int = 10,
    token_budget: int = 8000,
) -> dict[str, pd.DataFrame]:
    """-> {"entities": ..., "relationships": ..., "text_units": ...}.

    ``entities`` must carry an ``embedding`` column
    (stages/embed.embed_descriptions).
    """
    import pyarrow as pa
    import ray

    top = _top_entities(entities, np.asarray(query_vector, dtype=np.float64), k)
    selected = list(top["vec_id"])  # entity names
    sel_ref = ray.put(set(selected))

    ent_rows = entities.map_batches(
        lambda b: b.filter(
            pa.array([n in ray.get(sel_ref) for n in b.column("name").to_pylist()])
        ),
        batch_format="pyarrow",
    ).to_pandas()
    order = {name: i for i, name in enumerate(selected)}
    ent_rows["match_rank"] = ent_rows["name"].map(order)
    ent_rows = ent_rows.sort_values("match_rank")

    # top relationships touching selected entities, by combined rank desc
    rel_rows = (
        relationships.map_batches(
            lambda b: b.filter(
                pa.array(
                    [
                        s in ray.get(sel_ref) or d in ray.get(sel_ref)
                        for s, d in zip(
                            b.column("src").to_pylist(), b.column("dst").to_pylist()
                        )
                    ]
                )
            ),
            batch_format="pyarrow",
        )
        .sort(["rank", "src", "dst"], descending=[True, False, False])
        .limit(k * 2)
        .to_pandas()
    )

    # text units referenced by the selected entities (entity match order,
    # reference combine_context.py:259-261), under the token budget
    wanted_chunks: list[str] = []
    seen = set()
    for _, row in ent_rows.iterrows():
        for cid in (row.get("source_id") or "").split(", "):
            if cid and cid not in seen:
                seen.add(cid)
                wanted_chunks.append(cid)
    chunk_ref = ray.put(set(wanted_chunks))
    tu_rows = text_units.map_batches(
        lambda b: b.filter(
            pa.array(
                [c in ray.get(chunk_ref) for c in b.column("chunk_id").to_pylist()]
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()
    chunk_order = {cid: i for i, cid in enumerate(wanted_chunks)}
    tu_rows["match_rank"] = tu_rows["chunk_id"].map(chunk_order)
    tu_rows = tu_rows.sort_values("match_rank")
    kept, used = [], 0
    for _, row in tu_rows.iterrows():
        used += token_count(row["text"] or "")
        if used > token_budget:
            break
        kept.append(row)
    tu_out = pd.DataFrame(kept, columns=tu_rows.columns)

    return {"entities": ent_rows, "relationships": rel_rows, "text_units": tu_out}


def build_global_context(reports, k: int = 10, shuffle_seed: int = 6969,
                         token_budget: int = 8000) -> pd.DataFrame:
    """Global-search retrieval (reference query/structured_search/
    global_search/search.py:82-142): community reports are shuffled with
    a fixed seed (process_context/community_context.py:68-70), mapped in
    batches for relevance scores — here the deterministic score is the
    report ``rank`` (the LLM map-scoring seam) — and reduced to the
    top-k by (score desc, community) under a token budget."""
    scored = (
        reports.random_shuffle(seed=shuffle_seed)
        .sort(["rank", "community"], descending=[True, False])
        .limit(k * 2)
        .to_pandas()
    )
    kept, used = [], 0
    for _, row in scored.iterrows():
        used += token_count(row["full_content"] or "")
        if used > token_budget:
            break
        kept.append(row)
        if len(kept) >= k:
            break
    return pd.DataFrame(kept, columns=scored.columns)
