"""Local-search context builder over constructed tables (serving-side
data ops, reference search_test.py flow minus the LLM call)."""

import numpy as np
import ray.data as rd

from knowledge_graph_ray.config import PipelineConfig
from knowledge_graph_ray.corpus import generate_corpus_table
from knowledge_graph_ray.pipelines.build import build_knowledge_graph
from knowledge_graph_ray.pipelines.search import build_local_context
from knowledge_graph_ray.stages.embed import HashingEmbedder, embed_descriptions


def test_local_context():
    docs = rd.from_arrow(generate_corpus_table(150, seed=6969)).repartition(4)
    cfg = PipelineConfig(chunk_size=64, chunk_overlap=16, extract_concurrency=1)
    tables = build_knowledge_graph(docs, cfg, num_partitions=4)
    entities = embed_descriptions(tables.entities, concurrency=1, dim=64).materialize()
    text_units = tables.text_units.materialize()
    relationships = tables.relationships.materialize()

    # query with the embedding of one entity's own description: that
    # entity must be the top match
    target = entities.to_pandas().iloc[3]
    qv = HashingEmbedder(dim=64).embed_one(target["description"])

    ctx = build_local_context(entities, relationships, text_units, qv, k=5,
                              token_budget=500)
    assert ctx["entities"].iloc[0]["name"] == target["name"]
    assert len(ctx["entities"]) == 5
    # every context relationship touches a selected entity
    names = set(ctx["entities"]["name"])
    for _, r in ctx["relationships"].iterrows():
        assert r["src"] in names or r["dst"] in names
    # text units come from the selected entities' sources, budget respected
    assert not ctx["text_units"].empty
    total_tokens = sum(len((t or "").split()) for t in ctx["text_units"]["text"])
    assert total_tokens <= 600  # ~budget (regex vs whitespace tokens)
    sources = " ".join(ctx["entities"]["source_id"])
    for cid in ctx["text_units"]["chunk_id"]:
        assert cid in sources


def test_global_context():
    from knowledge_graph_ray.pipelines.search import build_global_context

    docs = rd.from_arrow(generate_corpus_table(150, seed=6969)).repartition(4)
    cfg = PipelineConfig(chunk_size=64, chunk_overlap=16, extract_concurrency=1,
                         max_cluster_size=3)
    tables = build_knowledge_graph(docs, cfg, num_partitions=4)
    ctx = build_global_context(tables.reports, k=3, token_budget=10000)
    assert 1 <= len(ctx) <= 3
    ranks = ctx["rank"].tolist()
    assert ranks == sorted(ranks, reverse=True)  # top by score
    # determinism
    ctx2 = build_global_context(tables.reports, k=3, token_budget=10000)
    assert ctx["community"].tolist() == ctx2["community"].tolist()
