"""Full-pipeline resume: stage checkpoints skip recomputation on rerun;
a changed fingerprint invalidates them."""

import json
import os

import ray.data as rd

from knowledge_graph_ray.config import PipelineConfig
from knowledge_graph_ray.corpus import generate_corpus_table
from knowledge_graph_ray.pipelines.build import build_knowledge_graph

CFG = PipelineConfig(chunk_size=64, chunk_overlap=16, extract_concurrency=1)


def _manifest(path):
    with open(os.path.join(path, "_manifest.json")) as f:
        return json.load(f)


def test_pipeline_resume(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    docs = rd.from_arrow(generate_corpus_table(80, seed=6969)).repartition(2)

    t1 = build_knowledge_graph(docs, CFG, num_partitions=4,
                               checkpoint_dir=ckpt, fingerprint="fp-a")
    n_ents = t1.entities.count()
    stages = ["entities_summarized", "relationships_summarized",
              "entities_degreed", "relationships_degreed", "communities"]
    first = {s: _manifest(os.path.join(ckpt, s))["written_at"] for s in stages}
    for s in stages:
        assert _manifest(os.path.join(ckpt, s))["fingerprint"] == "fp-a"

    # same fingerprint -> resumed, no checkpoint rewritten
    t2 = build_knowledge_graph(docs, CFG, num_partitions=4,
                               checkpoint_dir=ckpt, fingerprint="fp-a")
    assert t2.entities.count() == n_ents
    second = {s: _manifest(os.path.join(ckpt, s))["written_at"] for s in stages}
    assert second == first

    # new fingerprint (new input) -> stages recomputed
    docs2 = rd.from_arrow(generate_corpus_table(100, seed=6969)).repartition(2)
    t3 = build_knowledge_graph(docs2, CFG, num_partitions=4,
                               checkpoint_dir=ckpt, fingerprint="fp-b")
    assert t3.entities.count() >= n_ents
    third = {s: _manifest(os.path.join(ckpt, s))["written_at"] for s in stages}
    assert all(third[s] > first[s] for s in stages)
    for s in stages:
        assert _manifest(os.path.join(ckpt, s))["fingerprint"] == "fp-b"


def test_mentions_checkpoint(tmp_path):
    from knowledge_graph_ray.pipelines.build import build_graph

    docs = rd.from_arrow(generate_corpus_table(60, seed=6969)).repartition(2)
    path = str(tmp_path / "mentions")
    t1 = build_graph(docs, CFG, mentions_checkpoint=path, fingerprint="m1")
    n = t1.mentions.count()
    assert n > 0
    first = _manifest(path)["written_at"]
    # resume: mention extraction skipped, same rows
    t2 = build_graph(docs, CFG, mentions_checkpoint=path, fingerprint="m1")
    assert t2.mentions.count() == n
    assert _manifest(path)["written_at"] == first
    assert t2.entities.count() == t1.entities.count()


def test_media_features_branch(tmp_path):
    from knowledge_graph_ray.config import PipelineConfig
    from knowledge_graph_ray.pipelines.build import build_knowledge_graph, export_tables

    cfg = PipelineConfig(chunk_size=64, chunk_overlap=16, extract_concurrency=1,
                        media_features=True)
    docs = rd.from_arrow(generate_corpus_table(80, seed=6969)).repartition(2)
    tables = build_knowledge_graph(docs, cfg, num_partitions=4)
    feats = tables.media_features.to_pandas()
    assert not feats.empty
    assert set(feats.columns) == {"doc_id", "media_ref", "kind", "feature"}
    assert feats.kind.isin(["image", "audio", "table"]).all()
    manifests = export_tables(tables, str(tmp_path / "out"), fingerprint="m")
    assert manifests["media_features"]["rows"] == len(feats)


def test_resume_skips_cc_chain_entirely(tmp_path, monkeypatch):
    """A complete 'communities' checkpoint must not re-execute the
    connected-components chain (compute-and-discard regression)."""
    import knowledge_graph_ray.stages.community as community_mod
    import knowledge_graph_ray.stages.components as components_mod
    import knowledge_graph_ray.stages.degree as degree_mod

    ckpt = str(tmp_path / "ckpt")
    docs = rd.from_arrow(generate_corpus_table(80, seed=6969)).repartition(2)
    t1 = build_knowledge_graph(docs, CFG, num_partitions=4,
                               checkpoint_dir=ckpt, fingerprint="fp-cc")
    n = t1.entities.count()

    def _boom(*a, **k):
        raise AssertionError("CC chain executed despite complete checkpoint")

    monkeypatch.setattr(components_mod, "connected_components", _boom)
    monkeypatch.setattr(community_mod, "detect_communities", _boom)
    monkeypatch.setattr(degree_mod, "compute_degrees", _boom)
    t2 = build_knowledge_graph(docs, CFG, num_partitions=4,
                               checkpoint_dir=ckpt, fingerprint="fp-cc")
    assert t2.entities.count() == n
