"""Strategy-seam tests: multi-round gleaning merge semantics (A1),
claims entity resolution (M7), tolerant JSON report parsing (M9) and the
raw-JSON report composer behind it."""

import json

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from knowledge_graph_ray.functions.records import (
    format_entity_record,
    format_relationship_record,
    join_records,
)
from knowledge_graph_ray.stages.extract import PatternExtractor, extract_mentions


class GleaningExtractor(PatternExtractor):
    """Round 0: base extraction.  Glean round 1 adds an extra mention of
    ALPHA with a NEW TYPE + a new relationship (the reference CONTINUE
    round); the YES/NO probe stops after one glean round."""

    max_gleanings = 2
    glean_calls: list
    probe_calls: list

    def __init__(self):
        super().__init__(
            vocabulary=[("Alpha", "person"), ("Beta", "organization")],
            rel_verbs=[("works with", 1.0)],
        )
        self.glean_calls = []
        self.probe_calls = []

    def _glean(self, text, round_index, previous):
        self.glean_calls.append(round_index)
        if round_index == 0:
            return join_records(
                [
                    format_entity_record("Alpha", "deity", "gleaned alpha desc"),
                    format_relationship_record("Alpha", "Beta", "gleaned rel", 2.0),
                ]
            )
        return join_records([format_entity_record("Alpha", "ghost", "never")])

    def _should_continue(self, text, round_index, accumulated):
        self.probe_calls.append(round_index)
        return False  # the probe says stop after round 0's glean


def test_gleaning_rounds_merge_with_order_precedence():
    """Gleaned records append AFTER round-0 records; the order-sensitive
    merge gives them precedence (last non-empty type) and unions
    descriptions/weights — the reference protocol's merge interaction."""
    from knowledge_graph_ray.stages.canonicalize import (
        canonicalize_entities,
        canonicalize_relationships,
    )

    chunks = pa.Table.from_pylist(
        [
            {
                "chunk_id": "c0",
                "doc_id": "d0",
                "chunk_index": 0,
                "text": "Alpha works with Beta.",
            }
        ]
    )
    # the extractor class lives in this test module, which Ray workers
    # can't import — run extraction locally, merge distributed
    mentions = rd.from_arrow(GleaningExtractor()(chunks))
    ents = canonicalize_entities(mentions).to_pandas().set_index("name")
    rels = canonicalize_relationships(mentions).to_pandas()

    alpha = ents.loc["ALPHA"]
    # glean-round type overrides round-0 'PERSON' (later order_key wins)
    assert alpha["type"] == "DEITY"
    assert "gleaned alpha desc" in alpha["description"]
    assert "Alpha works with Beta." in alpha["description"]
    # round-2 glean never ran (probe stopped): no 'ghost'
    assert "never" not in alpha["description"]
    # relationship weights summed across rounds: 1.0 + 2.0
    edge = rels[(rels.src == "ALPHA") & (rels.dst == "BETA")].iloc[0]
    assert edge["weight"] == pytest.approx(3.0)
    assert "gleaned rel" in edge["description"]


def test_gleaning_probe_call_protocol():
    ext = GleaningExtractor()
    raw = ext._extract_all_rounds("Alpha works with Beta.")
    assert ext.glean_calls == [0]      # round-1 glean ran
    assert ext.probe_calls == [0]      # probe asked once, answered stop
    assert "deity" in raw and "ghost" not in raw


# ------------------------------------------------------------- M7 resolution


def test_resolve_claims_normalizes_and_maps():
    from knowledge_graph_ray.stages.claims import CLAIM_SCHEMA, resolve_claims

    rows = [
        {
            "chunk_id": "c0", "order_key": "d0:0:0",
            "subject_id": "hart &amp; sons\x01", "object_id": "ACME",
            "type": "T", "status": "TRUE", "start_date": "NONE",
            "end_date": "NONE", "description": "d", "source_text": ["s"],
            "doc_id": "d0",
        }
    ]
    claims = rd.from_arrow(pa.Table.from_pylist(rows, schema=CLAIM_SCHEMA))
    resolution = rd.from_items(
        [{"surface": "ACME", "canonical": "ACME CORPORATION"}]
    )
    # broadcast path
    out = resolve_claims(claims, resolution).to_pandas().iloc[0]
    assert out["subject_id"] == "HART & SONS"  # clean_str + upper
    assert out["object_id"] == "ACME CORPORATION"  # resolution dict applied
    # shuffle path (forced) matches
    out2 = resolve_claims(claims, resolution, broadcast_max=0).to_pandas().iloc[0]
    assert out2["subject_id"] == out["subject_id"]
    assert out2["object_id"] == out["object_id"]


def test_pipeline_claim_subjects_join_entity_table():
    """Claims produced by the full pipeline carry canonical entity keys
    (M7 done-criterion: claim subjects are a subset of entity names)."""
    from knowledge_graph_ray.config import PipelineConfig
    from knowledge_graph_ray.corpus import generate_corpus_table
    from knowledge_graph_ray.pipelines.build import build_knowledge_graph

    docs = rd.from_arrow(generate_corpus_table(120, seed=6969)).repartition(2)
    cfg = PipelineConfig(chunk_size=64, chunk_overlap=16,
                         extract_concurrency=1, extract_claims=True)
    tables = build_knowledge_graph(docs, cfg, num_partitions=4)
    subjects = set(tables.claims.to_pandas()["subject_id"])
    entities = set(tables.entities.to_pandas()["name"])
    assert subjects, "corpus should produce claims"
    assert subjects <= entities, subjects - entities


# ---------------------------------------------------------------- M9 parser


@pytest.mark.parametrize(
    "raw,expected",
    [
        ('{"a": 1}', {"a": 1}),
        ('text before ```json\n{"t": "x"}\n``` after', {"t": "x"}),
        ('{"a": [1, 2,], }', {"a": [1, 2]}),
        ("{'k': 'v'}", {"k": "v"}),
        ('{k: "v"}', {"k": "v"}),
        ('{"a": {"b": [1', {"a": {"b": [1]}}),  # truncated output
        ("not json at all", {}),
        ("[1, 2]", {}),  # non-dict payload rejected
    ],
)
def test_try_parse_json_object(raw, expected):
    from knowledge_graph_ray.functions.jsonx import try_parse_json_object

    _, got = try_parse_json_object(raw)
    assert got == expected


def test_raw_json_composer_recovers_messy_llm_output():
    """A fake LLM emitting fenced/trailing-comma JSON flows through the
    composer seam; malformed output degrades to defaults, not a crash."""
    from knowledge_graph_ray.stages.report import RawJsonReportComposer

    class FakeLLMComposer(RawJsonReportComposer):
        def _generate_raw(self, community, level, context):
            if community == "bad":
                return "the model refused to answer"
            return (
                "Sure! Here is the report:\n```json\n"
                '{"title": "T-' + community + '", "summary": "S", '
                '"rating": 7.5, "findings": [{"summary": "f"},],}\n```'
            )

    nodes = pd.DataFrame(
        {"name": ["A"], "type": ["org"], "description": ["d"], "degree": [1.0]}
    )
    edges = pd.DataFrame(columns=["src", "dst", "rank", "description"])
    good = FakeLLMComposer().compose("c1", 0, nodes, edges, 100, None)
    assert good["title"] == "T-c1"
    assert good["rank"] == 7.5
    assert json.loads(good["findings"]) == [{"summary": "f"}]
    bad = FakeLLMComposer().compose("bad", 0, nodes, edges, 100, None)
    assert bad["title"] == "Community bad"
    assert bad["rank"] == 0.0


def test_generate_reports_with_custom_composer():
    """The composer seam plugs into the distributed report stage."""
    from knowledge_graph_ray.stages.report import RawJsonReportComposer, generate_reports

    class FakeLLMComposer(RawJsonReportComposer):
        def _generate_raw(self, community, level, context):
            return '{"title": "LLM-%s", "summary": "s", "rating": 3}' % community

    communities = rd.from_items(
        [{"level": 0, "community": "cX", "name": "A"},
         {"level": 0, "community": "cX", "name": "B"}]
    )
    entities = rd.from_items(
        [{"name": "A", "type": "org", "description": "da", "degree": 1.0},
         {"name": "B", "type": "org", "description": "db", "degree": 1.0}]
    )
    rels = rd.from_items(
        [{"src": "A", "dst": "B", "weight": 1.0, "rank": 2.0,
          "description": "edge"}]
    )
    reports = generate_reports(communities, entities, rels, 4,
                               composer=FakeLLMComposer()).to_pandas()
    assert list(reports["title"]) == ["LLM-cX"]
    assert reports["rank"].iloc[0] == 3.0
