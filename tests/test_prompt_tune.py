"""Prompt-tuning pipeline tests (pipelines/prompt_tune.py).

The offline tests run the full reference flow (api.py:25-152,
cli.py:14-43) over the deterministic stand-in model; the mocked-endpoint
test drives the SAME flow through the OpenAI-compatible client against a
localhost server, proving the live seam slots in unchanged.
"""

import json

import ray.data

from knowledge_graph_ray.corpus import generate_corpus_table
from knowledge_graph_ray.pipelines.prompt_tune import (
    COMMUNITY_SUMMARIZATION_FILENAME,
    ENTITY_EXTRACTION_FILENAME,
    ENTITY_SUMMARIZATION_FILENAME,
    create_entity_extraction_prompt,
    generate_indexing_prompts,
    load_docs_in_chunks,
    prompt_tune,
)


def _docs(n=40):
    return ray.data.from_arrow(generate_corpus_table(n, seed=6969)).repartition(2)


def test_load_docs_in_chunks_bounded_and_deterministic():
    docs = _docs()
    a = load_docs_in_chunks(docs, chunk_size=64, chunk_overlap=16,
                            sample_size=5)
    b = load_docs_in_chunks(_docs(), chunk_size=64, chunk_overlap=16,
                            sample_size=5)
    assert len(a) == 5
    assert a == b  # seeded hash order, independent of block layout
    assert all(isinstance(t, str) and t for t in a)


def test_generate_indexing_prompts_offline():
    extraction, summarization, community = generate_indexing_prompts(
        _docs(), chunk_size=64, chunk_overlap=16, sample_size=4,
    )
    # extraction prompt: examples packed, {input_text} slot survives for
    # the indexing run, entity types inlined
    assert "Example 1:" in extraction and "Example 2:" in extraction
    assert "{input_text}" in extraction
    # summarization prompt: persona + slots for the summarize stage
    assert summarization.startswith("You are")
    assert "{entity_name}" in summarization
    assert "{description_list}" in summarization
    # community prompt: rating scale + reporter role + JSON contract
    assert "Importance rating scale" in community
    assert "rating_explanation" in community
    assert "{input_text}" in community


def test_prompt_tune_writes_reference_filenames(tmp_path):
    paths = prompt_tune(_docs(), output=str(tmp_path / "out"),
                        chunk_size=64, chunk_overlap=16, sample_size=3)
    assert set(paths) == {
        ENTITY_EXTRACTION_FILENAME,
        ENTITY_SUMMARIZATION_FILENAME,
        COMMUNITY_SUMMARIZATION_FILENAME,
    }
    for p in paths.values():
        text = open(p, encoding="utf-8").read()
        assert len(text) > 100


def test_extraction_prompt_token_budget_and_min_examples():
    """Budget packing per entity_extraction_prompt.py:68-93: the first
    min_examples_required examples always pack; further ones only while
    they fit the token budget."""
    docs = [f"doc {i} " + "tok " * 200 for i in range(6)]
    examples = [f'("entity"|E{i}|type|desc)' for i in range(6)]
    tight = create_entity_extraction_prompt(
        ["organization"], docs, examples, "English",
        max_token_count=500, min_examples_required=2,
    )
    assert "Example 1:" in tight and "Example 2:" in tight
    assert "Example 4:" not in tight
    loose = create_entity_extraction_prompt(
        ["organization"], docs, examples, "English",
        max_token_count=100_000, min_examples_required=2,
    )
    assert "Example 6:" in loose
    # untyped path: the budget must apply too (the reference's
    # conditional-expression precedence zeroes it — corrected)
    untyped_loose = create_entity_extraction_prompt(
        None, docs, examples, "English",
        max_token_count=100_000, min_examples_required=2,
    )
    assert "Example 6:" in untyped_loose
    untyped_tight = create_entity_extraction_prompt(
        None, docs, examples, "English",
        max_token_count=500, min_examples_required=2,
    )
    assert "Example 2:" in untyped_tight
    assert "Example 4:" not in untyped_tight


def test_prompt_tune_against_mocked_endpoint(tmp_path):
    """Live-seam parity: the same pipeline through OpenAIChatClient and a
    canned localhost chat-completions server."""
    from llm_mock import canned_chat_server

    from knowledge_graph_ray.stages.llm import OpenAIChatClient

    def reply(messages):
        last = messages[-1]["content"]
        if last.startswith("You are an expert data analyst."):
            return "renewable energy"
        if last.startswith("Name the primary natural language"):
            return "English"
        if last.startswith("Craft a one-paragraph expert persona"):
            return "You are a renewable-energy analyst."
        if "importance rating scale" in last:
            return "0 trivial ... 10 critical."
        if "List the entity types" in last:
            return "organization, person, technology"
        if "Output one record per line" in last:
            return '("entity"|HELIOS|organization|a company)'
        if "one-sentence role definition" in last:
            return "A grid analyst that maps market structure."
        return "OK"

    with canned_chat_server(reply) as base_url:
        client = OpenAIChatClient(base_url=base_url, api_key="k", model="m")
        paths = prompt_tune(_docs(20), output=str(tmp_path / "live"),
                            client=client, chunk_size=64, chunk_overlap=16,
                            sample_size=3)
    extraction = open(paths[ENTITY_EXTRACTION_FILENAME]).read()
    assert "organization, person, technology" in extraction
    assert "HELIOS" in extraction
    community = open(paths[COMMUNITY_SUMMARIZATION_FILENAME]).read()
    assert "renewable-energy analyst" in community
    assert "grid analyst" in community
