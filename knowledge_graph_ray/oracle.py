"""Differential oracle: faithful sequential reimplementation of the
reference's graph-merge semantics (for tests only — never in the Ray path).

Replays /root/reference/graph/extractors/graph_extractor.py:196-292
(``_process_results``) exactly: one networkx.Graph, records processed in
document order, set-union description/source merges, last-non-empty type,
stub endpoint nodes, summed undirected edge weights.  The differential
test (tests/test_differential.py) feeds identical per-chunk wire outputs
to this oracle and to the Ray pipeline and requires triple P/R >= 0.95
(it is exactly 1.0 by construction) plus description/source SET equality.
"""

from __future__ import annotations

import re

import networkx as nx

from knowledge_graph_ray.config import RECORD_DELIMITER, TUPLE_DELIMITER
from knowledge_graph_ray.functions.text import clean_str

_PARENS = re.compile(r"^\(|\)$")


def _unpack_descriptions(data) -> list[str]:
    value = data.get("description", None)
    return [] if value is None else value.split("\n")


def _unpack_source_ids(data) -> list[str]:
    value = data.get("source_id", None)
    return [] if value is None else value.split(", ")


def process_results(results: dict[str, str]) -> nx.Graph:
    """``results`` maps source chunk id -> raw wire output, in processing
    order (the reference iterates the dict in insertion order)."""
    graph = nx.Graph()
    for source_doc_id, extracted_data in results.items():
        records = [r.strip() for r in extracted_data.split(RECORD_DELIMITER)]
        for record in records:
            record = _PARENS.sub("", record.strip())
            attrs = record.split(TUPLE_DELIMITER)
            if attrs[0] == '"entity"' and len(attrs) >= 4:
                entity_name = clean_str(attrs[1].upper())
                entity_type = clean_str(attrs[2].upper())
                entity_description = clean_str(attrs[3])
                if entity_name in graph.nodes():
                    node = graph.nodes[entity_name]
                    node["description"] = "\n".join(
                        list({*_unpack_descriptions(node), entity_description})
                    )
                    node["source_id"] = ", ".join(
                        list({*_unpack_source_ids(node), str(source_doc_id)})
                    )
                    node["type"] = (
                        entity_type if entity_type != "" else node["type"]
                    )
                else:
                    graph.add_node(
                        entity_name,
                        type=entity_type,
                        description=entity_description,
                        source_id=str(source_doc_id),
                    )
            if attrs[0] == '"relationship"' and len(attrs) >= 5:
                source = clean_str(attrs[1].upper())
                target = clean_str(attrs[2].upper())
                edge_description = clean_str(attrs[3])
                edge_source_id = clean_str(str(source_doc_id))
                try:
                    weight = float(attrs[-1])
                except ValueError:
                    weight = 1.0
                for endpoint in (source, target):
                    if endpoint not in graph.nodes():
                        graph.add_node(
                            endpoint, type="", description="", source_id=edge_source_id
                        )
                if graph.has_edge(source, target):
                    edge_data = graph.get_edge_data(source, target)
                    weight += edge_data["weight"]
                    edge_description = "\n".join(
                        list({*_unpack_descriptions(edge_data), edge_description})
                    )
                    edge_source_id = ", ".join(
                        list({*_unpack_source_ids(edge_data), str(source_doc_id)})
                    )
                graph.add_edge(
                    source,
                    target,
                    weight=weight,
                    description=edge_description,
                    source_id=edge_source_id,
                )
    return graph


def graph_to_tables(graph: nx.Graph):
    """Oracle graph -> (entities, relationships) comparable dicts.

    Descriptions/sources compared as SETS (the reference's set-iteration
    order is nondeterministic — SURVEY.md §7.5).
    """
    entities = {
        name: {
            "type": d.get("type", ""),
            "descriptions": frozenset(_unpack_descriptions(d)),
            "sources": frozenset(_unpack_source_ids(d)),
        }
        for name, d in graph.nodes(data=True)
    }
    rels = {}
    for a, b, d in graph.edges(data=True):
        key = (a, b) if a <= b else (b, a)
        rels[key] = {
            "weight": d["weight"],
            "descriptions": frozenset(_unpack_descriptions(d)),
            "sources": frozenset(_unpack_source_ids(d)),
        }
    return entities, rels
