"""Delimited-record protocol: the reference's LLM output wire format.

Parsers are byte-faithful reimplementations of the reference semantics
(SURVEY.md M4 / M6) so triple P/R vs the reference oracle is exact:

* graph records — /root/reference/graph/extractors/graph_extractor.py:196-292
  ``("entity"<|>NAME<|>TYPE<|>desc)##`` arity>=4,
  ``("relationship"<|>SRC<|>DST<|>desc<|>weight)##`` arity>=5, weight
  ``float(last)`` with 1.0 fallback; names/types uppercased through
  ``clean_str``; the literal first field INCLUDES the double quotes.
* claim records — /root/reference/graph/claims/graph_claims.py:218-259
  positional 9-field pull with per-field strip, None when missing.

Formatters produce the same wire format (used by the deterministic
pattern extractor so the parser path is shared between LLM and
pattern strategies, like the reference's strategy loaders).
"""

from __future__ import annotations

import re
from typing import Any

from knowledge_graph_ray.config import (
    COMPLETION_DELIMITER,
    RECORD_DELIMITER,
    TUPLE_DELIMITER,
)
from knowledge_graph_ray.functions.text import clean_str

_PARENS = re.compile(r"^\(|\)$")


def parse_graph_records(
    extracted: str,
    tuple_delimiter: str = TUPLE_DELIMITER,
    record_delimiter: str = RECORD_DELIMITER,
) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
    """Parse one extraction output into (entity_mentions, rel_mentions).

    Mirrors graph_extractor.py:196-292 record handling exactly, but emits
    flat mention rows instead of mutating a global nx.Graph — merging is
    the canonicalization shuffle's job (SURVEY.md G1/G2).
    ``order`` is the record index within this output, used downstream for
    the reference's "last non-empty type wins" merge rule.
    """
    entities: list[dict[str, Any]] = []
    rels: list[dict[str, Any]] = []
    records = [r.strip() for r in extracted.split(record_delimiter)]
    for order, record in enumerate(records):
        record = _PARENS.sub("", record.strip())
        attrs = record.split(tuple_delimiter)
        if attrs[0] == '"entity"' and len(attrs) >= 4:
            entities.append(
                {
                    "name": clean_str(attrs[1].upper()),
                    "type": clean_str(attrs[2].upper()),
                    "description": clean_str(attrs[3]),
                    "order": order,
                }
            )
        if attrs[0] == '"relationship"' and len(attrs) >= 5:
            try:
                weight = float(attrs[-1])
            except ValueError:
                weight = 1.0
            rels.append(
                {
                    "src": clean_str(attrs[1].upper()),
                    "dst": clean_str(attrs[2].upper()),
                    "description": clean_str(attrs[3]),
                    "weight": weight,
                    "order": order,
                }
            )
    return entities, rels


def parse_claim_records(
    claims_text: str,
    tuple_delimiter: str = TUPLE_DELIMITER,
    record_delimiter: str = RECORD_DELIMITER,
    completion_delimiter: str = COMPLETION_DELIMITER,
) -> list[dict[str, Any]]:
    """Parse claim tuples (graph_claims.py:218-259): positional 9 fields."""

    def pull(index: int, fields: list[str]) -> str | None:
        return fields[index].strip() if len(fields) > index else None

    result: list[dict[str, Any]] = []
    values = claims_text.strip().removesuffix(completion_delimiter).split(record_delimiter)
    for claim in values:
        claim = claim.strip().removeprefix("(").removesuffix(")")
        if claim == completion_delimiter or not claim:
            continue
        fields = claim.split(tuple_delimiter)
        result.append(
            {
                "subject_id": pull(0, fields),
                "object_id": pull(1, fields),
                "type": pull(2, fields),
                "status": pull(3, fields),
                "start_date": pull(4, fields),
                "end_date": pull(5, fields),
                "description": pull(6, fields),
                "source_text": pull(7, fields),
                "doc_id": pull(8, fields),
            }
        )
    return result


def format_entity_record(name: str, type_: str, description: str) -> str:
    return f'("entity"{TUPLE_DELIMITER}{name}{TUPLE_DELIMITER}{type_}{TUPLE_DELIMITER}{description})'


def format_relationship_record(src: str, dst: str, description: str, weight: float) -> str:
    return (
        f'("relationship"{TUPLE_DELIMITER}{src}{TUPLE_DELIMITER}{dst}'
        f"{TUPLE_DELIMITER}{description}{TUPLE_DELIMITER}{weight:g})"
    )


def join_records(records: list[str]) -> str:
    """Assemble records into one wire-format output ending in <|COMPLETE|>."""
    if not records:
        return COMPLETION_DELIMITER
    return RECORD_DELIMITER.join(records) + RECORD_DELIMITER + COMPLETION_DELIMITER
