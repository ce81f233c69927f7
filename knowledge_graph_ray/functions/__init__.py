from knowledge_graph_ray.functions.text import (
    clean_str,
    normalize_name,
    tokenize,
    token_count,
    token_spans,
)
from knowledge_graph_ray.functions.records import (
    parse_graph_records,
    parse_claim_records,
    format_entity_record,
    format_relationship_record,
)

__all__ = [
    "clean_str",
    "normalize_name",
    "tokenize",
    "token_count",
    "token_spans",
    "parse_graph_records",
    "parse_claim_records",
    "format_entity_record",
    "format_relationship_record",
]
