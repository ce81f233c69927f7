"""Claim (covariate) extraction + merge.

Reference: per-chunk LLM claim extraction with the 9-field positional
tuple protocol (/root/reference/graph/claims/graph_claims.py:29-259),
then a groupby(subject_id) merge
(verbs/covariates/extract_covariates.py:69-83): description ' '-joined in
row order, source_text flatten+set, doc_id ', '-joined, first-non-None
for the remaining fields.  Optional stage — the reference flag
EXTRACT_COVARIATES (config.py:53) defaults False.

Ray-Data-native: an actor-pool extractor emitting claim rows through the
shared wire-format parser, then ``groupby(subject_id).map_groups`` with a
stable pre-sort on order_key so "first"/"join order" is deterministic
(the reference's order is document processing order).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.config import TUPLE_DELIMITER
from knowledge_graph_ray.corpus import REL_VERBS, VOCABULARY
from knowledge_graph_ray.functions.records import join_records, parse_claim_records

CLAIM_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.string()),
        ("order_key", pa.string()),
        ("subject_id", pa.string()),
        ("object_id", pa.string()),
        ("type", pa.string()),
        ("status", pa.string()),
        ("start_date", pa.string()),
        ("end_date", pa.string()),
        ("description", pa.large_string()),
        ("source_text", pa.list_(pa.large_string())),
        ("doc_id", pa.string()),
    ]
)

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+|\n+")


class PatternClaimExtractor:
    """Deterministic claim strategy: relationship sentences become claims
    of type = verb, status TRUE (LLM stand-in; same wire protocol)."""

    def __init__(self, vocabulary=None, rel_verbs=None):
        vocab = vocabulary if vocabulary is not None else VOCABULARY
        verbs = rel_verbs if rel_verbs is not None else REL_VERBS
        alts = sorted((n for n, _ in vocab), key=len, reverse=True)
        pattern = "|".join(
            re.escape(n).replace(re.escape("&"), "(?:&|&amp;)") for n in alts
        )
        self.entity_re = re.compile(rf"\b(?:{pattern})\b", re.IGNORECASE)
        self.verb_res = [
            (re.compile(rf"\b{re.escape(v)}\b", re.IGNORECASE), v) for v, _ in verbs
        ]

    def _extract_raw(self, text: str) -> str:
        records = []
        for sentence in _SENT_SPLIT.split(text):
            matches = list(self.entity_re.finditer(sentence))
            if len(matches) < 2:
                continue
            a, b = matches[0], matches[1]
            between = sentence[a.end() : b.start()]
            for verb_re, verb in self.verb_res:
                if verb_re.search(between):
                    fields = [
                        a.group(0).upper(),
                        b.group(0).upper(),
                        verb.upper().replace(" ", "_"),
                        "TRUE",
                        "NONE",
                        "NONE",
                        f"{a.group(0)} {verb} {b.group(0)}",
                        sentence.strip(),
                    ]
                    records.append("(" + TUPLE_DELIMITER.join(fields) + ")")
                    break
        return join_records(records)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for chunk_id, doc_id, ci, text in zip(
            batch.column("chunk_id").to_pylist(),
            batch.column("doc_id").to_pylist(),
            batch.column("chunk_index").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            if not text:
                continue
            for order, claim in enumerate(parse_claim_records(self._extract_raw(text))):
                rows.append(
                    {
                        "chunk_id": chunk_id,
                        "order_key": f"{doc_id}:{ci:08d}:{order:08d}",
                        "subject_id": claim["subject_id"],
                        "object_id": claim["object_id"],
                        "type": claim["type"],
                        "status": claim["status"],
                        "start_date": claim["start_date"],
                        "end_date": claim["end_date"],
                        "description": claim["description"],
                        "source_text": [claim["source_text"]] if claim["source_text"] else [],
                        # doc_id stamped by code, not parsed (graph_claims.py:212-214)
                        "doc_id": doc_id,
                    }
                )
        return pa.Table.from_pylist(rows, schema=CLAIM_SCHEMA)


def extract_claims(text_units, extractor_cls=PatternClaimExtractor,
                   batch_size: int = 256, concurrency=(1, 4), **kwargs):
    return text_units.map_batches(
        extractor_cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


RESOLUTION_BROADCAST_MAX = 2_000_000


def resolve_claims(claims, resolution=None,
                   broadcast_max: int = RESOLUTION_BROADCAST_MAX):
    """Map claim subject/object through the canonical-entity resolution
    (M7, reference graph_claims.py:123-137 ``_clean_claim``): without it,
    claims carry raw surface forms that don't join to the entity table.

    Two layers:

    1. ``normalize_name`` (clean_str + upper) is always applied — the same
       key function entity canonicalization groups by, so html-escaped /
       control-char variants land on the canonical key.
    2. ``resolution`` (optional ``Dataset[(surface, canonical)]``, e.g.
       from alias discovery) is applied after: broadcast dict under
       ``broadcast_max`` rows, partitioned hash_join above it.
    """
    from knowledge_graph_ray.functions.text import normalize_name

    def normalize(batch: pa.Table) -> pa.Table:
        subj = [normalize_name(s) if s else s
                for s in batch.column("subject_id").to_pylist()]
        obj = [normalize_name(o) if o else o
               for o in batch.column("object_id").to_pylist()]
        batch = batch.set_column(
            batch.schema.get_field_index("subject_id"), "subject_id",
            pa.array(subj, type=pa.string()),
        )
        return batch.set_column(
            batch.schema.get_field_index("object_id"), "object_id",
            pa.array(obj, type=pa.string()),
        )

    out = claims.map_batches(normalize, batch_format="pyarrow")
    if resolution is None:
        return out

    if resolution.count() <= broadcast_max:
        import ray

        res = resolution.to_pandas().set_index("surface")["canonical"]
        res_ref = ray.put(res)

        class ApplyResolution:
            def __init__(self):
                self.res = ray.get(res_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                for col in ("subject_id", "object_id"):
                    vals = pd.Series(batch.column(col).to_pylist())
                    mapped = vals.map(self.res).fillna(vals)
                    batch = batch.set_column(
                        batch.schema.get_field_index(col), col,
                        pa.array(mapped.tolist(), type=pa.string()),
                    )
                return batch

        return out.map_batches(ApplyResolution, batch_format="pyarrow",
                               concurrency=(1, 4))

    from knowledge_graph_ray.functions.joins import hash_join, project

    for col in ("subject_id", "object_id"):
        res_ds = project(resolution, {"surface": col, "canonical": "__canon"})
        joined = hash_join(out, res_ds, on=[col], how="left_outer")

        def substitute(batch: pa.Table, col=col) -> pa.Table:
            import pyarrow.compute as pc

            canon = batch.column("__canon")
            orig = batch.column(col)
            merged = pc.if_else(pc.is_null(canon), orig,
                                canon.cast(orig.type))
            batch = batch.set_column(
                batch.schema.get_field_index(col), col, merged
            )
            return batch.drop_columns(["__canon"])

        out = joined.map_batches(substitute, batch_format="pyarrow")
    return out


MERGED_CLAIM_SCHEMA = pa.schema(
    [
        ("subject_id", pa.string()),
        ("object_id", pa.string()),
        ("type", pa.string()),
        ("status", pa.string()),
        ("start_date", pa.string()),
        ("end_date", pa.string()),
        ("description", pa.large_string()),
        ("source_text", pa.list_(pa.large_string())),
        ("doc_id", pa.string()),
        ("n_claims", pa.int64()),
    ]
)


def _merge_claim_group(group: pd.DataFrame) -> pa.Table:
    g = group.sort_values("order_key")

    def first_non_none(col):
        for v in g[col]:
            if v is not None:
                return v
        return None

    source_text = sorted(
        {item for sub in g["source_text"] if sub is not None for item in sub}
    )
    return pa.Table.from_pylist(
        [
            {
                "subject_id": g["subject_id"].iloc[0],
                "object_id": first_non_none("object_id"),
                "type": first_non_none("type"),
                "status": first_non_none("status"),
                "start_date": first_non_none("start_date"),
                "end_date": first_non_none("end_date"),
                "description": " ".join(
                    str(d) for d in g["description"] if d is not None
                ),
                "source_text": source_text,
                "doc_id": ", ".join(d for d in g["doc_id"] if d is not None),
                "n_claims": len(g),
            }
        ],
        schema=MERGED_CLAIM_SCHEMA,
    )


def merge_claims(claims):
    """groupby(subject_id) merge — reference extract_covariates.py:69-83
    (pandas groupby drops null subjects there; dropna=True matches)."""
    from knowledge_graph_ray.functions.grouping import bucketed_group_map

    return bucketed_group_map(
        claims, ["subject_id"], _merge_claim_group,
        dropna=True, empty_schema=MERGED_CLAIM_SCHEMA,
    )
