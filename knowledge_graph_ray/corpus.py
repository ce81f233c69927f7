"""Deterministic synthetic corpus of interleaved text+media documents.

Implements FIXTURES.md F1: the authoritative input table shape per
BASELINE.json ``input_hint``::

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string, offset: int32>>

Text spans contain planted entity mentions from a closed vocabulary
(types per the reference DEFAULT_ENTITY_TYPES,
/root/reference/verbs/entities/extraction/entity_extract.py:23) and
planted relationship sentences, so the exact expected (subj, pred, obj)
triple set is computable.  Includes the fixture requirements:

* duplicate mentions across docs (exercises description set-union +
  weight summation, reference graph_extractor.py:212-227, 267-283)
* case / HTML-escape variants of one surface form (exercises
  ``clean_str(name.upper())`` normalization, utils/string.py:11-19)
* one hub entity in ~10% of docs (exercises skew handling)
* docs with media-only spans (chunker must pass them through untouched)

Everything is keyed off ``(seed, doc_index)`` so any shard of the corpus
can be regenerated independently — this is what makes the generator
usable as a distributed source at bench scale (each Ray read task
generates its own range of doc indices; no driver-side materialization).
"""

from __future__ import annotations

import random

import pyarrow as pa

# --- closed vocabulary -------------------------------------------------------
# (surface form, type).  Types uppercased downstream by the extraction protocol.
ORGS = [
    "Helios Energy",  # hub entity — planted in ~10% of docs
    "Borealis Labs",
    "Cascade Bank",
    "Meridian Press",
    "Atlas Logistics",
    "Quantum Foundry",
    "Redwood Capital",
    "Novus Media",
    "Hart & Sons",  # '&' exercises html-escape variants
]
PERSONS = [
    "Ada Winter",
    "Boris Chen",
    "Clara Mendez",
    "Dmitri Novak",
    "Elena Ruiz",
    "Felix Okafor",
    "Grace Liu",
    "Hugo Alvarez",
]
GEOS = [
    "Port Aurora",
    "Silverlake City",
    "Mount Verity",
    "Easton Harbor",
    "Karelia Province",
    "Delta Springs",
]
EVENTS = [
    "Summit of Tides",
    "Harvest Festival",
    "Orion Conference",
    "Lumen Expo",
]

VOCABULARY: list[tuple[str, str]] = (
    [(n, "organization") for n in ORGS]
    + [(n, "person") for n in PERSONS]
    + [(n, "geo") for n in GEOS]
    + [(n, "event") for n in EVENTS]
)

# relationship verbs with fixed weights (deterministic stand-in for the
# LLM-assigned relationship_strength, reference graph/extractors/prompt.py)
REL_VERBS: list[tuple[str, float]] = [
    ("partnered with", 2.0),
    ("acquired", 3.0),
    ("is located in", 1.0),
    ("hosted", 4.0),
    ("works for", 2.0),
    ("visited", 1.0),
]

FILLER_WORDS = (
    "the market report noted steady growth across regional supply chains "
    "while analysts expected further updates after the quarterly review"
).split()

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
CORPUS_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))]
)

HUB_ENTITY = ORGS[0]
ESCAPED_ENTITY = "Hart & Sons"


def _variant(rng: random.Random, name: str) -> str:
    """Render a surface-form variant that still normalizes to the same key."""
    roll = rng.random()
    if "&" in name and roll < 0.5:
        return name.replace("&", "&amp;")
    if roll < 0.15:
        return name.upper()
    if roll < 0.3:
        return name.lower()
    return name


def _sentence(rng: random.Random, doc_index: int) -> tuple[str, list]:
    """One sentence; returns (text, planted relationship or None)."""
    roll = rng.random()
    if roll < 0.45:  # relationship sentence with two entities
        a, _ = rng.choice(VOCABULARY)
        b, _ = rng.choice(VOCABULARY)
        while b == a:
            b, _ = rng.choice(VOCABULARY)
        verb, weight = rng.choice(REL_VERBS)
        text = f"{_variant(rng, a)} {verb} {_variant(rng, b)}."
        return text, [(a, b, verb, weight)]
    if roll < 0.8:  # single-entity sentence
        a, _ = rng.choice(VOCABULARY)
        filler = " ".join(rng.choices(FILLER_WORDS, k=rng.randint(3, 8)))
        text = f"{_variant(rng, a)} {filler}."
        return text, []
    filler = " ".join(rng.choices(FILLER_WORDS, k=rng.randint(5, 12)))
    return filler.capitalize() + ".", []


def generate_doc(doc_index: int, seed: int = 6969) -> dict:
    """One interleaved document, fully determined by (seed, doc_index)."""
    rng = random.Random(f"{seed}:{doc_index}")
    spans: list[dict] = []
    offset = 0
    media_only = rng.random() < 0.03
    n_spans = rng.randint(1, 2) if media_only else rng.randint(1, 5)
    for si in range(n_spans):
        is_media = media_only or (si > 0 and rng.random() < 0.25)
        if is_media:
            kind = rng.choice(["image", "audio", "table"])
            spans.append(
                {
                    "kind": kind,
                    "text": "",
                    "media_ref": f"media://{kind}/{doc_index}-{si}",
                    "offset": offset,
                }
            )
            offset += 1  # media occupies one logical position
        else:
            sentences = []
            n_sent = rng.randint(2, 6)
            if si == 0 and rng.random() < 0.10:
                # hub entity sentence — creates the hot key for skew tests
                verb, _w = REL_VERBS[0]
                other, _ = rng.choice(VOCABULARY[1:])
                sentences.append(f"{HUB_ENTITY} {verb} {_variant(rng, other)}.")
            for _ in range(n_sent):
                s, _rels = _sentence(rng, doc_index)
                sentences.append(s)
            text = " ".join(sentences)
            spans.append(
                {"kind": "text", "text": text, "media_ref": "", "offset": offset}
            )
            offset += len(text)
    return {"doc_id": f"doc-{doc_index:08d}", "spans": spans}


def generate_corpus_table(num_docs: int, seed: int = 6969, start: int = 0) -> pa.Table:
    """Arrow table of ``num_docs`` docs starting at ``start`` (shardable)."""
    docs = [generate_doc(i, seed) for i in range(start, start + num_docs)]
    return pa.Table.from_pylist(docs, schema=CORPUS_SCHEMA)


def read_corpus(num_docs: int, seed: int = 6969, shard_size: int = 2048,
                materialize: bool = True):
    """Distributed corpus source: one Ray generation task per shard.

    One-row shard descriptors fan out to ``map_batches`` generation tasks
    (no doc touches the driver).  ``materialize=True`` (default) pins the
    generated docs in the object store so downstream stages see one block
    per shard — WITHOUT it, Ray fuses the generator into the downstream
    actor pool and that stage's row-oriented ``batch_size`` coalesces the
    tiny descriptor blocks into a single batch, collapsing the whole
    pipeline to one task (measured: 1 task for a 100k-doc corpus).  A
    real deployment reads Lance/Parquet instead; this source exists for
    tests and bench.
    """
    import ray.data

    shards = [
        {"start": s, "count": min(shard_size, num_docs - s), "seed": seed}
        for s in range(0, num_docs, shard_size)
    ]

    def gen_batches(batch: pa.Table):
        for row in batch.to_pylist():
            yield generate_corpus_table(
                row["count"], seed=row["seed"], start=row["start"]
            )

    ds = ray.data.from_arrow(
        pa.Table.from_pylist(shards)
    ).repartition(len(shards)).map_batches(
        gen_batches, batch_format="pyarrow", batch_size=1
    )
    return ds.materialize() if materialize else ds


def docs_table_to_interleaved(batch: pa.Table) -> pa.Table:
    """Wrap a flat ``documents(doc_id:int64, text, ...)`` batch (the driver's
    /root/testdata tables, FIXTURES.md F5) into the interleaved-span schema:
    one ``kind='text'`` span per doc."""
    doc_ids = [str(d) for d in batch.column("doc_id").to_pylist()]
    texts = batch.column("text").to_pylist()
    spans = [
        [{"kind": "text", "text": t or "", "media_ref": "", "offset": 0}]
        for t in texts
    ]
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans}, schema=CORPUS_SCHEMA
    )
