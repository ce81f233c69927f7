"""Chunker tests: window math (FIXTURES.md F4) + the per-row span-sequence
invariant from BASELINE.json input_hint: (kind, text, media_ref, order)
must be preserved end-to-end."""

import pyarrow as pa

from knowledge_graph_ray.corpus import CORPUS_SCHEMA, generate_corpus_table
from knowledge_graph_ray.functions.text import token_count
from knowledge_graph_ray.stages.chunk import chunk_spans_batch


def _doc(doc_id, spans):
    return pa.Table.from_pylist([{"doc_id": doc_id, "spans": spans}], schema=CORPUS_SCHEMA)


def _text_span(text, offset=0):
    return {"kind": "text", "text": text, "media_ref": "", "offset": offset}


def test_window_math():
    # K tokens -> windows of size C stepping C-O (split_texts/run.py:16-19)
    words = " ".join(f"w{i}" for i in range(250))
    out = chunk_spans_batch(_doc("d", [_text_span(words)]), chunk_size=100, chunk_overlap=20)
    rows = out.to_pylist()
    # 250 tokens, windows start at 0, 80, 160 -> 3 chunks
    assert [r["chunk_index"] for r in rows] == [0, 1, 2]
    assert rows[0]["n_tokens"] == 100 and rows[1]["n_tokens"] == 100
    assert rows[2]["n_tokens"] == 90
    # overlap: last 20 tokens of chunk 0 == first 20 of chunk 1
    assert rows[0]["text"].split()[-20:] == rows[1]["text"].split()[:20]


def test_small_doc_single_chunk():
    out = chunk_spans_batch(_doc("d", [_text_span("only a few tokens here")]))
    rows = out.to_pylist()
    assert len(rows) == 1
    assert rows[0]["n_tokens"] == token_count("only a few tokens here")
    assert rows[0]["text"] == "only a few tokens here"


def test_media_only_doc_passthrough():
    spans = [
        {"kind": "image", "text": "", "media_ref": "media://image/1-0", "offset": 0},
        {"kind": "audio", "text": "", "media_ref": "media://audio/1-1", "offset": 1},
    ]
    rows = chunk_spans_batch(_doc("d", spans)).to_pylist()
    assert len(rows) == 1
    assert rows[0]["text"] == "" and rows[0]["n_tokens"] == 0
    assert rows[0]["span_seq"] == spans


def test_span_sequence_invariant_on_corpus():
    """Union of chunk span_seqs (dedup by offset, ordered) == original spans."""
    docs = generate_corpus_table(200, seed=6969)
    chunks = chunk_spans_batch(docs, chunk_size=64, chunk_overlap=16).to_pylist()
    by_doc: dict[str, dict[int, dict]] = {}
    for c in chunks:
        acc = by_doc.setdefault(c["doc_id"], {})
        for span in c["span_seq"]:
            prev = acc.get(span["offset"])
            if prev is not None:
                assert prev == span  # same span object everywhere it appears
            acc[span["offset"]] = span
    for row in docs.to_pylist():
        got = [s for _, s in sorted(by_doc[row["doc_id"]].items())]
        assert got == row["spans"], row["doc_id"]


def test_media_span_between_text_spans_is_covered():
    spans = [
        _text_span("alpha beta gamma delta", 0),
        {"kind": "image", "text": "", "media_ref": "media://image/x", "offset": 22},
        _text_span("epsilon zeta eta theta", 23),
    ]
    rows = chunk_spans_batch(_doc("d", spans), chunk_size=3, chunk_overlap=1).to_pylist()
    covered = {s["offset"] for r in rows for s in r["span_seq"]}
    assert covered == {0, 22, 23}


def test_carry_span_text_flag():
    """Scale mode: span text blanked, structural invariant kept."""
    docs = generate_corpus_table(30, seed=6969)
    lean = chunk_spans_batch(docs, chunk_size=64, chunk_overlap=16,
                             carry_span_text=False).to_pylist()
    full = chunk_spans_batch(docs, chunk_size=64, chunk_overlap=16).to_pylist()
    assert len(lean) == len(full)
    for a, b in zip(lean, full):
        assert a["text"] == b["text"]  # chunk text unaffected
        assert [(s["kind"], s["media_ref"], s["offset"]) for s in a["span_seq"]] == [
            (s["kind"], s["media_ref"], s["offset"]) for s in b["span_seq"]
        ]
        for s in a["span_seq"]:
            if s["kind"] == "text":
                assert s["text"] == ""
            else:
                assert s["media_ref"]


def test_sentence_chunker():
    from knowledge_graph_ray.stages.chunk import chunk_sentences_batch

    spans = [
        _text_span("First sentence. Second one! Third?", 0),
        {"kind": "image", "text": "", "media_ref": "media://image/z", "offset": 40},
    ]
    rows = chunk_sentences_batch(_doc("d", spans)).to_pylist()
    assert [r["text"] for r in rows] == ["First sentence.", "Second one!", "Third?"]
    assert [r["chunk_index"] for r in rows] == [0, 1, 2]
    # media attached to the first chunk
    assert any(s["kind"] == "image" for s in rows[0]["span_seq"])
    assert rows[0]["n_tokens"] == 3
