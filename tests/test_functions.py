"""Unit tests for normalizers + delimited-record parsers (FIXTURES.md F2).

Edge cases mirror the reference parser quirks
(/root/reference/graph/extractors/graph_extractor.py:196-292,
graph/claims/graph_claims.py:218-259).
"""

from knowledge_graph_ray.functions import (
    clean_str,
    normalize_name,
    parse_claim_records,
    parse_graph_records,
    token_count,
    tokenize,
)


def test_clean_str_html_and_control():
    # strip runs BEFORE control-char removal (utils/string.py:17-19), so a
    # space shielded by a control char survives
    assert clean_str("  Hart &amp; Sons \x00\x1f") == "Hart & Sons "
    assert clean_str("  Hart &amp; Sons  ") == "Hart & Sons"
    assert clean_str("a\x7fb\x9fc") == "abc"
    assert clean_str(42) == 42  # non-strings pass through (utils/string.py:14-16)


def test_normalize_name_variants():
    # clean_str(name.upper()) — graph_extractor.py:205
    assert normalize_name("hart &amp; sons") == "HART & SONS"
    assert normalize_name("Helios Energy") == "HELIOS ENERGY"
    assert normalize_name("  helios energy ") == "HELIOS ENERGY"


def test_parse_entity_and_relationship():
    raw = (
        '("entity"<|>Acme<|>organization<|>desc one)##'
        '("relationship"<|>Acme<|>Bob<|>works<|>7)##<|COMPLETE|>'
    )
    ents, rels = parse_graph_records(raw)
    assert ents == [
        {"name": "ACME", "type": "ORGANIZATION", "description": "desc one", "order": 0}
    ]
    assert rels[0]["src"] == "ACME" and rels[0]["dst"] == "BOB"
    assert rels[0]["weight"] == 7.0


def test_parse_arity_gates():
    # <4 fields entity and <5 fields relationship are dropped (arity gates)
    raw = '("entity"<|>A<|>T)##("relationship"<|>A<|>B<|>d)##<|COMPLETE|>'
    ents, rels = parse_graph_records(raw)
    assert ents == [] and rels == []


def test_parse_weight_fallback():
    # non-numeric last field -> weight 1.0 (graph_extractor.py:248-251)
    raw = '("relationship"<|>A<|>B<|>desc<|>heavy)##'
    _, rels = parse_graph_records(raw)
    assert rels[0]["weight"] == 1.0


def test_parse_empty_records_and_parens():
    raw = '##("entity"<|>A<|>T<|>d)## ##<|COMPLETE|>'
    ents, rels = parse_graph_records(raw)
    assert len(ents) == 1 and rels == []


def test_parse_claims_nine_fields():
    raw = "(S<|>O<|>TYPE<|>TRUE<|>2024-01-01T00:00:00<|>2024-01-02T00:00:00<|>desc<|>quote)##<|COMPLETE|>"
    claims = parse_claim_records(raw)
    assert len(claims) == 1
    c = claims[0]
    assert c["subject_id"] == "S" and c["object_id"] == "O"
    assert c["start_date"] == "2024-01-01T00:00:00"
    assert c["doc_id"] is None  # stamped by code, not parsed (graph_claims.py:212-214)


def test_tokenizer_deterministic():
    assert tokenize("Hello, world!") == ["Hello", ",", "world", "!"]
    assert token_count("a b c") == 3
    assert token_count("") == 0


def test_gleaning_seam():
    """Multi-round extraction protocol (reference gleaning loop shape)."""
    from knowledge_graph_ray.stages.extract import PatternExtractor

    class Gleaner(PatternExtractor):
        max_gleanings = 2

        def _glean(self, text, round_index, previous):
            if round_index == 0:
                return '("entity"<|>Extra<|>event<|>gleaned)'
            return None  # second probe says stop

    raw = Gleaner()._extract_all_rounds("Ada Winter visited Port Aurora.")
    ents, _ = parse_graph_records(raw)
    names = {e["name"] for e in ents}
    assert "ADA WINTER" in names and "EXTRA" in names


def test_quarantine_rows():
    """Extractor failures become kind='error' rows, not silent drops."""
    import pyarrow as pa

    from knowledge_graph_ray.stages.chunk import TEXT_UNIT_SCHEMA
    from knowledge_graph_ray.stages.extract import PatternExtractor

    class Exploding(PatternExtractor):
        def _extract_raw(self, text):
            if "boom" in text:
                raise ValueError("bad chunk")
            return super()._extract_raw(text)

    batch = pa.Table.from_pylist(
        [
            {"chunk_id": "c0", "doc_id": "d", "chunk_index": 0,
             "text": "Ada Winter visited Port Aurora.", "n_tokens": 5, "span_seq": []},
            {"chunk_id": "c1", "doc_id": "d", "chunk_index": 1,
             "text": "boom", "n_tokens": 1, "span_seq": []},
        ],
        schema=TEXT_UNIT_SCHEMA,
    )
    out = Exploding()(batch).to_pylist()
    errors = [r for r in out if r["kind"] == "error"]
    assert len(errors) == 1
    assert errors[0]["chunk_id"] == "c1" and errors[0]["type"] == "ValueError"
    assert any(r["kind"] == "entity" for r in out)  # good chunk still extracted


def test_bucketed_group_map_size_hint_regimes_agree():
    """size_hint only picks the regime: hint<=threshold (driver, no
    probe), hint>threshold (distributed, no materialize), and no hint
    (probe) all produce identical groups."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from knowledge_graph_ray.functions.grouping import bucketed_group_map

    df = pd.DataFrame({"k": ["a", "b", "a", "c", "b"], "v": [1, 2, 3, 4, 5]})
    ds = rd.from_pandas(df).repartition(3)

    def agg(sub: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pydict(
            {"k": [sub["k"].iloc[0]], "s": [int(sub["v"].sum())]}
        )

    outs = []
    for kwargs in (
        {"driver_threshold": 100, "size_hint": 5},      # driver, proven small
        {"driver_threshold": 100, "size_hint": 10_000}, # distributed, probe skipped
        {"driver_threshold": 100},                      # probe path
        {"driver_threshold": None},                     # plain distributed
    ):
        out = (
            bucketed_group_map(ds, ["k"], agg, num_buckets=4, **kwargs)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        outs.append(out)
    for other in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], other)


def test_grouped_agg_matches_pandas_all_kinds():
    """grouped_agg (combiner + size-adaptive merge) vs plain pandas on
    sum/count/min/max/mean with null values and null keys, both regimes."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from knowledge_graph_ray.functions.agg import grouped_agg

    rng = np.random.RandomState(4)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", None], n),
            "x": rng.randn(n) * 10,
            "i": rng.randint(0, 100, n).astype("int64"),
        }
    )
    df.loc[rng.choice(n, 50, replace=False), "x"] = np.nan
    ds = rd.from_pandas(df).repartition(6)
    specs = [
        ("sum_x", "x", "sum"),
        ("n", None, "count"),
        ("min_i", "i", "min"),
        ("max_i", "i", "max"),
        ("avg_x", "x", "mean"),
        ("sum_i", "i", "sum"),
    ]
    want = (
        df.groupby("k", dropna=False)
        .agg(sum_x=("x", "sum"), n=("k", "size"), min_i=("i", "min"),
             max_i=("i", "max"), avg_x=("x", "mean"), sum_i=("i", "sum"))
        .reset_index()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    for dt in (500_000, None):  # driver path and distributed path
        got = (
            grouped_agg(ds, ["k"], specs, driver_threshold=dt)
            .to_pandas()
            .sort_values("k", na_position="last")
            .reset_index(drop=True)
        )
        assert got["sum_i"].dtype == np.dtype("int64")  # exact int sums
        for c in ("sum_x", "avg_x"):
            assert np.allclose(got[c], want[c], rtol=1e-12)
        for c in ("n", "min_i", "max_i", "sum_i"):
            assert got[c].tolist() == want[c].tolist(), c


def test_extract_json_paths_edge_cases():
    import pyarrow as pa
    import ray.data as rd

    from knowledge_graph_ray.functions.jsonx import extract_json_paths

    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4, 5],
        "j": ['{"k": 87, "s": "x"}', "not json", None,
              '{"k": null}', '{"other": 1}'],
    }))
    got = (
        extract_json_paths(ds, "j", {"k": "$.k", "s": "$.s"},
                           types={"k": pa.int64()}, keep_cols=["id"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert got.k.tolist()[0] == 87
    assert got.k.isna().tolist() == [False, True, True, True, True]
    assert got.s.tolist()[0] == "x"
    assert got.s.isna().tolist() == [False, True, True, True, True]

