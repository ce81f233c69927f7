"""Tests: incremental G8 merge, resume source filtering, hash_join,
embedding stage, strategy registry."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from knowledge_graph_ray.config import PipelineConfig
from knowledge_graph_ray.corpus import generate_corpus_table
from knowledge_graph_ray.functions.joins import hash_join
from knowledge_graph_ray.pipelines.build import build_graph
from knowledge_graph_ray.stages.canonicalize import (
    incremental_canonicalize_entities,
    incremental_canonicalize_relationships,
)

CFG = PipelineConfig(chunk_size=64, chunk_overlap=16, extract_concurrency=1)


def _tables(lo, hi):
    tbl = generate_corpus_table(hi - lo, seed=6969, start=lo)
    return build_graph(rd.from_arrow(tbl).repartition(2), CFG)


def test_incremental_merge_equals_full_run():
    full = _tables(0, 200)
    run1 = _tables(0, 120)
    run2 = _tables(120, 200)

    inc_ents = incremental_canonicalize_entities(
        run1.entities.materialize(), run2.mentions
    ).to_pandas().set_index("name")
    full_ents = full.entities.to_pandas().set_index("name")
    assert set(inc_ents.index) == set(full_ents.index)
    for name in full_ents.index:
        f, g = full_ents.loc[name], inc_ents.loc[name]
        assert f["type"] == g["type"], name
        # description/source sets (minus stub-"" bookkeeping, which is
        # order-dependent across run splits) must agree
        fd = set(f["description"].split("\n")) - {""}
        gd = set(g["description"].split("\n")) - {""}
        assert fd == gd, name
        assert f["n_mentions"] == g["n_mentions"], name

    inc_rels = incremental_canonicalize_relationships(
        run1.relationships.materialize(), run2.mentions
    ).to_pandas().set_index(["src", "dst"])
    full_rels = full.relationships.to_pandas().set_index(["src", "dst"])
    assert set(inc_rels.index) == set(full_rels.index)
    for key in full_rels.index:
        assert full_rels.loc[key, "weight"] == pytest.approx(inc_rels.loc[key, "weight"])
        assert full_rels.loc[key, "n_mentions"] == inc_rels.loc[key, "n_mentions"]


def test_resume_filter(tmp_path):
    from knowledge_graph_ray.sources.io import (
        completed_doc_ids,
        filter_pending,
        record_completed_docs,
    )

    docs = rd.from_arrow(generate_corpus_table(50, seed=6969))
    mdir = str(tmp_path / "out")
    assert completed_doc_ids(mdir) == set()
    assert filter_pending(docs, mdir).count() == 50

    done = [f"doc-{i:08d}" for i in range(20)]
    record_completed_docs(mdir, "part-0", done)
    pending = filter_pending(docs, mdir)
    assert pending.count() == 30
    got = set(pending.to_pandas().doc_id)
    assert got.isdisjoint(done)
    # re-recording the same partition is idempotent
    record_completed_docs(mdir, "part-0", done)
    assert len(completed_doc_ids(mdir)) == 20


def test_read_documents_parquet(tmp_path):
    import pyarrow.parquet as pq

    from knowledge_graph_ray.sources.io import read_documents

    tbl = generate_corpus_table(20, seed=1)
    pq.write_table(tbl, str(tmp_path / "docs.parquet"))
    ds = read_documents(str(tmp_path / "docs.parquet"))
    assert ds.count() == 20
    assert set(ds.schema().names) == {"doc_id", "spans"}


@pytest.mark.parametrize("how", ["inner", "left_outer", "full_outer"])
def test_hash_join_matches_pandas(how):
    rng = np.random.RandomState(0)
    left = pd.DataFrame(
        {"k": rng.randint(0, 50, 200), "x": rng.randn(200)}
    )
    right = pd.DataFrame(
        {"k": rng.randint(0, 60, 80), "y": rng.randint(0, 1000, 80)}
    ).drop_duplicates("k")
    got = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on=["k"], how=how, num_partitions=8
    ).to_pandas()
    pd_how = {"left_outer": "left", "full_outer": "outer"}.get(how, "inner")
    expected = left.merge(right, on="k", how=pd_how)
    assert len(got) == len(expected)
    g = got.sort_values(["k", "x"]).reset_index(drop=True)
    e = expected.sort_values(["k", "x"]).reset_index(drop=True)
    pd.testing.assert_series_equal(g["x"], e["x"])
    assert g["y"].isna().sum() == e["y"].isna().sum()
    pd.testing.assert_series_equal(
        g["y"].fillna(-1).astype(np.int64),
        e["y"].fillna(-1).astype(np.int64),
        check_names=False,
    )


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_hash_join_semi_anti_matches_pandas(how):
    rng = np.random.RandomState(1)
    left = pd.DataFrame(
        {"k": rng.randint(0, 50, 200), "x": rng.randn(200)}
    )
    # right has duplicate keys and an extra payload column: semi/anti must
    # neither multiply rows nor emit right columns
    right = pd.DataFrame(
        {"k": rng.randint(25, 75, 120), "y": rng.randn(120)}
    )
    got = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on=["k"], how=how, num_partitions=8
    ).to_pandas()
    keys = set(right["k"])
    mask = left["k"].isin(keys)
    expected = left[mask] if how == "left_semi" else left[~mask]
    assert list(got.columns) == ["k", "x"]
    g = got.sort_values(["k", "x"]).reset_index(drop=True)
    e = expected.sort_values(["k", "x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e)


def test_hash_join_composite_key_and_collision_guard():
    left = rd.from_items([{"a": "x", "b": 1, "v": 10}, {"a": "y", "b": 2, "v": 20}])
    right = rd.from_items([{"a": "x", "b": 1, "w": 7}])
    got = hash_join(left, right, on=["a", "b"], how="inner", num_partitions=4).to_pandas()
    assert len(got) == 1 and got.w.iloc[0] == 7
    clash = rd.from_items([{"a": "x", "b": 1, "v": 99}])
    with pytest.raises(AssertionError):
        hash_join(left, clash, on=["a", "b"], how="inner")


def test_embedding_stage_and_vector_sink(tmp_path):
    from knowledge_graph_ray.stages.embed import HashingEmbedder, embed_descriptions, write_vector_table

    ds = rd.from_items(
        [
            {"name": "A", "description": "alpha beta gamma"},
            {"name": "B", "description": "alpha beta gamma"},
            {"name": "C", "description": "totally different words"},
            {"name": "D", "description": ""},
        ]
    )
    out = embed_descriptions(ds, concurrency=1, dim=32).to_pandas()
    vecs = {r["name"]: np.asarray(r["embedding"]) for _, r in out.iterrows()}
    assert np.allclose(vecs["A"], vecs["B"])  # deterministic
    assert not np.allclose(vecs["A"], vecs["C"])
    assert np.allclose(vecs["D"], 0)
    assert all(len(v) == 32 for v in vecs.values())
    for name in ("A", "C"):
        assert np.isclose(np.linalg.norm(vecs[name]), 1.0)

    manifest = write_vector_table(
        embed_descriptions(ds, concurrency=1, dim=32), str(tmp_path / "vec"), "fp"
    )
    assert manifest["rows"] == 4


def test_registry():
    from knowledge_graph_ray import registry

    assert registry.get_extractor("pattern").__name__ == "PatternExtractor"
    assert registry.get_extractor("cooccurrence").__name__ == "CooccurrenceExtractor"
    with pytest.raises(NotImplementedError):
        registry.get_extractor("graph_intelligence")()
    with pytest.raises(ValueError):
        registry.get_extractor("nope")

    class Custom:  # user extension
        pass

    registry.register_extractor("custom", Custom)
    assert registry.get_extractor("custom") is Custom


def test_with_row_index():
    from knowledge_graph_ray.functions.index import with_row_index

    ds = rd.from_items([{"name": n} for n in "dcabfe"]).repartition(3)
    out = with_row_index(ds, sort_key="name").to_pandas()
    assert out.sort_values("human_readable_id").name.tolist() == list("abcdef")
    assert sorted(out.human_readable_id) == list(range(6))


def test_export_shape(tmp_path):
    """F3 golden-shape: exported tables carry the reference-analog columns
    (node.csv / relationship.csv / community_report.csv)."""
    import pyarrow.dataset as pads

    from knowledge_graph_ray.pipelines.build import build_knowledge_graph, export_tables

    docs = rd.from_arrow(generate_corpus_table(60, seed=6969)).repartition(2)
    tables = build_knowledge_graph(docs, CFG, num_partitions=4)
    export_tables(tables, str(tmp_path / "out"), fingerprint="t")

    ents = pads.dataset(str(tmp_path / "out" / "entities"), format="parquet").to_table()
    assert {"id", "name", "type", "description", "source_id", "degree",
            "cluster", "human_readable_id"} <= set(ents.schema.names)
    hr = sorted(ents.column("human_readable_id").to_pylist())
    assert hr == list(range(len(hr)))  # contiguous enumeration
    names = ents.to_pandas().sort_values("human_readable_id").name.tolist()
    assert names == sorted(names)  # stabilize_graph ordering

    rels = pads.dataset(str(tmp_path / "out" / "relationships"), format="parquet").to_table()
    assert {"id", "src", "dst", "weight", "description", "source_id",
            "source_degree", "target_degree", "rank", "human_readable_id"} <= set(rels.schema.names)

    reports = pads.dataset(str(tmp_path / "out" / "community_reports"), format="parquet").to_table()
    assert {"id", "community", "title", "summary", "full_content",
            "full_content_json", "rank", "level", "rank_explanation",
            "findings"} <= set(reports.schema.names)

    tus = pads.dataset(str(tmp_path / "out" / "text_units"), format="parquet").to_table()
    assert {"chunk_id", "doc_id", "text", "n_tokens", "span_seq"} <= set(tus.schema.names)
    # span-sequence survives the parquet round trip (per-row invariant)
    spans = tus.column("span_seq").to_pylist()
    assert any(s for s in spans)


def test_read_text_directory(tmp_path):
    from knowledge_graph_ray.sources.io import filter_pending, read_text_directory

    sub = tmp_path / "corpus" / "nested"
    sub.mkdir(parents=True)
    (tmp_path / "corpus" / "a.txt").write_text("Helios Energy expands. Acme works with Helios Energy.")
    (sub / "b.md").write_text("Second doc text here.")
    (tmp_path / "corpus" / "ignore.bin").write_bytes(b"\x00\x01")

    ds = read_text_directory(str(tmp_path / "corpus"))
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df.doc_id) == ["a.txt", os.path.join("nested", "b.md")]
    assert df.spans[0][0]["text"].startswith("Helios Energy")
    assert df.spans[0][0]["kind"] == "text"

    # the resume filter composes with path-based doc ids
    from knowledge_graph_ray.sources.io import record_completed_docs

    mdir = str(tmp_path / "manifest")
    record_completed_docs(mdir, "p0", ["a.txt"])
    pending = filter_pending(ds, mdir).to_pandas()
    assert list(pending.doc_id) == [os.path.join("nested", "b.md")]

    # and feeds the real pipeline
    from knowledge_graph_ray.config import PipelineConfig
    from knowledge_graph_ray.pipelines.build import build_graph

    tables = build_graph(ds, PipelineConfig(chunk_size=32, chunk_overlap=8))
    ents = tables.entities.to_pandas()
    assert "HELIOS ENERGY" in set(ents.name)


def test_graph_diff_artifacts(tmp_path):
    """Change-log artifacts (reference checkpoints/graph.py:13-33 role):
    new keys via distributed anti-join, updated keys via payload
    comparison; persisted as Parquet checkpoints + summary JSON."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from knowledge_graph_ray.state.diff import graph_diff, write_graph_diff

    prev_e = rd.from_arrow(pa.table({
        "name": ["A", "B", "C"],
        "type": ["org", "org", "org"],
        "description": ["a", "b", "c"],
        "source_id": ["1", "1", "2"],
        "n_mentions": [1, 2, 3],
    }))
    cur_e = rd.from_arrow(pa.table({
        "name": ["A", "B", "C", "D"],
        "type": ["org", "org", "org", "person"],
        "description": ["a", "b CHANGED", "c", "d"],
        "source_id": ["1", "1", "2", "9"],
        "n_mentions": [1, 5, 3, 1],
    }))
    prev_r = rd.from_arrow(pa.table({
        "src": ["A"], "dst": ["B"], "weight": [1.0],
        "description": ["ab"], "source_id": ["1"], "n_mentions": [1],
    }))
    cur_r = rd.from_arrow(pa.table({
        "src": ["A", "C"], "dst": ["B", "D"], "weight": [2.0, 1.0],
        "description": ["ab", "cd"], "source_id": ["1", "9"],
        "n_mentions": [2, 1],
    }))
    diff = graph_diff(prev_e, prev_r, cur_e, cur_r, num_partitions=4)
    new_e = diff["new_entities"].to_pandas()
    upd_e = diff["updated_entities"].to_pandas()
    new_r = diff["new_relationships"].to_pandas()
    upd_r = diff["updated_relationships"].to_pandas()
    assert new_e["name"].tolist() == ["D"]
    assert upd_e["name"].tolist() == ["B"]  # description + n_mentions changed
    assert new_r[["src", "dst"]].values.tolist() == [["C", "D"]]
    assert upd_r[["src", "dst"]].values.tolist() == [["A", "B"]]  # weight changed

    out = tmp_path / "diff"
    summary = write_graph_diff(
        graph_diff(prev_e, prev_r, cur_e, cur_r, num_partitions=4),
        str(out), fingerprint="v2",
    )
    assert summary["counts"] == {
        "new_entities": 1, "updated_entities": 1,
        "new_relationships": 1, "updated_relationships": 1,
    }
    on_disk = json.loads((out / "_diff_summary.json").read_text())
    assert on_disk["fingerprint"] == "v2"
    import pyarrow.parquet as pq

    got = pq.read_table(str(out / "new_entities")).to_pandas()
    assert got["name"].tolist() == ["D"]


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_skew_join_equals_hash_join_on_hot_key(how):
    from knowledge_graph_ray.functions.joins import skew_join

    rng = np.random.RandomState(7)
    # 90% of left rows share one hot key; right has multi-row matches
    # for some keys and misses for others (exercises left_outer nulls)
    keys = np.where(rng.rand(2000) < 0.9, 1,
                    rng.randint(2, 40, 2000)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "x": np.arange(2000, dtype=np.int64)})
    right = pd.DataFrame({
        "k": np.r_[np.array([1, 1]), np.arange(2, 30)].astype(np.int64),
        "y": np.arange(30, dtype=np.int64),
    })
    got = skew_join(
        rd.from_pandas(left).repartition(8), rd.from_pandas(right),
        on=["k"], how=how, hot_min_rows=100, num_partitions=8,
    ).to_pandas()
    exp = hash_join(
        rd.from_pandas(left).repartition(8), rd.from_pandas(right),
        on=["k"], how=how, num_partitions=8,
    ).to_pandas()
    key = ["k", "x", "y"]
    g = got.sort_values(key, na_position="last").reset_index(drop=True)
    e = exp.sort_values(key, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(g[key], e[key], check_dtype=False)


def test_skew_join_no_hot_key_falls_back():
    from knowledge_graph_ray.functions.joins import skew_join

    left = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                         "x": np.arange(50, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 100, 2, dtype=np.int64),
                          "y": np.arange(50, dtype=np.int64)})
    got = skew_join(rd.from_pandas(left), rd.from_pandas(right), on=["k"],
                    hot_min_rows=1000).to_pandas()
    exp = left.merge(right, on="k", how="inner")
    assert len(got) == len(exp)
    assert sorted(got.k) == sorted(exp.k)


@pytest.mark.parametrize("how", ["inner", "left_outer", "left_semi",
                                 "left_anti"])
def test_size_adaptive_join_regimes_agree(how):
    from knowledge_graph_ray.functions.joins import size_adaptive_join

    rng = np.random.RandomState(3)
    left = pd.DataFrame({"k": rng.randint(0, 40, 300),
                         "x": np.arange(300, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 60, 2, dtype=np.int64),
                          "y": np.arange(30, dtype=np.int64)})
    l, r = rd.from_pandas(left).repartition(6), rd.from_pandas(right)
    bcast = size_adaptive_join(l, r, on=["k"], how=how,
                               broadcast_max=10_000).to_pandas()
    shuffl = size_adaptive_join(l, r, on=["k"], how=how,
                                broadcast_max=0).to_pandas()
    cols = [c for c in ("k", "x", "y") if c in bcast.columns]
    b = bcast.sort_values(cols, na_position="last").reset_index(drop=True)
    s = shuffl.sort_values(cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(b[cols], s[cols], check_dtype=False)
    assert len(b) > 0


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_size_adaptive_join_null_keys_match_shuffle_regime(how):
    from knowledge_graph_ray.functions.joins import size_adaptive_join

    left = pd.DataFrame({"k": pd.array([1, None, 2, None], dtype="Int64"),
                         "x": np.arange(4, dtype=np.int64)})
    right = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                          "y": np.array([10, 20], dtype=np.int64)})
    l, r = rd.from_pandas(left), rd.from_pandas(right)
    bcast = size_adaptive_join(l, r, on=["k"], how=how,
                               broadcast_max=100).to_pandas()
    shuffl = size_adaptive_join(l, r, on=["k"], how=how,
                                broadcast_max=0).to_pandas()
    cols = ["k", "x", "y"]
    b = bcast.sort_values(cols, na_position="last").reset_index(drop=True)
    s = shuffl.sort_values(cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(b[cols], s[cols], check_dtype=False)
    # the bucket body matches null==null: both regimes must keep the
    # null-key matches
    assert (b.k.isna() & b.y.notna()).any()


def test_skew_join_hot_key_absent_from_right():
    from knowledge_graph_ray.functions.joins import skew_join

    # the hot key (0) has ZERO right matches: inner must drop its rows,
    # left_outer must null-fill — and neither may crash on the empty
    # hot-right collect
    left = pd.DataFrame({"k": np.r_[np.zeros(300, dtype=np.int64),
                                    np.arange(1, 21)],
                         "x": np.arange(320, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(1, 21, dtype=np.int64),
                          "y": np.arange(20, dtype=np.int64)})
    inner = skew_join(rd.from_pandas(left), rd.from_pandas(right),
                      on=["k"], how="inner", hot_min_rows=100).to_pandas()
    assert len(inner) == 20 and (inner.k > 0).all()
    outer = skew_join(rd.from_pandas(left), rd.from_pandas(right),
                      on=["k"], how="left_outer",
                      hot_min_rows=100).to_pandas()
    assert len(outer) == 320
    assert outer[outer.k == 0].y.isna().all()


@pytest.mark.parametrize("how", ["inner", "left_outer", "left_semi",
                                 "left_anti"])
def test_size_adaptive_join_empty_right(how):
    from knowledge_graph_ray.functions.joins import size_adaptive_join

    left = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                         "x": np.arange(10, dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([99], dtype=np.int64),
                          "y": np.array([1], dtype=np.int64)})
    r_empty = rd.from_pandas(right).map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("k"), -1)),
        batch_format="pyarrow",
    )
    got = size_adaptive_join(rd.from_pandas(left), r_empty, on=["k"],
                             how=how, broadcast_max=100).to_pandas()
    if how in ("inner", "left_semi"):
        assert len(got) == 0
    elif how == "left_anti":
        assert len(got) == 10
    else:
        assert len(got) == 10 and got.y.isna().all()


def test_size_adaptive_join_many_to_many_and_empty_left():
    from knowledge_graph_ray.functions.joins import size_adaptive_join

    # duplicate keys on BOTH sides: the join must produce the full
    # cartesian fanout per key, identically in both regimes
    left = pd.DataFrame({"k": np.array([1, 1, 2, 3], dtype=np.int64),
                         "x": np.arange(4, dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([1, 1, 2], dtype=np.int64),
                          "y": np.arange(3, dtype=np.int64)})
    l, r = rd.from_pandas(left), rd.from_pandas(right)
    bcast = size_adaptive_join(l, r, on=["k"], how="inner",
                               broadcast_max=100).to_pandas()
    shuffl = size_adaptive_join(l, r, on=["k"], how="inner",
                                broadcast_max=0).to_pandas()
    assert len(bcast) == len(shuffl) == 5  # 2x2 fanout on k=1 + one k=2
    cols = ["k", "x", "y"]
    pd.testing.assert_frame_equal(
        bcast.sort_values(cols).reset_index(drop=True)[cols],
        shuffl.sort_values(cols).reset_index(drop=True)[cols],
        check_dtype=False)

    # empty LEFT: both regimes yield an empty, schema-correct result
    l_empty = rd.from_pandas(left).map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("k"), -1)),
        batch_format="pyarrow",
    )
    for bm in (100, 0):
        out = size_adaptive_join(l_empty, r, on=["k"], how="inner",
                                 broadcast_max=bm).to_pandas()
        assert len(out) == 0


def test_union_by_name_aligns_and_widens():
    from knowledge_graph_ray.sources.io import union_by_name

    a = rd.from_items([{"x": 1, "y": "a"}, {"x": 2, "y": "b"}])
    b = rd.from_items([{"y": "c", "z": 3.5}])  # reordered + drifted
    out = union_by_name(a, b).to_pandas().sort_values("y").reset_index(drop=True)
    assert sorted(out.columns) == ["x", "y", "z"]
    assert out["y"].tolist() == ["a", "b", "c"]
    assert out["x"].isna().tolist() == [False, False, True]
    assert out["z"].isna().tolist() == [True, True, False]

    # strict mode raises on a type conflict; permissive widens
    import pytest as _pytest
    c = rd.from_items([{"x": 1.5, "y": "d"}])
    with _pytest.raises(TypeError):
        union_by_name(a, c, strict=True)
    widened = union_by_name(a, c).to_pandas()
    assert widened["x"].dtype.kind == "f"


def test_bag_set_ops_and_full_outer_edge_cases():
    from knowledge_graph_ray.functions.joins import (
        except_all,
        hash_join,
        intersect_all,
    )

    left = rd.from_items([{"k": 1}, {"k": 1}, {"k": 1}, {"k": 2}])
    right = rd.from_items([{"k": 1}, {"k": 3}])
    ia = intersect_all(left, right, ["k"]).to_pandas()["k"].tolist()
    assert sorted(ia) == [1]  # min(3,1)=1 copy
    ea = except_all(left, right, ["k"]).to_pandas()["k"].tolist()
    assert sorted(ea) == [1, 1, 2]  # 3-1 copies of 1, 1-0 of 2

    # disjoint keys: intersect empty, except keeps all of left
    disjoint = rd.from_items([{"k": 9}])
    assert intersect_all(left, disjoint, ["k"]).count() == 0
    assert except_all(left, disjoint, ["k"]).count() == 4

    # full_outer where one bucket holds only right rows
    l2 = rd.from_items([{"k": 1, "x": 10}])
    r2 = rd.from_items([{"k": 2, "y": 20}, {"k": 3, "y": 30}])
    fo = hash_join(l2, r2, on=["k"], how="full_outer",
                   num_partitions=4).to_pandas()
    assert len(fo) == 3
    assert fo.loc[fo["k"] == 1, "y"].isna().all()
    assert fo.loc[fo["k"] == 2, "x"].isna().all()
    assert int(fo.loc[fo["k"] == 3, "y"].iloc[0]) == 30
