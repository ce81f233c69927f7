"""Stage tests: degrees vs networkx, distributed components vs networkx,
community granularity, reports shape, claim merge, summarizer shortcut
rules, checkpoint resume."""

import networkx as nx
import pandas as pd
import pytest
import ray.data

from knowledge_graph_ray.config import PipelineConfig
from knowledge_graph_ray.corpus import generate_corpus_table
from knowledge_graph_ray.pipelines.build import build_graph, build_knowledge_graph
from knowledge_graph_ray.stages.components import connected_components
from knowledge_graph_ray.stages.degree import (
    attach_edge_degrees,
    attach_entity_degrees,
    compute_degrees,
)
from knowledge_graph_ray.stages.summarize import DescriptionSummarizer

CFG = PipelineConfig(chunk_size=64, chunk_overlap=16, extract_concurrency=2)


@pytest.fixture(scope="module")
def graph_tables():
    docs = ray.data.from_arrow(generate_corpus_table(200, seed=6969)).repartition(4)
    t = build_graph(docs, CFG)
    return t.entities.materialize(), t.relationships.materialize()


def _nx_graph(entities, relationships):
    g = nx.Graph()
    for r in entities.to_pandas().itertuples():
        g.add_node(r.name)
    for r in relationships.to_pandas().itertuples():
        g.add_edge(r.src, r.dst, weight=r.weight)
    return g


def test_degrees_match_networkx(graph_tables):
    entities, relationships = graph_tables
    g = _nx_graph(entities, relationships)
    degrees = compute_degrees(relationships).to_pandas().set_index("name")["degree"]
    for node in g.nodes():
        assert degrees.get(node, 0) == g.degree(node), node
    ent = attach_entity_degrees(entities, compute_degrees(relationships), 4).to_pandas()
    assert (ent.set_index("name")["degree"] >= 0).all()
    for r in ent.itertuples():
        assert r.degree == g.degree(r.name), r.name


def test_edge_rank(graph_tables):
    entities, relationships = graph_tables
    g = _nx_graph(entities, relationships)
    edges = attach_edge_degrees(relationships, compute_degrees(relationships), 4).to_pandas()
    for r in edges.itertuples():
        assert r.rank == g.degree(r.src) + g.degree(r.dst)


@pytest.mark.parametrize("driver_threshold", [100_000, 0])
def test_connected_components_match_networkx(graph_tables, driver_threshold):
    """Both regimes: driver union-find fast path and distributed star
    contraction (forced with driver_threshold=0)."""
    from knowledge_graph_ray.stages.components import (
        _edge_pairs,
        connected_components_from_edges,
    )

    entities, relationships = graph_tables
    g = _nx_graph(entities, relationships)
    got = connected_components_from_edges(
        _edge_pairs(relationships),
        nodes=entities,
        num_partitions=4,
        driver_threshold=driver_threshold,
    ).to_pandas()
    labels = got.set_index("name")["component"]
    assert set(labels.index) == set(g.nodes())
    for comp in nx.connected_components(g):
        expected = min(comp)
        for node in comp:
            assert labels[node] == expected, node


def test_full_pipeline_and_reports():
    docs = ray.data.from_arrow(generate_corpus_table(150, seed=6969)).repartition(4)
    cfg = PipelineConfig(chunk_size=64, chunk_overlap=16, extract_concurrency=2,
                         extract_claims=True)
    tables = build_knowledge_graph(docs, cfg, num_partitions=4)
    comms = tables.communities.to_pandas()
    assert not comms.empty
    # granularity: every level-deepest cluster is <= max_cluster_size OR was
    # force-terminated; check level-0 covers the LCC and deeper levels refine
    level0 = comms[comms.level == 0]
    assert level0.name.is_unique
    reports = tables.reports.to_pandas()
    assert set(reports.columns) == {
        "id", "community", "title", "summary", "full_content",
        "full_content_json", "rank", "level", "rank_explanation", "findings",
    }
    assert len(reports) == comms.groupby(["level", "community"]).ngroups
    assert reports["rank"].between(0, 10).all()
    claims = tables.claims.to_pandas()
    assert not claims.empty
    assert claims.subject_id.is_unique  # merged by subject (G3)
    ents = tables.entities.to_pandas()
    assert "cluster" in ents.columns and "degree" in ents.columns


def test_summarizer_shortcut_rules():
    s = DescriptionSummarizer(max_summary_length=5)
    assert s.summarize_one(None) == ""
    assert s.summarize_one("") == ""
    assert s.summarize_one("one desc") == "one desc"  # single -> identity
    multi = s.summarize_one("b desc\na desc")
    assert multi.startswith("a desc")  # sorted fold
    long = s.summarize_one("x y z w\nq r s t")
    assert len(long.split()) <= 5  # token budget enforced


def test_checkpoint_roundtrip(tmp_path, graph_tables):
    from knowledge_graph_ray.state.checkpoint import (
        checkpoint_complete,
        checkpoint_or_compute,
        write_checkpoint,
    )

    entities, _ = graph_tables
    path = str(tmp_path / "entities")
    manifest = write_checkpoint(entities, path, fingerprint="fp1", stage="entities")
    assert manifest["status"] == "complete"
    assert manifest["rows"] == entities.count()
    assert sum(p["rows"] for p in manifest["partitions"]) == manifest["rows"]
    assert checkpoint_complete(path, "fp1")
    assert not checkpoint_complete(path, "fp2")  # fingerprint mismatch invalidates

    calls = []

    def make():
        calls.append(1)
        return entities

    ds = checkpoint_or_compute(make, path, "fp1", "entities")
    assert calls == []  # resumed from checkpoint, not recomputed
    assert ds.count() == entities.count()


def test_leveled_reports_with_mixed_context(graph_tables):
    """Bottom-up level loop + mixed-context substitution (O3/O4): with a
    tiny token budget and deep hierarchy, parent reports embed their
    children's summaries."""
    from knowledge_graph_ray.stages.community import detect_communities
    from knowledge_graph_ray.stages.components import connected_components
    from knowledge_graph_ray.stages.degree import (
        attach_edge_degrees,
        attach_entity_degrees,
        compute_degrees,
    )
    from knowledge_graph_ray.stages.report import generate_reports

    entities, relationships = graph_tables
    degrees = compute_degrees(relationships).materialize()
    ents = attach_entity_degrees(entities, degrees, 4).materialize()
    rels = attach_edge_degrees(relationships, degrees, 4).materialize()
    comps = connected_components(ents, rels, num_partitions=4).materialize()
    comms = detect_communities(comps, rels, max_cluster_size=3,
                               num_partitions=4).materialize()
    levels = sorted(comms.to_pandas().level.unique())
    assert len(levels) >= 2  # hierarchy actually refined

    reports = generate_reports(comms, ents, rels, 4, max_input_tokens=30).to_pandas()
    assert set(reports.level.unique()) == set(levels)
    parents = reports[reports.level == 0]
    assert any("Sub-community reports" in fc for fc in parents.full_content)


def test_reports_shuffle_context_equals_broadcast(graph_tables):
    """generate_reports with broadcast_max=0 (no driver materialization
    of the communities table — hash-join context path) produces the same
    reports as the broadcast path."""
    from knowledge_graph_ray.stages.community import detect_communities
    from knowledge_graph_ray.stages.degree import (
        attach_edge_degrees,
        attach_entity_degrees,
        compute_degrees,
    )
    from knowledge_graph_ray.stages.report import generate_reports

    entities, relationships = graph_tables
    degrees = compute_degrees(relationships).materialize()
    ents = attach_entity_degrees(entities, degrees, 4).materialize()
    rels = attach_edge_degrees(relationships, degrees, 4).materialize()
    comps = connected_components(ents, rels, num_partitions=4).materialize()
    comms = detect_communities(comps, rels, max_cluster_size=3,
                               num_partitions=4).materialize()

    cols = ["id", "community", "level", "title", "summary", "full_content"]
    a = (
        generate_reports(comms, ents, rels, 4, max_input_tokens=30)
        .to_pandas()[cols].sort_values(["level", "community"]).reset_index(drop=True)
    )
    b = (
        generate_reports(comms, ents, rels, 4, max_input_tokens=30, broadcast_max=0)
        .to_pandas()[cols].sort_values(["level", "community"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_lcc_pick_with_many_singletons():
    """The LCC selection is a dataset sort/limit, correct with an
    entity-scale number of singleton components."""
    import pyarrow as pa

    from knowledge_graph_ray.stages.community import detect_communities

    singletons = [{"name": f"iso{i}", "component": f"iso{i}"} for i in range(500)]
    big = [{"name": f"n{i}", "component": "BIG"} for i in range(10)]
    comps = ray.data.from_arrow(
        pa.Table.from_pylist(singletons + big)
    ).repartition(8)
    rels = ray.data.from_items(
        [
            {"src": f"n{i}", "dst": f"n{i+1}", "weight": 1.0}
            for i in range(9)
        ]
    )
    comms = detect_communities(comps, rels, max_cluster_size=5,
                               num_partitions=4).to_pandas()
    assert set(comms.name) == {f"n{i}" for i in range(10)}
    assert (comms[comms.level == 0].groupby("community")["name"].count() >= 1).all()


def test_giant_component_bisection_guard():
    """Components above max_louvain_nodes descend via ordered bisection
    (bounded memory) and still produce a complete, terminating hierarchy."""
    from knowledge_graph_ray.stages.community import _cluster_component

    g = nx.path_graph(64)
    g = nx.relabel_nodes(g, {i: f"n{i:03d}" for i in range(64)})
    nx.set_edge_attributes(g, 1.0, "weight")
    rows = _cluster_component(g, "comp", max_cluster_size=8, seed=6969,
                              max_louvain_nodes=16)
    df = pd.DataFrame(rows)
    # level 0 exists and covers every node exactly once
    level0 = df[df.level == 0]
    assert set(level0.name) == set(g.nodes())
    assert level0.name.is_unique
    # bisection at the top: level-0 has exactly 2 clusters
    assert level0.community.nunique() == 2
    # leaves are within max_cluster_size
    deepest = df[df.level == df.level.max()]
    assert (deepest.groupby("community")["name"].count() <= 8).all()


def test_community_hierarchy_table(graph_tables):
    """G5: the exported hierarchy table links each parent community to
    its next-level sub-communities with correct sizes (reference
    community_hierachy.py:22-74 subset semantics)."""
    from knowledge_graph_ray.stages.community import (
        community_hierarchy,
        detect_communities,
    )

    entities, relationships = graph_tables
    comps = connected_components(entities, relationships, num_partitions=4).materialize()
    comms = detect_communities(comps, relationships, max_cluster_size=3,
                               num_partitions=4).materialize()
    cdf = comms.to_pandas()
    assert cdf.level.nunique() >= 2

    h = community_hierarchy(comms, 4).to_pandas()
    assert set(h.columns) == {"community", "level", "sub_community", "sub_community_size"}
    assert len(h) > 0
    members = cdf.groupby(["level", "community"])["name"].apply(set)
    for r in h.itertuples():
        parent = members[(r.level, r.community)]
        sub = members[(r.level + 1, r.sub_community)]
        assert sub <= parent, (r.community, r.sub_community)
        assert len(sub) == r.sub_community_size
    # completeness: every deeper-level community appears as someone's sub
    deeper = {
        (lvl, c) for lvl, c in members.index if lvl > 0
        and (lvl - 1, ) <= tuple()  or lvl > 0
    }
    got_subs = {(r.level + 1, r.sub_community) for r in h.itertuples()}
    want_subs = {(lvl, c) for (lvl, c) in members.index if lvl > 0}
    assert got_subs == want_subs


def test_export_reference_layout(tmp_path, graph_tables):
    """node/entity tables match the reference's column sets
    (export.py:23-60, community_nodes.py/community_entities.py)."""
    import pyarrow.parquet as pq

    from knowledge_graph_ray.pipelines.build import GraphTables, export_tables
    from knowledge_graph_ray.stages.community import detect_communities
    from knowledge_graph_ray.stages.community import assign_clusters
    from knowledge_graph_ray.stages.degree import (
        attach_entity_degrees,
        compute_degrees,
    )
    from knowledge_graph_ray.stages.report import generate_reports

    entities, relationships = graph_tables
    degrees = compute_degrees(relationships).materialize()
    ents = attach_entity_degrees(entities, degrees, 4).materialize()
    rels = attach_edge_degrees(relationships, degrees, 4).materialize()
    comps = connected_components(ents, rels, num_partitions=4).materialize()
    comms = detect_communities(comps, rels, num_partitions=4).materialize()
    ents = assign_clusters(ents, comms, num_partitions=4).materialize()
    from knowledge_graph_ray.stages.community import community_hierarchy

    tables = GraphTables(
        text_units=ray.data.from_items([{"chunk_id": "c", "text": "t"}]),
        mentions=None,
        entities=ents,
        relationships=rels,
        communities=comms,
        reports=generate_reports(comms, ents, rels, 4),
        hierarchy=community_hierarchy(comms, 4),
    )
    out = str(tmp_path / "exp")
    manifests = export_tables(tables, out, fingerprint="fp", reference_layout=True)
    assert "node" in manifests and "entity" in manifests
    assert "community_hierarchy" in manifests

    import glob as _glob

    def read_dir(name):
        files = sorted(_glob.glob(f"{out}/{name}/*.parquet"))
        import pyarrow as _pa

        return _pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()

    node = read_dir("node")
    assert list(node.columns) == [
        "id", "title", "type", "description", "source_id", "degree",
        "human_readable_id", "community", "level",
    ]
    ent = read_dir("entity")
    assert list(ent.columns) == [
        "id", "name", "type", "description", "human_readable_id",
        "graph_embedding", "text_unit_ids",
    ]
    assert len(node) == len(ent) == ents.count()


def test_detect_communities_driver_path_equals_distributed(graph_tables):
    from knowledge_graph_ray.stages.community import detect_communities

    entities, relationships = graph_tables
    comps = connected_components(entities, relationships, num_partitions=4).materialize()
    a = detect_communities(comps, relationships, max_cluster_size=3,
                           num_partitions=4).to_pandas()
    b = detect_communities(comps, relationships, max_cluster_size=3,
                           num_partitions=4, driver_threshold=0).to_pandas()
    key = ["level", "community", "name"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_report_level_many_communities_distributed():
    """>=5k communities through the distributed bucketed path: exactly one
    report per community, sub-summary lookup intact, no per-community
    Ray group call (VERDICT r2 item 2)."""
    import numpy as np
    import pyarrow as pa

    from knowledge_graph_ray.stages.report import _report_level

    n_comm = 5000
    comm = np.repeat([f"c{i:05d}" for i in range(n_comm)], 3)
    n = len(comm)
    rng = np.random.RandomState(3)
    ctx = pa.Table.from_pydict(
        {
            "level": pa.array([1] * n, type=pa.int64()),
            "community": pa.array(comm, type=pa.string()),
            "kind": pa.array(["node"] * n),
            "name": pa.array([f"e{i:06d}" for i in range(n)], type=pa.string()),
            "type": pa.array(["organization"] * n),
            "description": pa.array([f"d{i}" for i in range(n)],
                                    type=pa.large_string()),
            "degree": pa.array(rng.randint(1, 9, n).astype("float64")),
            "src": pa.nulls(n, pa.string()),
            "dst": pa.nulls(n, pa.string()),
            "rank": pa.nulls(n, pa.float64()),
        }
    )
    ds = ray.data.from_arrow(ctx).repartition(8)
    out = _report_level(
        ds, {"c00007": [("sub1", "a sub summary")]}, 800,
        num_buckets=32, driver_threshold=None,
    ).to_pandas()
    assert len(out) == n_comm
    assert out["community"].nunique() == n_comm
    assert (out["level"] == 1).all()
    assert out["title"].str.len().gt(0).all()


def _embed_fixture():
    import pyarrow as pa

    # two components: a triangle+pendant and a separate pair
    edges = pa.Table.from_pydict(
        {
            "src": ["A", "A", "B", "C", "X"],
            "dst": ["B", "C", "C", "D", "Y"],
            "weight": [1.0, 1.0, 1.0, 1.0, 1.0],
        }
    )
    comps = pa.Table.from_pydict(
        {
            "name": ["A", "B", "C", "D", "X", "Y", "LONER"],
            "component": ["A", "A", "A", "A", "X", "X", "LONER"],
        }
    )
    return (ray.data.from_arrow(comps).repartition(2),
            ray.data.from_arrow(edges).repartition(2))


def test_embed_graph_deterministic_and_structured():
    """A7 parity stage: seeded projection embedding is identical across
    runs and partitionings, same knobs as the reference embed_nod2vec
    (dimensions / window_size / random_seed)."""
    import numpy as np

    from knowledge_graph_ray.stages.graph_embed import embed_graph

    comps, edges = _embed_fixture()
    a = embed_graph(comps, edges, dimensions=16, seed=6969).to_pandas()
    b = embed_graph(comps.repartition(1), edges.repartition(1),
                    dimensions=16, seed=6969).to_pandas()
    a = a.sort_values("name").reset_index(drop=True)
    b = b.sort_values("name").reset_index(drop=True)
    assert a["name"].tolist() == ["A", "B", "C", "D", "LONER", "X", "Y"]
    for va, vb in zip(a["graph_embedding"], b["graph_embedding"]):
        assert np.allclose(list(va), list(vb))
    mats = {n: np.array(list(v)) for n, v in zip(a["name"], a["graph_embedding"])}
    # connected nodes of the same component are closer than nodes of
    # different components (cosine; vectors are L2-normalized)
    assert mats["A"] @ mats["B"] > mats["A"] @ mats["X"]
    # isolated node: unit-norm seeded vector (never zero — downstream
    # cosine math must stay finite)
    assert abs(np.linalg.norm(mats["LONER"]) - 1.0) < 1e-5
    # a different seed moves the embedding
    c = embed_graph(comps, edges, dimensions=16, seed=7).to_pandas()
    c = c.sort_values("name").reset_index(drop=True)
    assert not np.allclose(list(a["graph_embedding"][0]),
                           list(c["graph_embedding"][0]))


def test_embed_graph_distributed_equals_driver():
    import numpy as np

    from knowledge_graph_ray.stages.graph_embed import embed_graph

    comps, edges = _embed_fixture()
    drv = embed_graph(comps, edges, dimensions=8).to_pandas()
    dist = embed_graph(comps, edges, dimensions=8,
                       driver_threshold=0).to_pandas()
    drv = drv.sort_values("name").reset_index(drop=True)
    dist = dist.sort_values("name").reset_index(drop=True)
    assert drv["name"].tolist() == dist["name"].tolist()
    assert drv["component"].tolist() == dist["component"].tolist()
    for va, vb in zip(drv["graph_embedding"], dist["graph_embedding"]):
        assert np.allclose(list(va), list(vb))


def test_detect_communities_giant_pre_split_equals_single_task():
    """A component above max_louvain_nodes must produce IDENTICAL rows
    through the distributed pre-split path (rank-arithmetic bisection
    levels + one parallel louvain task per leaf) as through the plain
    single-task recursion (the driver fast path's _cluster_component).

    Graph: one 300-node component (ring + seeded chords) forced giant
    with max_louvain_nodes=40, plus two small components to exercise the
    mixed normal/giant regime and use_lcc=False."""
    import numpy as np
    import pyarrow as pa

    from knowledge_graph_ray.stages.community import detect_communities

    rng = np.random.RandomState(7)
    big = [f"N{i:04d}" for i in range(300)]
    # canonical edge list: unique per unordered pair (what merge_edges
    # guarantees) — nx keeps the last-added weight for duplicates, and
    # "last" is shuffle-order-dependent, so parity needs uniqueness
    pairs = {(i, (i + 1) % 300) for i in range(300)}
    pairs = {(min(a, b), max(a, b)) for a, b in pairs}
    for a, b in rng.randint(0, 300, size=(200, 2)):
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    edges = [(big[a], big[b], 1.0 + ((a * 31 + b) % 3)) for a, b in sorted(pairs)]
    small1 = [("S1A", "S1B", 1.0), ("S1B", "S1C", 1.0)]
    small2 = [("S2A", "S2B", 1.0)]
    all_edges = edges + small1 + small2
    names = sorted({n for e in all_edges for n in e[:2]})
    ents = ray.data.from_arrow(pa.Table.from_pydict({"name": names})).repartition(4)
    rels = ray.data.from_arrow(pa.Table.from_pydict(
        {
            "src": [e[0] for e in all_edges],
            "dst": [e[1] for e in all_edges],
            "weight": [e[2] for e in all_edges],
        }
    )).repartition(4)
    comps = connected_components(ents, rels, num_partitions=4).materialize()

    kw = dict(max_cluster_size=8, num_partitions=4, use_lcc=False,
              max_louvain_nodes=40)
    via_driver = detect_communities(comps, rels, **kw).to_pandas()
    via_giant = detect_communities(comps, rels, driver_threshold=0,
                                   **kw).to_pandas()
    key = ["level", "community", "name"]
    pd.testing.assert_frame_equal(
        via_driver.sort_values(key).reset_index(drop=True),
        via_giant.sort_values(key).reset_index(drop=True),
    )
    # sanity: the bisection actually engaged (level-0 split of the giant
    # is exactly two communities of 150)
    giant_names = set(big)
    lvl0 = via_giant[(via_giant.level == 0)
                     & via_giant.name.isin(giant_names)]
    assert lvl0.community.nunique() == 2
    assert sorted(lvl0.community.value_counts()) == [150, 150]


def test_detect_communities_giant_edgeless_half_parity():
    """Review finding (round 5): a bisection half ABOVE max_louvain_nodes
    with zero internal edges must still bisect — the edge-free rank
    arithmetic of the pre-split path cannot see edges, so the recursion's
    size guard must take precedence over its zero-edge branch.  Hub and
    spokes: the sorted high half of the spokes has no internal edges."""
    import pyarrow as pa

    from knowledge_graph_ray.stages.community import detect_communities

    hub = "a-hub"
    leaves = [f"n{i:04d}" for i in range(200)]
    all_edges = [(hub, leaf, 1.0) for leaf in leaves]
    names = sorted([hub] + leaves)
    ents = ray.data.from_arrow(pa.Table.from_pydict({"name": names})).repartition(4)
    rels = ray.data.from_arrow(pa.Table.from_pydict(
        {
            "src": [e[0] for e in all_edges],
            "dst": [e[1] for e in all_edges],
            "weight": [e[2] for e in all_edges],
        }
    )).repartition(4)
    comps = connected_components(ents, rels, num_partitions=4).materialize()
    kw = dict(max_cluster_size=10, num_partitions=4, use_lcc=False,
              max_louvain_nodes=50)
    via_driver = detect_communities(comps, rels, **kw).to_pandas()
    via_giant = detect_communities(comps, rels, driver_threshold=0,
                                   **kw).to_pandas()
    key = ["level", "community", "name"]
    pd.testing.assert_frame_equal(
        via_driver.sort_values(key).reset_index(drop=True),
        via_giant.sort_values(key).reset_index(drop=True),
    )


def test_detect_communities_giant_max_cluster_above_louvain_parity():
    """Review finding (round 5, second pass): when max_cluster_size >
    max_louvain_nodes the recursion stops descending at clusters
    <= max_cluster_size, but the pre-split rank arithmetic used to keep
    bisecting down to max_louvain_nodes — emitting extra deeper levels.
    300-node ring, max_cluster_size=100 > max_louvain_nodes=40: the
    driver path stops at levels 0-1 (600 rows) and the distributed path
    must match exactly."""
    import pyarrow as pa

    from knowledge_graph_ray.stages.community import detect_communities

    big = [f"R{i:04d}" for i in range(300)]
    all_edges = [(big[i], big[(i + 1) % 300], 1.0) for i in range(300)]
    names = sorted(big)
    ents = ray.data.from_arrow(pa.Table.from_pydict({"name": names})).repartition(4)
    rels = ray.data.from_arrow(pa.Table.from_pydict(
        {
            "src": [e[0] for e in all_edges],
            "dst": [e[1] for e in all_edges],
            "weight": [e[2] for e in all_edges],
        }
    )).repartition(4)
    comps = connected_components(ents, rels, num_partitions=4).materialize()
    kw = dict(max_cluster_size=100, num_partitions=4, use_lcc=False,
              max_louvain_nodes=40)
    via_driver = detect_communities(comps, rels, **kw).to_pandas()
    via_giant = detect_communities(comps, rels, driver_threshold=0,
                                   **kw).to_pandas()
    key = ["level", "community", "name"]
    pd.testing.assert_frame_equal(
        via_driver.sort_values(key).reset_index(drop=True),
        via_giant.sort_values(key).reset_index(drop=True),
    )
    # the recursion stops once halves are <= max_cluster_size: levels 0-1
    assert sorted(via_giant.level.unique()) == [0, 1]
    assert len(via_giant) == 600
