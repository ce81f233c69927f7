"""Canonicalization shuffles: mentions -> entities / relationships.

This replaces the reference's single in-memory ``nx.Graph`` merge
(/root/reference/graph/extractors/graph_extractor.py:203-290) with a
two-phase distributed aggregation (SURVEY.md G1/G2):

1. **partial combine** inside ``map_batches`` — one partial row per key
   per batch (associative/commutative state), which is what bounds the
   shuffle volume for hub entities (skew axis of the north rule: a key
   appearing in 10% of all chunks contributes one row per batch, not one
   row per mention);
2. **final merge** via ``groupby(key).map_groups`` over the partials.

Reference semantics reproduced exactly (validated by the differential
oracle in tests/test_differential.py):

* entity key = ``clean_str(name.upper())`` (graph_extractor.py:205);
* description = set-union of mention descriptions joined "\\n"
  (graph_extractor.py:212-218; set order is nondeterministic there — we
  sort, justified by the reference itself sorting before summarize,
  verbs/entities/summarization/description_summarize.py:34);
* source_id = set-union of chunk ids joined ", " (graph_extractor.py:222-227);
* type = LAST non-empty type in processing order (graph_extractor.py:228-230),
  replayed via the total ``order_key``;
* relationship endpoints auto-create stub nodes with empty type/description
  and the creating edge's source id (graph_extractor.py:253-266) — a stub's
  extra description ""/source id survives later entity mentions only when
  the stub creation came FIRST in processing order, which we replay with
  min/max order bookkeeping instead of sequential mutation;
* edge key is undirected ``(min(src,dst), max(src,dst))`` (nx.Graph),
  weight SUMMED across mentions (graph_extractor.py:267-270).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

# partial-row set columns are packed as delimiter-joined strings, not
# Arrow lists: the groupby shuffle sorts partial rows, and sorting
# list-typed columns is disproportionately slow in Ray's sort path.
# Safe: descriptions can never contain "\n" (the reference itself
# round-trips them through "\n".join/split, graph_extractor.py:212-218)
# and chunk ids never contain ", ".
ENTITY_PARTIAL_SCHEMA = pa.schema(
    [
        ("name", pa.string()),
        ("descs", pa.large_string()),
        ("ent_chunks", pa.large_string()),
        ("type_order", pa.string()),
        ("type_val", pa.string()),
        ("min_ent_order", pa.string()),
        ("min_touch_order", pa.string()),
        ("min_touch_chunk", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)

EDGE_PARTIAL_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("weight", pa.float64()),
        ("descs", pa.large_string()),
        ("chunks", pa.large_string()),
        ("n_mentions", pa.int64()),
    ]
)

_HI = "￿"  # sorts after any real order_key

ENTITY_SCHEMA = pa.schema(
    [
        ("name", pa.string()),
        ("type", pa.string()),
        ("description", pa.large_string()),
        ("source_id", pa.large_string()),
        ("n_mentions", pa.int64()),
    ]
)

RELATIONSHIP_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("weight", pa.float64()),
        ("description", pa.large_string()),
        ("source_id", pa.large_string()),
        ("n_mentions", pa.int64()),
    ]
)


def entity_partials_batch(batch: pa.Table, max_descriptions: int | None = None,
                          max_sources: int | None = None) -> pa.Table:
    """Per-batch combiner: mention rows -> one partial row per entity name.

    Consumes BOTH mention kinds: 'entity' rows carry descriptions/types,
    'rel' rows contribute endpoint *touches* (stub bookkeeping).

    ``max_descriptions`` / ``max_sources`` bound per-key state (SURVEY §4
    hub-entity rule): keep the lexicographically smallest N — min-N is
    associative (min-N of unioned min-N partials == min-N of the full
    union), so partial and final truncation compose exactly.  None =
    faithful unbounded reference semantics (differential-test mode).

    Vectorized (pandas C groupbys; ~2x the row-loop at 32k batches) —
    the order-sensitive rules map to stable sorts:

    * type = last non-empty type in (order_key, row-position) order
      (the loop's ``>=`` update)  -> stable sort + groupby.last();
    * min_touch = FIRST strictly-smaller order (loop's ``<``), src
      visited before dst within a row -> src-then-dst concat + stable
      sort + groupby.first().
    """
    df = batch.select(
        ["kind", "name", "type", "description", "chunk_id", "order_key",
         "src", "dst"]
    ).to_pandas()
    ent = df[df["kind"] == "entity"]
    rel = df[df["kind"] == "rel"]  # 'error' rows skip both branches

    pieces: dict[str, pd.Series] = {}
    if len(ent):
        d = ent[["name", "description"]].drop_duplicates().sort_values(
            ["name", "description"]
        )
        if max_descriptions is not None:
            d = d[d.groupby("name").cumcount() < max_descriptions]
        pieces["descs"] = d.groupby("name")["description"].agg("\x1e".join)
        c = ent[["name", "chunk_id"]].drop_duplicates().sort_values(
            ["name", "chunk_id"]
        )
        if max_sources is not None:
            c = c[c.groupby("name").cumcount() < max_sources]
        pieces["ent_chunks"] = c.groupby("name")["chunk_id"].agg("\x1e".join)
        pieces["n_mentions"] = ent.groupby("name").size()
        pieces["min_ent_order"] = ent.groupby("name")["order_key"].min()
        t = ent[ent["type"] != ""].sort_values(["name", "order_key"], kind="stable")
        if len(t):
            last = t.groupby("name")[["order_key", "type"]].last()
            pieces["type_order"] = last["order_key"]
            pieces["type_val"] = last["type"]
    if len(rel):
        touch = pd.concat(
            [
                rel[["src", "order_key", "chunk_id"]].rename(columns={"src": "name"}),
                rel[["dst", "order_key", "chunk_id"]].rename(columns={"dst": "name"}),
            ]
        ).sort_values(["name", "order_key"], kind="stable")
        firsts = touch.groupby("name")[["order_key", "chunk_id"]].first()
        pieces["min_touch_order"] = firsts["order_key"]
        pieces["min_touch_chunk"] = firsts["chunk_id"]

    if not pieces:
        return ENTITY_PARTIAL_SCHEMA.empty_table()
    idx = pd.Index(
        sorted(set().union(*[p.index for p in pieces.values()])), name="name"
    )

    def col(key: str, fill):
        s = pieces.get(key)
        return s.reindex(idx, fill_value=fill) if s is not None else pd.Series(
            fill, index=idx
        )

    out = pd.DataFrame(
        {
            "name": idx,
            "descs": col("descs", ""),
            "ent_chunks": col("ent_chunks", ""),
            "type_order": col("type_order", ""),
            "type_val": col("type_val", ""),
            "min_ent_order": col("min_ent_order", _HI),
            "min_touch_order": col("min_touch_order", _HI),
            "min_touch_chunk": col("min_touch_chunk", ""),
            "n_mentions": col("n_mentions", 0).astype("int64"),
        }
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, schema=ENTITY_PARTIAL_SCHEMA,
                                preserve_index=False)


def _merge_entity_group(group: pd.DataFrame, max_descriptions: int | None = None,
                        max_sources: int | None = None) -> pa.Table:
    """Final merge of partial rows for one entity name."""
    descs: set[str] = set()
    ent_chunks: set[str] = set()
    # packed \x1e-joined sets; a partial whose min_ent_order is the _HI
    # sentinel saw no entity mention, so its packed "" means the EMPTY
    # set (otherwise "" is a legitimate single empty description —
    # clean_str strips \x00-\x1f so \x1e can never occur in members)
    for d, c, mo in zip(group["descs"], group["ent_chunks"], group["min_ent_order"]):
        if mo != _HI:
            descs.update(d.split("\x1e"))
            if c:
                ent_chunks.update(c.split("\x1e"))
    if max_descriptions is not None:
        descs = set(sorted(descs)[:max_descriptions])
    if max_sources is not None:
        ent_chunks = set(sorted(ent_chunks)[:max_sources])
    type_order, type_val = "", ""
    for to, tv in zip(group["type_order"], group["type_val"]):
        if tv and to >= type_order:
            type_order, type_val = to, tv
    min_ent = min(group["min_ent_order"])
    touch_idx = group["min_touch_order"].idxmin()
    min_touch = group["min_touch_order"][touch_idx]
    touch_chunk = group["min_touch_chunk"][touch_idx]
    n_mentions = int(group["n_mentions"].sum())

    stub_first = min_touch < min_ent  # stub node created before any entity record
    if min_ent == _HI:  # pure stub: only ever an edge endpoint
        description = ""
        sources = {touch_chunk}
    else:
        if stub_first:
            # reference: entity desc merges into the stub's "" description and
            # the stub's source id stays in the set (graph_extractor.py:212-227)
            descs.add("")
            sources = ent_chunks | {touch_chunk}
        else:
            sources = ent_chunks
        description = "\n".join(sorted(descs)) if len(descs) > 1 else next(iter(descs))
    return pa.Table.from_pylist(
        [
            {
                "name": group["name"].iloc[0],
                "type": type_val,
                "description": description,
                "source_id": ", ".join(sorted(sources)),
                "n_mentions": n_mentions,
            }
        ],
        schema=ENTITY_SCHEMA,
    )


def canonicalize_entities(mentions, batch_size: int = 32768, num_buckets: int = 64,
                          max_descriptions: int | None = None,
                          max_sources: int | None = None,
                          driver_threshold: int = 200_000,
                          size_hint: int | None = None):
    """Dataset[mention] -> Dataset[entity] (the G1 shuffle).

    Final merge runs via bucketed_group_map: one Ray task per key-hash
    bucket, not one Python call per entity (high-cardinality keys).

    ``size_hint``: cheap upper bound on the partial-row count (the
    mention count is always one — combiners only compress); when it
    already exceeds ``driver_threshold`` the size probe's materialize
    barrier is skipped and the merge streams."""
    import functools

    from knowledge_graph_ray.functions.grouping import bucketed_group_map

    partials = mentions.map_batches(
        functools.partial(
            entity_partials_batch,
            max_descriptions=max_descriptions,
            max_sources=max_sources,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return bucketed_group_map(
        partials,
        ["name"],
        functools.partial(
            _merge_entity_group,
            max_descriptions=max_descriptions,
            max_sources=max_sources,
        ),
        num_buckets=num_buckets,
        driver_threshold=driver_threshold,
        size_hint=size_hint,
        empty_schema=ENTITY_SCHEMA,
    )


def edge_partials_batch(batch: pa.Table, max_descriptions: int | None = None,
                        max_sources: int | None = None) -> pa.Table:
    """Per-batch combiner for relationship mentions, undirected key
    (vectorized; see entity_partials_batch)."""
    import numpy as np

    df = batch.select(
        ["kind", "src", "dst", "description", "chunk_id", "weight"]
    ).to_pandas()
    rel = df[df["kind"] == "rel"]
    if not len(rel):
        return EDGE_PARTIAL_SCHEMA.empty_table()
    swap = rel["src"] > rel["dst"]
    rel = pd.DataFrame(
        {
            "src": np.where(swap, rel["dst"], rel["src"]),
            "dst": np.where(swap, rel["src"], rel["dst"]),
            "description": rel["description"].to_numpy(),
            "chunk_id": rel["chunk_id"].to_numpy(),
            "weight": rel["weight"].to_numpy(),
        }
    )
    key = ["src", "dst"]
    agg = rel.groupby(key).agg(
        weight=("weight", "sum"), n_mentions=("weight", "size")
    )
    d = rel[key + ["description"]].drop_duplicates().sort_values(
        key + ["description"]
    )
    if max_descriptions is not None:
        d = d[d.groupby(key).cumcount() < max_descriptions]
    descs = d.groupby(key)["description"].agg("\x1e".join)
    c = rel[key + ["chunk_id"]].drop_duplicates().sort_values(key + ["chunk_id"])
    if max_sources is not None:
        c = c[c.groupby(key).cumcount() < max_sources]
    chunks = c.groupby(key)["chunk_id"].agg("\x1e".join)
    out = agg.assign(descs=descs, chunks=chunks).reset_index()
    out = out[["src", "dst", "weight", "descs", "chunks", "n_mentions"]]
    out["n_mentions"] = out["n_mentions"].astype("int64")
    return pa.Table.from_pandas(out, schema=EDGE_PARTIAL_SCHEMA,
                                preserve_index=False)


def _merge_edge_group(group: pd.DataFrame, max_descriptions: int | None = None,
                      max_sources: int | None = None) -> pa.Table:
    descs: set[str] = set()
    chunks: set[str] = set()
    for d in group["descs"]:
        descs.update(d.split(""))
    for c in group["chunks"]:
        if c:
            chunks.update(c.split(""))
    if max_descriptions is not None:
        descs = set(sorted(descs)[:max_descriptions])
    if max_sources is not None:
        chunks = set(sorted(chunks)[:max_sources])
    description = "\n".join(sorted(descs)) if len(descs) > 1 else next(iter(descs))
    return pa.Table.from_pylist(
        [
            {
                "src": group["src"].iloc[0],
                "dst": group["dst"].iloc[0],
                "weight": float(group["weight"].sum()),
                "description": description,
                "source_id": ", ".join(sorted(chunks)),
                "n_mentions": int(group["n_mentions"].sum()),
            }
        ],
        schema=RELATIONSHIP_SCHEMA,
    )


def canonicalize_relationships(mentions, batch_size: int = 32768, num_buckets: int = 64,
                               max_descriptions: int | None = None,
                               max_sources: int | None = None,
                               driver_threshold: int = 200_000,
                               size_hint: int | None = None):
    """Dataset[mention] -> Dataset[relationship] (the G2 shuffle).
    ``size_hint``: see canonicalize_entities."""
    import functools

    from knowledge_graph_ray.functions.grouping import bucketed_group_map

    partials = mentions.map_batches(
        functools.partial(
            edge_partials_batch,
            max_descriptions=max_descriptions,
            max_sources=max_sources,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return bucketed_group_map(
        partials,
        ["src", "dst"],
        functools.partial(
            _merge_edge_group,
            max_descriptions=max_descriptions,
            max_sources=max_sources,
        ),
        num_buckets=num_buckets,
        driver_threshold=driver_threshold,
        size_hint=size_hint,
        empty_schema=RELATIONSHIP_SCHEMA,
    )


# --------------------------------------------------------- incremental (G8)


def _repack_sets(values: "pd.Series", sep: str) -> "pd.Series":
    """Vectorized per-row ``sep``-split -> set -> sorted -> \\x1e-join.

    Explode + drop_duplicates + groupby over the row position — the
    same pandas shape as the mention combiners, no Python row loop.
    An empty/None input row packs to "" (the empty set, matching the
    row-loop form this replaces)."""
    import numpy as np

    idx = np.arange(len(values))
    e = pd.DataFrame({
        "i": idx, "part": values.fillna("").str.split(sep)
    }).explode("part")
    e = e.drop_duplicates().sort_values(["i", "part"], kind="stable")
    return e.groupby("i")["part"].agg("\x1e".join).reindex(idx).fillna("")


def entities_to_partials(batch: pa.Table) -> pa.Table:
    """Canonical entity rows -> partial rows, for incremental re-merge.

    Reference incremental mode string-concatenates old/new descriptions
    ("Old Information---\\n...", utils/graph.py:68-115); our merge is an
    associative set union, so a previous run's canonical table converts
    back to partials and re-merges exactly (SURVEY.md G8).  Old rows get
    the lowest order sentinel "" so a NEW non-empty type wins, matching
    the reference's dict.update(new-over-old) semantics.
    """
    names = [c for c in ("name", "type", "description", "source_id",
                         "n_mentions") if c in batch.column_names]
    df = batch.select(names).to_pandas()
    if len(df) == 0:
        return ENTITY_PARTIAL_SCHEMA.empty_table()
    nm = (df["n_mentions"].fillna(0) if "n_mentions" in df.columns
          else pd.Series(0, index=df.index))
    out = pd.DataFrame({
        "name": df["name"],
        "descs": _repack_sets(df["description"], "\n").to_numpy(),
        "ent_chunks": _repack_sets(df["source_id"], ", ").to_numpy(),
        "type_order": "",
        "type_val": df["type"].fillna(""),
        "min_ent_order": "",
        "min_touch_order": _HI,
        "min_touch_chunk": "",
        "n_mentions": nm.astype("int64"),
    })
    return pa.Table.from_pandas(out, schema=ENTITY_PARTIAL_SCHEMA,
                                preserve_index=False)


def relationships_to_partials(batch: pa.Table) -> pa.Table:
    """Canonical relationship rows -> partial rows (weights re-sum)."""
    names = [c for c in ("src", "dst", "weight", "description",
                         "source_id", "n_mentions") if c in batch.column_names]
    df = batch.select(names).to_pandas()
    if len(df) == 0:
        return EDGE_PARTIAL_SCHEMA.empty_table()
    nm = (df["n_mentions"].fillna(0) if "n_mentions" in df.columns
          else pd.Series(0, index=df.index))
    out = pd.DataFrame({
        "src": df["src"],
        "dst": df["dst"],
        "weight": df["weight"].astype("float64"),
        "descs": _repack_sets(df["description"], "\n").to_numpy(),
        "chunks": _repack_sets(df["source_id"], ", ").to_numpy(),
        "n_mentions": nm.astype("int64"),
    })
    return pa.Table.from_pandas(out, schema=EDGE_PARTIAL_SCHEMA,
                                preserve_index=False)


def incremental_canonicalize_entities(prev_entities, new_mentions,
                                      batch_size: int = 32768, num_buckets: int = 64,
                                      max_descriptions: int | None = None,
                                      max_sources: int | None = None):
    """Union a previous run's canonical entities with new mentions and
    re-merge — the incremental path (reference cluster_graph.py:32-36 /
    utils/graph.py:68-115, associative here so no special-case strings)."""
    import functools

    from knowledge_graph_ray.functions.grouping import bucketed_group_map

    prev_partials = prev_entities.map_batches(
        entities_to_partials, batch_format="pyarrow"
    )
    new_partials = new_mentions.map_batches(
        functools.partial(
            entity_partials_batch,
            max_descriptions=max_descriptions,
            max_sources=max_sources,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return bucketed_group_map(
        prev_partials.union(new_partials),
        ["name"],
        functools.partial(
            _merge_entity_group,
            max_descriptions=max_descriptions,
            max_sources=max_sources,
        ),
        num_buckets=num_buckets,
    )


def incremental_canonicalize_relationships(prev_relationships, new_mentions,
                                           batch_size: int = 32768, num_buckets: int = 64,
                                           max_descriptions: int | None = None,
                                           max_sources: int | None = None):
    import functools

    from knowledge_graph_ray.functions.grouping import bucketed_group_map

    prev_partials = prev_relationships.map_batches(
        relationships_to_partials, batch_format="pyarrow"
    )
    new_partials = new_mentions.map_batches(
        functools.partial(
            edge_partials_batch,
            max_descriptions=max_descriptions,
            max_sources=max_sources,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return bucketed_group_map(
        prev_partials.union(new_partials),
        ["src", "dst"],
        functools.partial(
            _merge_edge_group,
            max_descriptions=max_descriptions,
            max_sources=max_sources,
        ),
        num_buckets=num_buckets,
    )


# --------------------------------------------------- fused single-pass path

COMBINED_PARTIAL_SCHEMA = pa.schema(
    [("side", pa.int8())]          # 0 = entity partial, 1 = edge partial
    + [(f.name, f.type) for f in ENTITY_PARTIAL_SCHEMA]  # name..n_mentions
    + [(f.name, f.type) for f in EDGE_PARTIAL_SCHEMA
       if f.name not in ("descs", "n_mentions")]          # src dst weight chunks
)


def combined_partials_batch(batch: pa.Table,
                            max_descriptions: int | None = None,
                            max_sources: int | None = None) -> pa.Table:
    """ONE pass over a mention batch emitting BOTH entity and edge
    partial rows as a tagged union — the barrier-free canonicalize
    shape: the raw mention stream (GBs per million docs) is never
    materialized; only partial rows (keys x batches) cross the
    pipeline's one barrier.  ``descs``/``n_mentions`` columns are shared
    between the two partial schemas; the rest null-fill the other side.
    """
    ep = entity_partials_batch(batch, max_descriptions=max_descriptions,
                               max_sources=max_sources)
    rp = edge_partials_batch(batch, max_descriptions=max_descriptions,
                             max_sources=max_sources)
    cols: dict[str, pa.Array] = {}
    ne, nr = len(ep), len(rp)
    for f in COMBINED_PARTIAL_SCHEMA:
        if f.name == "side":
            cols["side"] = pa.concat_arrays(
                [pa.array([0] * ne, pa.int8()), pa.array([1] * nr, pa.int8())]
            )
            continue
        e_col = (ep.column(f.name).combine_chunks()
                 if f.name in ENTITY_PARTIAL_SCHEMA.names else pa.nulls(ne, f.type))
        r_col = (rp.column(f.name).combine_chunks()
                 if f.name in EDGE_PARTIAL_SCHEMA.names else pa.nulls(nr, f.type))
        cols[f.name] = pa.concat_arrays([e_col.cast(f.type), r_col.cast(f.type)])
    return pa.Table.from_pydict(cols, schema=COMBINED_PARTIAL_SCHEMA)


def canonicalize_fused(mentions, batch_size: int | None = None,
                       num_buckets: int = 64,
                       max_descriptions: int | None = None,
                       max_sources: int | None = None,
                       driver_threshold: int = 200_000):
    """-> (entities, relationships) via ONE streaming pass over the
    mention stream (G1+G2 fused).

    The unfused path materializes the full mention dataset so two
    downstream canonicalize scans don't re-run extraction — a
    GB-scale object-store barrier plus two full re-reads per million
    docs.  Here both per-batch combiners run inside one ``map_batches``
    while extraction streams, and only the combiner OUTPUT (one row per
    key per batch, ~1000x smaller) is materialized; the two final
    merges then read the tiny tagged table.  Use when the raw mention
    table is not itself a needed artifact (scaling/throughput runs;
    ``PipelineConfig.fused_canonicalize``).
    """
    import functools

    from knowledge_graph_ray.functions.grouping import bucketed_group_map

    # batch_size=None = whole upstream blocks: an explicit batch size
    # here COALESCES extract-shard outputs into fewer fused tasks
    # (measured 128 -> ~10 tasks at 20k docs, a 4x wall regression);
    # block-sized batches keep one fused chunk->extract->combine task
    # per shard and produce FEWER partials (keys x blocks, not
    # keys x 32k-batches)
    combined = mentions.map_batches(
        functools.partial(combined_partials_batch,
                          max_descriptions=max_descriptions,
                          max_sources=max_sources),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).materialize()
    n = combined.count()  # metadata-only on a materialized dataset

    def take_side(side: int, schema: pa.Schema):
        def body(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.equal(b.column("side"), pa.scalar(side, pa.int8()))
            sub = b.filter(keep)
            return pa.Table.from_pydict(
                {f.name: sub.column(f.name).cast(f.type) for f in schema},
                schema=schema,
            )

        return body

    ent_partials = combined.map_batches(
        take_side(0, ENTITY_PARTIAL_SCHEMA), batch_format="pyarrow"
    )
    rel_partials = combined.map_batches(
        take_side(1, EDGE_PARTIAL_SCHEMA), batch_format="pyarrow"
    )
    entities = bucketed_group_map(
        ent_partials, ["name"],
        functools.partial(_merge_entity_group,
                          max_descriptions=max_descriptions,
                          max_sources=max_sources),
        num_buckets=num_buckets, driver_threshold=driver_threshold,
        size_hint=n, empty_schema=ENTITY_SCHEMA,
    )
    relationships = bucketed_group_map(
        rel_partials, ["src", "dst"],
        functools.partial(_merge_edge_group,
                          max_descriptions=max_descriptions,
                          max_sources=max_sources),
        num_buckets=num_buckets, driver_threshold=driver_threshold,
        size_hint=n, empty_schema=RELATIONSHIP_SCHEMA,
    )
    return entities, relationships
