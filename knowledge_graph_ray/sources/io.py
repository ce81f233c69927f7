"""Input sources for the interleaved-document corpus + resume filtering.

Reference behavior replaced (SURVEY.md S1/S2/D1): LangChain
DirectoryLoader + a ``checkpoint.txt`` newline list of processed paths
(/root/reference/verbs/documents/load_documents/run.py:13-53).  Here the
input is a columnar table (Lance when the ``lance`` package is present,
Parquet otherwise — same logical schema per BASELINE.json input_hint)
and resume is an anti-join of ``doc_id`` against the completed output
manifest, evaluated as a broadcast-set filter inside ``map_batches``
(doc-id sets for completed partitions are small relative to the corpus;
for larger completed sets swap in a Bloom filter — same stage shape).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa


def read_documents(path: str, columns: list[str] | None = None):
    """Read an interleaved-document table (directory or file).

    Prefers Lance (`ray.data.read_lance`) when the format/package is
    available, else Parquet — identical downstream schema.
    """
    import ray.data

    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        try:
            import lance  # noqa: F401

            return ray.data.read_lance(path, columns=columns)
        except ImportError as err:
            raise ImportError(
                "input looks like a Lance dataset but the 'lance' package "
                "is not installed; re-materialize as Parquet or install lance"
            ) from err
    return ray.data.read_parquet(path, columns=columns)


def completed_doc_ids(manifest_dir: str) -> set[str]:
    """doc ids recorded as completed by a prior run's output manifest.

    The export manifest (state/checkpoint.py) lists per-partition files;
    a companion ``_completed_docs.json`` (written by
    ``record_completed_docs``) lists the doc ids each partition covered.
    """
    path = os.path.join(manifest_dir, "_completed_docs.json")
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        payload = json.load(f)
    done: set[str] = set()
    for part in payload.get("partitions", []):
        done.update(part.get("doc_ids", []))
    return done


def record_completed_docs(manifest_dir: str, partition_key: str, doc_ids: list[str]):
    """Append a completed partition's doc ids (atomic read-modify-write)."""
    os.makedirs(manifest_dir, exist_ok=True)
    path = os.path.join(manifest_dir, "_completed_docs.json")
    payload = {"partitions": []}
    if os.path.exists(path):
        with open(path) as f:
            payload = json.load(f)
    payload["partitions"] = [
        p for p in payload["partitions"] if p.get("key") != partition_key
    ] + [{"key": partition_key, "doc_ids": sorted(doc_ids)}]
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def filter_pending(docs, manifest_dir: str):
    """Anti-join against completed doc ids: broadcast the done-set once,
    filter inside map_batches (guide's semi/anti pattern — no shuffle)."""
    import pyarrow as pa
    import ray

    done = completed_doc_ids(manifest_dir)
    if not done:
        return docs
    done_ref = ray.put(done)

    class Pending:
        def __init__(self):
            self.done = ray.get(done_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pa.array(
                [d not in self.done for d in batch.column("doc_id").to_pylist()]
            )
            return batch.filter(mask)

    return docs.map_batches(Pending, batch_format="pyarrow", concurrency=(1, 4))


def read_text_directory(path: str, encoding: str = "utf-8",
                        file_extensions: list[str] | None = None):
    """Directory of raw text files -> interleaved-document Dataset.

    S1 parity with the reference's LangChain ``DirectoryLoader``
    (load_documents/run.py:37): one document per file, ``doc_id`` =
    path relative to ``path`` (so the processed-checkpoint resume
    filters by the same identifier the reference's checkpoint.txt
    records).  Reads distribute via ``read_binary_files`` — no file
    touches the driver.
    """
    import pyarrow as pa
    import ray.data

    from knowledge_graph_ray.corpus import CORPUS_SCHEMA

    root = os.path.abspath(path)
    ds = ray.data.read_binary_files(
        root, include_paths=True,
        file_extensions=file_extensions or ["txt", "md", "text"],
    )

    def to_docs(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        doc_ids, spans = [], []
        for p, blob in zip(paths, blobs):
            rel = os.path.relpath(p, root) if os.path.isabs(p) else p
            doc_ids.append(rel)
            text = blob.decode(encoding, errors="replace")
            spans.append(
                [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
            )
        return pa.Table.from_pydict(
            {"doc_id": doc_ids, "spans": spans}, schema=CORPUS_SCHEMA
        )

    return ds.map_batches(to_docs, batch_format="pyarrow")


def union_by_name(*datasets, strict: bool = False):
    """Schema-drift-tolerant union: align every input to the UNION of
    all column names (missing columns filled with typed nulls, column
    order normalized), then stream ``ds.union``.

    Ray Data's ``union`` requires block schemas to agree exactly; real
    ingestion rarely does — months of crawl output add and reorder
    columns.  This is the ``UNION ALL BY NAME`` verb (reference
    pipelines concat pandas frames, which align by name implicitly).

    ``strict=True`` raises on type conflicts between same-named
    columns; the default widens via Arrow's unify semantics only when
    the types differ, else keeps the first-seen type.  Schema
    resolution uses the probe-free plan walk (functions/dsschema) —
    no input executes just to be aligned."""
    from knowledge_graph_ray.functions.dsschema import dataset_schema

    assert datasets, "union_by_name needs at least one dataset"
    resolved = []
    fields: dict[str, pa.DataType] = {}
    for ds in datasets:
        sch, ds = dataset_schema(ds)
        resolved.append((sch, ds))
        for f in sch:
            if f.name not in fields:
                fields[f.name] = f.type
            elif fields[f.name] != f.type:
                if strict:
                    raise TypeError(
                        f"union_by_name type conflict on {f.name!r}: "
                        f"{fields[f.name]} vs {f.type}"
                    )
                # widen: let Arrow pick the common type via a unify cast
                fields[f.name] = pa.unify_schemas(
                    [pa.schema([(f.name, fields[f.name])]),
                     pa.schema([(f.name, f.type)])],
                    promote_options="permissive",
                ).field(f.name).type
    target = pa.schema(sorted(fields.items()))

    def align(batch: pa.Table) -> pa.Table:
        cols = []
        for f in target:
            if f.name in batch.schema.names:
                col = batch.column(f.name)
                if col.type != f.type:
                    col = col.cast(f.type)
            else:
                col = pa.nulls(len(batch), f.type)
            cols.append(col)
        return pa.Table.from_arrays(cols, schema=target)

    aligned = [ds.map_batches(align, batch_format="pyarrow")
               for _, ds in resolved]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out
