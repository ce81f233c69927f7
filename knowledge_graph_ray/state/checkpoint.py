"""Stage-boundary checkpoints with per-partition lineage manifests.

Replaces the reference's ad-hoc persistence — ``checkpoint.txt`` file
lists (/root/reference/verbs/documents/load_documents/run.py:13-22),
GraphML snapshots + JSON diffs (utils/graph.py:180-248,
checkpoints/file.py:7-51) — with the batch-pipeline form of resumability
(north rule): each stage writes a Parquet directory plus a
``_manifest.json`` recording per-file row counts, the input fingerprint,
and stage metrics.  A rerun with the same fingerprint skips the stage and
reads the checkpoint; a changed fingerprint invalidates it.

Writes are atomic: data lands in ``<path>.tmp-<pid>`` and is renamed into
place after the manifest is written, so a killed run never leaves a
half-complete checkpoint that a resume would trust.
"""

from __future__ import annotations

import json
import os
import shutil
import time

MANIFEST_NAME = "_manifest.json"


def checkpoint_complete(path: str, fingerprint: str | None = None) -> bool:
    manifest_path = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(manifest_path):
        return False
    try:
        with open(manifest_path) as f:
            manifest = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    if fingerprint is not None and manifest.get("fingerprint") != fingerprint:
        return False
    return manifest.get("status") == "complete"


def write_checkpoint(
    ds,
    path: str,
    fingerprint: str | None = None,
    stage: str | None = None,
    metrics: dict | None = None,
):
    """write_parquet + per-file lineage manifest, atomically."""
    import pyarrow.dataset as pads

    tmp = f"{path}.tmp-{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    t0 = time.time()
    ds.write_parquet(tmp)
    wall = time.time() - t0

    # an empty dataset writes no files (possibly not even the directory):
    # persist one zero-row file so the checkpoint keeps its schema and a
    # resume read works
    os.makedirs(tmp, exist_ok=True)
    if not any(p.endswith(".parquet") for p in os.listdir(tmp)):
        import pyarrow as pa
        import pyarrow.parquet as pq

        sch = ds.schema()
        base = getattr(sch, "base_schema", None) if sch is not None else None
        if not isinstance(base, pa.Schema):
            base = pa.schema([])
        pq.write_table(base.empty_table(), os.path.join(tmp, "empty-0.parquet"))

    dataset = pads.dataset(tmp, format="parquet")
    partitions = []
    total_rows = 0
    for fragment in dataset.get_fragments():
        rows = fragment.count_rows()
        total_rows += rows
        partitions.append(
            {"file": os.path.basename(fragment.path), "rows": rows}
        )
    manifest = {
        "status": "complete",
        "stage": stage,
        "fingerprint": fingerprint,
        "rows": total_rows,
        "write_seconds": round(wall, 3),
        "partitions": partitions,
        "metrics": metrics or {},
        "written_at": time.time(),
    }
    with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return manifest


def read_checkpoint(path: str):
    """Checkpointed stage output -> Dataset (lazy parquet read)."""
    import ray.data

    parts = [
        os.path.join(path, p)
        for p in sorted(os.listdir(path))
        if p.endswith(".parquet")
    ]
    return ray.data.read_parquet(parts)


def checkpoint_or_compute(make_ds, path: str, fingerprint: str, stage: str):
    """Resume helper: reuse a complete checkpoint with a matching input
    fingerprint, else compute + write it.  Returns a Dataset either way."""
    if checkpoint_complete(path, fingerprint):
        return read_checkpoint(path)
    ds = make_ds()
    write_checkpoint(ds, path, fingerprint=fingerprint, stage=stage)
    return read_checkpoint(path)
