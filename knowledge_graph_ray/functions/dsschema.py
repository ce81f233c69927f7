"""Probe-free dataset schema resolution.

``Dataset.schema()`` on a lazy dataset executes a limit-1 probe whose
tasks Ray CANCELS once the first row arrives.  An async cancellation can
interrupt a worker mid-module-import, leaving a half-initialized module
(observed: ``polars``) cached in ``sys.modules`` that poisons every
later task scheduled onto that worker process — including hash-bucket
computations, which then silently diverge per process.

``dataset_schema`` therefore never executes a cancellable probe: it
first asks the plan's non-executing metadata
(``schema(fetch_if_missing=False)`` — parquet reads and executed stages
know their schema without running), and only if that is unknown runs the
dataset to completion with ``materialize()`` (all tasks finish normally;
nothing is cancelled) and reads the schema off the materialized blocks.
The possibly-materialized dataset is returned alongside the schema so
callers reuse the executed blocks instead of recomputing.
"""

from __future__ import annotations

import pyarrow as pa


def _norm_type(t) -> pa.DataType:
    if isinstance(t, pa.DataType):
        return t
    import numpy as np

    if t is object or t is str or np.dtype(t) == np.dtype("O"):
        return pa.string()
    return pa.from_numpy_dtype(np.dtype(t))


def _to_arrow(sch) -> "pa.Schema | None":
    if sch is None:
        return None
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    try:
        return pa.schema(
            [(n, _norm_type(t)) for n, t in zip(sch.names, sch.types)]
        )
    except Exception:
        return None


def plan_schema(ds) -> "pa.Schema | None":
    """Non-executing-only variant of ``dataset_schema``: the plan's
    metadata schema or None — never materializes, never probes.  For
    callers that only need a best-effort schema (empty-input
    fallbacks) and must not trigger execution."""
    try:
        return _to_arrow(ds.schema(fetch_if_missing=False))
    except Exception:
        return None


def dataset_schema(ds):
    """-> (pa.Schema, ds) without ever running a cancellable probe.

    ``ds`` in the result may be the materialized dataset (when the lazy
    plan did not know its schema); callers should use it in place of
    their input to avoid recomputation.
    """
    sch = _to_arrow(ds.schema(fetch_if_missing=False))
    if sch is not None:
        return sch, ds
    ds = ds.materialize()
    sch = _to_arrow(ds.schema(fetch_if_missing=False))
    if sch is None:
        # fully executed; any remaining fetch is metadata-only
        sch = _to_arrow(ds.schema())
    if sch is None:
        raise ValueError(
            "cannot resolve dataset schema (empty with no schema metadata)"
        )
    return sch, ds
