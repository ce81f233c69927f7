"""Executor-launch budget pins for the broadcast-join fast paths.

Ray 2.49 facts these guard (measured; see BASELINE.md fourth coda):

* ``to_arrow_refs`` on a LAZY dataset launches TWO streaming executors
  (blocks + a ``.schema()`` re-execution) — every driver collect must
  therefore run off a materialized handle.
* Resolving a lazy left schema at join-build time materializes the whole
  lazy prefix — an N-join chain must stay ONE streaming pass.
* ``MaterializedDataset`` answers count/schema/to_arrow_refs for free —
  iterative callers (BFS frontiers) must pay ZERO extra launches per
  probe.

A regression here silently multiplies whole-pipeline executions at
100-TB scale, so the budgets are exact, not <=.
"""

import contextlib

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from knowledge_graph_ray.functions.joins import size_adaptive_join


@contextlib.contextmanager
def _count_launches():
    import ray.data._internal.execution.streaming_executor as se

    orig = se.StreamingExecutor.__init__
    box = {"n": 0}

    def patched(self, *a, **k):
        box["n"] += 1
        return orig(self, *a, **k)

    se.StreamingExecutor.__init__ = patched
    try:
        yield box
    finally:
        se.StreamingExecutor.__init__ = orig


def _opaque(df: pd.DataFrame):
    """A dataset whose plan does NOT know its schema (like project())."""
    return rd.from_pandas(df).map_batches(lambda b: b, batch_format="pyarrow")


def test_chained_broadcast_joins_are_one_streaming_pass():
    left = _opaque(pd.DataFrame({"k1": [1, 2, 3, 4], "k2": [10, 20, 30, 40],
                                 "v": [1.0, 2.0, 3.0, 4.0]}))
    r1 = pd.DataFrame({"k1": [1, 2, 3, 4], "a": ["w", "x", "y", "z"]})
    r2 = pd.DataFrame({"k2": [10, 20, 30, 40], "b": [7, 8, 9, 10]})

    with _count_launches() as box:
        step = size_adaptive_join(left, _opaque(r1), on=["k1"], how="inner",
                                  right_size_hint=len(r1))
        step = size_adaptive_join(step, _opaque(r2), on=["k2"], how="inner",
                                  right_size_hint=len(r2))
        built = box["n"]
        out = step.to_pandas()

    # build: exactly one bounded materialize per right side; the LEFT
    # chain must not execute at build time at all
    assert built == 2, f"chained join build launched {built} executors"
    # consume: the whole left chain is ONE streaming pass
    assert box["n"] - built == 1, (
        f"left chain took {box['n'] - built} executions, want 1"
    )
    assert sorted(out.columns) == ["a", "b", "k1", "k2", "v"]
    assert len(out) == 4 and set(out.b) == {7, 8, 9, 10}


def test_materialized_right_probe_is_free():
    left = _opaque(pd.DataFrame({"k": [1, 2, 3, 4, 5], "v": list("abcde")}))
    frontier = rd.from_pandas(pd.DataFrame({"k": [2, 4]})).materialize()

    with _count_launches() as box:
        semi = size_adaptive_join(left, frontier, on=["k"], how="left_semi")
        assert box["n"] == 0, (
            f"materialized-right semi-join probe launched {box['n']} executors"
        )
        out = semi.to_pandas()
    assert box["n"] == 1  # the single left streaming pass
    assert sorted(out.v) == ["b", "d"]


def test_broadcast_join_chain_matches_pandas_reference():
    # value-level check for the same chain the budget test pins
    left = pd.DataFrame({"k1": [1, 1, 2, 3], "k2": [10, 20, 10, 30],
                         "v": [1, 2, 3, 4]})
    r1 = pd.DataFrame({"k1": [1, 2], "a": ["x", "y"]})
    r2 = pd.DataFrame({"k2": [10, 30], "b": [7, 9]})
    step = size_adaptive_join(_opaque(left), _opaque(r1), on=["k1"],
                              how="inner", right_size_hint=2)
    step = size_adaptive_join(step, _opaque(r2), on=["k2"],
                              how="left_outer", right_size_hint=2)
    got = step.to_pandas().sort_values(["k1", "k2", "v"]).reset_index(drop=True)
    want = (left.merge(r1, on="k1", how="inner")
                .merge(r2, on="k2", how="left")
                .sort_values(["k1", "k2", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )
