"""Property tests for the round-5 hot rewrites.

Both targets are pure functions whose exactness claims the engine leans
on: the vectorized CRC32 (MinHash shingle hashing must equal
zlib.crc32 bit-for-bit or LSH buckets silently change) and the
giant-component bisection pre-split (must assign every node the SAME
leaf the single-task recursion would reach, for ANY combination of
max_louvain_nodes / max_cluster_size, or the two regimes emit different
community tables).
"""
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from knowledge_graph_ray.stages.community import _leaf_assignments
from knowledge_graph_ray.stages.dedup import _crc32_of_strings


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=80), max_size=60))
def test_crc32_of_strings_matches_zlib(strs):
    arr = pa.array(strs, type=pa.string())
    got = _crc32_of_strings(arr)
    want = np.array([zlib.crc32(s.encode()) for s in strs], dtype=np.uint32)
    assert got.tolist() == want.tolist()


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=50,
             unique=True),
    st.integers(min_value=1, max_value=2000),
)
def test_crc32_of_strings_matches_zlib_with_one_long_string(strs, long_len):
    # exercises the >=1KB zlib-kernel tail path next to short strings
    strs = strs + ["y" * long_len]
    arr = pa.array(strs, type=pa.string())
    got = _crc32_of_strings(arr)
    want = np.array([zlib.crc32(s.encode()) for s in strs], dtype=np.uint32)
    assert got.tolist() == want.tolist()


def _reference_leaves(names, ml, mc):
    """Direct transcription of _cluster_component's descent gates:
    the root is always entered (bisects iff n > ml); a bisected child
    is descended into iff it is BOTH > mc (the recurse() re-entry
    guard) and > ml (the bisection-vs-louvain branch); any child not
    descended-by-bisection is a pre-split leaf at (path/ci, level+1)."""
    out = {}

    def rec(cluster, level, path):
        n = len(cluster)
        if n > ml and n > 1:
            ordered = sorted(cluster)
            half = (n + 1) // 2
            for ci, sub in enumerate([ordered[:half], ordered[half:]]):
                if len(sub) > mc and len(sub) > ml:
                    rec(sub, level + 1, f"{path}/{ci}")
                else:
                    for node in sub:
                        out[node] = (f"{path}/{ci}", level + 1)
        else:
            for node in cluster:
                out[node] = (path, level)

    rec(list(names), 0, "")
    return out


@settings(max_examples=80, deadline=None)
@given(
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=1, max_value=120),
    st.integers(min_value=1, max_value=120),
)
def test_leaf_assignments_match_recursion_gates(n, ml, mc):
    names = [f"n{i:05d}" for i in range(n)]
    sub = pd.DataFrame({"component": ["c"] * n, "name": names})
    t = _leaf_assignments(sub, ml, mc).to_pandas()
    got = {
        r["name"]: (r["leaf_path"], int(r["leaf_level"]))
        for _, r in t.iterrows()
    }
    assert got == _reference_leaves(names, ml, mc)
