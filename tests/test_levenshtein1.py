"""levenshtein1_pairs / _ed1_class_mask (stages/fuzzy.py) vs a
brute-force DP oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from knowledge_graph_ray.stages.fuzzy import _ed1_class_mask, levenshtein1_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_ed1_mask_edge_cases():
    pairs = [
        ("ab", "ba"),      # shared delete, distance 2 -> False
        ("ab", "ab"),      # equal -> True
        ("ab", "abc"),     # suffix insert -> True
        ("abc", "bc"),     # prefix delete -> True
        ("abc", "axc"),    # substitution -> True
        ("abc", "axd"),    # two subs -> False
        ("", "a"),         # empty vs 1 char -> True
        ("", ""),          # both empty -> True
        ("kitten", "sitten"),
        ("kitten", "sittin"),
        ("abcd", "acbd"),  # transposition = distance 2 -> False
    ]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = _ed1_class_mask(a, b)
    want = np.array([_lev(x, y) <= 1 for x, y in pairs])
    assert (got == want).all()


def test_levenshtein1_pairs_matches_bruteforce():
    rng = np.random.default_rng(3)
    alpha = list("abcd")
    names = list({
        "".join(rng.choice(alpha, rng.integers(1, 7)))
        for _ in range(150)
    })
    want = {
        (x, y)
        for i, x in enumerate(names)
        for y in names[i + 1:]
        if _lev(x, y) <= 1
    }
    want = {(min(x, y), max(x, y)) for x, y in want}

    ds = rd.from_pandas(pd.DataFrame({"name": names}))
    got = levenshtein1_pairs(ds, "name").to_pandas()
    assert set(zip(got.a, got.b)) == want
    assert len(got) == len(got.drop_duplicates())


def test_levenshtein1_pairs_duplicate_values_collapse():
    ds = rd.from_pandas(pd.DataFrame({"name": ["aa", "aa", "ab", "zz"]}))
    got = levenshtein1_pairs(ds, "name").to_pandas()
    assert set(zip(got.a, got.b)) == {("aa", "ab")}
