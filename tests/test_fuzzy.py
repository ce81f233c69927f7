"""char_jaccard_pairs (stages/fuzzy.py) vs per-pair set brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from knowledge_graph_ray.stages.fuzzy import char_jaccard_pairs


def _jaccard(a: str, b: str) -> float:
    sa, sb = set(a.encode()), set(b.encode())
    return len(sa & sb) / len(sa | sb)


def test_char_jaccard_pairs_matches_bruteforce():
    rng = np.random.default_rng(9)
    words = ["widget", "gadget", "bolt", "nut", "cog", "spring"]
    colors = ["red", "blue", "gold", "mint"]
    n = 120
    df = pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        "blk": rng.choice(["b1", "b2", "b3"], n),
        "name": [f"{rng.choice(colors)} {rng.choice(words)}"
                 for _ in range(n)],
    })
    thr = 0.8
    got = (
        char_jaccard_pairs(rd.from_pandas(df).repartition(6), id_col="id",
                           text_col="name", block_cols=["blk"],
                           threshold=thr)
        .to_pandas().sort_values(["blk", "id_a", "id_b"])
        .reset_index(drop=True)
    )
    rows = []
    for blk, g in df.groupby("blk"):
        g = g.sort_values("id")
        recs = list(g.itertuples())
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                s = _jaccard(recs[i].name, recs[j].name)
                if s >= thr:
                    rows.append((blk, recs[i].id, recs[j].id, s))
    exp = pd.DataFrame(rows, columns=["blk", "id_a", "id_b", "sim"]) \
        .sort_values(["blk", "id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(exp) > 0  # the test actually exercised matches


def test_char_jaccard_oversized_block_secondary_blocking_exact():
    """A block above max_block_rows completes (no raise) and the chunked
    chunk-pair tiling emits EXACTLY the unchunked pair set."""
    rng = np.random.default_rng(17)
    words = ["widget", "gadget", "bolt", "nut", "cog", "spring", "gear"]
    n = 23  # not a multiple of the cap: exercises the ragged last chunk
    df = pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        "blk": ["hot"] * n,
        "name": [str(rng.choice(words)) for _ in range(n)],
    })

    def run(cap):
        return (
            char_jaccard_pairs(rd.from_pandas(df), id_col="id",
                               text_col="name", block_cols=["blk"],
                               threshold=0.6, max_block_rows=cap)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )

    unchunked = run(1_000)
    for cap in (5, 7, 22):
        chunked = run(cap)
        pd.testing.assert_frame_equal(chunked, unchunked, check_dtype=False)
    assert len(unchunked) > n  # quadratic pair set actually exercised


def test_char_jaccard_handles_empty_and_singleton_blocks():
    df = pd.DataFrame({
        "id": [1, 2, 3],
        "blk": ["lonely", "pairish", "pairish"],
        "name": ["abc", "hello", "hello"],
    })
    got = char_jaccard_pairs(rd.from_pandas(df), id_col="id",
                             text_col="name", block_cols=["blk"],
                             threshold=0.99).to_pandas()
    assert len(got) == 1
    assert got.iloc[0].id_a == 2 and got.iloc[0].id_b == 3
    assert got.iloc[0].sim == 1.0
    # null / empty text never crashes (empty byte set -> sim 0 vs anything)
    df2 = pd.DataFrame({
        "id": [1, 2], "blk": ["x", "x"],
        "name": pd.Series([None, "abc"], dtype="object"),
    })
    got2 = char_jaccard_pairs(rd.from_pandas(df2), id_col="id",
                              text_col="name", block_cols=["blk"],
                              threshold=0.1).to_pandas()
    assert len(got2) == 0


def test_hamming1_pairs_positions_and_counts():
    from knowledge_graph_ray.stages.fuzzy import hamming1_pairs

    names = ["abcd", "abce", "xbcd", "abcd_long", "zzzz", "abzd"]
    # hamming-1 pairs: (abcd,abce)@4 (abcd,xbcd)@1 (abcd,abzd)@3
    # (different lengths / distance>1 never pair)
    ds = rd.from_items([{"c_name": n} for n in names]).repartition(3)
    got = (hamming1_pairs(ds, "c_name").to_pandas()
           .sort_values("diff_pos").reset_index(drop=True))
    assert got["diff_pos"].tolist() == [1, 3, 4]
    assert got["n_pairs"].tolist() == [1, 1, 1]


# ------------------------------------------------------------ jaro-winkler


def _jw_ref(s1: str, s2: str) -> float:
    """Scalar reference (standard Jaro-Winkler, p=0.1, boost 0.7,
    4-char prefix cap) — independently matches DuckDB bit-for-bit,
    including jaro_winkler_similarity('', '') = 0.0 (no chars, no
    matches; identical NON-empty strings reach 1.0 via the main
    path)."""
    b1, b2 = s1.encode(), s2.encode()
    l1, l2 = len(b1), len(b2)
    if not l1 or not l2:
        return 0.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i in range(l1):
        for j in range(max(0, i - window), min(l2, i + window + 1)):
            if not m2[j] and b1[i] == b2[j]:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if b1[i] != b2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3
    if jaro > 0.7:
        pre = 0
        for a, b in zip(b1[:4], b2[:4]):
            if a == b:
                pre += 1
            else:
                break
        jaro = jaro + pre * 0.1 * (1 - jaro)
    return jaro


def test_jw_kernel_matches_scalar_reference():
    from knowledge_graph_ray.stages.fuzzy import _char_matrix, _jw_pairs

    rng = np.random.default_rng(13)
    vocab = list("abcdefg ")
    strs = ["".join(rng.choice(vocab, rng.integers(0, 11)))
            for _ in range(200)]
    strs += ["martha", "marhta", "dixon", "dicksonx", "CRATE", "TRACE",
             "arnab", "raanb", "", "a"]
    ia = rng.integers(0, len(strs), 1500)
    ib = rng.integers(0, len(strs), 1500)
    a = pd.Series([strs[i] for i in ia])
    b = pd.Series([strs[i] for i in ib])
    width = int(max(a.str.len().max(), b.str.len().max()))
    ca, la = _char_matrix(a, width)
    cb, lb = _char_matrix(b, width)
    got = _jw_pairs(ca, la, cb, lb)
    want = np.asarray([_jw_ref(x, y) for x, y in zip(a, b)])
    assert np.array_equal(got, want)  # bit-identical, no tolerance


def test_jw_blocked_pairs_secondary_blocking_exact():
    from knowledge_graph_ray.stages.fuzzy import jaro_winkler_blocked_pairs

    rng = np.random.default_rng(21)
    n = 90
    df = pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        "blk": rng.choice(["x", "y"], n),
        "name": [f"item-{rng.integers(0, 30):03d}" for _ in range(n)],
    })

    def run(cap):
        out = jaro_winkler_blocked_pairs(
            rd.from_pandas(df), "id", "name", ["blk"], 0.9,
            max_block_rows=cap, pair_tile=37).to_pandas()
        return sorted(zip(out.blk, out.id_a, out.id_b, out.sim.round(12)))

    big = run(10_000)
    assert big == run(7)           # chunk tiling preserves the pair set
    # brute force check
    want = []
    for _, blk in df.groupby("blk"):
        rows = blk.sort_values("id")
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                s = _jw_ref(rows.name.iloc[i], rows.name.iloc[j])
                if s >= 0.9:
                    want.append((rows.blk.iloc[i], rows.id.iloc[i],
                                 rows.id.iloc[j], round(s, 12)))
    assert big == sorted(want)
    assert len(big) > 0


def test_jw_blocked_pairs_empty_and_singleton():
    from knowledge_graph_ray.stages.fuzzy import jaro_winkler_blocked_pairs

    df = pd.DataFrame({"id": [1], "blk": ["x"], "name": ["solo"]})
    assert jaro_winkler_blocked_pairs(
        rd.from_pandas(df), "id", "name", ["blk"], 0.9).count() == 0


def test_lev_kernel_matches_bruteforce_dp():
    from knowledge_graph_ray.stages.fuzzy import _char_matrix, _lev_pairs

    def dp(s1, s2):
        b1, b2 = s1.encode(), s2.encode()
        prev = list(range(len(b2) + 1))
        for i, c1 in enumerate(b1, 1):
            cur = [i]
            for j, c2 in enumerate(b2, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (c1 != c2)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(31)
    vocab = list("abcd")
    strs = ["".join(rng.choice(vocab, rng.integers(0, 9)))
            for _ in range(150)] + ["kitten", "sitting", "", "a"]
    ia = rng.integers(0, len(strs), 1200)
    ib = rng.integers(0, len(strs), 1200)
    a = pd.Series([strs[i] for i in ia])
    b = pd.Series([strs[i] for i in ib])
    width = int(max(a.str.len().max(), b.str.len().max()))
    ca, la = _char_matrix(a, width)
    cb, lb = _char_matrix(b, width)
    for k in (1, 2, 3):
        got = _lev_pairs(ca, la, cb, lb, k)
        want = np.asarray([min(dp(x, y), k + 1) for x, y in zip(a, b)])
        assert np.array_equal(got, want), k


def test_lev_blocked_pairs_matches_bruteforce():
    from knowledge_graph_ray.stages.fuzzy import levenshtein_blocked_pairs

    rng = np.random.default_rng(17)
    n = 80
    df = pd.DataFrame({
        "id": np.arange(n, dtype="int64"),
        "blk": rng.choice(["x", "y"], n),
        "name": [f"rec-{rng.integers(0, 40):03d}" for _ in range(n)],
    })
    out = levenshtein_blocked_pairs(
        rd.from_pandas(df), "id", "name", ["blk"], k=2,
        max_block_rows=9, pair_tile=23).to_pandas()
    got = sorted(zip(out.blk, out.id_a, out.id_b, out.dist))

    import itertools
    want = []
    for _, blk in df.groupby("blk"):
        rows = blk.sort_values("id")
        for (i1, r1), (i2, r2) in itertools.combinations(
                rows.iterrows(), 2):
            d = _lev_scalar(r1["name"], r2["name"])
            if d <= 2:
                want.append((r1.blk, r1.id, r2.id, d))
    assert got == sorted(want) and len(got) > 0


def _lev_scalar(s1: str, s2: str) -> int:
    b1, b2 = s1.encode(), s2.encode()
    prev = list(range(len(b2) + 1))
    for i, c1 in enumerate(b1, 1):
        cur = [i]
        for j, c2 in enumerate(b2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]
