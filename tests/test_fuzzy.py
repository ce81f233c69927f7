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
