"""Deterministic split / sample / pack stages (SURVEY §2.11 family)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from knowledge_graph_ray.stages.packing import (
    greedy_boundaries,
    pack_by_offset,
    pack_greedy,
)
from knowledge_graph_ray.stages.sampling import (
    grouped_sample,
    hash_split,
    hash_u32,
    split_thresholds,
)


def test_hash_split_deterministic_and_proportional():
    df = pd.DataFrame({"k": np.arange(20000, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(4)
    out = hash_split(ds, "k", {"train": 0.8, "val": 0.1, "test": 0.1},
                     seed=6969).to_pandas()
    # determinism: label is a pure function of the key
    again = hash_split(rd.from_pandas(df).repartition(7), "k",
                       {"train": 0.8, "val": 0.1, "test": 0.1},
                       seed=6969).to_pandas()
    merged = out.merge(again, on="k", suffixes=("_a", "_b"))
    assert (merged.split_a == merged.split_b).all()
    frac = out.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02


def test_split_stable_under_corpus_growth():
    """Yesterday's split labels never change when new docs append."""
    small = pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
    big = pd.DataFrame({"k": np.arange(5000, dtype=np.int64)})
    f = {"train": 0.9, "val": 0.1}
    a = hash_split(rd.from_pandas(small), "k", f, seed=1).to_pandas()
    b = hash_split(rd.from_pandas(big), "k", f, seed=1).to_pandas()
    m = a.merge(b, on="k", suffixes=("_old", "_new"))
    assert (m.split_old == m.split_new).all()


def test_split_thresholds_close_rounding_gap():
    bounds = split_thresholds({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})
    assert bounds[-1][1] == 1 << 32


def test_grouped_sample_matches_pandas_rank():
    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 3000),
        "k": np.arange(3000, dtype=np.int64),
    })
    got = grouped_sample(rd.from_pandas(df).repartition(5), ["g"], "k", 7,
                         seed=42).to_pandas()
    h = hash_u32(df.k.to_numpy(), 42).astype("int64")
    exp = (df.assign(h=h).sort_values(["h", "k"])
             .groupby("g").head(7))
    assert len(got) == len(exp)
    assert set(zip(got.g, got.k)) == set(zip(exp.g, exp.k))
    assert got.rk.max() <= 7 and got.rk.min() == 1


def test_greedy_boundaries_first_fit_and_oversized():
    w = np.array([4, 4, 4, 15, 2, 9, 1], dtype=np.int64)
    packs = greedy_boundaries(w, 10)
    # 4+4<=10, +4 overflows -> [0,0,1]; 15 oversized own pack; 2+9>10; 9+1<=10
    assert packs.tolist() == [0, 0, 1, 2, 3, 4, 4]
    assert greedy_boundaries(np.array([], dtype=np.int64), 10).tolist() == []


def test_pack_by_offset_matches_window_sum():
    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "doc_id": np.arange(400, dtype=np.int64),
        "w": rng.randint(1, 500, 400).astype(np.int64),
    })
    out = pack_by_offset(rd.from_pandas(df).repartition(6), "w", 1000,
                         "doc_id").to_pandas().sort_values("doc_id")
    exp_off = np.concatenate(([0], np.cumsum(df.w.to_numpy())[:-1]))
    assert (out.start_offset.to_numpy() == exp_off).all()
    assert (out.pack_id.to_numpy() == exp_off // 1000).all()


def test_pack_greedy_per_partition():
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "shard": rng.choice(["s0", "s1"], 300),
        "doc_id": np.arange(300, dtype=np.int64),
        "w": rng.randint(1, 400, 300).astype(np.int64),
    })
    out = pack_greedy(rd.from_pandas(df).repartition(4), "w", 1000,
                      "doc_id", "shard").to_pandas()
    assert len(out) == 300
    for shard, sub in out.groupby("shard"):
        sub = sub.sort_values("doc_id")
        exp = greedy_boundaries(sub.w.to_numpy(), 1000)
        assert (sub.pack_id.to_numpy() == exp).all()
        # every non-oversized pack respects the budget
        sums = sub.groupby("pack_id").w.sum()
        sizes = sub.groupby("pack_id").size()
        assert ((sums <= 1000) | (sizes == 1)).all()


def test_weighted_repeat_multiplicity_and_copy_idx():
    from knowledge_graph_ray.stages.sampling import weighted_repeat

    df = pd.DataFrame({
        "k": np.arange(2000, dtype=np.int64),
        "w": np.tile([0.25, 1.0, 2.5, 0.0], 500),
    })
    out = weighted_repeat(rd.from_pandas(df).repartition(4), "w", "k",
                          seed=7).to_pandas()
    h = hash_u32(df.k.to_numpy(), 7)
    frac_thresh = np.floor((df.w - np.floor(df.w)) * 2**32).astype("uint64")
    exp_n = np.floor(df.w).astype(int) + (h < frac_thresh).astype(int)
    got_n = out.groupby("k").size().reindex(df.k, fill_value=0)
    assert (got_n.values == exp_n.values).all()
    # copy_idx is a dense 0..n-1 counter per source row
    for k, sub in out.groupby("k"):
        assert sorted(sub.copy_idx) == list(range(len(sub)))
    # expected multiplicity tracks the weight
    mult = out.merge(df, on="k").groupby("w_x").size() / 500
    assert abs(mult[0.25] - 0.25) < 0.06 and abs(mult[2.5] - 2.5) < 0.06
    assert 0.0 not in mult.index


def test_decontaminate_counts_match_bruteforce():
    import re

    from knowledge_graph_ray.stages.decontaminate import contaminated_counts

    word = re.compile(r"\w+")

    def grams(t, n):
        toks = word.findall(t.lower())
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda: " ".join(rng.choice(vocab, rng.randint(2, 25)))
    train = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                          "text": [mk() for _ in range(300)]})
    bench = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64) + 1000,
                          "text": [mk() for _ in range(40)]})
    got = contaminated_counts(
        rd.from_pandas(train).repartition(4),
        rd.from_pandas(bench).repartition(2), n=3,
    ).to_pandas().set_index("doc_id").n_shared
    bg = set().union(*(grams(t, 3) for t in bench.text))
    exp = {r.doc_id: len(grams(r.text, 3) & bg) for r in train.itertuples()
           if len(grams(r.text, 3) & bg) > 0}
    assert got.to_dict() == exp
    assert len(exp) > 0  # the corpus genuinely overlaps


def test_decontaminate_short_docs_contribute_nothing():
    from knowledge_graph_ray.stages.decontaminate import contaminated_counts

    train = pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "a b c d"]})
    bench = pd.DataFrame({"doc_id": [9], "text": ["a b c"]})
    got = contaminated_counts(rd.from_pandas(train), rd.from_pandas(bench),
                              n=3).to_pandas()
    # doc 1 has no 3-gram; doc 2 shares exactly "a b c"
    assert got.doc_id.tolist() == [2] and got.n_shared.tolist() == [1]


def test_drop_contaminated_complements_counts():
    from knowledge_graph_ray.stages.decontaminate import (
        contaminated_counts,
        drop_contaminated,
    )

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(25)]
    mk = lambda: " ".join(rng.choice(vocab, rng.randint(3, 20)))
    train = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                          "text": [mk() for _ in range(200)]})
    bench = pd.DataFrame({"doc_id": [900, 901],
                          "text": [mk(), mk()]})
    tds = rd.from_pandas(train).repartition(3)
    bds = rd.from_pandas(bench)
    hits = set(contaminated_counts(tds, bds, n=3).to_pandas().doc_id)
    clean = drop_contaminated(tds, bds, n=3).to_pandas()
    assert set(clean.doc_id) == set(train.doc_id) - hits
    assert list(clean.columns) == ["doc_id", "text"]  # columns preserved


# ---------------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=500), max_size=60),
    st.integers(min_value=1, max_value=600),
)
def test_greedy_boundaries_laws(ws, budget):
    w = np.asarray(ws, dtype=np.int64)
    packs = greedy_boundaries(w, budget)
    assert len(packs) == len(w)
    if len(w) == 0:
        return
    # contiguous, 0-based, non-decreasing by at most 1
    assert packs[0] == 0
    steps = np.diff(packs)
    assert ((steps == 0) | (steps == 1)).all()
    for p in range(packs.max() + 1):
        idx = np.flatnonzero(packs == p)
        total = w[idx].sum()
        # budget respected unless a single oversized row
        assert total <= budget or len(idx) == 1
        # first-fit: the row after this pack would not have fit
        nxt = idx[-1] + 1
        if nxt < len(w) and total <= budget:
            assert total + w[nxt] > budget


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(min_value=0.01, max_value=0.99), min_size=1,
             max_size=6),
    st.integers(min_value=0, max_value=2**31),
)
def test_split_thresholds_partition_the_hash_space(fracs, hv):
    total = sum(fracs)
    fractions = {f"s{i}": f / total for i, f in enumerate(fracs)}
    # renormalize rounding drift so the contract (sum==1) holds
    fractions[f"s{len(fracs)-1}"] += 1.0 - sum(fractions.values())
    bounds = split_thresholds(fractions)
    uppers = [u for _, u in bounds]
    assert uppers == sorted(uppers)
    assert uppers[-1] == 1 << 32
    # every hash value lands in exactly one bucket
    idx = np.searchsorted(np.array(uppers, dtype=np.uint64),
                          np.uint64(hv), side="right")
    assert 0 <= idx < len(bounds)


def test_hash_u32_matches_sql_for_negative_keys():
    import duckdb

    keys = np.array([-5, -1, 0, 7, -2**40], dtype=np.int64)
    ours = hash_u32(keys, seed=6969).astype(np.uint64)
    sql = duckdb.sql(
        "SELECT ((((CAST(x AS HUGEINT) % 4294967296) + 4294967296)"
        "         % 4294967296) * 2654435761 + 6969) % 4294967296 AS hv "
        "FROM (SELECT unnest([-5, -1, 0, 7, -1099511627776]) AS x)"
    ).fetchnumpy()["hv"].astype(np.uint64)
    assert (ours == sql).all()


def test_weighted_sample_per_group_properties():
    from knowledge_graph_ray.stages.sampling import weighted_sample_per_group

    rng = np.random.default_rng(23)
    n = 2000
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], n),
        "id": np.arange(n, dtype="int64"),
        # 100 heavy rows (weight 50) vs light rows (weight 1)
        "w": np.where(np.arange(n) % 20 == 0, 50.0, 1.0),
    })
    ds = rd.from_pandas(df).repartition(8)
    picks = []
    for seed in range(8):
        got = weighted_sample_per_group(ds, ["g"], "id", "w", n=10,
                                        seed=seed).to_pandas()
        assert len(got) == 20  # 10 per group
        assert got.groupby("g").size().eq(10).all()
        # deterministic: same seed -> same rows
        again = weighted_sample_per_group(ds, ["g"], "id", "w", n=10,
                                          seed=seed).to_pandas()
        assert sorted(got.id) == sorted(again.id)
        picks.append(got)
    allp = pd.concat(picks)
    heavy_rate = (allp.w == 50.0).mean()
    # heavy rows are 5% of the population but weight 50x: expect them to
    # dominate the samples (ES inclusion ~ weight); loose bound
    assert heavy_rate > 0.5, heavy_rate


def test_weighted_sample_zero_and_null_weights_lose():
    from knowledge_graph_ray.stages.sampling import weighted_sample_per_group

    df = pd.DataFrame({
        "g": ["a"] * 6,
        "id": [1, 2, 3, 4, 5, 6],
        "w": pd.Series([0.0, -1.0, None, 2.0, 2.0, 2.0]),
    })
    got = weighted_sample_per_group(rd.from_pandas(df), ["g"], "id", "w",
                                    n=3).to_pandas()
    assert sorted(got.id) == [4, 5, 6]


def test_stratified_take_fraction_exact_per_group():
    from knowledge_graph_ray.stages.sampling import stratified_take_fraction

    rng = np.random.default_rng(29)
    df = pd.DataFrame({
        "g": rng.choice(["big", "small", "tiny"], 1000,
                        p=[0.9, 0.09, 0.01]),
        "id": np.arange(1000, dtype="int64"),
    })
    got = stratified_take_fraction(
        rd.from_pandas(df).repartition(8), ["g"], "id", 0.5, seed=3
    ).to_pandas()
    sizes = df.groupby("g").size()
    got_sizes = got.groupby("g").size().reindex(sizes.index).fillna(0)
    for g in sizes.index:
        assert got_sizes[g] == int(np.floor(0.5 * sizes[g])), g
    # deterministic
    again = stratified_take_fraction(
        rd.from_pandas(df).repartition(8), ["g"], "id", 0.5, seed=3
    ).to_pandas()
    assert sorted(got.id) == sorted(again.id)


def test_kfold_assign_balanced_and_deterministic():
    from knowledge_graph_ray.stages.sampling import kfold_assign

    df = pd.DataFrame({"id": np.arange(5000, dtype="int64")})
    got = kfold_assign(rd.from_pandas(df).repartition(8), "id",
                       k=5, seed=1).to_pandas()
    counts = got.fold.value_counts()
    assert set(counts.index) == {0, 1, 2, 3, 4}
    # multiplicative hashing over a dense key range is near-uniform
    assert counts.min() > 0.8 * counts.max()
    again = kfold_assign(rd.from_pandas(df), "id", k=5, seed=1).to_pandas()
    pd.testing.assert_series_equal(
        got.sort_values("id").fold.reset_index(drop=True),
        again.sort_values("id").fold.reset_index(drop=True))


def test_gram_frame_matches_per_row_reference():
    import pyarrow as pa

    from knowledge_graph_ray.stages.decontaminate import _gram_frame, _grams

    texts = ["a b c d", "", None, "x", "a b c d e f", "Hé wörld a b c"]
    arr = pa.array(texts, type=pa.string())
    for n in (1, 2, 3, 5):
        gf = _gram_frame(arr, n).drop_duplicates(["doc", "gram"])
        got = {(int(d), g) for d, g in gf.itertuples(index=False)}
        want = {(i, g) for i, t in enumerate(texts)
                for g in _grams(t or "", n)}
        assert got == want, (n, got ^ want)
