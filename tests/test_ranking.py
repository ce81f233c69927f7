"""Ranking / ordered-scan window stage tests vs pandas brute force.

Stage calls default ``driver_threshold=None`` so the DISTRIBUTED path
(shuffle + bucket bodies) is what's exercised; regime equivalence vs
the driver fast path is asserted separately.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from knowledge_graph_ray.stages.ranking import (
    ordered_gaps,
    running_sum,
    running_sum_salted,
    window_rank,
)

SF = "/root/testdata/sf0.001"


def test_window_rank_matches_pandas():
    events = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "user_id", "value"])
    got = (
        window_rank(events, key="user_id", order_col="value",
                    id_cols=["event_id"])
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/events.parquet",
                          columns=["event_id", "user_id", "value"])
    gb = pdf.groupby("user_id")["value"]
    pdf["rk"] = gb.rank(method="min").astype("int64")
    n = gb.transform("size").to_numpy().astype("int64")
    pdf["pct_rank"] = np.where(
        n > 1, (pdf["rk"].to_numpy() - 1) / np.maximum(n - 1, 1), 0.0
    )
    expected = pdf.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[expected.columns.tolist()], expected, check_dtype=False
    )


def test_window_rank_descending_and_singleton():
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4],
        "k": ["a", "a", "a", "b"],
        "v": [10.0, 30.0, 30.0, 7.0],
    }))
    got = (
        window_rank(ds, key="k", order_col="v", id_cols=["id"],
                    descending=True)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # ties share the min rank; gap after ties (SQL RANK)
    assert got.rk.tolist() == [3, 1, 1, 1]
    # singleton partition: pct_rank defined as 0.0
    assert got.pct_rank.tolist() == [1.0, 0.0, 0.0, 0.0]


def test_running_sum_matches_pandas():
    events = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "ts_s": pc.divide(b.column("ts").cast(pa.int64()),
                              1_000_000).cast(pa.int64()),
            "cents": pc.round(
                pc.multiply(b.column("value").cast(pa.float64()), 100.0),
                ndigits=0, round_mode="half_towards_infinity",
            ).cast(pa.int64()),
        })

    got = (
        running_sum(events.map_batches(prep, batch_format="pyarrow"),
                    key="user_id", order_cols=["ts_s", "event_id"],
                    value_col="cents", out_col="running_cents")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["ts_s"] = (pdf.ts.astype("int64") // 10**6).astype("int64")
    v = pdf.value.to_numpy() * 100.0
    pdf["cents"] = np.where(v >= 0, np.floor(v + 0.5),
                            np.ceil(v - 0.5)).astype("int64")
    pdf = pdf.sort_values(["user_id", "ts_s", "event_id"], kind="stable")
    pdf["running_cents"] = pdf.groupby("user_id")["cents"].cumsum()
    expected = pdf.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, expected[got.columns.tolist()], check_dtype=False
    )


def test_ordered_gaps_matches_bruteforce():
    events = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts"])
    got = (
        ordered_gaps(events, over_seconds=1800)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["ts_s"] = (pdf.ts.astype("int64") // 10**6).astype("int64")
    rows = []
    for uid, g in pdf.groupby("user_id"):
        ts = np.sort(g.ts_s.to_numpy())
        gaps = np.diff(ts)
        rows.append((uid, len(ts),
                     int(gaps.max()) if len(gaps) else -1,
                     int((gaps > 1800).sum())))
    expected = pd.DataFrame(
        rows, columns=["user_id", "n_events", "max_gap_s", "n_gaps_over"]
    ).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_ranking_regime_equivalence():
    """Driver fast path and distributed bucket path agree row-for-row."""
    events = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "user_id", "value"])

    def norm(df):
        return df.sort_values("event_id").reset_index(drop=True)

    dist = norm(window_rank(events, key="user_id", order_col="value",
                            id_cols=["event_id"]).to_pandas())
    drv = norm(window_rank(events, key="user_id", order_col="value",
                           id_cols=["event_id"], driver_threshold=10**9,
                           size_hint=1000).to_pandas())
    pd.testing.assert_frame_equal(dist, drv[dist.columns.tolist()])


def test_ordered_gaps_null_key_and_empty():
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([None, None, 7], type=pa.int64()),
        "ts": pa.array([0, 4_000_000_000, 0], type=pa.int64()).cast(
            pa.timestamp("us")),
    }))
    got = ordered_gaps(ds, over_seconds=1800).to_pandas()
    # null keys form one group (factorize use_na_sentinel=False)
    null_row = got[got.user_id.isna()]
    assert len(null_row) == 1
    assert null_row.n_events.iloc[0] == 2
    assert null_row.max_gap_s.iloc[0] == 4000
    assert null_row.n_gaps_over.iloc[0] == 1
    single = got[got.user_id == 7]
    assert single.max_gap_s.iloc[0] == -1 and single.n_gaps_over.iloc[0] == 0


def test_window_rank_null_order_values_rank_last():
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4],
        "k": ["a", "a", "a", "a"],
        "v": pa.array([2.0, None, 1.0, None], type=pa.float64()),
    }))
    got = (
        window_rank(ds, key="k", order_col="v", id_cols=["id"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # nulls last (DuckDB default_null_order) and tied with each other
    assert got.rk.tolist() == [2, 3, 1, 3]


def test_ordered_gaps_string_key():
    ds = rd.from_arrow(pa.table({
        "session": pa.array(["s1", "s1", "s2"], type=pa.string()),
        "ts": pa.array([0, 10_000_000, 0], type=pa.int64()).cast(
            pa.timestamp("us")),
    }))
    got = (
        ordered_gaps(ds, key="session", over_seconds=5)
        .to_pandas().sort_values("session").reset_index(drop=True)
    )
    assert got.session.tolist() == ["s1", "s2"]
    assert got.max_gap_s.tolist() == [10, -1]
    assert got.n_gaps_over.tolist() == [1, 0]


def test_window_ntile_uneven_buckets():
    from knowledge_graph_ray.stages.ranking import window_ntile

    # 7 rows into 3 tiles: sizes 3,2,2 (first n%b tiles get the extra)
    ds = rd.from_arrow(pa.table({
        "k": ["a"] * 7,
        "o": list(range(7)),
    }))
    got = (
        window_ntile(ds, key="k", order_cols=["o"], n_tiles=3)
        .to_pandas().sort_values("o").reset_index(drop=True)
    )
    assert got.tile.tolist() == [1, 1, 1, 2, 2, 3, 3]


def test_window_ntile_fewer_rows_than_tiles():
    from knowledge_graph_ray.stages.ranking import window_ntile

    ds = rd.from_arrow(pa.table({"k": ["a", "a"], "o": [1, 2]}))
    got = (
        window_ntile(ds, key="k", order_cols=["o"], n_tiles=4)
        .to_pandas().sort_values("o").reset_index(drop=True)
    )
    # each row its own tile, like SQL NTILE
    assert got.tile.tolist() == [1, 2]


def test_window_lag_matches_pandas():
    from knowledge_graph_ray.stages.ranking import window_lag

    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "b"],
        "o": [3, 1, 2, 1],
        "v": pa.array([30, 10, 20, 5], type=pa.int64()),
    }))
    got = (
        window_lag(ds, key="k", order_cols=["o"], value_col="v")
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    # within a: ordered by o -> lag values null,10,20; b first row null
    assert pd.isna(got.lag_value.iloc[0])
    assert got.lag_value.iloc[1] == 10 and got.lag_value.iloc[2] == 20
    assert pd.isna(got.lag_value.iloc[3])


def test_window_enumerate_matches_pandas():
    from knowledge_graph_ray.stages.ranking import window_enumerate

    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "b"],
        "o": [2, 1, 1, 1],          # ties at o=1 within a
        "id": [10, 11, 12, 13],
        "v": pa.array([5, 6, 7, 8], type=pa.int64()),
    }))
    got = (
        window_enumerate(ds, key="k", order_cols=["o", "id"],
                         dense_rank_col="o", value_col="v")
        .to_pandas().sort_values(["k", "o", "id"]).reset_index(drop=True)
    )
    # a ordered by (o,id): rows (1,11),(1,12),(2,10)
    assert got.rn.tolist() == [1, 2, 3, 1]
    # dense_rank on o: ties share, no gaps
    assert got.drk.tolist() == [1, 1, 2, 1]
    # lead of v in order: 7, 5, null; b single row null
    assert got.lead_value.iloc[0] == 7 and got.lead_value.iloc[1] == 5
    assert pd.isna(got.lead_value.iloc[2]) and pd.isna(got.lead_value.iloc[3])


def test_running_sum_salted_equals_unsalted_on_hot_key():
    """Skew fallback: one key holds 90% of rows; the range-salted
    two-phase path must be row-identical to the one-shuffle path."""
    rng = np.random.default_rng(7)
    n_hot, n_cold = 9000, 1000
    df = pd.DataFrame({
        "rid": np.arange(n_hot + n_cold, dtype="int64"),
        "k": np.concatenate([
            np.repeat("hot", n_hot),
            rng.choice(["a", "b", "c"], n_cold),
        ]),
        # duplicate order values on purpose: ties must share a salt
        "o": np.concatenate([
            rng.integers(0, 500, n_hot),
            rng.integers(0, 500, n_cold),
        ]).astype("int64"),
        "v": rng.integers(-50, 50, n_hot + n_cold).astype("int64"),
    })
    # rid is the unique tiebreak so the prefix sums are unambiguous
    ds = rd.from_pandas(df).repartition(16)
    kw = dict(key="k", order_cols=["o", "rid"], value_col="v",
              out_col="run")
    base = (running_sum(ds, **kw).to_pandas()
            .sort_values("rid").reset_index(drop=True))
    salted = (running_sum_salted(ds, n_salts=8, **kw).to_pandas()
              .sort_values("rid").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        salted[base.columns.tolist()], base, check_dtype=False)
    # explicit caller-supplied boundaries exercise the other branch
    salted2 = (running_sum_salted(ds, boundaries=[100.0, 250.0, 400.0],
                                  **kw).to_pandas()
               .sort_values("rid").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        salted2[base.columns.tolist()], base, check_dtype=False)


def test_window_moving_agg_matches_pandas():
    from knowledge_graph_ray.stages.ranking import window_moving_agg

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "rid": np.arange(500, dtype="int64"),
        "k": rng.choice(["a", "b", "c", "solo"], 500,
                        p=[0.45, 0.45, 0.098, 0.002]),
        "v": rng.integers(-100, 100, 500).astype("int64"),
    })
    got = (
        window_moving_agg(rd.from_pandas(df).repartition(8), key="k",
                          order_cols=["rid"], value_col="v", frame_rows=5,
                          sum_col="ms", avg_col="ma")
        .to_pandas().sort_values("rid").reset_index(drop=True)
    )
    exp = df.sort_values(["k", "rid"], kind="stable")
    g = exp.groupby("k")["v"]
    exp["ms"] = g.rolling(5, min_periods=1).sum().reset_index(
        level=0, drop=True).astype("int64")
    exp["ma"] = exp["ms"] / g.rolling(5, min_periods=1).count().reset_index(
        level=0, drop=True)
    exp = exp.sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp,
                                  check_dtype=False)


def test_window_first_last_respects_nulls():
    from knowledge_graph_ray.stages.ranking import window_first_last

    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "b"],
        "o": [1, 2, 3, 1],
        "v": pa.array([None, 5, None, 9], type=pa.int64()),
    }))
    got = (
        window_first_last(ds, key="k", order_cols=["o"], value_col="v",
                          first_col="f", last_col="l")
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    # SQL FIRST_VALUE/LAST_VALUE take the boundary ROW's value even if
    # null — a's first (o=1) and last (o=3) are both null
    assert got[got.k == "a"].f.isna().all()
    assert got[got.k == "a"].l.isna().all()
    assert (got[got.k == "b"].f == 9).all() and (got[got.k == "b"].l == 9).all()


def test_window_cume_dist_matches_duckdb():
    import duckdb

    from knowledge_graph_ray.stages.ranking import window_cume_dist

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "id": np.arange(300, dtype="int64"),
        "k": rng.choice(["a", "b", "solo"], 300, p=[0.5, 0.497, 0.003]),
        "v": rng.integers(0, 40, 300).astype("int64"),  # many ties
    })
    got = (
        window_cume_dist(rd.from_pandas(df).repartition(4), key="k",
                         order_col="v", id_cols=["id"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    exp = duckdb.sql("""
        SELECT id, k, v,
               cume_dist() OVER (PARTITION BY k ORDER BY v) AS cume
        FROM df
    """).df().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp,
                                  check_dtype=False)


def test_window_share_zero_total_and_values():
    from knowledge_graph_ray.stages.ranking import window_share

    df = pd.DataFrame({
        "k": ["a", "a", "a", "z", "z"],
        "id": [1, 2, 3, 4, 5],
        "v": [10, 30, 60, 5, -5],  # z sums to zero
    })
    got = (
        window_share(rd.from_pandas(df), key="k", order_cols=["id"],
                     value_col="v")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert got[got.k == "a"].share.tolist() == [0.1, 0.3, 0.6]
    assert got[got.k == "z"].share.isna().all()


def test_window_nth_value_short_partitions_and_nulls():
    from knowledge_graph_ray.stages.ranking import window_nth_value

    ds = rd.from_arrow(pa.table({
        "k": ["a", "a", "a", "b", "b", "c"],
        "o": [1, 2, 3, 1, 2, 1],
        "v": pa.array([10, None, 30, 7, 8, 5], type=pa.int64()),
    }))
    got = (
        window_nth_value(ds, key="k", order_cols=["o"], value_col="v",
                         n=2, out_col="second")
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    # a's 2nd row value is NULL and must be carried as NULL (respected)
    assert got[got.k == "a"].second.isna().all()
    assert (got[got.k == "b"].second == 8).all()
    # partition with < n rows -> NULL
    assert got[got.k == "c"].second.isna().all()


def test_window_nth_value_block_dtype_stable_across_buckets():
    import ray

    from knowledge_graph_ray.stages.ranking import window_nth_value

    # many keys: some with >= 2 rows, some singletons, spread over
    # buckets — every output block must carry int64 for the value
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": [f"k{v}" for v in rng.integers(0, 40, 300)],
        "o": np.arange(300, dtype="int64"),
        "v": rng.integers(0, 100, 300).astype("int64"),
    })
    out = window_nth_value(rd.from_pandas(df).repartition(8), key="k",
                           order_cols=["o"], value_col="v", n=2,
                           out_col="second")
    for ref in out.to_arrow_refs():
        blk = ray.get(ref)
        if len(blk):
            assert blk.schema.field("second").type == pa.int64(), blk.schema


def test_window_range_agg_matches_brute_force():
    from knowledge_graph_ray.stages.ranking import window_range_agg

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "rid": np.arange(n, dtype="int64"),
        "k": rng.choice(["a", "b", "hot"], n, p=[0.2, 0.2, 0.6]),
        # coarse grid so duplicate timestamps (RANGE peers) occur
        "t": rng.integers(0, 60, n).astype("int64") * 10,
        "v": rng.integers(-50, 50, n).astype("int64"),
    })
    got = (
        window_range_agg(rd.from_pandas(df).repartition(8), key="k",
                         order_col="t", value_col="v", range_preceding=100,
                         id_cols=["rid"], sum_col="s", n_col="c",
                         avg_col="m")
        .to_pandas().sort_values(["rid"]).reset_index(drop=True)
    )
    # brute force: every same-key row with t' in [t-100, t] — INCLUDING
    # peers at exactly t (SQL RANGE CURRENT ROW = last peer)
    for _, row in df.sample(80, random_state=0).iterrows():
        mask = (df.k == row.k) & (df.t >= row.t - 100) & (df.t <= row.t)
        gr = got[got.rid == row.rid].iloc[0]
        assert gr.s == df.v[mask].sum(), row.rid
        assert gr.c == mask.sum()
        assert gr.m == gr.s / gr.c


def test_window_range_agg_matches_duckdb_range_frame():
    import duckdb

    from knowledge_graph_ray.stages.ranking import window_range_agg

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "rid": np.arange(300, dtype="int64"),
        "k": rng.integers(0, 12, 300).astype("int64"),
        "t": rng.integers(0, 40, 300).astype("int64"),
        "v": rng.integers(0, 100, 300).astype("int64"),
    })
    got = (
        window_range_agg(rd.from_pandas(df), key="k", order_col="t",
                         value_col="v", range_preceding=7, id_cols=["rid"],
                         sum_col="s", n_col="c", avg_col="m")
        .to_pandas().sort_values(["rid", "s"]).reset_index(drop=True)
    )
    exp = duckdb.sql("""
        SELECT rid, CAST(sum(v) OVER w AS BIGINT) AS s,
               CAST(count(*) OVER w AS BIGINT) AS c
        FROM df
        WINDOW w AS (PARTITION BY k ORDER BY t
                     RANGE BETWEEN 7 PRECEDING AND CURRENT ROW)
    """).df().sort_values(["rid", "s"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["rid", "s", "c"]], exp,
                                  check_dtype=False)


def test_window_range_agg_overflow_guard():
    import pytest as _pytest

    from knowledge_graph_ray.stages.ranking import window_range_agg

    # huge order range x many keys -> composite axis would overflow
    df = pd.DataFrame({
        "k": np.arange(1000, dtype="int64"),
        "t": np.array([0] * 999 + [2 ** 53], dtype="int64"),
        "v": np.ones(1000, dtype="int64"),
    })
    # num_buckets=1 so every key lands in one bucket body (the guard is
    # per-bucket — that's the only place the composite axis exists)
    with _pytest.raises(Exception, match="composite axis|overflow"):
        window_range_agg(rd.from_pandas(df), key="k", order_col="t",
                         value_col="v", range_preceding=10,
                         num_buckets=1).materialize()


def test_window_groups_agg_vs_brute_force():
    from knowledge_graph_ray.stages.ranking import window_groups_agg

    rng = np.random.RandomState(3)
    n = 400
    df = pd.DataFrame({
        "k": rng.randint(0, 4, size=n),
        "o": rng.randint(0, 12, size=n),   # coarse → many peer groups
        "v": rng.randint(-50, 50, size=n),
        "rid": np.arange(n),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = window_groups_agg(ds, key="k", order_col="o", value_col="v",
                            groups_preceding=1, id_cols=["rid"]) \
        .to_pandas().set_index("rid")["groups_sum"]
    # brute force: per (k, o) group sums; frame = own group + previous
    # distinct group in the partition
    gs = df.groupby(["k", "o"])["v"].sum()
    for _, row in df.iterrows():
        k, o = row["k"], row["o"]
        prev = [oo for oo in sorted(df[df.k == k]["o"].unique()) if oo < o]
        want = gs.loc[(k, o)] + (gs.loc[(k, prev[-1])] if prev else 0)
        assert got[row["rid"]] == want
