"""Funnel stage tests vs brute force (distributed path by default)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from knowledge_graph_ray.stages.funnel import funnel_counts

SF = "/root/testdata/sf0.001"
STEPS = ["view", "click", "purchase"]


def _brute(pdf):
    counts = []
    arrived = {}
    for i, s in enumerate(STEPS):
        new_arrived = {}
        for uid, g in pdf[pdf.event_type == s].groupby("user_id"):
            ts = g.ts_s.to_numpy()
            if i == 0:
                new_arrived[uid] = ts.min()
            elif uid in arrived:
                ok = ts[ts >= arrived[uid]]
                if len(ok):
                    new_arrived[uid] = ok.min()
        arrived = new_arrived
        counts.append(len(arrived))
    return counts


def test_funnel_matches_bruteforce_distributed():
    events = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts", "event_type"])
    got = (
        funnel_counts(events, steps=STEPS)  # driver_threshold=None
        .to_pandas().sort_values("step_idx").reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["ts_s"] = (pdf.ts.astype("int64") // 10**6).astype("int64")
    assert got.step.tolist() == STEPS
    assert got.n_keys.tolist() == _brute(pdf)
    # funnel counts are monotone non-increasing
    assert (np.diff(got.n_keys.to_numpy()) <= 0).all()


def test_funnel_order_matters():
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2, 2], type=pa.int64()),
        "event_type": ["view", "click", "click", "view"],
        "ts": pa.array([0, 10**6, 0, 10**6], type=pa.int64()).cast(
            pa.timestamp("us")),
    }))
    got = (
        funnel_counts(ds, steps=["view", "click"])
        .to_pandas().sort_values("step_idx")
    )
    # user 2 clicked BEFORE viewing: reaches step 1 only
    assert got.n_keys.tolist() == [2, 1]


def test_cohort_retention_matches_bruteforce_distributed():
    from knowledge_graph_ray.stages.funnel import cohort_retention

    events = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts"])
    got = (
        cohort_retention(events)  # distributed path
        .to_pandas().sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["wk"] = (pdf.ts.astype("int64") // 10**6 // 604800).astype("int64")
    uw = pdf[["user_id", "wk"]].drop_duplicates()
    cohort = uw.groupby("user_id")["wk"].transform("min")
    expected = (
        pd.DataFrame({"cohort_week": cohort, "week_offset": uw.wk - cohort})
        .groupby(["cohort_week", "week_offset"]).size()
        .rename("n_keys").reset_index()
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
    # offset-0 row per cohort equals the cohort size (every key is
    # active in its own first week)
    z = got[got.week_offset == 0]
    assert (z.n_keys.to_numpy() >= got.groupby("cohort_week").n_keys.max().to_numpy()).all()


def test_funnel_null_key_counts_step1_only():
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([None, None, 5, 5], type=pa.int64()),
        "event_type": ["view", "click", "view", "click"],
        "ts": pa.array([0, 10**6, 0, 10**6], type=pa.int64()).cast(
            pa.timestamp("us")),
    }))
    got = (
        funnel_counts(ds, steps=["view", "click"])
        .to_pandas().sort_values("step_idx")
    )
    # SQL: the NULL group exists at step 1 (GROUP BY keeps it) but
    # NULL = NULL never joins, so it cannot advance
    assert got.n_keys.tolist() == [2, 1]


def test_funnel_empty_log_emits_zero_rows_per_step():
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1], type=pa.int64()),
        "event_type": ["error"],  # none of the funnel steps
        "ts": pa.array([0], type=pa.int64()).cast(pa.timestamp("us")),
    }))
    got = (
        funnel_counts(ds, steps=STEPS)
        .to_pandas().sort_values("step_idx").reset_index(drop=True)
    )
    # oracle's UNION ALL always yields one row per step
    assert got.step.tolist() == STEPS
    assert got.n_keys.tolist() == [0, 0, 0]
