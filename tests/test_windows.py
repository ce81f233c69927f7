"""Window stage tests vs pandas brute force."""

import numpy as np
import pandas as pd
import ray.data as rd

from knowledge_graph_ray.stages.windows import sessionize, sliding_window_agg

SF = "/root/testdata/sf0.001"


def test_sessionize_matches_pandas():
    events = rd.read_parquet(f"{SF}/events.parquet")
    got = sessionize(events, gap_seconds=1800).to_pandas()
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["ts_s"] = (pdf.ts.astype("int64") // 10**6).astype("int64")
    expected_rows = []
    for uid, grp in pdf.groupby("user_id"):
        g = grp.sort_values("ts_s")
        ts = g.ts_s.to_numpy()
        vals = g.value.to_numpy()
        start = 0
        for i in range(1, len(ts) + 1):
            if i == len(ts) or ts[i] - ts[i - 1] > 1800:
                expected_rows.append(
                    (uid, int(ts[start]), int(ts[i - 1]), i - start,
                     int(round(vals[start:i].sum() * 100)))
                )
                start = i
    expected = pd.DataFrame(
        expected_rows,
        columns=["user_id", "session_start", "session_end", "n_events", "sum_value_cents"],
    )
    key = ["user_id", "session_start"]
    g = got.sort_values(key).reset_index(drop=True)
    e = expected.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_sliding_windows():
    events = rd.read_parquet(f"{SF}/events.parquet")
    got = sliding_window_agg(events, window_seconds=7200, slide_seconds=3600).to_pandas()
    # every event lands in exactly window_seconds/slide_seconds windows
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    assert got.n_events.sum() == 2 * len(pdf)
    # window starts aligned to the slide
    assert (got.window_start % 3600 == 0).all()
    # each (key, window) total matches a brute-force filter for a sample
    sample = got.head(5)
    ts_s = pdf.ts.astype("int64") // 10**6
    for _, row in sample.iterrows():
        mask = (
            (pdf.event_type == row.event_type)
            & (ts_s >= row.window_start)
            & (ts_s < row.window_start + 7200)
        )
        assert mask.sum() == row.n_events
        assert np.isclose(pdf.loc[mask, "value"].sum(), row.sum_value)
