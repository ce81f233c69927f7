"""Measured A/B: skew_join vs plain hash_join on a hot-key fact table.

Synthetic: LEFT = N fact rows with ``hot_share`` of them on ONE key
(the "hot entity" of the north rule), the rest uniform over ``n_keys``;
RIGHT = one payload row per key.  hash_join must colocate every hot
row in one bucket task; skew_join broadcasts the hot key's right rows
and streams the hot left rows through map_batches.

Usage: python scripts/skew_join_scale_check.py [rows] [hot_share] [cpus]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
HOT = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
N_KEYS = 100_000


def main() -> None:
    import ray
    import ray.data as rd

    from knowledge_graph_ray.functions.joins import hash_join, skew_join

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    rng = np.random.RandomState(6969)
    keys = np.where(rng.rand(ROWS) < HOT, 0,
                    rng.randint(1, N_KEYS, ROWS)).astype(np.int64)
    left_df = pd.DataFrame({"k": keys,
                            "x": np.arange(ROWS, dtype=np.int64)})
    right_df = pd.DataFrame({"k": np.arange(N_KEYS, dtype=np.int64),
                             "y": rng.randint(0, 1000, N_KEYS)})

    left = rd.from_pandas(left_df).repartition(CPUS * 4).materialize()
    right = rd.from_pandas(right_df).repartition(CPUS).materialize()

    results = {}
    for name, fn in [
        ("hash_join", lambda: hash_join(left, right, on=["k"],
                                        num_partitions=CPUS * 4)),
        ("skew_join", lambda: skew_join(left, right, on=["k"],
                                        hot_min_rows=max(ROWS // 100, 1000),
                                        num_partitions=CPUS * 4)),
    ]:
        t0 = time.time()
        n = fn().count()
        dt = time.time() - t0
        results[name] = dt
        print(f"{name}: {n} rows in {dt:.2f}s "
              f"({ROWS / dt / 1000:.0f}k rows/s)")
    print(f"speedup: {results['hash_join'] / results['skew_join']:.2f}x "
          f"at hot_share={HOT}")
    ray.shutdown()


if __name__ == "__main__":
    main()
