"""Re-pin any single bench query with the control protocol.

Runs the named queries() entry in N fresh processes (fresh ray session
each), each with bench.py's raw-CPU control, and prints one JSON line
per run — the protocol BASELINE.md uses for control-qualified pins
(generalized from repin_ngram_jaccard.py, round-4 verdict ask #4).

Usage: python scripts/repin_query.py <query> [n_runs]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(query: str) -> dict:
    import time

    import ray
    import ray.data

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, REPO)
    from bench import _calibrate_raw_cpu, consume
    from knowledge_graph_ray.pipelines import queries as Q

    # warm page cache + worker pool (same discipline as bench.py)
    ray.data.read_parquet(f"{sf}/documents.parquet").count()
    consume(Q.dedup_exact(sf))

    fn = getattr(Q, query)
    t0 = time.time()
    consume(fn(sf))
    sec = time.time() - t0
    out = {
        "query": query,
        "sec": round(sec, 3),
        "sf_dir": sf,
        "num_cpus": ncpu,
        "raw_cpu_tasks_per_sec": round(_calibrate_raw_cpu(ncpu), 2),
    }
    ray.shutdown()
    return out


def main(query: str, n_runs: int) -> None:
    for _ in range(n_runs):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", query],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        print(r.stdout.strip().splitlines()[-1], flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        print(json.dumps(worker(sys.argv[sys.argv.index("--worker") + 1])))
    else:
        q = sys.argv[1] if len(sys.argv) > 1 else "dedup_incremental"
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        main(q, n)
