"""Thin alias kept for BASELINE.md provenance: the round-4
dedup_ngram_jaccard re-pin protocol now lives in the generalized
``scripts/repin_query.py`` (same warm-up, control calibration,
fresh-process runs, JSON-line output).  One copy of the protocol only —
edit repin_query.py, not this file.

Usage: python scripts/repin_ngram_jaccard.py [n_runs]
"""
import subprocess
import sys

if __name__ == "__main__":
    n = sys.argv[1] if len(sys.argv) > 1 else "3"
    raise SystemExit(subprocess.call(
        [sys.executable, "scripts/repin_query.py", "dedup_ngram_jaccard", n]
    ))
