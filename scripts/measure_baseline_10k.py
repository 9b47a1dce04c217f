"""Measure the serial reference-pattern baseline at north-star scale.

VERDICT r4 task 4: the >=100x north-star target is defined on the 10k-cell
scan (BASELINE.json) but the serial baseline had only ever been measured at
2k cells.  This script times oracle.scan_interaction_reference_style on the
SAME dataset bench.py's ``cells10k_pairs5k`` config uses (10k cells, 20
contexts, 125 donors, seed=1), with setup (11 thin SVDs of the half-factor
stacks) separated from the per-SNP scan, and writes the result to
``BASELINE_10K.json`` for bench.py to pin.

Run on the bench host (the 2-core axon host) with JAX_PLATFORMS=cpu.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from bench import make_dataset  # noqa: E402
from cellregmap_tpu import oracle  # noqa: E402


def main(n_snps=2):
    d = make_dataset(10_000, 20, 125, max(n_snps, 8), seed=1)
    timers = {}
    t0 = time.perf_counter()
    pv, _ = oracle.scan_interaction_reference_style(
        d["y"], d["W"], d["E"], Ls=d["Ls"], G=d["G"][:, :n_snps],
        timers=timers)
    total = time.perf_counter() - t0
    rec = {
        "config": {"n_cells": 10_000, "n_contexts": 20, "n_donors": 125,
                   "seed": 1, "n_snps": n_snps},
        "setup_s": round(timers["setup_s"], 2),
        "scan_s": round(timers["scan_s"], 2),
        "total_s": round(total, 2),
        "steady_tests_per_sec": round(n_snps / timers["scan_s"], 5),
        "tests_per_sec_incl_setup": round(n_snps / total, 5),
        "pvalues": [float(p) for p in pv],
        "host_cores": os.cpu_count(),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_10K.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
