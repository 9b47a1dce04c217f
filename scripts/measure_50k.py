"""Run the flagship 50k-cell x 100k-pair scan FOR REAL (VERDICT r4 weak #5).

bench.py's ``cells50k_pairs100k`` row measures 512 SNPs and extrapolates;
this script streams the full pair count through the engine in 4096-variant
blocks (host RAM cannot hold a 50k x 100k f64 matrix, so blocks are
generated donor-level per block and expanded on the fly — the same pattern
the PLINK streaming driver uses) and records the measured wall time.

Modes: ``exact`` (full-f64 + Davies, the parity path) and ``screen``
(f32 screen -> f64 confirm).  Writes MEASURED_50K.json at the repo root.

Usage: python scripts/measure_50k.py [exact|screen] [n_pairs]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(mode="exact", n_snps=100_000, block=4096):
    import cellregmap_tpu as crt
    from bench import make_dataset

    n_cells, n_contexts, n_donors = 50_000, 10, 200
    t_setup0 = time.perf_counter()
    d = make_dataset(n_cells, n_contexts, n_donors, 64, seed=2)
    cfg = crt.ScanConfig(snp_batch=512)
    crm = crt.CellRegMap(y=d["y"], E=d["E"], W=d["W"], Ls=d["Ls"],
                         config=cfg)
    crm._ctx
    t_setup = time.perf_counter() - t_setup0
    print(f"# setup {t_setup:.1f}s", flush=True)

    donor_of = np.repeat(np.arange(n_donors),
                         -(-n_cells // n_donors))[:n_cells]

    def gen_block(b, width):
        rng = np.random.default_rng(1000 + b)
        maf = rng.uniform(0.1, 0.45, size=width)
        Gd = rng.binomial(2, maf[None, :].repeat(n_donors, 0))
        G = np.asarray(Gd, float)[donor_of, :]
        return (G - G.mean(0)) / np.maximum(G.std(0), 1e-9)

    scan = (crm.scan_interaction if mode == "exact"
            else crm.scan_interaction_screen)

    # warmup/compile on one block (excluded from the measured wall)
    t0 = time.perf_counter()
    scan(gen_block(-1, block))
    t_compile = time.perf_counter() - t0
    print(f"# compile+first block {t_compile:.1f}s", flush=True)

    n_blocks = -(-n_snps // block)
    t_scan_only = 0.0
    n_done = 0
    n_confirmed = 0
    t_wall0 = time.perf_counter()
    for b in range(n_blocks):
        width = min(block, n_snps - n_done)
        G = gen_block(b, width)
        t0 = time.perf_counter()
        pv, info = scan(G)
        t_scan_only += time.perf_counter() - t0
        n_done += width
        if mode == "screen":
            n_confirmed += int(info["n_confirmed"])
        el = time.perf_counter() - t_wall0
        print(f"# block {b + 1}/{n_blocks} pairs={n_done} "
              f"wall={el:.0f}s rate={n_done / el:.1f}/s", flush=True)
    wall = time.perf_counter() - t_wall0

    rec = {
        "mode": mode,
        "n_cells": n_cells, "n_contexts": n_contexts,
        "n_pairs": n_done,
        "setup_s": round(t_setup, 1),
        "compile_plus_first_block_s": round(t_compile, 1),
        "measured_wall_s": round(wall, 1),
        "measured_wall_hours": round(wall / 3600, 4),
        "scan_only_s": round(t_scan_only, 1),
        "tests_per_sec_wall": round(n_done / wall, 1),
        "tests_per_sec_scan_only": round(n_done / t_scan_only, 1),
        "host_datagen_s": round(wall - t_scan_only, 1),
    }
    if mode == "screen":
        rec["n_confirmed"] = n_confirmed
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURED_50K.json")
    old = {}
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
    old[mode] = rec
    with open(path, "w") as f:
        json.dump(old, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "exact"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    main(mode, n)
