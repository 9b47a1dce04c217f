"""Benchmark harness: interaction-scan throughput vs the CPU reference.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference publishes no numbers (SURVEY.md section 6) and the
pip package is unavailable here, so the baseline is measured from
``oracle.scan_interaction_reference_style`` — a faithful serial
re-implementation of the reference's computational pattern (per-rho economic
QS setup, per-SNP serial loop of 11 REML fits via scipy scalar search,
matrix-free score pass, Davies p-value) running on host CPU/BLAS.

Engine: the batched device kernel (steady-state, compile excluded),
p-values included per the configured ladder.

Env knobs: BENCH_CELLS, BENCH_CONTEXTS, BENCH_DONORS, BENCH_SNPS,
BENCH_BATCH, BENCH_BASELINE_SNPS, BENCH_PVALUE (davies|saddlepoint|liu).
"""
import json
import os
import sys
import time

import numpy as np


def env_int(name, default):
    return int(os.environ.get(name, default))


def main():
    n_cells = env_int("BENCH_CELLS", 2000)
    n_contexts = env_int("BENCH_CONTEXTS", 10)
    n_donors = env_int("BENCH_DONORS", 100)
    n_snps = env_int("BENCH_SNPS", 2048)
    batch = env_int("BENCH_BATCH", 512)
    baseline_snps = env_int("BENCH_BASELINE_SNPS", 6)
    pvalue_method = os.environ.get("BENCH_PVALUE", "davies")

    import jax

    import cellregmap_tpu as crt
    from cellregmap_tpu import oracle

    backend = jax.default_backend()

    # ---- synthetic dataset (BASELINE.json config family) ----
    rng = np.random.default_rng(0)
    E = rng.normal(size=(n_cells, n_contexts)) / np.sqrt(n_contexts)
    W = np.ones((n_cells, 1))
    donor_of = np.repeat(np.arange(n_donors), -(-n_cells // n_donors))[:n_cells]
    hK = np.zeros((n_cells, n_donors))
    hK[np.arange(n_cells), donor_of] = 1.0
    Ls = [np.asarray(L) for L in crt.get_L_values(hK, E)]
    maf = rng.uniform(0.1, 0.45, size=n_snps)
    G = rng.binomial(2, maf[None, :].repeat(n_donors, 0))[donor_of, :]
    G = np.asarray(G, float)
    G = (G - G.mean(0)) / np.maximum(G.std(0), 1e-9)
    y = (
        rng.normal(size=n_cells)
        + 0.5 * E @ rng.normal(size=n_contexts)
        + 0.4 * hK @ rng.normal(size=n_donors)
        + 0.2 * G[:, 7] * E[:, 0] * np.sqrt(n_contexts)
    )

    # ---- baseline: reference-style serial CPU scan on a few SNPs ----
    # (BENCH_BASELINE_SNPS=0 skips it: at large n the serial oracle takes
    # minutes per SNP, and the scale runs only need engine numbers)
    if baseline_snps > 0:
        t0 = time.perf_counter()
        pv_base, _ = oracle.scan_interaction_reference_style(
            y, W, E, Ls=Ls, G=G[:, :baseline_snps]
        )
        t_base = time.perf_counter() - t0
        baseline_tps = baseline_snps / t_base
    else:
        pv_base, baseline_tps = None, None

    # ---- engine ----
    cfg = crt.ScanConfig(snp_batch=batch, pvalue_method=pvalue_method)
    t0 = time.perf_counter()
    crm = crt.CellRegMap(y=y, E=E, W=W, Ls=Ls, config=cfg)
    t_setup = time.perf_counter() - t0

    # warmup / compile on the first batch
    t0 = time.perf_counter()
    crm.scan_interaction(G[:, :batch])
    t_compile = time.perf_counter() - t0

    # steady state over the full scan
    t0 = time.perf_counter()
    pv, info = crm.scan_interaction(G)
    t_scan = time.perf_counter() - t0
    engine_tps = n_snps / t_scan

    # phase breakdown: device kernel alone vs host Davies pass
    import jax.numpy as jnp
    from cellregmap_tpu import engine
    from cellregmap_tpu.models import pvalues as pv_mod

    eff_batch = min(batch, crm._auto_batch_cap(), n_snps)
    gb = jnp.asarray(G[:, :eff_batch], crm._dtype)
    delta_cfg = (cfg.delta_logit_lo, cfg.delta_logit_hi,
                 cfg.n_delta_grid_interaction, cfg.n_golden_iters)
    out = engine.interaction_kernel(crm._ctx, gb, gb, n_cells,
                                    delta_cfg=delta_cfg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = engine.interaction_kernel(crm._ctx, gb, gb, n_cells,
                                        delta_cfg=delta_cfg)
        jax.block_until_ready(out)
    t_kernel = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    pv_mod.davies_pvalue_batch(np.asarray(out["Q"]),
                               np.asarray(out["lambdas"]),
                               lim=cfg.davies_lim, acc=cfg.davies_acc)
    t_davies = time.perf_counter() - t0

    # parity on the baseline subset
    max_abs_diff = (
        float(np.max(np.abs(pv[:baseline_snps] - pv_base)))
        if pv_base is not None else None
    )

    result = {
        "metric": "interaction_tests_per_sec",
        "value": round(engine_tps, 3),
        "unit": "tests/s",
        "vs_baseline": (round(engine_tps / baseline_tps, 2)
                        if baseline_tps else None),
        "baseline_tests_per_sec": (round(baseline_tps, 4)
                                   if baseline_tps else None),
        "pvalue_max_abs_diff_vs_reference_style": max_abs_diff,
        "backend": backend,
        "config": {
            "n_cells": n_cells, "n_contexts": n_contexts,
            "n_donors": n_donors, "n_snps": n_snps, "batch": eff_batch,
            "pvalue_method": pvalue_method,
        },
        "setup_s": round(t_setup, 2),
        "compile_s": round(t_compile, 2),
        "scan_s": round(t_scan, 2),
        "kernel_s_per_batch": round(t_kernel, 3),
        "kernel_tests_per_sec": round(eff_batch / t_kernel, 1),
        "davies_s_per_batch": round(t_davies, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
