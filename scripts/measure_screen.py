"""Measure f32-screen accuracy + throughput at production shapes on TPU.

VERDICT r4 weak #3 / task 6: the f32 path needs calibration evidence at the
shapes the screen mode actually runs (n ~ 2k, C 10-20, S >= 512).  This
script scans the bench headline dataset (2k cells x 10 contexts x 2048
variants) plus a C=20 config:

1. full-f64 scan with SADDLEPOINT p-values (same approximation family as
   the screen, isolating the f32 error from the tail-approximation error),
2. f32 screen pass,
3. reports the distribution of |log10(pv32) - log10(pv64)| (max + q99),
   the implied safe screen margin, and the throughput of screen vs exact.

Writes SCREEN_CALIB.json at the repo root; docs/performance.md cites it.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run_config(name, n_cells, n_contexts, n_donors, n_snps, out):
    import cellregmap_tpu as crt
    from bench import make_dataset

    d = make_dataset(n_cells, n_contexts, n_donors, n_snps,
                     seed=5 if n_contexts > 10 else 0)
    cfg = crt.ScanConfig(snp_batch=512)
    crm = crt.CellRegMap(y=d["y"], E=d["E"], W=d["W"], Ls=d["Ls"],
                         config=cfg)

    # f64 exact (davies) timing — the headline comparator
    t0 = time.perf_counter()
    pv64_davies, _ = crm.scan_interaction(d["G"])
    t_first64 = time.perf_counter() - t0
    t0 = time.perf_counter()
    pv64_davies, _ = crm.scan_interaction(d["G"])
    t64 = time.perf_counter() - t0

    # f64 saddlepoint (error isolation comparator)
    crm_sp = crt.CellRegMap(y=d["y"], E=d["E"], W=d["W"], Ls=d["Ls"],
                            config=dataclasses.replace(
                                cfg, pvalue_method="saddlepoint"))
    crm_sp._ctx_cache = crm._ctx  # share the factorization
    pv64_sp, _ = crm_sp.scan_interaction(d["G"])

    # f32 screen (significance tiny so NOTHING confirms: pure screen timing
    # would be polluted by the confirm pass otherwise; a second call with
    # the real threshold gives the end-to-end number)
    t0 = time.perf_counter()
    _, info0 = crm.scan_interaction_screen(d["G"], significance=1e-300)
    t_first32 = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, info = crm.scan_interaction_screen(d["G"], significance=1e-300)
    t32 = time.perf_counter() - t0
    pv32 = info["screen_pv"]

    t0 = time.perf_counter()
    pv_e2e, info_e2e = crm.scan_interaction_screen(d["G"],
                                                   significance=5e-8)
    t_e2e = time.perf_counter() - t0

    ok = (np.isfinite(pv32) & np.isfinite(pv64_sp)
          & (pv64_sp > 1e-300) & (pv32 > 1e-300))
    dlog = np.abs(np.log10(pv32[ok]) - np.log10(pv64_sp[ok]))
    # miss analysis at the would-be threshold: any pair with exact
    # (davies) pv below 5e-8 must have screen pv below 5e-8 * margin
    sig = pv64_davies < 5e-8
    margin_needed = (float((pv32[sig] / pv64_davies[sig]).max())
                     if sig.any() else None)

    out[name] = {
        "n_cells": n_cells, "n_contexts": n_contexts, "n_snps": n_snps,
        "dlog10_max": round(float(dlog.max()), 4),
        "dlog10_q99": round(float(np.quantile(dlog, 0.99)), 4),
        "dlog10_median": round(float(np.median(dlog)), 5),
        "n_compared": int(ok.sum()),
        "n_true_hits": int(sig.sum()),
        "screen_over_exact_ratio_at_hits": margin_needed,
        "exact_tests_per_sec": round(n_snps / t64, 1),
        "screen_tests_per_sec": round(n_snps / t32, 1),
        "e2e_screen_tests_per_sec": round(n_snps / t_e2e, 1),
        "n_confirmed_e2e": int(info_e2e["n_confirmed"]),
        "speedup_screen_vs_exact": round(t64 / t32, 2),
        "compile_first_exact_s": round(t_first64, 1),
        "compile_first_screen_s": round(t_first32, 1),
    }
    print(json.dumps({name: out[name]}), flush=True)


def main():
    import jax

    out = {"backend": None}
    out["backend"] = jax.default_backend()
    run_config("c10_2k", 2000, 10, 100, 2048, out)
    run_config("c20_2k", 2048, 20, 125, 1024, out)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCREEN_CALIB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
