"""float32 fast path: same pipeline, ~1e-5-relative p-values."""
import numpy as np
from numpy.testing import assert_allclose

import cellregmap_tpu as crt


def test_float32_scan_close_to_float64():
    rng = np.random.default_rng(7)
    n, C, S = 120, 4, 8
    E = rng.normal(size=(n, C))
    W = np.ones((n, 1))
    hK = rng.normal(size=(n, 8)) / np.sqrt(8)
    Ls = [np.asarray(L) for L in crt.get_L_values(hK, E)]
    G = rng.choice([0.0, 1.0, 2.0], size=(n, S), p=[0.49, 0.42, 0.09])
    G = (G - G.mean(0)) / G.std(0)
    KE = sum(L @ L.T for L in Ls)
    y = (0.6 * rng.normal(size=n)
         + np.linalg.cholesky(KE + 1e-8 * np.eye(n)) @ rng.normal(size=n))

    pv64, _ = crt.CellRegMap(y=y, E=E, W=W, Ls=Ls).scan_interaction(G)
    cfg32 = crt.ScanConfig(dtype="float32")
    pv32, _ = crt.CellRegMap(y=y, E=E, W=W, Ls=Ls,
                             config=cfg32).scan_interaction(G)
    assert_allclose(pv32, pv64, rtol=1e-3, atol=1e-6)
