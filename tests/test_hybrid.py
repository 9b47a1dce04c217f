"""Hybrid-precision localization must not move the statistical outputs.

The engine localizes the REML optimum in f32 and converges in f64
(engine.interaction_batch stages 1-3); the final delta, the rho argmax, and
the p-values must match the full-f64 path to the f64-Newton convergence
tolerance.
"""
import numpy as np
import pytest

import cellregmap_tpu as crt


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(11)
    n, C, donors, S = 200, 4, 20, 24
    E = rng.normal(size=(n, C)) / np.sqrt(C)
    W = np.concatenate([np.ones((n, 1)), rng.normal(size=(n, 1))], axis=1)
    hK = np.zeros((n, donors))
    hK[np.arange(n), np.repeat(np.arange(donors), n // donors)] = 1.0
    Ls = crt.get_L_values(hK, E)
    G = rng.binomial(2, 0.3, size=(n, S)).astype(float)
    y = (rng.normal(size=n) + 0.6 * E @ rng.normal(size=C)
         + 0.5 * hK @ rng.normal(size=donors)
         + 0.4 * G[:, 3] * E[:, 1])
    return y, W, E, Ls, G


def test_hybrid_matches_full_f64(dataset):
    y, W, E, Ls, G = dataset
    pv_h, info_h = crt.CellRegMap(
        y=y, E=E, W=W, Ls=Ls,
        config=crt.ScanConfig(hybrid_localization=True),
    ).scan_interaction(G)
    pv_f, info_f = crt.CellRegMap(
        y=y, E=E, W=W, Ls=Ls,
        config=crt.ScanConfig(hybrid_localization=False),
    ).scan_interaction(G)

    np.testing.assert_array_equal(info_h["rho1"], info_f["rho1"])
    np.testing.assert_allclose(info_h["Q"], info_f["Q"], rtol=1e-9)
    np.testing.assert_allclose(pv_h, pv_f, atol=1e-9)
    # delta converged to the same optimum by the f64 Newton tail
    assert np.max(np.abs(info_h["eps2"] - info_f["eps2"])) < 1e-8
