"""C ~ 50 contexts (the upper end SURVEY 2.4 mentions).

Round 1 only exercised C <= 10; the per-context contractions, the (S, C, C)
weight-matrix host transfers, and the C x C eigenvalue path all scale with C
(VERDICT round-1 item 9).
"""
import numpy as np
from numpy.testing import assert_allclose

import cellregmap_tpu as crt
from cellregmap_tpu import oracle


def _dataset(n=150, C=50, donors=6, S=6, seed=7):
    rng = np.random.default_rng(seed)
    E = rng.normal(size=(n, C)) / np.sqrt(C)
    W = np.ones((n, 1))
    donor_of = np.repeat(np.arange(donors), -(-n // donors))[:n]
    hK = np.zeros((n, donors))
    hK[np.arange(n), donor_of] = 1.0
    Ls = [np.asarray(L) for L in crt.get_L_values(hK, E)]
    G = rng.choice([0.0, 1.0, 2.0], size=(n, S), p=[0.49, 0.42, 0.09])
    G = (G - G.mean(0)) / G.std(0)
    y = (rng.normal(size=n) + 0.6 * E @ rng.normal(size=C)
         + 0.4 * hK @ rng.normal(size=donors)
         + 0.5 * G[:, 2] * E[:, 0] * np.sqrt(C))
    return y, W, E, G, Ls


def test_interaction_scan_c50_matches_dense():
    y, W, E, G, Ls = _dataset()
    crm = crt.CellRegMap(y=y, E=E, W=W, Ls=Ls)
    pv, info = crm.scan_interaction(G)
    pv_d, info_d = oracle.scan_interaction_dense(y, W, E, Ls=Ls, G=G)
    assert np.max(np.abs(pv - pv_d)) < 1e-8
    assert np.array_equal(info["rho1"], info_d["rho1"])
    assert pv.shape == (6,) and np.all((pv > 0) & (pv <= 1))


def test_betas_c50_finite_and_crosschecked():
    y, W, E, G, Ls = _dataset(S=3)
    crm = crt.CellRegMap(y=y, E=E, W=W, Ls=Ls)
    maf = np.full(3, 0.3)
    bg, bgxe = crm.predict_interaction(G, maf)
    assert np.isfinite(bg).all() and np.isfinite(bgxe).all()
    assert bgxe.shape == (len(y), 3)

    # dense cross-check on one variant (oracle reduces rank like glimix)
    i = 0
    g = G[:, [i]]
    M = np.concatenate((W, g, E), axis=1)
    gE = g * E
    bgm = sum(np.asarray(L) @ np.asarray(L).T for L in Ls)
    best = None
    for rho1 in np.linspace(0, 1, 11):
        Sigma = rho1 * (gE @ gE.T) + (1 - rho1) * bgm
        fit = oracle.fit_lmm_dense(y, M, Sigma, restricted=True)
        if best is None or fit["lml"] > best["lml"]:
            best = dict(fit, rho1=rho1, Sigma=Sigma)
    assert_allclose(bg[i], best["beta"][W.shape[1]], atol=5e-4)
