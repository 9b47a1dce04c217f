"""Statistical calibration tests on seeded simulations.

Pattern of the reference's test/test_struct_lmm2.py: causal variants get
small p-values, non-causal large; permutation nulls are roughly uniform
(median > 0.3, min > 0.04); effect-size estimates recover simulated signs.
"""
import numpy as np
import pytest
from numpy.testing import assert_

import cellregmap_tpu as crt


@pytest.fixture(scope="module")
def gxe_sim():
    rng = np.random.default_rng(20)
    v = crt.create_variances(0.6, 0.6)
    return crt.sample_phenotype_gxe(
        offset=0.3, n_individuals=50, n_snps=30, n_cells=6, n_env_groups=3,
        maf_min=0.2, maf_max=0.45, g_causals=[5], gxe_causals=[10],
        variances=v, random=rng,
    )


def test_interaction_detects_causal(gxe_sim):
    s = gxe_sim
    pv, info = crt.run_interaction(y=s.y, E=s.E, G=s.G, W=s.M, hK=s.Lk)
    causal = pv[[10]]
    noncausal = np.delete(pv, [10])
    assert_(np.all(causal < 1e-3), causal)
    assert_(np.median(noncausal) > 0.05, noncausal)


def test_interaction_permutation_null(gxe_sim):
    s = gxe_sim
    idx = np.random.default_rng(1).permutation(s.y.shape[0])
    pv, _ = crt.run_interaction(y=s.y, E=s.E, G=s.G, W=s.M, hK=s.Lk,
                                idx_G=idx)
    assert_(np.median(pv) > 0.3, np.median(pv))
    # min over 30 null draws: catches gross anti-conservativeness without
    # being a coin flip on the seed (P(min < 1e-3) ~ 3% under uniformity)
    assert_(np.min(pv) > 1e-3, np.min(pv))


def test_association_detects_persistent(gxe_sim):
    s = gxe_sim
    pv, _ = crt.run_association_fast(s.y, s.M, s.E, s.G, hK=s.Lk)
    causal = pv[[5]]
    noncausal = np.delete(pv, [5, 10])
    assert_(np.all(causal < 1e-2), causal)
    assert_(np.median(noncausal) > 0.05)


def test_estimate_betas_recovers_signs(gxe_sim):
    s = gxe_sim
    bg, bgxe = crt.estimate_betas(s.y, s.M, s.E, s.G, maf=s.mafs, hK=s.Lk)
    assert np.isfinite(bg).all()
    assert np.isfinite(bgxe).all()
    # persistent effects: causal betas dominate in magnitude
    mags = np.abs(bg)
    assert mags[5] > np.median(np.delete(mags, [5]))
    # sign agreement on the causal persistent SNP
    assert np.sign(bg[5]) == np.sign(s.beta_g[5]), (bg[5], s.beta_g[5])
