"""Parity against the actual reference stack's pinned constants and its own
simulator (VERDICT.md round-1 items 1 and 10).

Three layers of grounding, strongest first:

1. **Exact reference golden constants through the ENGINE score path.**  The
   reference pins Q = 0.49961017073389324 and the mixture weights / Liu
   parameters for an n=3 fixture (test/test_math.py:66-83).  The fixture's
   phenotype comes from ``RandomState(0).multivariate_normal``, whose output
   depends on the LAPACK build's SVD sign conventions — on this machine the
   raw draw does NOT reproduce the pinned y.  The original y is recovered
   exactly by searching the 8 sign-flip combinations of the covariance SVD
   (numpy draws y = mean + z @ (sqrt(s)[:,None] * V) for some LAPACK-specific
   sign assignment of V's rows); sign pattern (+,-,-) relative to this
   machine's LAPACK reproduces the reference's Q to 3e-16.  That recovered y
   is pinned here through :func:`cellregmap_tpu.engine.score_test_core` —
   the very code the interaction scan executes per variant.

2. **Reference-simulator-driven cross-validation.**  Input data is generated
   by executing the reference's own ``_simulate.py`` (see tests/_refsim.py),
   reproducing the dataset behind test/test_struct_lmm2.py:355-391, and the
   engine's ``predict_interaction`` is checked against an independent dense
   implementation of the current reference algorithm (_cellregmap.py:137-205)
   on that exact data.

3. **Stale-pin impossibility note.**  The reference's four pinned betas
   (test_struct_lmm2.py:387-391: beta_G[3] = -0.07720025290188615, ...) do
   NOT reproduce: both the engine and the independent dense implementation of
   the *current* reference algorithm agree with each other (best rho1 = 0,
   hence beta_GxC = 0 exactly) and disagree with the pins.  Two independent
   causes make those pins unreproducible in principle:
   (a) the pins predate the current code — test_struct_lmm2.py targets the
       removed ``StructLMM2`` API and imports symbols the package no longer
       exports (SURVEY.md section 4), so they were produced by an earlier
       algorithm; and
   (b) the dataset itself is platform-dependent — ``sample_covariance_matrix``
       feeds a donor kernel with a 100-fold degenerate eigenvalue (100
       identical 2-cell blocks) through an SVD, so the factor basis (and
       every ``random.normal`` draw multiplied by it) depends on the LAPACK
       build; the same ambiguity already breaks the raw n=3 fixture above.
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

from cellregmap_tpu import CellRegMap, engine, oracle
from cellregmap_tpu.models import pvalues as pv_mod

from _refsim import reference_gxe_dataset


# --------------------------------------------------------------------------
# 1. exact reference constants through the engine score path
# --------------------------------------------------------------------------
def _reference_math_fixture():
    """test/test_math.py:17-35 fixture with the recovered exact y."""
    random = np.random.RandomState(0)
    W = random.randn(3, 2)
    K0 = random.randn(3, 3)
    K0 = K0 @ K0.T
    # recovered multivariate_normal draw (see module docstring); reproduces
    # the reference's pinned Q to 3e-16 through the dense oracle as well
    y = np.array([2.1610032748682015, -0.98127030641023172,
                  1.356890721823325])
    return y, W, K0


def test_engine_score_core_reference_golden_q():
    """Q = 0.49961017073389324 (test_math.py:66-68) through the engine."""
    y, W, K0 = _reference_math_fixture()
    # cov = v0 K0 + v1 I with v0 = 0.2, v1 = 1.0 (the fixture's K);
    # dK = K0 = A A^T with A any factor -> engine inputs in K0's eigenbasis
    S, Z = np.linalg.eigh(K0)
    S = np.maximum(S, 0.0)
    A = np.linalg.cholesky(K0 + 1e-300 * np.eye(3))
    v0, v1 = 0.2, 1.0

    Q, Wmat = engine.score_test_core(
        jnp.asarray(S), jnp.asarray(Z.T @ W), jnp.asarray(Z.T @ y),
        jnp.asarray(Z.T @ A), jnp.asarray(W.T @ W), jnp.asarray(W.T @ y),
        jnp.asarray(A.T @ W), jnp.asarray(A.T @ y), jnp.asarray(A.T @ A),
        v0, v1,
    )
    assert_allclose(float(Q), 0.49961017073389324, rtol=1e-12)

    # mixture weights (test_math.py:71-73): one significant eigenvalue
    lam = np.sort(np.linalg.eigvalsh(np.asarray(Wmat)))
    assert_allclose(lam[-1], 3.46249449e-01, atol=1e-7)
    assert np.all(np.abs(lam[:-1]) < 1e-7)

    # Liu params through the device p-value path (test_math.py:76-83)
    pv, dof_x, _, mu_q, sigma_q = pv_mod.liu_sf(
        jnp.asarray(float(Q)), jnp.asarray(lam[lam > 1e-16]))
    assert_allclose(float(pv), 0.22966744652848403, rtol=1e-7)
    assert_allclose(float(mu_q), 0.34624945394475326, rtol=1e-7)
    assert_allclose(float(sigma_q), 0.48967066729451103, rtol=1e-7)
    assert_allclose(float(dof_x), 1.0, rtol=1e-6)


def test_recovered_y_is_a_valid_mvn_draw():
    """The pinned y is mean + z @ D for this machine's (mean, z) and a
    sign-flipped SVD factor D of K — i.e. a genuine RandomState(0)
    multivariate_normal output under some LAPACK sign convention."""
    random = np.random.RandomState(0)
    W = random.randn(3, 2)
    K0 = random.randn(3, 3)
    K0 = K0 @ K0.T
    K = 0.2 * K0 + np.eye(3)
    mean = W @ np.array([0.5, -0.2])
    z = random.standard_normal(3)
    _, s, v = np.linalg.svd(K)
    y_pinned, _, _ = _reference_math_fixture()
    diffs = []
    import itertools
    for signs in itertools.product([1, -1], repeat=3):
        y = mean + z @ (np.sqrt(s)[:, None] * (np.diag(signs) @ v))
        diffs.append(np.max(np.abs(y - y_pinned)))
    assert min(diffs) < 1e-12


# --------------------------------------------------------------------------
# 2. reference-simulator-driven cross-validation
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_data():
    s = reference_gxe_dataset()
    if s is None:
        pytest.skip("reference checkout not available")
    return s


def _predict_dense_current_algorithm(s, snps):
    """Dense serial implementation of the CURRENT reference
    predict_interaction (_cellregmap.py:137-205): per-SNP covariance
    rho (gE)(gE)^T + (1-rho) sum_i L_i L_i^T, REML fit over the rho grid via
    an independent scipy optimizer, GLS beta, BLUP-style beta_GxC."""
    W = np.asarray(s.M, float)
    E0 = np.asarray(s.E, float)
    y = np.asarray(s.y, float)
    G = np.asarray(s.G, float)
    bg = sum(np.asarray(L, float) @ np.asarray(L, float).T for L in s.Ls)
    mafs = np.asarray(s.mafs, float)
    norm = 1 / np.sqrt(2 * mafs * (1 - mafs))
    rho_grid = np.linspace(0, 1, 11)
    n = len(y)

    out = {}
    for i in snps:
        g = G[:, [i]]
        M = np.concatenate((W, g, E0), axis=1)
        gE = g * E0
        best = None
        for rho1 in rho_grid:
            Sigma = rho1 * (gE @ gE.T) + (1 - rho1) * bg
            fit = oracle.fit_lmm_dense(y, M, Sigma, restricted=True)
            if best is None or fit["lml"] > best["lml"]:
                best = dict(fit, rho1=rho1, Sigma=Sigma)
        beta_g = best["beta"][W.shape[1]]
        yadj = y - M @ best["beta"]
        cov = best["v0"] * best["Sigma"] + best["v1"] * np.eye(n)
        vv = np.linalg.solve(cov, yadj)
        beta_gxe = best["v0"] * best["rho1"] * (E0 @ (gE.T @ vv)) * norm[i]
        out[i] = (beta_g, beta_gxe, best["rho1"])
    return out


def test_predict_interaction_crosscheck_on_reference_data(ref_data):
    s = ref_data
    crm = CellRegMap(y=s.y, E=s.E, W=s.M, Ls=[np.asarray(L) for L in s.Ls])
    beta_g, beta_gxe = crm.predict_interaction(s.G, s.mafs)
    dense = _predict_dense_current_algorithm(s, [3, 10, 19])
    # 1e-6 parity budget (VERDICT r3 item 5); measured agreement ~2e-10
    # on beta_G and exact 0 on beta_GxC (rho1 = 0 for these snps).  The
    # delta-sensitivity bound justifying 1e-6 is pinned in
    # tests/test_many_contexts.py::test_betas_delta_sensitivity_bound.
    for i, (bg_d, bgxe_d, rho1_d) in dense.items():
        assert_allclose(beta_g[i], bg_d, rtol=0, atol=1e-6)
        assert_allclose(beta_gxe[:, i], bgxe_d, rtol=0, atol=1e-6)


def test_stale_beta_pins_documented_disagreement(ref_data):
    """Both implementations of the current algorithm agree that the best
    rho1 is 0 for the pinned SNPs (hence beta_GxC = 0 exactly), which is
    incompatible with the stale pins — evidence the pins predate the current
    reference algorithm / are platform-dependent (see module docstring)."""
    s = ref_data
    dense = _predict_dense_current_algorithm(s, [3])
    bg_d, bgxe_d, rho1_d = dense[3]
    assert rho1_d == 0.0
    assert np.allclose(bgxe_d, 0.0)
    # ... whereas the stale pin claims beta_GxC[1, 1] = 0.010062608120425824
    assert abs(bg_d - (-0.07720025290188615)) > 1e-3


def test_interaction_pvalue_equality_on_reference_data(ref_data):
    """End-to-end interaction p-values on reference-simulator data: the
    engine matches an independent dense serial pipeline (scipy optimizer,
    dense covariances, dense P matrix) to <= 1e-8, with identical rho
    argmaxes — the strongest available cross-implementation anchor with the
    real reference stack unavailable (measured agreement 3.3e-9)."""
    s = ref_data
    Ls = [np.asarray(L) for L in s.Ls]
    crm = CellRegMap(y=s.y, E=s.E, W=s.M, Ls=Ls)
    pv, info = crm.scan_interaction(s.G)
    pv_d, info_d = oracle.scan_interaction_dense(s.y, s.M, s.E, Ls=Ls,
                                                 G=s.G)
    assert np.max(np.abs(pv - pv_d)) < 1e-8
    assert_allclose(info["rho1"], info_d["rho1"])
    # sanity: the data's noncausal p-values are not degenerate
    noncausal = np.delete(pv, [10, 11])
    assert np.median(noncausal) > 0.1


def test_rho_argmax_first_max_wins_on_exact_ties():
    """The reference keeps the FIRST rho at an exact lml tie (strict ``>``
    over the grid in order, /root/reference/cellregmap/_cellregmap.py:345-357).
    A duplicated-rho grid makes every per-rho problem bitwise identical, so
    the engine's argmax must return index 0 and report the first grid value.
    This test fails if the argmax/tie semantics ever drift (e.g. last-max,
    or a reduction reordering that breaks exact equality of tied lmls)."""
    import jax.numpy as jnp
    from cellregmap_tpu import engine

    rng = np.random.default_rng(3)
    n, C, S = 50, 3, 4
    E = rng.normal(size=(n, C))
    W = np.ones((n, 1))
    hK = rng.normal(size=(n, 6)) / np.sqrt(6)
    import cellregmap_tpu as crt

    Ls = [np.asarray(L) for L in crt.get_L_values(hK, E)]
    y = rng.normal(size=n) + 0.3 * E @ rng.normal(size=C)
    G = rng.choice([0.0, 1.0, 2.0], size=(n, S))
    G = (G - G.mean(0)) / G.std(0)

    rho_tied = np.array([0.4, 0.4, 0.4])
    ctx = engine.build_null_context(y, W, E, E0=E, Ls=Ls,
                                    rho_grid=rho_tied)
    out = engine.interaction_kernel(ctx, jnp.asarray(G), jnp.asarray(G), n)
    # identical problems => identical lmls => first index wins for all SNPs
    assert np.all(np.asarray(out["rho1"]) == rho_tied[0])


def test_delta_optimum_matches_brent_high_precision():
    """Engine REML delta vs an independent bounded-Brent scalar search at
    xatol 1e-12 (the optimix/Brent family the reference's glimix-core fit
    uses, _cellregmap.py:351-352): optima agree to <=1e-7 in delta and the
    engine's lml is never materially below Brent's (same optimum found)."""
    import jax
    import jax.numpy as jnp
    from scipy.optimize import minimize_scalar
    from cellregmap_tpu import engine
    from cellregmap_tpu.models import lmm as lmm_mod

    rng = np.random.default_rng(17)
    n, C, S = 80, 3, 6
    E = rng.normal(size=(n, C))
    W = np.ones((n, 1))
    import cellregmap_tpu as crt

    hK = rng.normal(size=(n, 5)) / np.sqrt(5)
    Ls = [np.asarray(L) for L in crt.get_L_values(hK, E)]
    y = rng.normal(size=n) + 0.5 * E @ rng.normal(size=C)
    G = rng.choice([0.0, 1.0, 2.0], size=(n, S))
    G = (G - G.mean(0)) / np.maximum(G.std(0), 1e-9)

    ctx = engine.build_null_context(y, W, E, E0=E, Ls=Ls)
    out = engine.interaction_kernel(ctx, jnp.asarray(G), jnp.asarray(G), n)
    k_best = np.asarray([np.flatnonzero(
        np.asarray(ctx.rho) == r)[0] for r in np.asarray(out["rho1"])])

    Z = np.asarray(ctx.Z)
    V = np.asarray(ctx.V)
    Ssp = np.asarray(ctx.S)
    for s in range(S):
        k = k_best[s]
        X = np.concatenate([W, G[:, [s]]], axis=1)
        Xz = Z.T @ X
        Xt = V[k].T @ Xz
        yt = V[k].T @ (Z.T @ y)
        data = lmm_mod.EigData(
            S=jnp.asarray(Ssp[k]), Xt=jnp.asarray(Xt), yt=jnp.asarray(yt),
            Cxx=jnp.asarray(X.T @ X - Xt.T @ Xt),
            cxy=jnp.asarray(X.T @ y - Xt.T @ yt),
            cyy=jnp.asarray(y @ y - yt @ yt),
        )

        def neg(logit_d):
            return -float(lmm_mod.lml_at_delta_eig(
                float(jax.nn.sigmoid(logit_d)), data, n, True)[0])

        res = minimize_scalar(neg, bounds=(-18.0, 18.0), method="bounded",
                              options={"xatol": 1e-12})
        d_brent = float(jax.nn.sigmoid(res.x))
        d_eng = float(np.asarray(out["delta"])[s])
        assert abs(d_eng - d_brent) < 1e-7, (s, d_eng, d_brent)
        assert float(np.asarray(out["lml"])[s]) > -res.fun - 1e-8
