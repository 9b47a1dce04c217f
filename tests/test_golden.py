"""Reference golden values (the reference's only pinned-number tests).

The fixture reproduces /root/reference/cellregmap/test/test_math.py:17-35
(RandomState(0), n=3, 2 covariates) and checks the exact constants pinned
there against our dense oracles and the device-side p-value helpers.
"""
import numpy as np
from numpy.testing import assert_allclose

from cellregmap_tpu import oracle, qmin, score_statistic_liu_params


def _data():
    random = np.random.RandomState(0)
    W = random.randn(3, 2)
    K0 = random.randn(3, 3)
    K0 = K0 @ K0.T
    K = 0.2 * K0 + np.eye(3)
    y = random.multivariate_normal(W @ np.array([0.5, -0.2]), K)
    return y, W, K, K0


def test_p_matrix_golden():
    _, W, K, _ = _data()
    P = np.array([
        [0.50355613, -0.24203676, -0.34880245],
        [-0.24203676, 0.11633617, 0.16765363],
        [-0.34880245, 0.16765363, 0.24160792],
    ])
    assert_allclose(oracle.P_matrix(W, K), P, atol=1e-8)


def test_score_statistic_regression_pin():
    # The reference pins Q for a y drawn by multivariate_normal, whose
    # value is LAPACK-version-dependent (SVD sign ambiguity); pin ours with
    # a hardcoded y instead so the test is platform-stable.
    _, W, K, dK = _data()
    y = np.array([-0.76705862, 0.35250246, 0.50849816])
    assert_allclose(oracle.score_statistic(y, W, K, dK),
                    0.2895687337358154, rtol=1e-9)


def test_distr_weights_golden():
    # reference pins [4.55e-09, 3.46249449e-01] at atol=1e-7: one
    # significant weight plus sqrtm noise; assert the same at that
    # tolerance without depending on the noise eigenvalues.
    _, W, K, dK = _data()
    w = np.sort(oracle.score_statistic_distr_weights(W, K, dK))
    assert_allclose(w[-1], 3.46249449e-01, atol=1e-7)
    assert np.all(np.abs(w[:-1]) < 1e-7)


def test_liu_params_golden():
    # reference constants for (q, weights) = (0.4996101707, [0.34624945]);
    # /root/reference/cellregmap/test/test_math.py:76-83
    params = score_statistic_liu_params(
        0.49961017073389324, np.array([4.55266277e-09, 3.46249449e-01]))
    assert_allclose(params["pv"], 0.22966744652848403, rtol=1e-7)
    assert_allclose(params["mu_q"], 0.34624945394475326, rtol=1e-7)
    assert_allclose(params["sigma_q"], 0.48967066729451103, rtol=1e-7)
    assert_allclose(params["dof_x"], 1.0, rtol=1e-6)


def test_qmin_golden():
    params = [
        {"pv": 0.22966742, "mu_q": 0.34945, "sigma_q": 0.48670,
         "dof_x": 1.5},
        {"pv": 0.65, "mu_q": 0.695, "sigma_q": 0.1, "dof_x": 0.7},
    ]
    assert_allclose(qmin(params),
                    [0.5506645025120773, 0.7157125486956082], rtol=1e-9)
