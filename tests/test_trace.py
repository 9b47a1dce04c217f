"""Observability: phase timers, structured logging, trace config plumbing."""
import json
import logging

import numpy as np
import pytest

import cellregmap_tpu as crt
from cellregmap_tpu.utils import trace


def test_phase_timers_accumulate():
    t = trace.PhaseTimers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts == {"a": 2, "b": 1}
    assert set(t.summary()) == {"a", "b"}
    assert all(v >= 0 for v in t.summary().values())


def test_log_event_is_json(caplog):
    with caplog.at_level(logging.INFO, logger="cellregmap_tpu"):
        trace.log_event("unit_test", x=1, y="z")
    assert len(caplog.records) == 1
    payload = json.loads(caplog.records[0].message)
    assert payload == {"event": "unit_test", "x": 1, "y": "z"}


def test_scan_interaction_returns_timers(small_dataset):
    y, W, E, Ls, G = small_dataset
    cfg = crt.ScanConfig(pvalue_method="liu", trace=True, snp_batch=4)
    crm = crt.CellRegMap(y=y, E=E, W=W, Ls=Ls, config=cfg)
    pv, info = crm.scan_interaction(G[:, :6])
    assert "timers" in info
    assert "interaction/dispatch" in info["timers"]
    assert "interaction/device_get" in info["timers"]
    assert "interaction/pvalue_ladder" in info["timers"]
    # timers must not disturb results
    crm2 = crt.CellRegMap(y=y, E=E, W=W, Ls=Ls,
                          config=crt.ScanConfig(pvalue_method="liu",
                                                snp_batch=4))
    pv2, info2 = crm2.scan_interaction(G[:, :6])
    np.testing.assert_allclose(pv, pv2, rtol=0, atol=0)
    assert "timers" not in info2


@pytest.fixture
def small_dataset():
    rng = np.random.default_rng(3)
    n, C, rk, S = 60, 3, 4, 8
    E = rng.normal(size=(n, C))
    W = np.ones((n, 1))
    hK = rng.normal(size=(n, rk)) / np.sqrt(rk)
    Ls = crt.get_L_values(hK, E)
    G = rng.choice([0.0, 1.0, 2.0], size=(n, S), p=[0.5, 0.4, 0.1])
    y = rng.normal(size=n)
    return y, W, E, Ls, G
