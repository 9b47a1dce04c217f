"""PLINK .bed reader: native decoder vs pure-NumPy fallback vs ground truth."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from cellregmap_tpu.utils import plink


@pytest.fixture
def fileset(tmp_path):
    rng = np.random.default_rng(0)
    n, m = 37, 23  # deliberately not multiples of 4
    G = rng.choice([0.0, 1.0, 2.0], size=(n, m), p=[0.5, 0.3, 0.2])
    G[3, 5] = np.nan
    G[36, 22] = np.nan
    prefix = str(tmp_path / "toy")
    plink.write_bed(prefix, G)
    return prefix, G


def test_roundtrip_full(fileset):
    prefix, G = fileset
    rd = plink.PlinkReader(prefix)
    assert rd.n_samples == G.shape[0]
    assert rd.n_variants == G.shape[1]
    got = rd.read()
    assert_allclose(got, G)
    # python fallback agrees with the native path
    py = plink._decode_python(prefix + ".bed", G.shape[0], 0, G.shape[1])
    assert_allclose(py, G)


def test_range_and_blocks(fileset):
    prefix, G = fileset
    rd = plink.PlinkReader(prefix)
    got = rd.read(5, 11)
    assert_allclose(got, G[:, 5:11])
    blocks = list(rd.iter_blocks(7))
    full = np.concatenate([b for b, _ in blocks], axis=1)
    assert_allclose(full, G)
    assert blocks[0][1] == slice(0, 7)


def test_metadata(fileset):
    prefix, G = fileset
    rd = plink.PlinkReader(prefix)
    assert rd.variants[0].snp_id == "snp0"
    assert rd.samples[0][1] == "iid0"
