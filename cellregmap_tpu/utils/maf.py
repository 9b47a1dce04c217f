"""Minor-allele-frequency computation (reference _cellregmap.py:589-638).

Multi-backend like the reference (ndarray / pandas / dask / xarray), but the
optional backends are gated: only imported if the input already is one.
"""
from __future__ import annotations

import numpy as np


def compute_maf(X):
    """Compute minor allele frequencies.

    Assumes ``X`` encodes 0, 1, 2 (allele counts or dosage) with NaN for
    missing values; samples on axis 0, variants on axis 1.
    """
    mod = type(X).__module__.split(".")[0]
    if mod == "dask":
        import dask.array as da

        s0 = da.nansum(X, axis=0).compute()
        denom = 2 * (X.shape[0] - da.isnan(X).sum(axis=0)).compute()
    elif mod == "pandas":
        s0 = X.sum(axis=0, skipna=True)
        denom = 2 * (~X.isna()).sum(axis=0)
    elif mod == "xarray":
        kwargs = {"dim": "sample"} if "sample" in X.dims else {"axis": 0}
        s0 = X.sum(skipna=True, **kwargs)
        denom = 2 * np.logical_not(np.isnan(X)).sum(**kwargs)
    else:
        X = np.asarray(X, float)
        s0 = np.nansum(X, axis=0)
        denom = 2 * np.logical_not(np.isnan(X)).sum(axis=0)
    s0 = s0 / denom
    maf = np.minimum(s0, 1 - s0)
    if hasattr(maf, "name"):
        maf.name = "maf"
    return maf
