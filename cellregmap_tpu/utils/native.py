"""Lazy build + ctypes loader for the native qfc library (Davies' method).

The C++ source lives in ``cellregmap_tpu/native/qfc.cc`` and is compiled on
first use with g++ into a per-user cache directory.  If compilation fails
(no toolchain), callers transparently fall back to the SciPy Imhof oracle /
modified-Liu ladder — the framework stays functional, only the host-exact
path gets slower.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _source_path() -> Path:
    return Path(__file__).resolve().parent.parent / "native" / "qfc.cc"


def _cache_dir() -> Path:
    d = os.environ.get("CELLREGMAP_TPU_CACHE")
    if d:
        p = Path(d)
    else:
        p = Path.home() / ".cache" / "cellregmap_tpu"
    p.mkdir(parents=True, exist_ok=True)
    return p


def _build_generic(source_name: str, lib_prefix: str) -> Path | None:
    """Compile a C++ source from cellregmap_tpu/native into the cache."""
    src = Path(__file__).resolve().parent.parent / "native" / source_name
    if not src.exists():
        return None
    digest = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    out = _cache_dir() / f"{lib_prefix}_{digest}.so"
    if out.exists():
        return out
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", str(out), str(src), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return out if out.exists() else None


def _build() -> Path | None:
    return _build_generic("qfc.cc", "libqfc")


class QfcLib:
    """Thin typed wrapper over the shared library."""

    def __init__(self, cdll: ctypes.CDLL):
        self._lib = cdll
        self._lib.qfc_survival.restype = ctypes.c_double
        self._lib.qfc_survival.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # lb
            ctypes.POINTER(ctypes.c_double),  # nc
            ctypes.POINTER(ctypes.c_int),     # df
            ctypes.c_int,                     # r
            ctypes.c_double,                  # sigma
            ctypes.c_double,                  # q
            ctypes.c_int,                     # lim
            ctypes.c_double,                  # acc
            ctypes.POINTER(ctypes.c_int),     # ifault
        ]
        self._lib.qfc_survival_batch.restype = None
        self._lib.qfc_survival_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # lambdas
            ctypes.POINTER(ctypes.c_double),  # qs
            ctypes.c_int, ctypes.c_int,       # n_problems, c
            ctypes.c_int, ctypes.c_double,    # lim, acc
            ctypes.c_double, ctypes.c_int,    # filter_ratio, n_threads
            ctypes.POINTER(ctypes.c_double),  # out_pv
            ctypes.POINTER(ctypes.c_int),     # out_fault
        ]

    def davies(self, lambdas: np.ndarray, q: float, lim: int, acc: float):
        """P(Q > q) for the central chi2(1) mixture; returns (pv, ifault)."""
        lam = np.ascontiguousarray(lambdas, dtype=np.float64)
        ifault = ctypes.c_int(0)
        pv = self._lib.qfc_survival(
            lam.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            None, None, lam.shape[0], 0.0, float(q), int(lim), float(acc),
            ctypes.byref(ifault),
        )
        return float(pv), int(ifault.value)

    def davies_general(self, lambdas, ncps, dfs, sigma, q, lim, acc):
        lam = np.ascontiguousarray(lambdas, dtype=np.float64)
        nc = np.ascontiguousarray(ncps, dtype=np.float64)
        df = np.ascontiguousarray(dfs, dtype=np.int32)
        ifault = ctypes.c_int(0)
        pv = self._lib.qfc_survival(
            lam.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            nc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            df.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            lam.shape[0], float(sigma), float(q), int(lim), float(acc),
            ctypes.byref(ifault),
        )
        return float(pv), int(ifault.value)

    def davies_batch(self, lambda_rows, qs, lim, acc, filter_ratio,
                     n_threads=0):
        """Threaded batch; lambda_rows (S, C) zero-padded; returns pv (S,).

        Problems the algorithm cannot handle (ifault != 0) fall back to the
        Python ladder (Imhof / modified Liu) one by one.
        """
        lam = np.ascontiguousarray(lambda_rows, dtype=np.float64)
        qs = np.ascontiguousarray(qs, dtype=np.float64)
        n, c = lam.shape
        pv = np.empty(n, dtype=np.float64)
        fault = np.empty(n, dtype=np.int32)
        self._lib.qfc_survival_batch(
            lam.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            qs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, c, int(lim), float(acc), float(filter_ratio), int(n_threads),
            pv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            fault.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        bad = np.nonzero(fault != 0)[0]
        if bad.size:
            from ..models.pvalues import davies_pvalue

            for i in bad:
                pv[i] = davies_pvalue(
                    qs[i], lambdas=lam[i], lim=lim, acc=acc,
                    lambda_filter_ratio=filter_ratio,
                )
        return pv


def get_qfc() -> QfcLib | None:
    """Return the loaded native library, building it on first use."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            _LIB = QfcLib(ctypes.CDLL(str(path)))
        except OSError:
            _LIB = None
        return _LIB
