"""Hadamard-product low-rank factorization.

The background kernel K (.) EE^T (elementwise/Hadamard product) never needs to
be materialized: with the thin SVD E = U diag(s) V^T,

    K (.) EE^T = sum_i L_i L_i^T,   L_i = diag(u_i * s_i) @ hK,

where hK hK^T = K.  Proof: /root/reference/proof.md:17-29; consumed by the
reference as ``get_L_values`` (_cellregmap.py:533-545).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _economic_svd(E):
    """Thin SVD with numpy_sugar's absolute cutoff sqrt(eps) on singular
    values (numpy_sugar.linalg.economic_svd semantics, consumed by the
    reference at _cellregmap.py:540).  Host-side: the retained width is a
    static shape."""
    E = np.asarray(E, float)
    U, s, _ = np.linalg.svd(E, full_matrices=False)
    keep = s >= np.sqrt(np.finfo(float).eps)
    return U[:, keep], s[keep]


def get_L_values(hK, E):
    """List of factors L_i with sum_i L_i L_i^T = (hK hK^T) (.) (E E^T).

    Mirrors the reference API (_cellregmap.py:533-545): returns a list of
    (n x k) arrays, one per retained singular vector of E.  Host-side
    (NumPy): this is one-time setup; keeping it off-device avoids C
    separate dispatches per call.
    """
    hK = np.asarray(hK, float)
    U, s = _economic_svd(E)
    us = U * s[None, :]
    return [us[:, i : i + 1] * hK for i in range(us.shape[1])]


def hadamard_factor_tensor(hK, E):
    """Stacked version of :func:`get_L_values` as one (C, n, k) tensor.

    The engine prefers this layout: the concatenated factor
    ``[L_1 .. L_C]`` (n x C*k) is ``transpose(T, (1, 0, 2)).reshape(n, C*k)``.
    """
    hK = jnp.asarray(hK)
    U, s = _economic_svd(E)
    us = jnp.asarray(U * s[None, :])
    return us.T[:, :, None] * hK[None, :, :]
