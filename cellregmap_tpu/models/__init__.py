from .lmm import (
    FitResult,
    lml_at_delta_eig,
    fit_delta_eig,
    lml_at_delta_woodbury,
    fit_delta_woodbury,
    fast_scan,
)
from . import pvalues

__all__ = [
    "FitResult",
    "lml_at_delta_eig",
    "fit_delta_eig",
    "lml_at_delta_woodbury",
    "fit_delta_woodbury",
    "fast_scan",
    "pvalues",
]
