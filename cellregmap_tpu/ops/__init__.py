from .lowrank import (
    QSCov,
    PMat,
    ScoreStatistic,
    economic_qs,
    economic_qs_linear,
    gram_eigh,
    orthonormal_basis,
    kinv_quad,
)
from .hadamard import get_L_values, hadamard_factor_tensor

__all__ = [
    "QSCov",
    "PMat",
    "ScoreStatistic",
    "economic_qs",
    "economic_qs_linear",
    "gram_eigh",
    "orthonormal_basis",
    "kinv_quad",
    "get_L_values",
    "hadamard_factor_tensor",
]
