from .maf import compute_maf
from . import native

__all__ = ["compute_maf", "native"]
