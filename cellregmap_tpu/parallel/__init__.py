from .mesh import make_mesh
from .scan import sharded_interaction_batch, ShardedScanner
from .checkpoint import ScanCheckpoint

__all__ = [
    "make_mesh",
    "sharded_interaction_batch",
    "ShardedScanner",
    "ScanCheckpoint",
]
