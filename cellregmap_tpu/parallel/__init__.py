from .mesh import initialize_distributed, make_mesh
from .scan import sharded_interaction_batch, ShardedScanner
from .checkpoint import ScanCheckpoint

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "sharded_interaction_batch",
    "ShardedScanner",
    "ScanCheckpoint",
]
