"""Multi-device (sharded) execution of the network solve."""

from . import sharding, sweep
from .sharding import ShardedNetworkSolver, shard_solve
from .sweep import sharded_sweep

__all__ = ["sharding", "sweep", "ShardedNetworkSolver", "shard_solve", "sharded_sweep"]
