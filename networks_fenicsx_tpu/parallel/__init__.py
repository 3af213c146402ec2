"""Multi-device (sharded) execution of the network solve."""

from . import sharding
from .sharding import ShardedNetworkSolver, shard_solve

__all__ = ["sharding", "ShardedNetworkSolver", "shard_solve"]
