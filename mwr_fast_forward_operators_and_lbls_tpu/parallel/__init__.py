"""Mesh construction and sharding rules for multi-chip execution."""

from .mesh import make_mesh, single_device_mesh  # noqa: F401
from .sharding import forward_sharded, shard_profiles  # noqa: F401
from . import checkpoint, profiling  # noqa: F401
