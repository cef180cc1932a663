"""Sharding / multi-chip layer (SURVEY.md §5, §7 step 6).

The reference is strictly single-threaded, single-image C; everything here is
new capability: image batches shard over a mesh "batch" axis, and the MCU
block grid of a single huge image shards over a "grid" axis, with XLA/GSPMD
inserting any boundary communication for overlay regions that straddle shard
edges.
"""

from .mesh import make_mesh, batch_sharding, grid_sharding  # noqa: F401
from .batch import compose_batch, BatchComposer  # noqa: F401
from .grid import effects_sharded, compose_sharded  # noqa: F401
from .session import GridSession, init_distributed  # noqa: F401
