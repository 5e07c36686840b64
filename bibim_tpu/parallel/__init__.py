"""Multi-chip parallelism.

The reference is single-GPU (SURVEY.md §2.4); this layer is the TPU-native
scale-out it never had. The renderer's natural data-parallel axis is the
*pixel* axis: framebuffer bands shard over a 1D device mesh, geometry is
replicated, and — because screen tiles are independent — the frame needs **no
collectives at all**; only the final image gather crosses chips (over ICI).
"""

from bibim_tpu.parallel.mesh import make_device_mesh
from bibim_tpu.parallel.tile_shard import (
    ShardedRenderer,
    render_frame_sharded,
)

__all__ = ["ShardedRenderer", "make_device_mesh", "render_frame_sharded"]
