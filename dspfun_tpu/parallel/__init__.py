from dspfun_tpu.parallel.mesh import make_mesh
from dspfun_tpu.parallel.sharded import (
    cube_sharding,
    dct3d_sharded_fn,
    fused_filter_3d_sharded,
    mask_sharding,
)

__all__ = [
    "make_mesh",
    "cube_sharding",
    "mask_sharding",
    "dct3d_sharded_fn",
    "fused_filter_3d_sharded",
]
