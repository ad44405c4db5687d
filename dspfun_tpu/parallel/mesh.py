"""Device-mesh helpers for multi-chip sharding.

The reference is single-process (SURVEY.md section 2.8); its only
concurrency is FFTW pthreads.  This layer is the new first-class
distributed component: dspfun workloads shard naturally over

* ``space`` — the block grid (motion) or pixel rows (spec/zoom/scan):
  blocks are independent, so this is pure data parallelism over ICI;
* ``time``  — the frame/depth axis of motion's 3-D cubes: a
  depth-sharded 3-D DCT needs the time axis made local before its
  1-D transform, done with an all-to-all axis swap (Ulysses-style)
  inside shard_map.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "NamedSharding"]


def make_mesh(
    n_devices: int | None = None,
    space: int | None = None,
    time: int | None = None,
) -> Mesh:
    """Build a (space, time) mesh over the first ``n_devices`` devices.

    Defaults: all devices on the space axis (block-parallelism scales
    furthest), time=1.  Axis sizes must multiply to n_devices.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if space is None and time is None:
        space, time = n, 1
    elif space is None:
        space = n // time
    elif time is None:
        time = n // space
    if space * time != n:
        raise ValueError(f"space*time ({space}*{time}) != n_devices ({n})")
    arr = np.array(devs).reshape(space, time)
    return Mesh(arr, axis_names=("space", "time"))
