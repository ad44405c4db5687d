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

__all__ = ["make_mesh", "mesh_from_spec", "plan_row_spec", "P",
           "NamedSharding"]


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


def mesh_from_spec(spec: str | None) -> Mesh | None:
    """Parse a CLI/env mesh request into a Mesh (None = single device).

    Grammar (the ``--mesh`` option shared by the tools; also honoured
    via the ``DSPFUN_MESH`` env var):

    * ``none`` / ``1``  — single device (no mesh)
    * ``auto``          — all visible devices on the space axis
    * ``N``             — N devices on the space axis
    * ``space=N[,time=M]`` / ``time=M[,space=N]`` — explicit axes

    The reference is single-process (SURVEY.md section 2.8); this is the
    rebuild's scaling surface, so it has no reference counterpart.
    """
    import os

    if spec is None:
        spec = os.environ.get("DSPFUN_MESH", "")
    spec = (spec or "").strip().lower()
    if spec in ("", "none", "1", "0"):
        return None
    ndev = len(jax.devices())
    if spec == "auto":
        if ndev <= 1:
            return None
        return make_mesh(ndev, space=ndev, time=1)
    space = time = None
    if "=" in spec:
        for part in spec.split(","):
            k, _, v = part.partition("=")
            k, v = k.strip(), int(v)
            if k == "space":
                space = v
            elif k == "time":
                time = v
            else:
                raise ValueError(f"unknown mesh axis {k!r}")
    else:
        space, time = int(spec), 1
    n = (space or 1) * (time or 1)
    if n > ndev:
        raise ValueError(f"mesh needs {n} devices, only {ndev} visible")
    if n <= 1:
        return None
    return make_mesh(n, space=space, time=time)


def plan_row_spec(plan, axis_name: str = "space"):
    """PartitionSpec pytree sharding an AxisPlan by its OUTPUT rows.

    Field-aware over every AxisPlan leaf so a new field cannot silently
    pick a wrong spec (shared by the scan and zoom row-sharded paths):
    [M, K] matrix leaves (hi/lo) split rows on axis 0; digit leaves are
    [D, M, K] (rows on axis 1); rowsum is [2, M] (rows on axis 1);
    exact-mode scale is a scalar (replicates) while i8-mode scale is
    per-row [M, 1] (rows on axis 0).
    """
    from dspfun_tpu.core.transforms import AxisPlan  # noqa: PLC0415

    scale_spec = None
    if plan.scale is not None:
        scale_spec = (P(axis_name, None)
                      if np.ndim(plan.scale) == 2 else P())
    return AxisPlan(
        hi=P(axis_name, None),
        lo=None if plan.lo is None else P(axis_name, None),
        digits=None if plan.digits is None else P(None, axis_name, None),
        scale=scale_spec,
        rowsum=None if plan.rowsum is None else P(None, axis_name),
    )
