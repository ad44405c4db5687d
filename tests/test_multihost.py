"""Multi-host (2-process jax.distributed) execution of the sharded
3-D DCT: the DCN layer VERDICT item 9 requires exercised.

Two real OS processes rendezvous over a local coordinator, each
contributing 4 virtual CPU devices; each stages its own time-contiguous
frame slab (`stage_global_cube`), the Ulysses-sharded filter runs over
the global (time, space) mesh, and both processes verify the gathered
result against the host-side oracle.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r'''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from dspfun_tpu.parallel import multihost, sharded
from dspfun_tpu.core.precision import Precision
from dspfun_tpu.models.fused import lowpass_mask, fused_filter_3d, filter_plans

multihost.initialize(coordinator=f"localhost:{port}", num_processes=2,
                     process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

mesh = multihost.global_mesh(space=2, time=4)
t, h, w, c = 8, 4, 6, 3
rng = np.random.default_rng(0)
full = rng.random((t, h, w, c)).astype(np.float32)
local = full[pid * 4 : (pid + 1) * 4]       # this host's time slab
cube = multihost.stage_global_cube(local, mesh)
assert cube.shape == (t, h, w, c)

prec = Precision(coeff="float32", intermediate="f32")
mask = lowpass_mask((t, h, w), cutoff=0.5, boost=1.25, damp=0.1)[..., None]
mask_s = jax.device_put(jax.numpy.asarray(mask, jax.numpy.float32),
                        sharded.mask_sharding(mesh))
out = sharded.fused_filter_3d_sharded(cube, mask_s, mesh, prec)

import jax.experimental.multihost_utils as mhu
gathered = np.asarray(mhu.process_allgather(out, tiled=True)).reshape(t, h, w, c)
ref = np.asarray(fused_filter_3d(full, mask.astype(np.float32),
                                 filter_plans((t, h, w), prec), prec))
err = np.max(np.abs(gathered - ref))
assert err < 1e-4, err
print(f"proc {pid} OK err={err:.3g}", flush=True)
'''


@pytest.mark.timeout(180)
def test_two_process_distributed_sharded_dct(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out
