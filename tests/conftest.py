"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
can be exercised without a TPU pod (the driver separately dry-runs the
multichip path; real-TPU benchmarking happens in bench.py).

Must set env vars before anything imports jax.
"""

import os

if os.environ.get("DSPFUN_TEST_TPU"):
    # On-chip verification mode: keep the environment's TPU backend and
    # select ONLY the TPU-gated tests, e.g.
    #   DSPFUN_TEST_TPU=1 python -m pytest -q -k engages_on_tpu \
    #       tests/test_int8mm.py tests/test_pallas.py
    # (everything else expects the CPU oracle backend; first blocking
    # sync on the tunnel takes minutes — run nohup'd in the background)
    import jax  # noqa: F401
else:
    # Force-override: the environment pins JAX_PLATFORMS to the
    # tunnelled TPU backend, but the test suite must run on the CPU
    # oracle backend (f64/complex128 + virtual multi-device mesh).
    os.environ["JAX_PLATFORMS"] = "cpu"
    # Enable x64 so the coeff=float64 precision policy (the analogue of
    # the reference's default COEFF_PRECISION=D,
    # include/precision.h:50-57) is real on the CPU oracle backend.
    # All library code is explicit about dtypes, so this does not
    # change f32-policy behaviour.
    os.environ.setdefault("JAX_ENABLE_X64", "1")

    import jax  # noqa: E402

    jax.config.update("jax_enable_x64", True)
    # The environment's TPU plugin forces itself over the JAX_PLATFORMS
    # env var, so pin the platform programmatically too.
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
