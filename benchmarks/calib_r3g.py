#!/usr/bin/env python
"""Round-3 calibration, part 7: i8 dense bisect + kernel-only rates."""

import time

import numpy as np

import jax
import jax.numpy as jnp


def t2(fn, args, iters):
    probe = jax.jit(lambda a: a.reshape(-1)[0])

    def run(n):
        @jax.jit
        def f(a, *rest):
            return jax.lax.fori_loop(0, n, lambda i, v: fn(v, *rest), a)

        _ = jax.device_get(probe(f(*args)))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _ = jax.device_get(probe(f(*args)))
            best = min(best, time.perf_counter() - t0)
        return best

    a, b = run(iters), run(2 * iters)
    dt = (b - a) / iters
    return dt if dt > 0 else b / (2 * iters)


def main():
    from dspfun_tpu.core import basis as basis_mod
    from dspfun_tpu.ops.int8mm import i8_contract, split_matrix_i8

    print("device:", jax.devices()[0], flush=True)
    print("warm:", float(jax.jit(lambda: jnp.float32(1))().block_until_ready()),
          flush=True)
    rng = np.random.default_rng(0)

    # ---- dense-chain contraction bisect (which one breaks Mosaic?) ----
    h, w, c = 2160, 3840, 3
    shapes = [
        ("fwd0 left",  (c, h, w), 1, h),     # batched-left K=2160
        ("fwd1 right", (c, h, w), 2, w),     # right K=3840
        ("inv0 left",  (c, h, w), 1, h),     # same as fwd0 shape-wise
        ("inv1 right", (c, h, w), 2, w),
    ]
    for name, shape, axis, k in shapes:
        try:
            m = basis_mod.dct2_matrix(k)
            dig, rs = split_matrix_i8(m)
            x = jnp.asarray(rng.random(shape).astype(np.float32))
            y = jax.jit(lambda xx, d=jnp.asarray(dig), s=jnp.asarray(rs),
                        a=axis: i8_contract(xx, d, s, a))(x)
            y.block_until_ready()
            print(f"dense {name}: OK", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"dense {name}: FAIL {str(e)[:200]}", flush=True)

    # ---- kernel rate at the pruned bench shapes ----
    for name, k, mm, rr in [("pruned fwd1", 3840, 960, 540 * 3),
                            ("pruned inv1", 960, 3840, 2160 * 3),
                            ("square 3840", 3840, 3840, 3840)]:
        mat = basis_mod.dct2_matrix(max(k, mm))[:mm, :k]
        dig, rs = split_matrix_i8(mat)
        d = jax.device_put(jnp.asarray(dig))
        s = jax.device_put(jnp.asarray(rs))
        x = jax.device_put(jnp.asarray(rng.random((k, rr)).astype(np.float32)))

        def body(v, d=d, s=s, k=k):
            y = i8_contract(v, d, s, 0)
            return y[:k, :] if y.shape[0] >= k else jnp.pad(
                y, ((0, k - y.shape[0]), (0, 0)))

        dt = t2(body, (x,), 20)
        tops = 6 * 2 * mm * k * rr / dt / 1e12
        print(f"kernel {name}: {dt*1e3:.3f} ms = {tops:.0f} eff int8-TOPS",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
