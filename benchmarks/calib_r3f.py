#!/usr/bin/env python
"""i8 kernel at 4K shapes: tile-size / vmem-limit sweep + timing."""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 7
_NDIG = 3


def make_call(tm, tr, vmem_mb):
    def kernel(a0, a1, a2, x_ref, o_ref):
        x = x_ref[:]
        mx = jnp.max(jnp.abs(x), axis=0, keepdims=True)
        e = jnp.where(mx > 0, jnp.ceil(jnp.log2(mx)) + 1.0, 0.0)
        r = x * jnp.exp2(-e)
        xd = []
        for i in range(_NDIG):
            sc = float(2.0 ** (B * (i + 1)))
            d = jnp.round(r * sc)
            r = r - d * (1.0 / sc)
            xd.append(d.astype(jnp.int8))
        w = [float(2.0 ** (-B * (p + 2))) for p in range(3)]
        acc = jnp.dot(a0[:], xd[0], preferred_element_type=jnp.int32).astype(jnp.float32) * w[0]
        acc += (jnp.dot(a0[:], xd[1], preferred_element_type=jnp.int32)
                + jnp.dot(a1[:], xd[0], preferred_element_type=jnp.int32)).astype(jnp.float32) * w[1]
        acc += (jnp.dot(a0[:], xd[2], preferred_element_type=jnp.int32)
                + jnp.dot(a1[:], xd[1], preferred_element_type=jnp.int32)
                + jnp.dot(a2[:], xd[0], preferred_element_type=jnp.int32)).astype(jnp.float32) * w[2]
        o_ref[:] = acc * jnp.exp2(e)

    @functools.partial(jax.jit, static_argnames=())
    def call(a0, a1, a2, x):
        m, k = a0.shape
        r = x.shape[1]
        params = {}
        if vmem_mb:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb << 20)
        a_spec = pl.BlockSpec((tm, k), lambda j, i: (i, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, r), jnp.float32),
            grid=(r // tr, m // tm),
            in_specs=[a_spec, a_spec, a_spec,
                      pl.BlockSpec((k, tr), lambda j, i: (0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tm, tr), lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
            **params,
        )(a0, a1, a2, x)

    return call


def main():
    from dspfun_tpu.core import basis as basis_mod
    from dspfun_tpu.ops.int8mm import split_matrix_i8

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    # the 4K chain's worst contraction: axis-1 forward (K=3840), pruned
    # output rows M=960, R = 2160*3 columns
    K, M, R = 3840, 960, 2160 * 3
    mat = basis_mod.dct2_matrix(K)[:M]
    dig, rs = split_matrix_i8(mat)
    x_np = (rng.random((K, R)).astype(np.float32) - 0.3) * 4
    ref = mat @ x_np.astype(np.float64)

    a = jnp.asarray(dig)
    x = jnp.asarray(x_np)
    probe = jax.jit(lambda v: v.reshape(-1)[0])

    for tm, tr, vmem in [(128, 128, 0), (256, 256, 64), (128, 256, 0),
                         (256, 512, 100), (96, 256, 0)]:
        if M % tm or R % tr:
            continue
        try:
            call = make_call(tm, tr, vmem)
            y = call(a[0], a[1], a[2], x)
            got = np.asarray(y, np.float64) * rs
            rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))

            @jax.jit
            def loop(xx, n=20, call=call):
                def body(i, v):
                    return call(a[0], a[1], a[2], v)[:K, :]
                return jax.lax.fori_loop(0, n, body, xx)

            # M < K so slice keeps shape valid only if M >= ... guard:
            if M >= K:
                _ = jax.device_get(probe(loop(x)))
                t0 = time.perf_counter()
                _ = jax.device_get(probe(loop(x)))
                dt = (time.perf_counter() - t0) / 20
            else:
                # serial chain: feed a scalar of each result into the
                # next call so the loop cannot be hoisted
                @jax.jit
                def many(xx, call=call):
                    def body(i, carry):
                        acc, v = carry
                        y = call(a[0], a[1], a[2], xx + acc * 1e-30)
                        return y[0, 0], v
                    return jax.lax.fori_loop(0, 20, body,
                                             (jnp.float32(0), jnp.float32(0)))[0]
                _ = jax.device_get(many(x))
                t0 = time.perf_counter()
                _ = jax.device_get(many(x))
                dt = (time.perf_counter() - t0) / 20
            tops = 6 * 2 * M * K * R / dt / 1e12
            print(f"tm={tm} tr={tr} vmem={vmem}MB: rel={rel:.2e} "
                  f"{dt*1e3:.2f} ms  {tops:.0f} eff-TOPS(int8)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"tm={tm} tr={tr} vmem={vmem}MB: FAIL {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
