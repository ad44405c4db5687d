#!/usr/bin/env python
"""Round-3 calibration, part 3: int8 MXU viability for digit contraction.

1. Raw throughput: int8xint8->int32 dot vs bf16 HIGHEST/DEFAULT f32 dot.
2. Prototype int8-digit (Ozaki) contraction: error + speed on the 4K
   fused chain shapes.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def chain_time(fn, args, iters):
    probe = jax.jit(lambda a: jnp.float32(a).reshape(-1)[0])

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

    t1, t2 = run(iters), run(2 * iters)
    dt = (t2 - t1) / iters
    return dt if dt > 0 else t2 / (2 * iters)


def main():
    results = {}
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    # ---- raw matmul rates ----
    m = k = n = 4096
    a8 = jnp.asarray(rng.integers(-64, 64, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-64, 64, (k, n)), jnp.int8)
    abf = jnp.asarray(rng.random((m, k)), jnp.bfloat16)
    bbf = jnp.asarray(rng.random((k, n)), jnp.bfloat16)
    af = jnp.asarray(rng.random((m, k)), jnp.float32)
    bf = jnp.asarray(rng.random((k, n)), jnp.float32)

    flops = 2.0 * m * k * n

    def rate(fn, x, y, iters=50):
        # chain via output-feeds-nothing: wrap so the loop carries x
        g = lambda v, yy: fn(v, yy).astype(v.dtype)[:, :k]  # noqa: E731
        dt = chain_time(g, (x, y), iters)
        return flops / dt / 1e12

    i8 = lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.int32)  # noqa: E731
    r = rate(i8, a8, b8)
    results["int8_TOPS"] = round(r, 1)
    print(f"int8xint8->int32 : {r:7.1f} TOPS", flush=True)

    bfd = lambda x, y: jax.lax.dot(x, y, preferred_element_type=jnp.float32)  # noqa: E731
    r = rate(bfd, abf, bbf)
    results["bf16_TFLOPS"] = round(r, 1)
    print(f"bf16xbf16->f32   : {r:7.1f} TFLOPS", flush=True)

    fhi = lambda x, y: jax.lax.dot(x, y, precision=jax.lax.Precision.HIGHEST,  # noqa: E731
                                   preferred_element_type=jnp.float32)
    r = rate(fhi, af, bf)
    results["f32_HIGHEST_TFLOPS"] = round(r, 1)
    print(f"f32 HIGHEST      : {r:7.1f} TFLOPS", flush=True)

    # ---- int8-digit contraction prototype on a DCT-sized problem ----
    # y = M @ x along axis 0, M = dct2(2160), x [2160, 3840*3]
    from dspfun_tpu.core import basis as basis_mod

    K, R = 2160, 3840 * 3
    M = basis_mod.dct2_matrix(K)
    x_np = rng.random((K, R)).astype(np.float32)
    ref = M @ x_np.astype(np.float64)

    B = 7
    DA = DX = 3

    # host split of the matrix: per-row scale into half-range digits
    def split_host(mat, nd):
        e = np.ceil(np.log2(np.max(np.abs(mat), axis=1, keepdims=True))) + 1.0
        r = mat / 2.0**e
        digs = []
        for i in range(nd):
            d = np.round(r * 2.0 ** (B * (i + 1)))
            r = r - d / 2.0 ** (B * (i + 1))
            digs.append(d.astype(np.int8))
        return np.stack(digs), e.astype(np.float32)

    mdig, me = split_host(M, DA)
    assert np.max(np.abs(mdig.astype(np.int32))) <= 65

    def split_dev(x, nd):
        mx = jnp.max(jnp.abs(x), axis=0, keepdims=True)
        e = jnp.where(mx > 0, jnp.ceil(jnp.log2(mx)) + 1.0, 0.0)
        r = x * jnp.exp2(-e)
        digs = []
        for i in range(nd):
            sc = float(2.0 ** (B * (i + 1)))
            d = jnp.round(r * sc)
            r = r - d / sc
            digs.append(d.astype(jnp.int8))
        return digs, e

    def int8_contract(x, md, me_):
        xd, xe = split_dev(x, DX)
        da, mm, kk = md.shape
        big = jax.lax.dot(
            md.reshape(da * mm, kk), jnp.concatenate(xd, axis=1),
            preferred_element_type=jnp.int32,
        ).reshape(da, mm, DX, x.shape[1])
        y = jnp.zeros((mm, x.shape[1]), jnp.float32)
        for i in range(da):
            for j in range(DX):
                y = y + big[i, :, j].astype(jnp.float32) * float(2.0 ** (-B * (i + j + 2)))
        return y * jnp.exp2(me_) * jnp.exp2(xe)

    md = jax.device_put(jnp.asarray(mdig))
    mee = jax.device_put(jnp.asarray(me))
    x = jax.device_put(x_np)
    got = np.asarray(jax.jit(int8_contract)(x, md, mee), np.float64)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    results["int8_contract_relerr"] = float(err)
    print(f"int8 contraction rel err: {err:.3e}", flush=True)

    g = lambda v, md_, me2: int8_contract(v, md_, me2)[:, : v.shape[1]]  # noqa: E731
    dt = chain_time(g, (x, md, mee), 20)
    eq_tflops = 2.0 * K * K * R / dt / 1e12
    results["int8_contract_eq_TFLOPS"] = round(eq_tflops, 1)
    print(f"int8 contraction: {dt*1e3:.2f} ms = {eq_tflops:.1f} eff TFLOPS "
          f"(HIGHEST does ~33)", flush=True)

    with open("/tmp/calib_r3c.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("WROTE /tmp/calib_r3c.json", flush=True)


if __name__ == "__main__":
    main()
