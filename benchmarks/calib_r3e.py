#!/usr/bin/env python
"""Bisect which construct in the in-kernel-split i8 kernel breaks Mosaic."""

import functools
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, R, M, TM, TR = 256, 256, 64, 64, 256
B = 7


def run(name, kernel, extra_in=()):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, R), jnp.float32),
            grid=(R // TR, M // TM),
            in_specs=[pl.BlockSpec((TM, K), lambda j, i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((K, TR), lambda j, i: (0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TM, TR), lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
        )(*extra_in)
        out.block_until_ready()
        print(f"{name}: OK  sum={float(out.sum()):.3f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {str(e)[:200]}", flush=True)


rng = np.random.default_rng(0)
a8 = jnp.asarray(rng.integers(-64, 64, (M, K)), jnp.int8)
xf = jnp.asarray(rng.random((K, R)), jnp.float32)


def k_dot_ref(a_ref, x_ref, o_ref):
    # int8 ref x int8 computed-from-f32 via round+astype
    d = jnp.round(x_ref[:] * 64.0).astype(jnp.int8)
    o_ref[:] = jnp.dot(a_ref[:], d, preferred_element_type=jnp.int32).astype(jnp.float32)


def k_dot_ref_i32(a_ref, x_ref, o_ref):
    d = jnp.round(x_ref[:] * 64.0).astype(jnp.int32).astype(jnp.int8)
    o_ref[:] = jnp.dot(a_ref[:], d, preferred_element_type=jnp.int32).astype(jnp.float32)


def k_redmax(a_ref, x_ref, o_ref):
    mx = jnp.max(jnp.abs(x_ref[:]), axis=0, keepdims=True)
    e = jnp.where(mx > 0, jnp.ceil(jnp.log2(mx)) + 1.0, 0.0)
    d = jnp.round(x_ref[:] * jnp.exp2(-e) * 64.0).astype(jnp.int8)
    o_ref[:] = (jnp.dot(a_ref[:], d, preferred_element_type=jnp.int32)
                .astype(jnp.float32) * jnp.exp2(e))


def k_full(a_ref, x_ref, o_ref):
    x = x_ref[:]
    mx = jnp.max(jnp.abs(x), axis=0, keepdims=True)
    e = jnp.where(mx > 0, jnp.ceil(jnp.log2(mx)) + 1.0, 0.0)
    r = x * jnp.exp2(-e)
    xd = []
    for i in range(3):
        sc = float(2.0 ** (B * (i + 1)))
        d = jnp.round(r * sc)
        r = r - d * (1.0 / sc)
        xd.append(d.astype(jnp.int8))
    w = [float(2.0 ** (-B * (p + 2))) for p in range(3)]
    acc = jnp.dot(a_ref[:], xd[0], preferred_element_type=jnp.int32).astype(jnp.float32) * w[0]
    acc += (jnp.dot(a_ref[:], xd[1], preferred_element_type=jnp.int32)
            + jnp.dot(a_ref[:], xd[0], preferred_element_type=jnp.int32)).astype(jnp.float32) * w[1]
    o_ref[:] = acc * jnp.exp2(e)


print("device:", jax.devices()[0], flush=True)
run("dot_computed_int8", k_dot_ref, (a8, xf))
run("dot_via_int32", k_dot_ref_i32, (a8, xf))
run("redmax_log2", k_redmax, (a8, xf))
run("full_split", k_full, (a8, xf))
