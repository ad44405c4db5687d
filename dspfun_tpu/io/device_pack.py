"""Device-side frame packing: RGB float frames -> container payload
bytes on the TPU.

The frame-emitting tools (scan/zoom) are bound by device->host
bandwidth (~20 MB/s through this environment's tunnel; still a real
cost on attached chips): transferring float RGB costs 12 bytes/px even
when the output container stores 3 (yuv444p y4m) or 1 (gray).  Packing
on device — YCbCr matrix, chroma box-filter, range quantisation to
uint8/uint16, planar layout — cuts the transfer 4-12x and moves the
per-frame host conversion work (numpy matmuls in the writers) onto the
accelerator, overlapping it with the next chunk's compute
(VERDICT r3 item 9).

The packed payload is bit-compatible with the host writers'
``rgb_to_planes`` + ``_quantize_plane`` path up to f32-vs-f64 rounding
at exact .5 boundaries (asserted <= 1 LSB in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["make_packer", "pack_motion_planes"]


def _matrix_for(space):
    from dspfun_tpu.io.video import _matrix_for as mf  # noqa: PLC0415

    return mf(space)


def _pack_motion_impl(plane_frames, div255, pf, color_range,
                      float_pixels: bool, nframes: int):
    maxv = (1 << pf.depth) - 1
    scale8 = 1 << (pf.depth - 8)
    dtype = (jnp.float32 if pf.is_float
             else (jnp.uint8 if pf.depth <= 8 else jnp.uint16))
    chunks = []
    for i, p in enumerate(plane_frames):
        p = jnp.asarray(p, jnp.float32)
        idx = jnp.minimum(jnp.arange(nframes), p.shape[0] - 1)
        p = p[idx]
        if float_pixels:
            # div255 rides as a runtime argument: as a traced CONSTANT
            # XLA strength-reduces x/255 to x*(1/255) (1 ULP off),
            # breaking bit-parity with the host write path (the
            # mesh-vs-single-device bit-identical contract)
            unit = p / div255
            if pf.is_float:
                q = unit.astype(jnp.float32)
            elif color_range == "mpeg" and not pf.is_rgb:
                v = (unit * (224.0 if (i in (1, 2) and pf.ncomp > 1)
                             else 219.0) + 16.0) * scale8
                q = jnp.clip(jnp.rint(v), 0, maxv).astype(dtype)
            else:
                q = jnp.clip(jnp.rint(unit * maxv), 0, maxv).astype(dtype)
        elif pf.is_float:
            q = p.astype(jnp.float32)
        else:
            q = jnp.clip(jnp.rint(p), 0, maxv).astype(dtype)
        chunks.append(q.reshape(nframes, -1))
    return jnp.concatenate(chunks, axis=1)


_MOTION_PACKERS: dict = {}


def pack_motion_planes(plane_frames, pf, color_range, float_pixels: bool,
                       nframes: int):
    """Motion's per-plane emission packed on device: a list of
    ``[F_i, h_i, w_i]`` plane frame stacks in stored pel units
    (0..255-scale) -> one ``[nframes, S]`` container payload.

    Mirrors tools/motion.py's host write path exactly: planes shorter
    than the slab depth replicate their last frame
    (``zz = min(z, scaled.d - 1)``), the float-pixel path divides by
    255 before the writer quantisation, and the raw path clips+rounds
    int containers (VideoWriter.write_frame semantics).

    Jitted per (format, range, float-path, depth) — eagerly this chain
    was ~37 separate dispatches per slab, each paying the remote
    tunnel's fixed per-dispatch cost (round-5 motion CLI profile)."""
    key = (pf.name, color_range, bool(float_pixels), int(nframes))
    fn = _MOTION_PACKERS.get(key)
    if fn is None:
        fn = jax.jit(lambda planes, d: _pack_motion_impl(
            planes, d, pf, color_range, float_pixels, nframes))
        _MOTION_PACKERS[key] = fn
    return fn(list(plane_frames), jnp.float32(255.0))


def make_packer(pf, props, height: int, width: int):
    """A jitted ``frames [F, H, W, 3] float RGB -> [F, S] payload``
    packer for ``pf``/``props``, or None when the format has no packed
    fast path (then callers keep the host writer path).

    Supported: 8/16-bit gray + planar YCbCr (with chroma subsampling)
    and float gbrp/gray (layout reorder only).
    """
    from dspfun_tpu.io import color as _color  # noqa: PLC0415

    if pf.is_float:
        if pf.is_rgb:       # gbrpf32le: planar G, B, R
            @jax.jit
            def pack_gbrp(frames):
                f = jnp.asarray(frames, jnp.float32)
                n = f.shape[0]
                return jnp.concatenate(
                    [f[..., 1].reshape(n, -1), f[..., 2].reshape(n, -1),
                     f[..., 0].reshape(n, -1)], axis=1)

            return pack_gbrp
        if pf.ncomp == 1:   # grayf32le
            @jax.jit
            def pack_grayf(frames):
                f = jnp.asarray(frames, jnp.float32)
                y = (0.299 * f[..., 0] + 0.587 * f[..., 1]
                     + 0.114 * f[..., 2])
                return y.reshape(f.shape[0], -1)

            return pack_grayf
        return None

    maxv = (1 << pf.depth) - 1
    scale8 = 1 << (pf.depth - 8)
    dtype = jnp.uint8 if pf.depth <= 8 else jnp.uint16
    mpeg = props.color_range == "mpeg"

    def quant(p, chroma):
        if mpeg:
            v = (p * (224.0 if chroma else 219.0) + 16.0) * scale8
        else:
            v = p * maxv
        return jnp.clip(jnp.rint(v), 0, maxv).astype(dtype)

    if pf.ncomp == 1:       # gray / gray16le
        @jax.jit
        def pack_gray(frames):
            f = jnp.asarray(frames, jnp.float32)
            y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
            return quant(y, False).reshape(f.shape[0], -1)

        return pack_gray

    if not pf.name.startswith("yuv"):
        return None

    m = jnp.asarray(_color.ycbcr_matrix(_matrix_for(props.color_space)),
                    jnp.float32)
    sx, sy = pf.chroma_shift
    fx, fy = 1 << sx, 1 << sy
    ph, pw = (height + fy - 1) // fy, (width + fx - 1) // fx

    @jax.jit
    def pack_yuv(frames):
        f = jnp.asarray(frames, jnp.float32)
        n = f.shape[0]
        ycc = jnp.einsum("fhwc,kc->fhwk", f, m)
        y = ycc[..., 0]
        cb = ycc[..., 1] + 0.5
        cr = ycc[..., 2] + 0.5
        if sx or sy:
            def down(p):
                pad = jnp.pad(p, ((0, 0), (0, ph * fy - height),
                                  (0, pw * fx - width)), mode="edge")
                return pad.reshape(n, ph, fy, pw, fx).mean(axis=(2, 4))

            cb, cr = down(cb), down(cr)
        return jnp.concatenate(
            [quant(y, False).reshape(n, -1),
             quant(cb, True).reshape(n, -1),
             quant(cr, True).reshape(n, -1)], axis=1)

    return pack_yuv
