"""motion's whole-volume filter chain over a (space, time) device mesh.

The reference's whole-clip mode (``-b WxHx0``, motion/README.md:65 "the
full dimensions of the input must fit into memory") runs one 3-D FFTW
transform over the entire clip — its scaling ceiling is one machine's
RAM and one FFTW plan.  Here the volume is sharded over the mesh:
frames over ``time`` (the sequence/context-parallel axis) and rows over
``space``, the separable 3-D DCT runs Ulysses-style (transform the
locally-complete axis, all_to_all to re-localise the next — see
dspfun_tpu.parallel.sharded), and the full motion filter chain
(reference motion/motion.c:641-771) runs in the transformed layout as
elementwise work over *global* coefficient coordinates.

Chain parity notes vs models.motion_pipeline.filter_blocks:

* requires block == scaled == the (truncated) source volume, so the
  active region covers the whole buffer and no resize embedding is
  needed — exactly the reference's whole-clip mode;
* the top-N coefficient limit is computed *globally* with an exact
  distributed top-k: each shard contributes its local top-k candidates
  (any global winner is its shard's local winner), candidates are
  all_gathered, and the k-th (value desc, flat-index asc) candidate —
  lax.top_k's own tie order — becomes the keep threshold;
* Floyd-Steinberg dithering (round 3): rows all_gather per time shard
  and the sequential diffusion runs on whole local frames (redundant
  across the space axis — cheap VPU work next to the DCTs).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dspfun_tpu.core.precision import Precision, get_precision
from dspfun_tpu.core.transforms import apply_plan, plan_axis

__all__ = [
    "volume_sharding",
    "supports_volume_params",
    "volume_mesh_compatible",
    "motion_filter_volume_sharded",
    "coded_count",
]


def volume_sharding(mesh: Mesh) -> NamedSharding:
    """[T, H, W] pel-space layout: T over 'time', H over 'space'."""
    return NamedSharding(mesh, P("time", "space", None))


def supports_volume_params(params) -> bool:
    """Chain features the sharded whole-volume path can run (round 3:
    all of them — dither gathers rows per time shard and runs the
    sequential diffusion on whole local frames)."""
    return True


def volume_mesh_compatible(dims, mesh: Mesh) -> bool:
    """True when [T, H, W] = dims divides the mesh in both the pel
    layout (T%time, H%space) and the coefficient layout (H%time,
    W%space)."""
    t, h, w = dims
    nt, ns = mesh.shape["time"], mesh.shape["space"]
    return t % nt == 0 and h % ns == 0 and h % nt == 0 and w % ns == 0


def _swap(x, axis_name, split_axis, concat_axis):
    return jax.lax.all_to_all(
        x, axis_name, split_axis=split_axis, concat_axis=concat_axis, tiled=True
    )


def _axis_vec(idx, sqrt2: float):
    """Per-axis uniform-range factor: sqrt2 at global index 0, 1
    elsewhere (reference motion/motion.c:643-647)."""
    return jnp.where(idx > 0, 1.0, sqrt2)


def motion_filter_volume_sharded(
    volume: jax.Array,            # [T, H, W] pel values 0..255, volume_sharding
    mesh: Mesh,
    *,
    geom,                         # PlaneGeometry with block == scaled == truncated
    params,                       # MotionParams
    plane_index: int,
    nplanes: int,
    bz=0,
    precision: Precision | None = None,
):
    """Whole-clip single-block motion chain, sharded over the mesh.

    Stateful --eval forms are rejected up front: they evaluate per
    coefficient in sequence on the host (reference motion.c:670-681),
    so no sharded evaluation order can match the reference.

    Returns (out_volume [T, H, W] with the input sharding, coded count
    as a replicated [hi, lo] base-2^15 limb pair — combine with
    :func:`coded_count`; pod-scale counts can exceed int32).  Matches
    filter_blocks on a [1, T, H, W] batch elementwise (same matmuls,
    same chain order).
    """
    g = geom
    p = params
    if p.expr is not None and p.expr.stateful:
        raise ValueError(
            "stateful av_expr forms (random/randomi/while/root/taylor/"
            "time) evaluate sequentially on the host and are not "
            "supported on the sharded path; run single-device")
    prec = precision or get_precision()
    t, h, w = (int(d) for d in volume.shape)
    if (g.block.d, g.block.h, g.block.w) != (t, h, w) or g.block != g.scaled:
        raise ValueError("volume path requires block == scaled == volume dims")
    if not volume_mesh_compatible((t, h, w), mesh):
        raise ValueError(f"volume {t}x{h}x{w} does not divide mesh {dict(mesh.shape)}")
    # bz only feeds the --eval expression environment: keep it out of
    # the trace cache key otherwise, or every slab of a multi-slab run
    # would recompile the whole sharded program
    fn = _volume_fn(mesh, geom, params, plane_index, nplanes,
                    int(bz) if params.expr is not None else 0,
                    prec, t, h, w)
    return fn(volume)


def coded_count(c) -> int:
    """Combine the [hi, lo] limb pair the volume path returns."""
    hi, lo = (int(v) for v in np.asarray(c))
    return (hi << 15) + lo


@functools.lru_cache(maxsize=32)
def _volume_fn(mesh, geom, params, plane_index, nplanes, bz, prec, t, h, w):
    """Cached shard_map+jit construction (every argument is a hashable
    static config), so repeated slabs/runs reuse the traced program."""
    g = geom
    p = params

    plans = {
        "t2": plan_axis(t, "dct2", prec), "t3": plan_axis(t, "dct3", prec),
        "h2": plan_axis(h, "dct2", prec), "h3": plan_axis(h, "dct3", prec),
        "w2": plan_axis(w, "dct2", prec), "w3": plan_axis(w, "dct3", prec),
    }
    svol = g.scaled.volume()
    scalefactor = svol / g.block.volume()     # == 1.0 here
    normalization = 1.0 / math.sqrt(svol * 8.0)
    norm2 = normalization * normalization
    sqrt2 = math.sqrt(2.0)

    def to_coeff_layout(x):
        """[T/t, H/s, W] -> [T, H/t, W/s] (transport only)."""
        x = _swap(x, "space", 2, 1)
        return _swap(x, "time", 1, 0)

    def to_pel_layout(x):
        x = _swap(x, "time", 0, 1)
        return _swap(x, "space", 1, 2)

    def fwd(x):
        x = apply_plan(x, plans["w2"], 2, prec)
        x = _swap(x, "space", 2, 1)
        x = apply_plan(x, plans["h2"], 1, prec)
        x = _swap(x, "time", 1, 0)
        return apply_plan(x, plans["t2"], 0, prec)

    def inv(c):
        c = apply_plan(c, plans["t3"], 0, prec)
        c = _swap(c, "time", 0, 1)
        c = apply_plan(c, plans["h3"], 1, prec)
        c = _swap(c, "space", 1, 2)
        return apply_plan(c, plans["w3"], 2, prec)

    def local(vol_shard):
        if not jnp.issubdtype(vol_shard.dtype, jnp.floating):
            # raw integer pel staging (see filter_blocks): cast on device
            vol_shard = vol_shard.astype(jnp.float32)
        dtype = vol_shard.dtype
        x = vol_shard
        # --- input decode (motion.c:618-638) --------------------------
        if p.ispec == "shift":
            ic = 127.5 / math.log1p(svol * normalization * 255 * 8)
            tt = x - 127.5
            x = jnp.sign(tt) * jnp.expm1(jnp.abs(tt / ic)) / normalization
        elif p.ispec == "flat":
            x = (x - 127.5) * 2.0 / norm2
        elif p.ispec == "copy":
            x = x / norm2
        elif p.linear:
            from dspfun_tpu.io.color import srgb_decode  # noqa: PLC0415

            x = srgb_decode(x / 255.0, jnp) * 255.0

        # --- forward 3-D DCT + uniform renorm (motion.c:641-647) ------
        if not p.ispec:
            M = fwd(x)
        else:
            M = to_coeff_layout(x)

        # global coefficient coordinates in the [T, H/t, W/s] layout
        lth, lws = M.shape[1], M.shape[2]
        ti = jax.lax.axis_index("time")
        si = jax.lax.axis_index("space")
        zg = jnp.arange(t)
        yg = ti * lth + jnp.arange(lth)
        xg = si * lws + jnp.arange(lws)

        if not p.ispec:
            uf = (2.0 * sqrt2
                  / (_axis_vec(zg, sqrt2)[:, None, None]
                     * _axis_vec(yg, sqrt2)[None, :, None]
                     * _axis_vec(xg, sqrt2)[None, None, :]))
            M = M * uf.astype(dtype)

        is_dc = ((zg == 0)[:, None, None] & (yg == 0)[None, :, None]
                 & (xg == 0)[None, None, :])
        dc = jax.lax.psum(
            jax.lax.psum(jnp.sum(jnp.where(is_dc, M, 0.0)), "space"), "time"
        )

        # --- top-N coefficient limit (motion.c:652-668) ----------------
        if p.coeff_limit:
            k = min(p.coeff_limit, t * h * w)
            # tie-break by (z, y, x) lexicographic order — equivalent to
            # lax.top_k's flat-index order but free of the int32
            # overflow a z*(h*w)+y*w+x flat index hits past 2^31
            # coefficients (the whole point of the sharded volume path)
            a = jnp.abs(M).reshape(-1)
            zf = jnp.broadcast_to(zg[:, None, None], M.shape).reshape(-1)
            yf = jnp.broadcast_to(yg[None, :, None], M.shape).reshape(-1)
            xf = jnp.broadcast_to(xg[None, None, :], M.shape).reshape(-1)
            kl = min(k, a.shape[0])
            lv, li = jax.lax.top_k(a, kl)

            def gather(u):
                return jax.lax.all_gather(
                    jax.lax.all_gather(u, "space", tiled=True),
                    "time", tiled=True,
                )

            cv, cz, cy, cx = (gather(u) for u in
                              (lv, zf[li], yf[li], xf[li]))
            ov, oz, oy, ox = jax.lax.sort(
                (-cv, cz, cy, cx), dimension=0, num_keys=4
            )
            vth, zth, yth, xth = -ov[k - 1], oz[k - 1], oy[k - 1], ox[k - 1]
            aa = jnp.abs(M)
            z3 = zg[:, None, None]
            y3 = yg[None, :, None]
            x3 = xg[None, None, :]
            lex_le = ((z3 < zth)
                      | ((z3 == zth)
                         & ((y3 < yth) | ((y3 == yth) & (x3 <= xth)))))
            keep = (aa > vth) | ((aa == vth) & lex_le)
            M = jnp.where(keep, M, 0.0)

        # --- expression (motion.c:670-681) ----------------------------
        if p.expr is not None:
            env = {
                "c": M * (norm2 / 255.0),
                "x": jnp.broadcast_to(xg.astype(dtype)[None, None, :], M.shape),
                "y": jnp.broadcast_to(yg.astype(dtype)[None, :, None], M.shape),
                "z": jnp.broadcast_to(zg.astype(dtype)[:, None, None], M.shape),
                "i": jnp.asarray(float(plane_index), dtype),
                "width": float(g.block.w), "height": float(g.block.h),
                "depth": float(g.block.d), "components": float(nplanes),
                "bx": jnp.asarray(0.0, dtype), "by": jnp.asarray(0.0, dtype),
                "bz": jnp.asarray(float(bz), dtype),
                "bwidth": 1.0, "bheight": 1.0, "bdepth": 1.0,
            }
            M = (p.expr(env, jnp) * (255.0 / norm2)).astype(dtype)

        # --- bandpass (motion.c:683-719): the face-product form shared
        # with filter_blocks — overlapping faces double-damp when
        # begin > end, matching the reference's sequential loops
        if p.damp != 1.0 or p.boost != 1.0:
            from dspfun_tpu.models.motion_pipeline import (  # noqa: PLC0415
                bandpass_mult_grid,
            )

            mult = bandpass_mult_grid(
                zg[:, None, None], yg[None, :, None], xg[None, None, :],
                g, p.boost, p.damp, jnp)
            M = M * mult.astype(dtype)

        # --- threshold (motion.c:721-728) ------------------------------
        if p.threshold_max:
            tmin = p.threshold_min * 255.0 / norm2
            tmax = p.threshold_max * 255.0 / norm2
            a = jnp.abs(M)
            M = jnp.where((a < tmin) | (a > tmax), 0.0, M)

        # --- preserve DC (motion.c:730-738) -----------------------------
        if p.preserve_dc:
            dcstop = bool(g.bp_begin.d or g.bp_begin.h or g.bp_begin.w)
            if p.expr is not None or dcstop or p.boost != 1.0 or p.threshold_max:
                if p.preserve_dc == "dc":
                    M = jnp.where(is_dc, dc, M)
                else:  # grey
                    edge = p.damp if dcstop else p.boost
                    M = jnp.where(
                        is_dc,
                        M + (1.0 - edge) * 127.5 / (norm2 * scalefactor),
                        M,
                    )

        # --- quantize (motion.c:740-744) --------------------------------
        coded = jnp.zeros((2,), jnp.int32)
        if p.quant:
            quantizer = p.quant * 8.0 * math.sqrt(svol)
            M = jnp.round(M / quantizer) * quantizer
            # two base-2^15 int32 limbs: a pod-wide count can exceed
            # 2^31 nonzero coefficients (the very scale this path
            # exists for), which a single-int32 psum would wrap
            cnt = jnp.sum(M != 0, dtype=jnp.int32)
            limbs = jnp.stack([cnt >> 15, cnt & 0x7FFF])
            coded = jax.lax.psum(jax.lax.psum(limbs, "space"), "time")

        # --- inverse / spectrogram output (motion.c:746-771) ------------
        if not p.spec:
            ufinv = ((_axis_vec(zg, sqrt2)[:, None, None]
                      * _axis_vec(yg, sqrt2)[None, :, None]
                      * _axis_vec(xg, sqrt2)[None, None, :])
                     / (2.0 * sqrt2))
            S = inv(M * ufinv.astype(dtype))
        else:
            S = to_pel_layout(M)

        pel = S * (scalefactor * normalization)
        if p.spec == "abs":
            cval = 255.0 / jnp.log1p(jnp.abs(dc * (scalefactor * normalization)))
            pel = cval * jnp.log1p(jnp.abs(pel))
        elif p.spec == "shift":
            cs = 127.5 / math.log1p(svol * normalization * 255 * 8)
            pel = cs * jnp.sign(pel) * jnp.log1p(jnp.abs(pel)) + 127.5
        elif p.spec == "flat":
            pel = pel * normalization / 2.0 + 127.5
        else:  # copy or none
            pel = pel * normalization
            if p.spec is None and p.linear:
                from dspfun_tpu.io.color import srgb_encode  # noqa: PLC0415

                pel = srgb_encode(pel / 255.0, jnp) * 255.0

        if p.float_pixels or p.spec:
            out = pel
        elif p.dither:
            # Floyd-Steinberg error diffusion is sequential per frame;
            # frames are local to a time shard but their rows shard
            # over 'space' — all_gather the rows, dither whole local
            # frames (each space shard redundantly dithers its time
            # slab; the dither is VPU work dwarfed by the DCTs), and
            # keep this shard's row block
            from dspfun_tpu.models.motion_pipeline import _dither_blocks  # noqa: PLC0415

            full = jax.lax.all_gather(pel, "space", axis=1, tiled=True)
            dth = _dither_blocks(full[None], 1.0)[0]
            si = jax.lax.axis_index("space")
            lh = pel.shape[1]
            out = jax.lax.dynamic_slice_in_dim(dth, si * lh, lh, axis=1)
        else:
            out = jnp.clip(jnp.floor(pel + 0.5), 0.0, 255.0)
        return out, coded

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=P("time", "space", None),
        out_specs=(P("time", "space", None), P()),
        check_vma=False,
    )
    return jax.jit(fn)
