"""motion compute: 3-D blockwise frequency-space video editing.

The reference (motion/motion.c:591-811) loops block-by-block per plane:
forward 3-D FFTW DCT in a strided max(block, scaled) buffer, a ~100-line
scalar filter chain (uniform-range renorm, top-N coefficient limit,
expression eval, brick-wall bandpass, threshold, preserve-DC, quantize),
inverse DCT at the scaled dims, and pel mapping with optional
Floyd-Steinberg dithering.

TPU formulation: all blocks of a slab are processed in ONE jitted call
per plane — the block grid becomes a batch axis, the 3-D DCTs are six
batched MXU matmuls, and the whole filter chain is elementwise work XLA
fuses between them.  Region effects (uniform renorm, bandpass, active
windows) become precomputed mask arrays over the [md, mh, mw] buffer,
matching the reference's strided-buffer semantics exactly (including
block resize by zero-pad/truncate, motion.c:566, and top-N competition
from coefficients beyond the scaled dims).

Floyd-Steinberg dithering is a genuinely sequential scan-order loop
(motion.c:778-787); it runs as a lax.scan over rows x columns, vmapped
over the (block, z) batch — per-pixel serial, parallel across blocks.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from dspfun_tpu.core.expr import Expr, host_eval_in_jit
from dspfun_tpu.core.precision import Precision, get_precision
from dspfun_tpu.core.transforms import apply_plan_nd, plan_axis

__all__ = [
    "Dims",
    "PlaneGeometry",
    "MotionParams",
    "plan_geometry",
    "filter_blocks",
    "frames_to_blocks",
    "blocks_to_frames",
    "SPECTYPES",
    "ISPECTYPES",
    "PRESERVE_DCTYPES",
]

SPECTYPES = ("abs", "shift", "flat", "copy")
ISPECTYPES = ("shift", "flat", "copy")
PRESERVE_DCTYPES = ("dc", "grey")

_SQRT2 = math.sqrt(2.0)

# Which fused fast-path implementation the most recent filter_blocks
# *trace* selected ("pallas-kron" | "xla-sep" | "xla-kron") — set at
# trace time, so it reflects the first call per (geometry, params)
# config.  Used by benchmarks/tests to assert the
# intended kernel engages.
LAST_FAST_PATH: str | None = None


@dataclasses.dataclass(frozen=True)
class Dims:
    w: int = 0
    h: int = 0
    d: int = 0

    def volume(self) -> int:
        return self.w * self.h * self.d


def _propagate(c: Dims, base: Dims, sub_w: int, sub_h: int) -> Dims:
    """0 = inherit from plane 0 with chroma shift (reference
    motion.c:61-68: ceiling-shifted)."""
    w = c.w or -((-base.w) >> sub_w)
    h = c.h or -((-base.h) >> sub_h)
    d = c.d or base.d
    return Dims(w, h, d)


def _fill(src: Dims, dst: Dims) -> Dims:
    return Dims(dst.w or src.w, dst.h or src.h, dst.d or src.d)


def _limit(src: Dims, dst: Dims) -> Dims:
    return Dims(min(src.w, dst.w), min(src.h, dst.h), min(src.d, dst.d))


@dataclasses.dataclass(frozen=True)
class PlaneGeometry:
    """Per-plane block geometry (reference motion.c:369-433,487-511)."""

    source: Dims
    block: Dims
    scaled: Dims
    bp_begin: Dims
    bp_end: Dims
    nblocks: Dims
    truncated: Dims
    newres: Dims
    active: Dims
    minbuf: Dims


def plan_geometry(
    source_w: int,
    source_h: int,
    source_d: int,
    nplanes: int,
    log2_chroma_w: int = 0,
    log2_chroma_h: int = 0,
    block: Dims = Dims(0, 0, 1),
    scaled: Dims = Dims(),
    bp_begin: Dims = Dims(),
    bp_end: Dims = Dims(),
    samesize_chroma: bool = False,
) -> list[PlaneGeometry]:
    """Propagate block/scaled/bandpass boxes to every plane with
    0-inherit semantics (reference motion.c:369-433)."""
    subs = [(0, 0)] + [(log2_chroma_w, log2_chroma_h)] * min(2, nplanes - 1) \
        + [(0, 0)] * max(0, nplanes - 3)
    src0 = Dims(source_w, source_h, source_d)
    sources = [_propagate(Dims(), src0, sw, sh) if i else src0
               for i, (sw, sh) in enumerate(subs)]
    # samesize-chroma: when the block fits the chroma plane, clear the
    # chroma subsample factors (and default an unset block to the
    # chroma plane dims, as the reference does — motion.c:337-353)
    if samesize_chroma and nplanes >= 3:
        sw, sh = subs[1]
        if block.w <= sources[1].w:
            subs[1] = (0, subs[1][1])
            subs[2] = (0, subs[2][1])
            if not block.w:
                block = dataclasses.replace(block, w=sources[1].w)
        if block.h <= sources[1].h:
            subs[1] = (subs[1][0], 0)
            subs[2] = (subs[2][0], 0)
            if not block.h:
                block = dataclasses.replace(block, h=sources[1].h)

    planes = []
    for i in range(nplanes):
        sw, sh = subs[i]
        src = sources[i] if i < len(sources) else src0
        blk = Dims(
            (-((-block.w) >> sw)) if block.w else 0,
            (-((-block.h) >> sh)) if block.h else 0,
            block.d,
        )
        scl = Dims(
            (-((-scaled.w) >> sw)) if scaled.w else 0,
            (-((-scaled.h) >> sh)) if scaled.h else 0,
            scaled.d,
        )
        bpb = Dims(
            (-((-bp_begin.w) >> sw)) if bp_begin.w else 0,
            (-((-bp_begin.h) >> sh)) if bp_begin.h else 0,
            bp_begin.d,
        )
        bpe = Dims(
            (-((-bp_end.w) >> sw)) if bp_end.w else 0,
            (-((-bp_end.h) >> sh)) if bp_end.h else 0,
            bp_end.d,
        )
        blk = _limit(src, _fill(src, blk))
        scl = _fill(blk, scl)
        bpe = _limit(blk, _fill(blk, bpe))
        bpb = _limit(blk, bpb)
        nb = Dims(src.w // blk.w, src.h // blk.h, src.d // blk.d)
        trunc = Dims(nb.w * blk.w, nb.h * blk.h, nb.d * blk.d)
        newres = Dims(nb.w * scl.w, nb.h * scl.h, nb.d * scl.d)
        active = Dims(min(blk.w, scl.w), min(blk.h, scl.h), min(blk.d, scl.d))
        minbuf = Dims(max(blk.w, scl.w), max(blk.h, scl.h), max(blk.d, scl.d))
        planes.append(PlaneGeometry(src, blk, scl, bpb, bpe, nb, trunc,
                                    newres, active, minbuf))
    return planes


@dataclasses.dataclass(frozen=True)
class MotionParams:
    """The filter-chain parameter set (reference motion.c:170-287)."""

    spec: str | None = None          # abs | shift | flat | copy
    ispec: str | None = None         # shift | flat | copy
    preserve_dc: str | None = None   # dc | grey
    boost: float = 1.0
    damp: float = 0.0
    quant: float = 0.0
    threshold_min: float = 0.0
    threshold_max: float = 0.0
    coeff_limit: int = 0
    expr: Expr | None = None
    dither: bool = False
    linear: bool = False
    float_pixels: bool = True

    def _key(self):
        # Expr objects compare by source text (the dataclass default
        # would compare object identity and defeat the jit static-arg
        # cache); everything else is a plain value.
        return (self.spec, self.ispec, self.preserve_dc, self.boost,
                self.damp, self.quant, self.threshold_min,
                self.threshold_max, self.coeff_limit,
                self.expr.source if self.expr else None,
                self.dither, self.linear, self.float_pixels)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        # NEVER via hash(): colliding-but-different params (e.g.
        # boost=-1.0 vs -2.0 — CPython hashes both to -2) would reuse
        # the wrong compiled filter chain from the static-arg cache
        return isinstance(other, MotionParams) and self._key() == other._key()


def _region_mask(md, mh, mw, dims: Dims) -> np.ndarray:
    m = np.zeros((md, mh, mw), dtype=bool)
    m[: dims.d, : dims.h, : dims.w] = True
    return m


def _uniform_factor(md, mh, mw) -> np.ndarray:
    """2*sqrt2 / ((x?1:sqrt2)(y?1:sqrt2)(z?1:sqrt2)) per coefficient
    (reference motion.c:643-647)."""
    z = np.where(np.arange(md) > 0, 1.0, _SQRT2)[:, None, None]
    y = np.where(np.arange(mh) > 0, 1.0, _SQRT2)[None, :, None]
    x = np.where(np.arange(mw) > 0, 1.0, _SQRT2)[None, None, :]
    return 2.0 * _SQRT2 / (x * y * z)


def _bandpass_mult(g: PlaneGeometry, boost: float, damp: float) -> np.ndarray:
    """Multiplier array from the reference's six sequential face loops
    plus the boost box (motion.c:683-719).

    Computed as the *product* of the six face multipliers, not a single
    region mask: when begin > end on an axis the reference's faces
    overlap and damp applies twice (e.g. begin.h > end.h damps the full
    height in the "top" loop and rows >= end.h again in "bottom") —
    caught by the motion fuzz oracle (tests/test_motion_fuzz.py).  For
    well-formed boxes the faces are disjoint and this reduces to the
    usual boost-inside/damp-outside mask.  The boost loop is not
    clipped to active dims (motion.c:715-719); the damp faces are."""
    md, mh, mw = g.minbuf.d, g.minbuf.h, g.minbuf.w
    z = np.arange(md)[:, None, None]
    y = np.arange(mh)[None, :, None]
    x = np.arange(mw)[None, None, :]
    return bandpass_mult_grid(z, y, x, g, boost, damp, np)


def bandpass_mult_grid(z, y, x, g: PlaneGeometry, boost: float, damp: float,
                       xp):
    """The face-product bandpass multiplier over broadcastable global
    coordinate grids ``z``/``y``/``x`` (numpy or jnp) — shared with the
    sharded volume path, which evaluates it on each shard's global
    coordinates."""
    ad, ah, aw = g.active.d, g.active.h, g.active.w
    bb, be = g.bp_begin, g.bp_end
    act2 = (y < ah) & (x < aw)
    mid_z = (z >= bb.d) & (z < be.d)
    mid_y = (y >= bb.h) & (y < be.h)
    faces = [
        (z < bb.d) & act2,                                   # front
        (z >= be.d) & (z < ad) & act2,                       # back
        mid_z & (y < bb.h) & (x < aw),                       # top
        mid_z & (y >= be.h) & (y < ah) & (x < aw),           # bottom
        mid_z & mid_y & (x < bb.w),                          # left
        mid_z & mid_y & (x >= be.w) & (x < aw),              # right
    ]
    mult = xp.ones(xp.broadcast_shapes(z.shape, y.shape, x.shape),
                   dtype=xp.float64 if xp is np else None)
    for f in faces:
        mult = mult * xp.where(f, damp, 1.0)
    inside = mid_z & mid_y & (x >= bb.w) & (x < be.w)
    return mult * xp.where(inside, boost, 1.0)


def _fast_eligible(g: PlaneGeometry, p: MotionParams) -> bool:
    """The fused fast-path gate: two matmuls around a pointwise middle
    (no codecs/expr/top-N/DC/dither/quant/linear, no block resize)."""
    return (p.expr is None and p.spec is None and p.ispec is None
            and not p.coeff_limit and not p.preserve_dc and not p.dither
            and not p.quant and not p.linear
            and g.block == g.scaled == g.minbuf)


@functools.lru_cache(maxsize=16)
def maybe_kron_plans(g: PlaneGeometry, params: MotionParams,
                     max_support_frac: float = 0.25,
                     allow_cpu: bool = False):
    """Support-pruned Kronecker-folded int8 plans for the fused fast
    path, or None when they cannot win.

    When the bandpass multiplier zeroes most coefficients (damp == 0
    lowpass/bandpass edits — the common frequency-space filter), only
    the pass-band ROWS of the folded [V, V] DCT ever matter: K2' is
    [S, V] and K3' [V, S] with S = |support| — exact algebra (the
    dropped rows are multiplied by zero), the whole-chain analogue of
    scan's pruned IDCT (reference scan/scan.c:20-41) in the blockwise
    domain (VERDICT r3 item 3).  The two contractions run the int8
    digit kernels (K = V >= 2048 rides the MXU's 2x int8 rate).

    Pass the result as ``plans[2]`` into :func:`filter_blocks` (device
    arrays; the FFTW-plan analogue).
    """
    from dspfun_tpu.core.transforms import plan_matrix  # noqa: PLC0415
    from dspfun_tpu.ops.blockdct import kron_dct_matrix  # noqa: PLC0415

    p = params
    vol = g.minbuf.volume()
    if not _fast_eligible(g, p) or vol <= 1024:
        return None
    if not allow_cpu and jax.default_backend() in ("cpu",):
        return None  # the int8 kernels only interpret off-TPU
    dims3 = (g.block.d, g.block.h, g.block.w)
    uf = _uniform_factor(*dims3).reshape(-1)
    bpm = _bandpass_mult(g, p.boost, p.damp).reshape(-1)
    support = np.flatnonzero(bpm != 0.0)
    if support.size > vol * max_support_frac:
        return None
    from dspfun_tpu.ops.int8mm import i8_feasible  # noqa: PLC0415

    # both folded contractions must fit the int8 kernels' exact-int32
    # and VMEM domain ([S, V] contracts K=V, [V, S] contracts K=S);
    # otherwise plan_matrix would silently fall back to bf16 digits,
    # which filter_blocks' i8_contract branch cannot consume — probing
    # first also skips the big [V, V] host kron build for large V
    if not (i8_feasible(support.size, vol) and
            i8_feasible(vol, support.size)):
        return None
    prec = Precision(coeff="float32", intermediate="i8", tol=1e-5)
    k2 = kron_dct_matrix(dims3, "dct2")[support, :] \
        * (uf * bpm)[support][:, None]
    k3 = (kron_dct_matrix(dims3, "dct3")[:, support] / (8.0 * vol)) \
        * (1.0 / uf)[None, support]
    p2, p3 = plan_matrix(k2, prec), plan_matrix(k3, prec)
    assert np.asarray(p2.digits).dtype == np.int8  # guarded by the probe
    assert np.asarray(p3.digits).dtype == np.int8
    return p2, p3


@functools.partial(jax.jit, static_argnames=("geom", "params", "plane_index", "nplanes"))
def filter_blocks(
    blocks: jax.Array,          # [NB, bd, bh, bw] pel values in 0..255
    plans,                      # ((fwd_d, fwd_h, fwd_w), (inv_d, inv_h, inv_w))
    block_coords,               # (bx[NB], by[NB]) int arrays
    bz: jax.Array,              # block-depth index: scalar, or [NB] when
                                # blocks of several slabs batch into one
                                # dispatch (tools/motion.py --slab-batch)
    geom: PlaneGeometry,
    params: MotionParams,
    plane_index: int,
    nplanes: int,
):
    """The full per-plane chain over all blocks of a slab.

    Returns (out_blocks [NB, sd, sh, sw] pel 0..255, coded[NB] per-block
    coded-coefficient counts — per block so batch padding/sharding can
    slice them exactly).
    """
    g = geom
    p = params
    if not jnp.issubdtype(blocks.dtype, jnp.floating):
        # raw container pels upload in their native integer dtype (4x
        # less H2D traffic for u8 sources); the cast fuses on device
        blocks = blocks.astype(jnp.float32)
    nb = blocks.shape[0]
    md, mh, mw = g.minbuf.d, g.minbuf.h, g.minbuf.w
    sd, sh, sw = g.scaled.d, g.scaled.h, g.scaled.w
    dtype = blocks.dtype

    svol = g.scaled.volume()
    scalefactor = svol / g.block.volume()
    normalization = 1.0 / math.sqrt(svol * 8.0)
    norm2 = normalization * normalization

    # ------------------------------------------------------------------
    # Fast path: when the chain is two matmuls around a pointwise middle
    # (no spectrogram codecs, expression, top-N, preserve-DC, dither,
    # trc, quant stats, or block resize) and the block is small, fold
    # everything into Kronecker matrices and run the fused VMEM-resident
    # kernel — one HBM read + one write per block.
    # ------------------------------------------------------------------
    vol = g.minbuf.volume()
    fast = _fast_eligible(g, p)
    kron_plans = plans[2] if len(plans) >= 3 else None
    if fast:
        from dspfun_tpu.ops import pallas_kernels as _pk  # noqa: PLC0415

        # Kernel selection (two-point-calibrated on v5e, see CLAUDE.md):
        # - V <= 1024: the Pallas Kronecker kernel (both [V, V] matrices
        #   VMEM-resident; ~32 us/slab, on par with XLA at this size);
        # - V > 1024 with pruned i8 kron plans provided: the two int8
        #   digit contractions over the pass-band support (round 4);
        # - V > 1024 otherwise: the XLA separable formulation (~146 us
        #   per 880x16^3 slab, near the ~100 us roofline).  A bf16
        #   separable Pallas kernel measured 2x slower here and was
        #   retired in round 3 (see ops/pallas_kernels.py docstring).
        on_acc = _pk.has_pallas() and jax.default_backend() not in ("cpu",)
        use_pallas = on_acc and vol % 128 == 0 and vol <= 1024
        use_i8kron = (kron_plans is not None and not use_pallas
                      and vol > 1024)
        use_xla_sep = not use_pallas and not use_i8kron and vol > 1024
    if fast:
        global LAST_FAST_PATH

        dims3 = (g.block.d, g.block.h, g.block.w)
        uf = _uniform_factor(*dims3).reshape(-1)
        bpm = _bandpass_mult(g, p.boost, p.damp).reshape(-1)
        tmin = p.threshold_min * 255.0 / norm2 if p.threshold_max else 0.0
        tmax = p.threshold_max * 255.0 / norm2 if p.threshold_max else 0.0
        flat = blocks.reshape(nb, -1)
        if use_pallas:
            LAST_FAST_PATH = "pallas-kron"
            out = _pk.fused_block_filter(
                flat, dims3, uf * bpm, threshold=(tmin, tmax),
                post_filter=1.0 / uf,
            )
        elif use_i8kron:
            from dspfun_tpu.ops.int8mm import i8_contract  # noqa: PLC0415

            LAST_FAST_PATH = "i8-kron"
            kp2, kp3 = kron_plans
            xf = flat.astype(jnp.float32)
            F = i8_contract(xf, kp2.digits, kp2.scale, 1)
            if p.threshold_max:
                a = jnp.abs(F)
                F = jnp.where((a < tmin) | (a > tmax), 0.0, F)
            out = i8_contract(F, kp3.digits, kp3.scale, 1)
        elif use_xla_sep:
            LAST_FAST_PATH = "xla-sep"
            fwd_plans, inv_plans = plans[0], plans[1]
            b = blocks.astype(jnp.float32)
            F = apply_plan_nd(b, fwd_plans, (1, 2, 3))
            F = F * jnp.asarray((uf * bpm).reshape(dims3), jnp.float32)
            if p.threshold_max:
                a = jnp.abs(F)
                F = jnp.where((a < tmin) | (a > tmax), 0.0, F)
            F = F * jnp.asarray((1.0 / uf).reshape(dims3) / (8.0 * vol),
                                jnp.float32)
            out = apply_plan_nd(F, inv_plans, (1, 2, 3)).reshape(nb, -1)
        else:
            from dspfun_tpu.ops.blockdct import kron_dct_matrix  # noqa: PLC0415

            LAST_FAST_PATH = "xla-kron"
            k2 = kron_dct_matrix(dims3, "dct2") * (uf * bpm)[:, None]
            k3 = (kron_dct_matrix(dims3, "dct3") / (8.0 * vol)) \
                * (1.0 / uf)[None, :]
            fcoef = jnp.dot(flat.astype(jnp.float32),
                            jnp.asarray(k2.T, jnp.float32),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            if p.threshold_max:
                a = jnp.abs(fcoef)
                fcoef = jnp.where((a < tmin) | (a > tmax), 0.0, fcoef)
            out = jnp.dot(fcoef, jnp.asarray(k3.T, jnp.float32),
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        pel = out.reshape(nb, g.scaled.d, g.scaled.h, g.scaled.w).astype(dtype)
        zero_coded = jnp.zeros((nb,), jnp.int32)
        if p.float_pixels:
            return pel, zero_coded
        return jnp.clip(jnp.floor(pel + 0.5), 0.0, 255.0), zero_coded

    fwd_plans, inv_plans = plans[0], plans[1]

    # --- input decode (motion.c:618-638) -------------------------------
    x = blocks
    if p.ispec == "shift":
        ic = 127.5 / math.log1p(svol * normalization * 255 * 8)
        t = x - 127.5
        x = jnp.sign(t) * jnp.expm1(jnp.abs(t / ic)) / normalization
    elif p.ispec == "flat":
        x = (x - 127.5) * 2.0 / norm2
    elif p.ispec == "copy":
        x = x / norm2
    elif p.linear:
        from dspfun_tpu.io.color import srgb_decode  # noqa: PLC0415

        x = srgb_decode(x / 255.0, jnp) * 255.0

    # --- forward transform + uniform renorm (motion.c:641-647) ---------
    if not p.ispec:
        x = apply_plan_nd(x, fwd_plans, (1, 2, 3))
        uf = _uniform_factor(md, mh, mw)[: x.shape[1], : x.shape[2], : x.shape[3]]
        act3 = _region_mask(md, mh, mw, g.active)[
            : x.shape[1], : x.shape[2], : x.shape[3]
        ]
        x = x * jnp.asarray(np.where(act3, uf, 1.0), dtype)

    # embed into the minbuf-sized buffer (zero-pad / work at full size)
    M = jnp.zeros((nb, md, mh, mw), dtype)
    M = M.at[:, : x.shape[1], : x.shape[2], : x.shape[3]].set(x)

    dc = M[:, 0, 0, 0]
    act = jnp.asarray(_region_mask(md, mh, mw, g.active), dtype=bool)

    # --- top-N coefficient limit (motion.c:652-668) --------------------
    if p.coeff_limit:
        k = min(p.coeff_limit, md * mh * mw)
        flat = jnp.abs(M).reshape(nb, -1)
        _, idx = jax.lax.top_k(flat, k)
        keep = jnp.zeros((nb, md * mh * mw), dtype=bool)
        keep = keep.at[jnp.arange(nb)[:, None], idx].set(True)
        M = jnp.where(keep.reshape(M.shape), M, 0.0)

    # --- expression (motion.c:670-681) ---------------------------------
    if p.expr is not None:
        z = jnp.arange(md, dtype=dtype)[:, None, None]
        yy = jnp.arange(mh, dtype=dtype)[None, :, None]
        xx = jnp.arange(mw, dtype=dtype)[None, None, :]
        bxs, bys = block_coords
        env = {
            "c": M * (norm2 / 255.0),
            "x": jnp.broadcast_to(xx, M.shape[1:]),
            "y": jnp.broadcast_to(yy, M.shape[1:]),
            "z": jnp.broadcast_to(z, M.shape[1:]),
            "i": jnp.asarray(float(plane_index), dtype),
            "width": float(g.block.w), "height": float(g.block.h),
            "depth": float(g.block.d), "components": float(nplanes),
            "bx": bxs.astype(dtype)[:, None, None, None],
            "by": bys.astype(dtype)[:, None, None, None],
            # scalar for the streaming slab loop; [NB] when slabs batch
            "bz": (bz.astype(dtype)[:, None, None, None]
                   if getattr(bz, "ndim", 0) else bz.astype(dtype)),
            "bwidth": float(g.nblocks.w), "bheight": float(g.nblocks.h),
            "bdepth": float(g.nblocks.d),
        }
        if p.expr.stateful:
            # random()/while()/root()/taylor() evaluate per coefficient
            # on the host in raster order — the TPU mapping of the
            # reference's host-side av_expr loop (motion.c:670-681);
            # the grid round-trips through an ordered io_callback so
            # slot/prng state stays in program order across slabs.
            res = host_eval_in_jit(p.expr, env, M.shape, dtype)
            res = res * (255.0 / norm2)
        else:
            res = p.expr(env, jnp) * (255.0 / norm2)
        M = jnp.where(act[None], res.astype(dtype), M)

    # --- bandpass (motion.c:683-719) -----------------------------------
    if p.damp != 1.0 or p.boost != 1.0:
        mult = _bandpass_mult(g, p.boost, p.damp)
        M = M * jnp.asarray(mult, dtype)

    # --- threshold (motion.c:721-728) ----------------------------------
    if p.threshold_max:
        tmin = p.threshold_min * 255.0 / norm2
        tmax = p.threshold_max * 255.0 / norm2
        a = jnp.abs(M)
        M = jnp.where(act[None] & ((a < tmin) | (a > tmax)), 0.0, M)

    # --- preserve DC (motion.c:730-738) --------------------------------
    if p.preserve_dc:
        dcstop = bool(g.bp_begin.d or g.bp_begin.h or g.bp_begin.w)
        if p.expr is not None or dcstop or p.boost != 1.0 or p.threshold_max:
            if p.preserve_dc == "dc":
                M = M.at[:, 0, 0, 0].set(dc)
            else:  # grey
                edge = p.damp if dcstop else p.boost
                M = M.at[:, 0, 0, 0].add(
                    (1.0 - edge) * 127.5 / (norm2 * scalefactor)
                )

    # --- quantize (motion.c:740-744) -----------------------------------
    coded = jnp.zeros((nb,), jnp.int32)
    if p.quant:
        quantizer = p.quant * 8.0 * math.sqrt(svol)
        Mq = jnp.round(M / quantizer) * quantizer
        M = jnp.where(act[None], Mq, M)
        coded = jnp.sum((M != 0) & act[None], axis=(1, 2, 3), dtype=jnp.int32)

    # --- inverse / spectrogram output (motion.c:746-771) ---------------
    if not p.spec:
        uf = _uniform_factor(md, mh, mw)
        M = M * jnp.asarray(np.where(_region_mask(md, mh, mw, g.active),
                                     1.0 / uf, 1.0), dtype)
        S = apply_plan_nd(M[:, :sd, :sh, :sw], inv_plans, (1, 2, 3))
    else:
        S = M[:, :sd, :sh, :sw]

    pel = S * (scalefactor * normalization)
    if p.spec == "abs":
        cval = 255.0 / jnp.log1p(jnp.abs(dc * (scalefactor * normalization)))
        pel = cval[:, None, None, None] * jnp.log1p(jnp.abs(pel))
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

    # --- output quantisation + dithering (motion.c:772-787) ------------
    if p.float_pixels or p.spec:
        out = pel
    elif p.dither:
        out = _dither_blocks(pel, scalefactor * norm2)
    else:
        # C lround after 0/255 clamp (motion.c:776); pel >= 0 after the
        # clamp so floor(x+0.5) == lround
        out = jnp.clip(jnp.floor(pel + 0.5), 0.0, 255.0)

    return out, coded


def _dither_blocks(pel: jax.Array, back_scale: float) -> jax.Array:
    """2-D Floyd-Steinberg over each (block, z) slice
    (reference motion.c:778-787).

    The reference diffuses error in *coefficient* units: the quantised
    pel is scaled back by 1/(normalization^2*scalefactor) before
    differencing.  Here pel and the error are kept in pel units (the
    two scalings cancel through the linear error propagation).
    """
    nb, d, h, w = pel.shape
    sl = pel.reshape(nb * d, h, w)
    del back_scale  # scalings cancel; kept for signature parity

    def one_slice(img):
        def row_step(err_next, row):
            # err_next: error arriving at this row [w]
            def col_step(carry, inp):
                err_right, next_row = carry
                xval, xi = inp
                v = xval + err_right
                # C lround after 0/255 clamp (motion.c:776)
                q = jnp.clip(jnp.floor(v + 0.5), 0.0, 255.0)
                dp = v - q
                nr = next_row.at[xi - 1].add(dp * 3 / 16)
                nr = nr.at[xi].add(dp * 5 / 16)
                nr = nr.at[xi + 1].add(dp * 1 / 16)
                return (dp * 7 / 16, nr), q

            init = (jnp.zeros((), pel.dtype), jnp.zeros(w + 2, pel.dtype))
            (_, next_row), qrow = jax.lax.scan(
                col_step, init, (row + err_next, jnp.arange(1, w + 1))
            )
            return next_row[1 : w + 1], qrow

        _, out = jax.lax.scan(row_step, jnp.zeros(w, pel.dtype), img)
        return out

    return jax.vmap(one_slice)(sl).reshape(nb, d, h, w)


def frames_to_blocks(frames: np.ndarray, g: PlaneGeometry) -> np.ndarray:
    """[bd, H, W] plane frames -> [nbh*nbw, bd, bh, bw] blocks
    (truncating ragged edges, reference motion.c:597-608)."""
    bd, bh, bw = g.block.d, g.block.h, g.block.w
    nbh, nbw = g.nblocks.h, g.nblocks.w
    a = frames[:bd, : nbh * bh, : nbw * bw]
    a = a.reshape(bd, nbh, bh, nbw, bw).transpose(1, 3, 0, 2, 4)
    return a.reshape(nbh * nbw, bd, bh, bw)


def blocks_to_frames(blocks: np.ndarray, g: PlaneGeometry) -> np.ndarray:
    """[nbh*nbw, sd, sh, sw] -> [sd, nbh*sh, nbw*sw]."""
    sd, sh, sw = g.scaled.d, g.scaled.h, g.scaled.w
    nbh, nbw = g.nblocks.h, g.nblocks.w
    a = blocks.reshape(nbh, nbw, sd, sh, sw).transpose(2, 0, 3, 1, 4)
    return a.reshape(sd, nbh * sh, nbw * sw)


def make_plans(g: PlaneGeometry, precision: Precision | None = None):
    """(forward, inverse) axis plans: forward DCT-II at block dims,
    inverse DCT-III at scaled dims (reference motion.c:518-552)."""
    p = precision or get_precision()
    fwd = tuple(plan_axis(n, "dct2", p) for n in (g.block.d, g.block.h, g.block.w))
    inv = tuple(plan_axis(n, "dct3", p) for n in (g.scaled.d, g.scaled.h, g.scaled.w))
    return fwd, inv
