"""Flagship decode pixel pipeline (jittable, static shapes).

`decode_inter_frame_16` is the device side of decoding a P frame whose
blocks are all 16x16 inter: batched MC (gather + separable 6-tap),
dequantize, inverse transform (batched matmuls on the MXU), reconstruct.
The host supplies dense per-tile metadata (MV integer offsets and
fractions) and the 16x16 coefficient tensor.

This is the unit the full decoder schedules per frame; it is also the
compile target for the driver's graft entry.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mc import mc_luma_tiles
from ..ops.mc_pallas import mc_luma_tiles_pallas
from ..ops.transform import (inv_transform_batch, dequantize_batch,
                             reconstruct_batch)

TILE = 16


def _mc(ref_padded, oy, ox, frac_v, frac_h, bitdepth, platform):
    """Pallas DMA-gather MC on TPU; XLA formulation elsewhere (CPU mesh)."""
    if platform != "tpu":
        return mc_luma_tiles(ref_padded, oy, ox, frac_v, frac_h, tile=TILE,
                             bipred=0, bitdepth=bitdepth)
    n = oy.shape[0]
    block = 32 if n % 32 == 0 else (16 if n % 16 == 0 else
                                    (8 if n % 8 == 0 else 1))
    return mc_luma_tiles_pallas(ref_padded, oy, ox, frac_v, frac_h,
                                tile=TILE, bipred=0, bitdepth=bitdepth,
                                block=block)


@partial(jax.jit,
         static_argnames=("height", "width", "qp", "bitdepth", "platform"))
def decode_inter_frame_16(ref_padded: jax.Array, oy: jax.Array,
                          ox: jax.Array, frac_v: jax.Array,
                          frac_h: jax.Array, coeff: jax.Array,
                          height: int, width: int, qp: int = 32,
                          bitdepth: int = 8,
                          platform: str | None = None) -> jax.Array:
    """Decode one frame of 16x16 inter tiles.

    ref_padded: [Hp, Wp] int32.  oy/ox/frac_v/frac_h: [N] per-tile MC
    metadata (window origins into ref_padded).  coeff: [N, 16, 16] int32
    quantized coefficients.  Returns the reconstructed frame [H, W] int32.
    """
    n_tiles_y = height // TILE
    n_tiles_x = width // TILE
    if platform is None:
        platform = jax.default_backend()
    pred = _mc(ref_padded, oy, ox, frac_v, frac_h, bitdepth, platform)
    rcoeff = dequantize_batch(coeff, qp, TILE)
    res = inv_transform_batch(rcoeff, TILE, bitdepth)
    rec = reconstruct_batch(res, pred, bitdepth)
    # tiles -> frame
    return (rec.reshape(n_tiles_y, n_tiles_x, TILE, TILE)
            .transpose(0, 2, 1, 3).reshape(height, width))


def make_example(height=288, width=352, qp=32, seed=0):
    """Example args for decode_inter_frame_16 (CIF by default)."""
    rng = np.random.default_rng(seed)
    pad = 64
    ref = rng.integers(0, 256, (height + 2 * pad, width + 2 * pad),
                       dtype=np.int32)
    n = (height // TILE) * (width // TILE)
    ty, tx = np.mgrid[0:height:TILE, 0:width:TILE]
    mvy = rng.integers(-32, 33, n)
    mvx = rng.integers(-32, 33, n)
    oy = (pad + ty.ravel() + (mvy >> 2) - 2).astype(np.int32)
    ox = (pad + tx.ravel() + (mvx >> 2) - 2).astype(np.int32)
    fv = (mvy & 3).astype(np.int32)
    fh = (mvx & 3).astype(np.int32)
    coeff = np.zeros((n, TILE, TILE), np.int32)
    coeff[:, :4, :4] = rng.integers(-80, 80, (n, 4, 4))
    return (jnp.asarray(ref), jnp.asarray(oy), jnp.asarray(ox),
            jnp.asarray(fv), jnp.asarray(fh), jnp.asarray(coeff))


def multi_stream_step(mesh, height=96, width=128, streams=None, qp=32):
    """Build a sharded multi-stream decode step over a device mesh.

    Axes: 'stream' = independent bitstreams (data parallel), 'row' = tile
    batches within a frame (sequence/spatial parallel).  Returns
    (jitted_fn, example_args).  The step reconstructs every stream's frame
    and reduces a distortion sum (cross-device psum via XLA).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    axes = mesh.axis_names
    n_stream = mesh.shape[axes[0]]
    streams = streams or n_stream
    n = (height // TILE) * (width // TILE)
    pad = 64

    rng = np.random.default_rng(1)
    refs = rng.integers(0, 256, (streams, height + 2 * pad,
                                 width + 2 * pad), dtype=np.int32)
    ty, tx = np.mgrid[0:height:TILE, 0:width:TILE]
    mvy = rng.integers(-16, 17, (streams, n))
    mvx = rng.integers(-16, 17, (streams, n))
    oy = (pad + ty.ravel()[None] + (mvy >> 2) - 2).astype(np.int32)
    ox = (pad + tx.ravel()[None] + (mvx >> 2) - 2).astype(np.int32)
    fv = (mvy & 3).astype(np.int32)
    fh = (mvx & 3).astype(np.int32)
    coeff = np.zeros((streams, n, TILE, TILE), np.int32)
    coeff[:, :, :4, :4] = rng.integers(-80, 80, (streams, n, 4, 4))
    orig = rng.integers(0, 256, (streams, height, width), dtype=np.int32)

    s_stream = NamedSharding(mesh, P(axes[0]))
    s_tiles = NamedSharding(mesh, P(axes[0], axes[1]))

    def put(a, s):
        return jax.device_put(a, s)

    args = (put(refs, s_stream), put(oy, s_tiles), put(ox, s_tiles),
            put(fv, s_tiles), put(fh, s_tiles),
            put(coeff, NamedSharding(mesh, P(axes[0], axes[1], None, None))),
            put(orig, s_stream))

    platform = mesh.devices.flat[0].platform

    @jax.jit
    def step(refs, oy, ox, fv, fh, coeff, orig):
        rec = jax.vmap(
            lambda r, a, b, c, d, e: decode_inter_frame_16(
                r, a, b, c, d, e, height, width, qp, platform=platform))(
            refs, oy, ox, fv, fh, coeff)
        sse = jnp.sum((rec - orig) ** 2)  # global reduction -> collectives
        return rec, sse

    return step, args


def _mc_chroma(ref_padded, oy, ox, frac_v, frac_h, bitdepth, platform,
               tile=8):
    from ..ops.mc import mc_chroma_tiles
    from ..ops.mc_pallas import mc_chroma_tiles_pallas
    if platform != "tpu":
        return mc_chroma_tiles(ref_padded, oy, ox, frac_v, frac_h,
                               tile=tile, bitdepth=bitdepth)
    n = oy.shape[0]
    block = 32 if n % 32 == 0 else (16 if n % 16 == 0 else
                                    (8 if n % 8 == 0 else 1))
    return mc_chroma_tiles_pallas(ref_padded, oy, ox, frac_v, frac_h,
                                  tile=tile, bitdepth=bitdepth, block=block)


@partial(jax.jit, static_argnames=(
    "height", "width", "qp", "bitdepth", "platform", "clpf_strengths",
    "cdef_damping"))
def decode_p_frame_420(refy, refu, refv, oy, ox, fv, fh, coy, cox, cfv, cfh,
                       coeff_y, coeff_u, coeff_v,
                       dbl_maskv, dbl_maskh, dbl_cmaskv, dbl_cmaskh,
                       cdef_level, cdef_sec, cdef_mask_y, cdef_mask_u,
                       cdef_mask_v, clpf_mask_y, clpf_mask_u, clpf_mask_v,
                       height: int, width: int, qp: int = 32,
                       bitdepth: int = 8, platform: str | None = None,
                       clpf_strengths: tuple = (2, 2, 2),
                       cdef_damping: tuple = (6, 5)):
    """Full device side of decoding a 4:2:0 P frame of 16x16 inter tiles:
    MC (luma quarter-pel + chroma eighth-pel), dequant + inverse transform
    on the MXU, reconstruction, then the in-loop chain deblock -> CDEF
    (directions computed on device from the deblocked luma) -> CLPF,
    exactly as dec/decode_frame.c:140-198 orders it.

    The host supplies per-tile MC metadata, coefficients, and the
    block-metadata masks/maps folded from deblock_data (ops.filters
    helpers).  Returns (y, u, v) reconstructed planes.
    """
    from ..ops import filters as OF
    from ..tables import CHROMA_QP

    if platform is None:
        platform = jax.default_backend()
    nty, ntx = height // TILE, width // TILE
    ch, cw = height // 2, width // 2

    def tiles_to_frame(t, h, w, ts):
        return (t.reshape(h // ts, w // ts, ts, ts)
                .transpose(0, 2, 1, 3).reshape(h, w))

    # ---- prediction + residual + reconstruction ----
    pred_y = _mc(refy, oy, ox, fv, fh, bitdepth, platform)
    if platform == "tpu" and coy.shape[0] % 16 == 0:
        # U/V share per-tile metadata: one kernel, two DMA streams
        from ..ops.mc_pallas import mc_chroma_uv_tiles_pallas
        pred_u, pred_v = mc_chroma_uv_tiles_pallas(
            refu, refv, coy, cox, cfv, cfh, tile=8, bitdepth=bitdepth,
            block=16)
    else:
        pred_u = _mc_chroma(refu, coy, cox, cfv, cfh, bitdepth, platform)
        pred_v = _mc_chroma(refv, coy, cox, cfv, cfh, bitdepth, platform)
    qpc = int(CHROMA_QP[qp])
    res_y = inv_transform_batch(dequantize_batch(coeff_y, qp, TILE), TILE,
                                bitdepth)
    res_u = inv_transform_batch(dequantize_batch(coeff_u, qpc, 8), 8,
                                bitdepth)
    res_v = inv_transform_batch(dequantize_batch(coeff_v, qpc, 8), 8,
                                bitdepth)
    y = tiles_to_frame(reconstruct_batch(res_y, pred_y, bitdepth),
                       height, width, TILE)
    u = tiles_to_frame(reconstruct_batch(res_u, pred_u, bitdepth),
                       ch, cw, 8)
    v = tiles_to_frame(reconstruct_batch(res_v, pred_v, bitdepth),
                       ch, cw, 8)

    # ---- deblock ----
    y = OF.deblock_plane_y(y, dbl_maskv, dbl_maskh, qp, bitdepth)
    u = OF.deblock_plane_uv(u, dbl_cmaskv, dbl_cmaskh, qpc, 1, bitdepth)
    v = OF.deblock_plane_uv(v, dbl_cmaskv, dbl_cmaskh, qpc, 1, bitdepth)

    # ---- CDEF (dirs from the deblocked luma, shared with chroma) ----
    cs = bitdepth - 8
    dirs, var = OF.cdef_dirs(y, cs)
    y = OF.cdef_plane(y, dirs, var, cdef_level, cdef_sec, cdef_mask_y,
                      8, 0, cdef_damping[0], cdef_damping[1], cs)
    u = OF.cdef_plane(u, dirs, var, cdef_level, cdef_sec, cdef_mask_u,
                      4, 1, cdef_damping[0] - 1, cdef_damping[1] - 1, cs)
    v = OF.cdef_plane(v, dirs, var, cdef_level, cdef_sec, cdef_mask_v,
                      4, 1, cdef_damping[0] - 1, cdef_damping[1] - 1, cs)

    # ---- CLPF ----
    sy, su, sv = clpf_strengths
    if sy:
        y = OF.clpf_plane(y, clpf_mask_y, sy << cs,
                          bitdepth - 4 + (qp >> 4))
    if su:
        u = OF.clpf_plane(u, clpf_mask_u, su << cs,
                          bitdepth - 5 + (qp >> 4))
    if sv:
        v = OF.clpf_plane(v, clpf_mask_v, sv << cs,
                          bitdepth - 5 + (qp >> 4))
    return y, u, v


def make_example_full(height=288, width=352, qp=32, seed=0, bitdepth=8):
    """Random-but-consistent inputs for decode_p_frame_420 plus the spec
    objects needed to cross-check it (dd, presets)."""
    from ..spec import inter
    from ..ops import filters as OF

    rng = np.random.default_rng(seed)
    pad = 64
    maxv = (1 << bitdepth)
    H, W = height, width
    ch, cw = H // 2, W // 2
    refy = rng.integers(0, maxv, (H + 2 * pad, W + 2 * pad), dtype=np.int32)
    refu = rng.integers(0, maxv, (ch + pad, cw + pad), dtype=np.int32)
    refv = rng.integers(0, maxv, (ch + pad, cw + pad), dtype=np.int32)
    n = (H // TILE) * (W // TILE)
    ty, tx = np.mgrid[0:H:TILE, 0:W:TILE]
    mvy = rng.integers(-32, 33, n)
    mvx = rng.integers(-32, 33, n)
    oy = (pad + ty.ravel() + (mvy >> 2) - 2).astype(np.int32)
    ox = (pad + tx.ravel() + (mvx >> 2) - 2).astype(np.int32)
    fv = (mvy & 3).astype(np.int32)
    fh = (mvx & 3).astype(np.int32)
    cty, ctx = np.mgrid[0:ch:8, 0:cw:8]
    coy = (pad // 2 + cty.ravel() + (mvy >> 3) - 1).astype(np.int32)
    cox = (pad // 2 + ctx.ravel() + (mvx >> 3) - 1).astype(np.int32)
    cfv = (mvy & 7).astype(np.int32)
    cfh = (mvx & 7).astype(np.int32)
    coeff_y = np.zeros((n, TILE, TILE), np.int32)
    coeff_y[:, :4, :4] = rng.integers(-80, 80, (n, 4, 4))
    coeff_u = np.zeros((n, 8, 8), np.int32)
    coeff_u[:, :2, :2] = rng.integers(-40, 40, (n, 2, 2))
    coeff_v = np.zeros((n, 8, 8), np.int32)
    coeff_v[:, :2, :2] = rng.integers(-40, 40, (n, 2, 2))

    dd = inter.DeblockData(W, H)
    nn = dd.size.shape[0]
    dd.size[:] = 16
    dd.cbp_y[:] = rng.integers(0, 2, nn)
    dd.mode[:] = rng.choice([0, 2, 2, 4], nn)
    dd.mv0[:] = np.repeat(np.stack([mvy, mvx], 1), 16, 0)[:nn]
    dd.mv1[:] = dd.mv0
    mv_, mh_ = OF.deblock_masks_y(dd, W, H)
    cmv, cmh = OF.deblock_masks_uv(dd, W, H)

    nfb = ((H + 63) // 64) * ((W + 63) // 64)
    presets = [{"level": int(rng.integers(0, 12)),
                "sec_strength": int(rng.integers(0, 4))} for _ in range(nfb)]
    lv, sec, m_y = OF.cdef_block_maps(dd, presets, W, H, 0, 1)
    _, _, m_u = OF.cdef_block_maps(dd, presets, W, H, 1, 1)
    _, _, m_v = OF.cdef_block_maps(dd, presets, W, H, 2, 1)
    cm_y, _ = OF.clpf_pixel_mask(dd, W, H, 0, 7, 1)
    cm_u, _ = OF.clpf_pixel_mask(dd, W, H, 1, 4, 1)
    cm_v, _ = OF.clpf_pixel_mask(dd, W, H, 2, 4, 1)

    args = tuple(jnp.asarray(a) for a in (
        refy, refu, refv, oy, ox, fv, fh, coy, cox, cfv, cfh,
        coeff_y, coeff_u, coeff_v, mv_, mh_, cmv, cmh,
        lv, sec, m_y, m_u, m_v, cm_y, cm_u, cm_v))
    return args, dd, presets


def multi_stream_full(mesh, height=64, width=128, qp=32):
    """Full-pipeline multi-stream decode step, data-parallel over the
    mesh's first axis (independent bitstreams per device group).

    Returns (jitted_fn, sharded_args): vmap of decode_p_frame_420 (MC,
    transforms, recon, deblock, CDEF, CLPF) over a stream batch laid out
    with jax.sharding.  The tile-sharded core variant (multi_stream_step)
    covers the spatial axis; together they exercise dp x sp shardings.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    axes = mesh.axis_names
    n_stream = int(np.prod([mesh.shape[a] for a in axes]))
    platform = mesh.devices.flat[0].platform

    batches = []
    for sidx in range(n_stream):
        args, _dd, _pr = make_example_full(height, width, qp, seed=sidx)
        batches.append(args)
    stacked = tuple(jnp.stack([b[i] for b in batches])
                    for i in range(len(batches[0])))
    sh = NamedSharding(mesh, P(axes))  # batch dim over the whole mesh
    args = tuple(jax.device_put(a, sh) for a in stacked)

    @jax.jit
    def step(*a):
        return jax.vmap(lambda *one: decode_p_frame_420(
            *one, height=height, width=width, qp=qp,
            platform=platform, clpf_strengths=(2, 1, 4)))(*a)

    return step, args
