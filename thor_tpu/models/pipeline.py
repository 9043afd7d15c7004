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
