"""Pallas TPU kernel for tile-batched quarter-pel luma MC.

The XLA gather formulation (ops/mc.py) is memory-layout hostile on TPU
(~37ms for a 1080p frame of 16x16 tiles).  Here each grid step DMAs its
(tile+5)^2 window from the HBM reference plane at a data-dependent offset
(scalar-prefetched oy/ox) into VMEM and runs the separable 6-tap filter
on the VPU.  Bit-exact with ops.mc.mc_luma_tiles / spec.inter.mc_luma.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import COEFFS_STANDARD, COEFFS_BIPRED

_LP = np.array([[0, 1, 1, 0], [1, 2, 2, 1], [1, 2, 2, 1], [0, 1, 1, 0]],
               np.int32)


def _kernel(oy_ref, ox_ref, fv_ref, fh_ref, ref_hbm, out_ref, win, sem,
            *, tile, bipred, bitdepth, block):
    """One grid step: MC `block` consecutive tiles."""
    coeffs = jnp.asarray(np.array(
        COEFFS_BIPRED if bipred else COEFFS_STANDARD, np.int32))
    w = tile + 5
    i0 = pl.program_id(0) * block

    # start all DMAs, then drain
    for b in range(block):
        dma = pltpu.make_async_copy(
            ref_hbm.at[pl.ds(oy_ref[i0 + b], w), pl.ds(ox_ref[i0 + b], w)],
            win.at[b], sem.at[b])
        dma.start()
    for b in range(block):
        pltpu.make_async_copy(
            ref_hbm.at[pl.ds(oy_ref[i0 + b], w), pl.ds(ox_ref[i0 + b], w)],
            win.at[b], sem.at[b]).wait()

    for b in range(block):
        wv = win[b]
        fv = coeffs[fv_ref[i0 + b]]
        fh = coeffs[fh_ref[i0 + b]]
        tmp = jnp.zeros((tile, w), jnp.int32)
        for m in range(6):
            tmp = tmp + fv[m] * wv[m:m + tile, :]
        acc = jnp.zeros((tile, tile), jnp.int32)
        for m in range(6):
            acc = acc + fh[m] * tmp[:, m:m + tile]
        res = jnp.clip((acc + 2048) >> 12, 0, (1 << bitdepth) - 1)
        if bipred < 2:
            lp = jnp.zeros((tile, tile), jnp.int32)
            for dy in range(4):
                for dx in range(4):
                    if _LP[dy, dx]:
                        lp = lp + int(_LP[dy, dx]) * \
                            wv[1 + dy:1 + dy + tile, 1 + dx:1 + dx + tile]
            lp = jnp.clip((lp + 8) >> 4, 0, (1 << bitdepth) - 1)
            centre = jnp.logical_and(fv_ref[i0 + b] == 2,
                                     fh_ref[i0 + b] == 2)
            res = jnp.where(centre, lp, res)
        out_ref[b] = res


@partial(jax.jit, static_argnames=("tile", "bipred", "bitdepth", "block"))
def mc_luma_tiles_pallas(ref: jax.Array, oy: jax.Array, ox: jax.Array,
                         frac_v: jax.Array, frac_h: jax.Array,
                         tile: int = 16, bipred: int = 0, bitdepth: int = 8,
                         block: int = 8):
    """Same contract as ops.mc.mc_luma_tiles (N divisible by `block`)."""
    n = oy.shape[0]
    assert n % block == 0
    w = tile + 5
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block, tile, tile),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block, w, w), jnp.int32),
                        pltpu.SemaphoreType.DMA((block,))],
    )
    kern = partial(_kernel, tile=tile, bipred=bipred, bitdepth=bitdepth,
                   block=block)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, tile, tile), jnp.int32),
    )(oy.astype(jnp.int32), ox.astype(jnp.int32),
      frac_v.astype(jnp.int32), frac_h.astype(jnp.int32),
      ref.astype(jnp.int32))
