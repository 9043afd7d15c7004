"""Pallas TPU kernel for tile-batched quarter-pel luma MC.

XLA lowers batched dynamic-start window gathers to a sequential
while-loop (one DMA per window, ~11ms for a 1080p frame of 16x16 tiles
regardless of formulation - vmap(dynamic_slice), lax.gather, take all hit
it).  Here each grid step DMAs `block` windows from the HBM reference at
data-dependent offsets (scalar-prefetched oy/ox) into VMEM, double-
buffered across grid steps so the copies for step i+1 overlap step i's
filtering, then runs the separable 6-tap filter on the VPU.

TPU-idiomatic details:
  - Mosaic requires DMA slices to be (8,128)-tile aligned in start and
    shape, so each window copy is the aligned 32x256 region containing
    the (tile+5)^2 read window; the residual offset is removed in
    register with pltpu.roll.
  - The fractional-MV taps are scalar loads from an SMEM table
    (per-tile scalar x vector multiplies are native on TPU; the same
    data-dependent taps as a vector broadcast are what cripples the XLA
    formulation).

Bit-exact with ops.mc.mc_luma_tiles / spec.inter.mc_luma (mc6tap tap
order, single rounding, centre lowpass when bipred<2).
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
               np.int64)

_WR = 32    # DMA window rows (sublane-aligned, >= 7 + tile + 5 for tile 16)
_WC = 256   # DMA window cols (lane-aligned, >= 127 + tile + 5)


def _kernel(oy_ref, ox_ref, fv_ref, fh_ref, tap_ref, ref_hbm, out_ref,
            win, sem, *, tile, bipred, bitdepth, block, hp, wp, nsteps):
    """One grid step: MC `block` consecutive tiles (double-buffered DMA)."""
    w = tile + 5
    step = pl.program_id(0)
    i0 = step * jnp.int32(block)
    maxval = (1 << bitdepth) - 1

    def aligned(i):
        oyb = oy_ref[i]
        oxb = ox_ref[i]
        # shift-then-multiply: Mosaic's divisibility prover recognises
        # `x * 8` as tile-aligned (bitwise-and and min are opaque to it)
        ay = (jnp.minimum(oyb, jnp.int32(hp - _WR)) >> jnp.int32(3)) \
            * jnp.int32(8)
        ax = (jnp.minimum(oxb, jnp.int32(wp - _WC)) >> jnp.int32(7)) \
            * jnp.int32(128)
        return ay, ax, oyb - ay, oxb - ax

    def start_batch(step_idx, buf):
        base = step_idx * jnp.int32(block)
        for b in range(block):
            bb = jnp.int32(b)
            ay, ax, _, _ = aligned(base + bb)
            pltpu.make_async_copy(
                ref_hbm.at[pl.ds(ay, _WR), pl.ds(ax, _WC)],
                win.at[buf, bb], sem.at[buf, bb]).start()

    cur = step % jnp.int32(2)
    nxt = (step + jnp.int32(1)) % jnp.int32(2)

    # step 0 issues its own copies; every step prefetches the next batch
    @pl.when(step == 0)
    def _():
        start_batch(step, cur)

    @pl.when(step < jnp.int32(nsteps - 1))
    def _():
        start_batch(step + jnp.int32(1), nxt)

    for b in range(block):
        bb = jnp.int32(b)
        ay, ax, ry, rx = aligned(i0 + bb)
        pltpu.make_async_copy(
            ref_hbm.at[pl.ds(ay, _WR), pl.ds(ax, _WC)],
            win.at[cur, bb], sem.at[cur, bb]).wait()
        # remove the residual row offset; the lane offset is removed on the
        # narrower post-vertical-filter array (half the roll work)
        data = pltpu.roll(win[cur, bb], -ry, 0)
        fvb = fv_ref[i0 + bb]
        fhb = fh_ref[i0 + bb]
        # taps are scalar SMEM loads -> native scalar*vector multiplies
        tmp = None
        for m in range(6):
            c = tap_ref[fvb * 6 + jnp.int32(m)]
            t = c * data[m:m + tile, :]
            tmp = t if tmp is None else tmp + t
        tmp = pltpu.roll(tmp, -rx, 1)
        acc = None
        for m in range(6):
            c = tap_ref[fhb * 6 + jnp.int32(m)]
            t = c * tmp[:, m:m + tile]
            acc = t if acc is None else acc + t
        res = jnp.minimum(jnp.maximum(
            (acc + jnp.int32(2048)) >> jnp.int32(12), jnp.int32(0)),
            jnp.int32(maxval))
        out_ref[bb] = res
        if bipred < 2:
            # centre (2,2) lowpass: computed only for the 1/16 of tiles
            # that take it (scf.if skips the work entirely otherwise)
            @pl.when(jnp.logical_and(fvb == 2, fhb == 2))
            def _():
                wv = pltpu.roll(data, -rx, 1)
                lp = None
                for dy in range(4):
                    for dx in range(4):
                        if _LP[dy, dx]:
                            t = int(_LP[dy, dx]) * \
                                wv[1 + dy:1 + dy + tile,
                                   1 + dx:1 + dx + tile]
                            lp = t if lp is None else lp + t
                out_ref[bb] = jnp.minimum(jnp.maximum(
                    (lp + jnp.int32(8)) >> jnp.int32(4), jnp.int32(0)),
                    jnp.int32(maxval))


@partial(jax.jit, static_argnames=("tile", "bipred", "bitdepth", "block"))
def mc_luma_tiles_pallas(ref: jax.Array, oy: jax.Array, ox: jax.Array,
                         frac_v: jax.Array, frac_h: jax.Array,
                         tile: int = 16, bipred: int = 0, bitdepth: int = 8,
                         block: int = 32):
    """Same contract as ops.mc.mc_luma_tiles (N divisible by `block`).

    ref's dims must be multiples of (8, 128) and at least (32, 256) so the
    aligned window copies stay in bounds.
    """
    n = oy.shape[0]
    assert n % block == 0
    hp, wp = ref.shape
    pr = max((hp + 7) & ~7, _WR) - hp
    pc = max((wp + 127) & ~127, _WC) - wp
    if pr or pc:
        # the aligned-window clamp needs (8,128)-aligned plane dims
        ref = jnp.pad(ref, ((0, pr), (0, pc)))
        hp, wp = ref.shape
    nsteps = n // block
    taps = np.array(COEFFS_BIPRED if bipred else COEFFS_STANDARD,
                    np.int32).reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block, tile, tile),
                               lambda i, *_: (i, jnp.int32(0), jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, block, _WR, _WC), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, block))],
    )
    kern = partial(_kernel, tile=tile, bipred=bipred, bitdepth=bitdepth,
                   block=block, hp=hp, wp=wp, nsteps=nsteps)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, tile, tile), jnp.int32),
    )(oy.astype(jnp.int32), ox.astype(jnp.int32),
      frac_v.astype(jnp.int32), frac_h.astype(jnp.int32),
      jnp.asarray(taps), ref.astype(jnp.int32))


from ..tables import COEFFS_CHROMA

_CWR = 32   # chroma DMA window rows; power-of-2 sublanes (pltpu.roll mod)
_CWC = 256


def _chroma_kernel(oy_ref, ox_ref, fv_ref, fh_ref, tap_ref, ref_hbm,
                   out_ref, win, sem, *, tile, bitdepth, block, hp, wp,
                   nsteps):
    """Chroma MC grid step: 4-tap eighth-pel, horizontal then vertical
    with one rounding (spec.mc_chroma / common_kernels.c chroma path)."""
    w = tile + 3
    step = pl.program_id(0)
    i0 = step * jnp.int32(block)
    maxval = (1 << bitdepth) - 1

    def aligned(i):
        oyb = oy_ref[i]
        oxb = ox_ref[i]
        ay = (jnp.minimum(oyb, jnp.int32(hp - _CWR)) >> jnp.int32(3)) \
            * jnp.int32(8)
        ax = (jnp.minimum(oxb, jnp.int32(wp - _CWC)) >> jnp.int32(7)) \
            * jnp.int32(128)
        return ay, ax, oyb - ay, oxb - ax

    def start_batch(step_idx, buf):
        base = step_idx * jnp.int32(block)
        for b in range(block):
            bb = jnp.int32(b)
            ay, ax, _, _ = aligned(base + bb)
            pltpu.make_async_copy(
                ref_hbm.at[pl.ds(ay, _CWR), pl.ds(ax, _CWC)],
                win.at[buf, bb], sem.at[buf, bb]).start()

    cur = step % jnp.int32(2)
    nxt = (step + jnp.int32(1)) % jnp.int32(2)

    @pl.when(step == 0)
    def _():
        start_batch(step, cur)

    @pl.when(step < jnp.int32(nsteps - 1))
    def _():
        start_batch(step + jnp.int32(1), nxt)

    for b in range(block):
        bb = jnp.int32(b)
        ay, ax, ry, rx = aligned(i0 + bb)
        pltpu.make_async_copy(
            ref_hbm.at[pl.ds(ay, _CWR), pl.ds(ax, _CWC)],
            win.at[cur, bb], sem.at[cur, bb]).wait()
        data = pltpu.roll(win[cur, bb], -ry, 0)
        fvb = fv_ref[i0 + bb]
        fhb = fh_ref[i0 + bb]
        # the reference filters horizontally first (spec.mc_chroma), but
        # with a single rounding after both passes the separable order
        # commutes exactly; vertical-first keeps lane slices static
        tmp = None
        for m in range(4):
            c = tap_ref[fvb * 4 + jnp.int32(m)]
            t = c * data[m:m + tile, :]
            tmp = t if tmp is None else tmp + t
        tmp = pltpu.roll(tmp, -rx, 1)
        acc = None
        for m in range(4):
            c = tap_ref[fhb * 4 + jnp.int32(m)]
            t = c * tmp[:, m:m + tile]
            acc = t if acc is None else acc + t
        out_ref[bb] = jnp.minimum(jnp.maximum(
            (acc + jnp.int32(2048)) >> jnp.int32(12), jnp.int32(0)),
            jnp.int32(maxval))


@partial(jax.jit, static_argnames=("tile", "bitdepth", "block"))
def mc_chroma_tiles_pallas(ref: jax.Array, oy: jax.Array, ox: jax.Array,
                           frac_v: jax.Array, frac_h: jax.Array,
                           tile: int = 8, bitdepth: int = 8,
                           block: int = 32):
    """Same contract as ops.mc.mc_chroma_tiles (N divisible by `block`)."""
    n = oy.shape[0]
    assert n % block == 0
    hp, wp = ref.shape
    pr = max((hp + 7) & ~7, _CWR) - hp
    pc = max((wp + 127) & ~127, _CWC) - wp
    if pr or pc:
        ref = jnp.pad(ref, ((0, pr), (0, pc)))
        hp, wp = ref.shape
    nsteps = n // block
    taps = np.array(COEFFS_CHROMA, np.int32).reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block, tile, tile),
                               lambda i, *_: (i, jnp.int32(0), jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, block, _CWR, _CWC), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, block))],
    )
    kern = partial(_chroma_kernel, tile=tile, bitdepth=bitdepth,
                   block=block, hp=hp, wp=wp, nsteps=nsteps)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, tile, tile), jnp.int32),
    )(oy.astype(jnp.int32), ox.astype(jnp.int32),
      frac_v.astype(jnp.int32), frac_h.astype(jnp.int32),
      jnp.asarray(taps), ref.astype(jnp.int32))


def _chroma_uv_kernel(oy_ref, ox_ref, fv_ref, fh_ref, tap_ref, refu_hbm,
                      refv_hbm, outu_ref, outv_ref, win, sem, *, tile,
                      bitdepth, block, hp, wp, nsteps):
    """U and V share per-tile offsets/fractions: one scalar pass drives
    two DMAs and two filters per tile (halves the issue overhead of two
    separate plane calls)."""
    step = pl.program_id(0)
    i0 = step * jnp.int32(block)
    maxval = (1 << bitdepth) - 1

    def aligned(i):
        oyb = oy_ref[i]
        oxb = ox_ref[i]
        ay = (jnp.minimum(oyb, jnp.int32(hp - _CWR)) >> jnp.int32(3)) \
            * jnp.int32(8)
        ax = (jnp.minimum(oxb, jnp.int32(wp - _CWC)) >> jnp.int32(7)) \
            * jnp.int32(128)
        return ay, ax, oyb - ay, oxb - ax

    def start_batch(step_idx, buf):
        base = step_idx * jnp.int32(block)
        for b in range(block):
            bb = jnp.int32(b)
            ay, ax, _, _ = aligned(base + bb)
            for p, hbm in ((0, refu_hbm), (1, refv_hbm)):
                pltpu.make_async_copy(
                    hbm.at[pl.ds(ay, _CWR), pl.ds(ax, _CWC)],
                    win.at[buf, bb, jnp.int32(p)],
                    sem.at[buf, bb, jnp.int32(p)]).start()

    cur = step % jnp.int32(2)
    nxt = (step + jnp.int32(1)) % jnp.int32(2)

    @pl.when(step == 0)
    def _():
        start_batch(step, cur)

    @pl.when(step < jnp.int32(nsteps - 1))
    def _():
        start_batch(step + jnp.int32(1), nxt)

    for b in range(block):
        bb = jnp.int32(b)
        ay, ax, ry, rx = aligned(i0 + bb)
        fvb = fv_ref[i0 + bb]
        fhb = fh_ref[i0 + bb]
        for p, hbm, out in ((0, refu_hbm, outu_ref), (1, refv_hbm, outv_ref)):
            pltpu.make_async_copy(
                hbm.at[pl.ds(ay, _CWR), pl.ds(ax, _CWC)],
                win.at[cur, bb, jnp.int32(p)],
                sem.at[cur, bb, jnp.int32(p)]).wait()
            data = pltpu.roll(win[cur, bb, jnp.int32(p)], -ry, 0)
            tmp = None
            for m in range(4):
                c = tap_ref[fvb * 4 + jnp.int32(m)]
                t = c * data[m:m + tile, :]
                tmp = t if tmp is None else tmp + t
            tmp = pltpu.roll(tmp, -rx, 1)
            acc = None
            for m in range(4):
                c = tap_ref[fhb * 4 + jnp.int32(m)]
                t = c * tmp[:, m:m + tile]
                acc = t if acc is None else acc + t
            out[bb] = jnp.minimum(jnp.maximum(
                (acc + jnp.int32(2048)) >> jnp.int32(12), jnp.int32(0)),
                jnp.int32(maxval))


@partial(jax.jit, static_argnames=("tile", "bitdepth", "block"))
def mc_chroma_uv_tiles_pallas(refu: jax.Array, refv: jax.Array,
                              oy: jax.Array, ox: jax.Array,
                              frac_v: jax.Array, frac_h: jax.Array,
                              tile: int = 8, bitdepth: int = 8,
                              block: int = 16):
    """MC both chroma planes with shared per-tile metadata.  Returns
    (pred_u, pred_v), each [N, tile, tile], identical to two
    mc_chroma_tiles_pallas calls."""
    n = oy.shape[0]
    assert n % block == 0 and refu.shape == refv.shape
    hp, wp = refu.shape
    pr = max((hp + 7) & ~7, _CWR) - hp
    pc = max((wp + 127) & ~127, _CWC) - wp
    if pr or pc:
        refu = jnp.pad(refu, ((0, pr), (0, pc)))
        refv = jnp.pad(refv, ((0, pr), (0, pc)))
        hp, wp = refu.shape
    nsteps = n // block
    taps = np.array(COEFFS_CHROMA, np.int32).reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec((block, tile, tile),
                                lambda i, *_: (i, jnp.int32(0),
                                               jnp.int32(0)),
                                memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((2, block, 2, _CWR, _CWC), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, block, 2))],
    )
    kern = partial(_chroma_uv_kernel, tile=tile, bitdepth=bitdepth,
                   block=block, hp=hp, wp=wp, nsteps=nsteps)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, tile, tile), jnp.int32)] * 2,
    )(oy.astype(jnp.int32), ox.astype(jnp.int32),
      frac_v.astype(jnp.int32), frac_h.astype(jnp.int32),
      jnp.asarray(taps), refu.astype(jnp.int32), refv.astype(jnp.int32))
