"""Batched motion compensation on device.

TPU-first design.  Per-tile data-dependent filter taps are pathological on
the VPU (a [N,1,1]->[N,tile,w] broadcast multiply measured ~300x slower
than the same filter with compile-time-constant taps), so MC is formulated
frame-first: every (frac_v, frac_h) variant of the padded reference is
pre-filtered densely with CONSTANT taps (16 luma variants incl. the centre
lowpass, 64 chroma variants), then each tile does a single cheap
vmap(dynamic_slice) gather from its variant.  Dense aligned passes run at
HBM speed; the gather of whole windows lowers to a bulk slice-gather.

Bit-exact with spec.inter.mc_luma / mc_chroma (same tap order, single
rounding after the separable pass, saturation); the special centre lowpass
(frac==(2,2), bipred<2) simply *is* variant 10.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import COEFFS_STANDARD, COEFFS_BIPRED, COEFFS_CHROMA

_STD = np.array(COEFFS_STANDARD, np.int64)
_BIP = np.array(COEFFS_BIPRED, np.int64)
_CHR = np.array(COEFFS_CHROMA, np.int64)
_LP = np.array([[0, 1, 1, 0], [1, 2, 2, 1], [1, 2, 2, 1], [0, 1, 1, 0]],
               np.int64)


def _gather_windows(ref: jax.Array, oy: jax.Array, ox: jax.Array, wh: int,
                    ww: int):
    """Gather [N, wh, ww] windows at (oy[n], ox[n]) from 2D ref.

    vmap(dynamic_slice) lowers to a gather of whole (wh,ww) slices - orders
    of magnitude faster on TPU than elementwise advanced indexing.  Window
    origins are always in-bounds (reference padding covers the MV range),
    so dynamic_slice's start clamping never triggers.
    """
    def slice_one(y, x):
        return jax.lax.dynamic_slice(ref, (y, x), (wh, ww))
    return jax.vmap(slice_one)(oy, ox)


def _luma_variants(ref: jax.Array, bipred: int, bitdepth: int):
    """Stack of the 16 (frac_v, frac_h) pre-filtered frames.

    V[fv*4+fh][y, x] is the MC output for pixel (y+2, x+2) of `ref`
    (the 6 taps cover rows/cols -2..+3 around the output pixel), so a
    window origin oy = pos - 2 indexes the stack directly.
    """
    hp, wp = ref.shape
    coeffs = _BIP if bipred else _STD
    maxval = (1 << bitdepth) - 1
    # vertical pass: 4 constant-tap variants over the whole frame
    vert = []
    for f in range(4):
        t = jnp.zeros((hp - 5, wp), jnp.int32)
        for m in range(6):
            c = int(coeffs[f, m])
            if c:
                t = t + c * ref[m:hp - 5 + m]
        vert.append(t)
    variants = []
    for f in range(4):
        for g in range(4):
            if f == 2 and g == 2 and bipred < 2:
                # centre lowpass (common_kernels.c thor-style 4x4 kernel)
                t = jnp.zeros((hp - 5, wp - 5), jnp.int32)
                for dy in range(4):
                    for dx in range(4):
                        if _LP[dy, dx]:
                            t = t + int(_LP[dy, dx]) * \
                                ref[1 + dy:hp - 4 + dy, 1 + dx:wp - 4 + dx]
                variants.append(jnp.clip((t + 8) >> 4, 0, maxval))
                continue
            t = jnp.zeros((hp - 5, wp - 5), jnp.int32)
            for m in range(6):
                c = int(coeffs[g, m])
                if c:
                    t = t + c * vert[f][:, m:wp - 5 + m]
            variants.append(jnp.clip((t + 2048) >> 12, 0, maxval))
    return jnp.stack(variants)


@partial(jax.jit, static_argnames=("tile", "bitdepth", "bipred"))
def mc_luma_tiles(ref: jax.Array, oy: jax.Array, ox: jax.Array,
                  frac_v: jax.Array, frac_h: jax.Array,
                  tile: int = 4, bipred: int = 0, bitdepth: int = 8):
    """MC a batch of tile x tile luma blocks.

    ref: padded reference plane [Hp, Wp] int32.
    oy/ox: [N] window origins = pad + block_y + ver_int - 2 (top-left of the
    (tile+5)-wide read window).  frac_v/frac_h: [N] in 0..3.
    Returns [N, tile, tile] int32.
    """
    v = _luma_variants(ref.astype(jnp.int32), bipred, bitdepth)
    idx = frac_v * 4 + frac_h

    def slice_one(k, y, x):
        return jax.lax.dynamic_slice(v, (k, y, x), (1, tile, tile))[0]
    return jax.vmap(slice_one)(idx, oy, ox)


@partial(jax.jit, static_argnames=("tile", "bitdepth"))
def mc_chroma_tiles(ref: jax.Array, oy: jax.Array, ox: jax.Array,
                    frac_v: jax.Array, frac_h: jax.Array,
                    tile: int = 2, bitdepth: int = 8):
    """MC a batch of tile x tile chroma blocks (4-tap eighth-pel).

    oy/ox: [N] window origins = pad_c + block_y + ver_int - 1.
    frac_v/frac_h: [N] in 0..7.  Returns [N, tile, tile] int32.
    Order matches spec.mc_chroma: horizontal first, then vertical; one
    rounding after both passes.  Variant (fv,fh) index y holds output
    pixel y+1, so window origins index the stack directly.
    """
    r = ref.astype(jnp.int32)
    hp, wp = r.shape
    maxval = (1 << bitdepth) - 1
    horiz = []
    for g in range(8):
        t = jnp.zeros((hp, wp - 3), jnp.int32)
        for m in range(4):
            c = int(_CHR[g, m])
            if c:
                t = t + c * r[:, m:wp - 3 + m]
        horiz.append(t)
    variants = []
    for f in range(8):
        for g in range(8):
            t = jnp.zeros((hp - 3, wp - 3), jnp.int32)
            for m in range(4):
                c = int(_CHR[f, m])
                if c:
                    t = t + c * horiz[g][m:hp - 3 + m]
            variants.append(jnp.clip((t + 2048) >> 12, 0, maxval))
    v = jnp.stack(variants)
    idx = frac_v * 8 + frac_h

    def slice_one(k, y, x):
        return jax.lax.dynamic_slice(v, (k, y, x), (1, tile, tile))[0]
    return jax.vmap(slice_one)(idx, oy, ox)
