"""Batched motion compensation on device.

TPU-first design: instead of per-block pointer walks, MC is a dense batch
over fixed-size tiles (the 4x4 MV grid the codec already maintains).  Each
tile gathers a (tile+5)^2 window from the padded reference at its integer
MV offset and applies the separable 6-tap quarter-pel filter selected by
its fractional MV.  Integer positions fall out naturally because frac=0
selects the delta filter [0,0,64,0,0,0] ((64*64*x+2048)>>12 == x).

Bit-exact with spec.inter.mc_luma / mc_chroma (same tap order, rounding
and saturation); the special centre lowpass (frac==(2,2), bipred<2) is a
masked select.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import COEFFS_STANDARD, COEFFS_BIPRED, COEFFS_CHROMA

_STD = jnp.asarray(np.array(COEFFS_STANDARD, np.int32))
_BIP = jnp.asarray(np.array(COEFFS_BIPRED, np.int32))
_CHR = jnp.asarray(np.array(COEFFS_CHROMA, np.int32))


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
    w = tile + 5
    win = _gather_windows(ref, oy, ox, w, w)            # [N, w, w]
    coeffs = _BIP if bipred else _STD
    fv = coeffs[frac_v]                                  # [N, 6]
    fh = coeffs[frac_h]
    # vertical: tmp[n, i, j] = sum_m fv[n,m] * win[n, i+m, j]
    tmp = jnp.zeros((win.shape[0], tile, w), jnp.int32)
    for m in range(6):
        tmp = tmp + fv[:, m, None, None] * win[:, m:m + tile, :]
    out = jnp.zeros((win.shape[0], tile, tile), jnp.int32)
    for m in range(6):
        out = out + fh[:, m, None, None] * tmp[:, :, m:m + tile]
    out = jnp.clip((out + 2048) >> 12, 0, (1 << bitdepth) - 1)

    if bipred < 2:
        # centre (2,2): special 4x4 lowpass on rows/cols [1..4] of the window
        k = jnp.asarray(np.array([[0, 1, 1, 0], [1, 2, 2, 1],
                                  [1, 2, 2, 1], [0, 1, 1, 0]], np.int32))
        lp = jnp.zeros((win.shape[0], tile, tile), jnp.int32)
        for dy in range(4):
            for dx in range(4):
                if int(np.array([[0, 1, 1, 0], [1, 2, 2, 1], [1, 2, 2, 1],
                                 [0, 1, 1, 0]])[dy, dx]):
                    lp = lp + k[dy, dx] * win[:, 1 + dy:1 + dy + tile,
                                              1 + dx:1 + dx + tile]
        lp = jnp.clip((lp + 8) >> 4, 0, (1 << bitdepth) - 1)
        centre = ((frac_v == 2) & (frac_h == 2))[:, None, None]
        out = jnp.where(centre, lp, out)
    return out


@partial(jax.jit, static_argnames=("tile", "bitdepth"))
def mc_chroma_tiles(ref: jax.Array, oy: jax.Array, ox: jax.Array,
                    frac_v: jax.Array, frac_h: jax.Array,
                    tile: int = 2, bitdepth: int = 8):
    """MC a batch of tile x tile chroma blocks (4-tap eighth-pel).

    oy/ox: [N] window origins = pad_c + block_y + ver_int - 1.
    frac_v/frac_h: [N] in 0..7.  Returns [N, tile, tile] int32.
    Order matches spec.mc_chroma: horizontal first, then vertical.
    """
    w = tile + 3
    win = _gather_windows(ref, oy, ox, w, w)
    fh = _CHR[frac_h]
    fv = _CHR[frac_v]
    tmp = jnp.zeros((win.shape[0], w, tile), jnp.int32)
    for m in range(4):
        tmp = tmp + fh[:, m, None, None] * win[:, :, m:m + tile]
    out = jnp.zeros((win.shape[0], tile, tile), jnp.int32)
    for m in range(4):
        out = out + fv[:, m, None, None] * tmp[:, m:m + tile, :]
    return jnp.clip((out + 2048) >> 12, 0, (1 << bitdepth) - 1)
