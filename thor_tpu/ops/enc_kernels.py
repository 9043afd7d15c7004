"""Encoder vectorized kernels on device (batched over blocks).

TPU twins of the reference's encoder SIMD tier (enc/enc_kernels.c:84-910
and the shared kernels common/common_kernels.c:38-163): SAD / SSD /
widesad, the fast half- and quarter-pel 8-position SAD evaluators (exact
averaging-tree approximations of the MC filters), bi-prediction block
averaging and the temporal-interpolation 2x2 pyramid downscale.

Each takes a whole batch of blocks (or a full plane) so one call covers a
frame's worth of candidate evaluations - the unit a TPU motion-estimation
schedule works in.  All bit-exact with enc/me.py and spec/tempinterp.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _i32(x):
    return x.astype(jnp.int32)


@jax.jit
def sad_batch(org: jax.Array, cand: jax.Array) -> jax.Array:
    """SAD per block: [N,h,w] x [N,h,w] -> [N] (enc_kernels.c:84)."""
    return jnp.sum(jnp.abs(_i32(org) - _i32(cand)), axis=(1, 2))


@jax.jit
def ssd_batch(org: jax.Array, cand: jax.Array) -> jax.Array:
    """SSD per block -> [N] int64 (enc_kernels.c:119)."""
    d = org.astype(jnp.int64) - cand.astype(jnp.int64)
    return jnp.sum(d * d, axis=(1, 2))


@jax.jit
def avg_batch(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """Bi-prediction average (p0+p1)>>1, no rounding
    (inter_prediction.c:228-248)."""
    return (_i32(p0) + _i32(p1)) >> 1


@jax.jit
def scale_down2x2(plane: jax.Array) -> jax.Array:
    """Temporal-interp pyramid downscale, SIMD rounding semantics
    (temporal_interp.c:143: column-pair averages, then >>1)."""
    s = _i32(plane)
    a = s[0::2, 0::2]
    b = s[1::2, 0::2]
    c = s[0::2, 1::2]
    d = s[1::2, 1::2]
    return (((a + b + 1) >> 1) + ((c + d + 1) >> 1)) >> 1


@jax.jit
def widesad_batch(org: jax.Array, win: jax.Array):
    """SAD at 5 x-offsets (-3,-1,0,1,3) per block (enc_kernels.c:430-453
    pattern x.xXx.x).  org: [N,h,w]; win: [N,h,w+6] with the centre
    candidate at column offset 3.  Returns (best_sad [N], best_x [N]);
    strict < keeps the earlier offset on ties, like the reference."""
    o = _i32(org)
    w = org.shape[2]
    offs = (-3, -1, 0, 1, 3)
    sads = jnp.stack([jnp.sum(jnp.abs(o - _i32(win[:, :, 3 + off:3 + off + w])),
                              axis=(1, 2)) for off in offs], axis=1)
    best = jnp.argmin(sads, axis=1)   # first minimum = earliest offset
    return (jnp.take_along_axis(sads, best[:, None], 1)[:, 0],
            jnp.asarray(np.array(offs, np.int32))[best])


def _avg(a, b):
    return (a + b + 1) >> 1


@jax.jit
def fasthalf_batch(org: jax.Array, win: jax.Array):
    """8 half-pel SADs via the reference's averaging trees
    (enc/encode_block.c:174-282 / enc/me.py sad_calc_fasthalf).

    org: [N,h,w]; win: [N,h+4,w+4] centred so the full-pel candidate is
    win[:, 2:2+h, 2:2+w].  Returns (best_sad [N], best_x [N], best_y [N])
    with x/y in {-2,0,2} and the reference's tie-break order."""
    o = _i32(org)
    n, h, w = org.shape

    def b(dy, dx):
        return _i32(win[:, 2 + dy:2 + dy + h, 2 + dx:2 + dx + w])

    def sad(p):
        return jnp.sum(jnp.abs(o - p), axis=(1, 2))

    t2 = _avg(b(0, -1), b(0, 0))
    left = sad(t2)
    t8 = _avg(b(0, 0), b(0, 1))
    right = sad(t8)
    down = sad(_avg(b(0, 0), b(1, 0)))
    top = sad(_avg(b(0, 0), b(-1, 0)))

    # corners via the exact averaging trees (shared temporaries kept with
    # me.py's names)
    t1 = (_avg(b(-1, -1), b(-1, 0)) + t2) >> 1
    t4 = _avg(b(-2, 0), b(1, 0))
    t3 = (_avg(b(-2, -1), b(1, -1)) + t4) >> 1
    t6 = _avg(b(0, -2), b(0, 1))
    t5a = (_avg(b(-1, -2), b(-1, 1)) + t6) >> 1
    tl = sad((((t3 + t5a) >> 1) + t1) >> 1)

    t1 = (_avg(b(-1, 0), b(-1, 1)) + t8) >> 1
    t3 = (t4 + _avg(b(-2, 1), b(1, 1))) >> 1
    t7 = _avg(b(0, -1), b(0, 2))
    t5c = (t7 + _avg(b(-1, -1), b(-1, 2))) >> 1
    tr = sad((((t3 + t5c) >> 1) + t1) >> 1)

    t3 = (_avg(b(1, -1), b(1, 0)) + t2) >> 1
    t4c = _avg(b(-1, 0), b(2, 0))
    t5d = (t4c + _avg(b(-1, -1), b(2, -1))) >> 1
    t2c = (t6 + _avg(b(1, -2), b(1, 1))) >> 1
    bl = sad((((t5d + t2c) >> 1) + t3) >> 1)

    t3 = (t8 + _avg(b(1, 0), b(1, 1))) >> 1
    t6b = (t4c + _avg(b(-1, 1), b(2, 1))) >> 1
    t1c = (t7 + _avg(b(1, -1), b(1, 2))) >> 1
    br = sad((((t6b + t1c) >> 1) + t3) >> 1)

    # strict-< scan order top,down,right,left,tl,tr,br,bl: first minimum
    # in that order wins ties (enc/encode_block.c:264-281)
    cands = jnp.stack([top, down, right, left, tl, tr, br, bl], 1)
    xs = jnp.asarray(np.array([0, 0, 2, -2, -2, 2, 2, -2], np.int32))
    ys = jnp.asarray(np.array([-2, 2, 0, 0, -2, -2, 2, 2], np.int32))
    best = jnp.argmin(cands, axis=1)
    return (jnp.take_along_axis(cands, best[:, None], 1)[:, 0],
            xs[best], ys[best])


@partial(jax.jit, static_argnames=("inx", "iny"))
def fastquarter_batch(org: jax.Array, win: jax.Array, inx: int, iny: int):
    """8 quarter-pel SADs around a half-pel centre
    (enc/encode_block.c:286-415 / enc/me.py sad_calc_fastquarter).

    org: [N,h,w]; win: [N,h+2,w+2] with the centre full-pel anchor at
    win[:, 1:1+h, 1:1+w].  inx/iny: nonzero if the centre sits at a
    half-pel phase in x/y.  Returns (best_sad, best_x, best_y [N]),
    x/y in {-1,0,1}."""
    o = _i32(org)
    n, h, w = org.shape

    def r(dy, dx):
        return _i32(win[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w])

    a = r(0, 0)
    d = r(0, 1)
    e = r(1, 1)
    f = r(1, 0)
    if inx and iny:
        ad = _avg(a, d)
        de = _avg(d, e)
        af = _avg(a, f)
        fe = _avg(f, e)
        preds = {
            (-1, -1): (ad + af) >> 1, (0, -1): (de + a) >> 1,
            (1, -1): (ad + de) >> 1, (-1, 0): (ad + f) >> 1,
            (1, 0): (ad + e) >> 1, (-1, 1): (af + fe) >> 1,
            (0, 1): (de + f) >> 1, (1, 1): (de + fe) >> 1}
    elif inx:
        b_ = r(-1, 0)
        c = r(-1, 1)
        ad = _avg(a, d)
        de = _avg(d, e)
        dc = _avg(d, c)
        af = _avg(a, f)
        ab = _avg(a, b_)
        preds = {
            (-1, -1): (ad + ab) >> 1, (0, -1): (dc + a) >> 1,
            (1, -1): (ad + dc) >> 1, (-1, 0): (ad + a) >> 1,
            (1, 0): (ad + d) >> 1, (-1, 1): (ad + af) >> 1,
            (0, 1): (af + d) >> 1, (1, 1): (ad + de) >> 1}
    elif iny:
        g = r(1, -1)
        hh = r(0, -1)
        ad = _avg(a, d)
        af = _avg(a, f)
        fe = _avg(f, e)
        ah = _avg(a, hh)
        gf = _avg(g, f)
        preds = {
            (-1, -1): (ah + af) >> 1, (0, -1): (af + a) >> 1,
            (1, -1): (ad + af) >> 1, (-1, 0): (gf + a) >> 1,
            (1, 0): (ad + f) >> 1, (-1, 1): (af + gf) >> 1,
            (0, 1): (af + f) >> 1, (1, 1): (af + fe) >> 1}
    else:
        b_ = r(-1, 0)
        hh = r(0, -1)
        ad = _avg(a, d)
        af = _avg(a, f)
        ah = _avg(a, hh)
        ab = _avg(a, b_)
        preds = {
            (-1, -1): (ah + ab) >> 1, (0, -1): (ab + a) >> 1,
            (1, -1): (ad + ab) >> 1, (-1, 0): (ah + a) >> 1,
            (1, 0): (ad + a) >> 1, (-1, 1): (ah + af) >> 1,
            (0, 1): (af + a) >> 1, (1, 1): (af + ad) >> 1}

    def sad(p):
        return jnp.sum(jnp.abs(o - p), axis=(1, 2))

    order = [(0, -1), (-1, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1),
             (1, 1)]
    cands = jnp.stack([sad(preds[k]) for k in order], 1)
    xs = jnp.asarray(np.array([k[0] for k in order], np.int32))
    ys = jnp.asarray(np.array([k[1] for k in order], np.int32))
    best = jnp.argmin(cands, axis=1)
    return (jnp.take_along_axis(cands, best[:, None], 1)[:, 0],
            xs[best], ys[best])
