"""In-loop filters on device (deblock, CLPF, CDEF).

TPU-first formulation: all three Thor filters are non-recursive per pass
(each output pixel depends only on the pre-pass frame; the reference
realises this with a delayed write-back cache, common_frame.c:851-1002),
and edge filters 8 px apart never overlap, so every pass is a dense
whole-plane stencil.  Block-metadata conditions (mode/cbp/mv/size from
deblock_data) are folded on the host into per-edge boolean masks - they
are tiny compared to the pixel work and keep the device kernels purely
dense.

Bit-exact with spec.filters (common_frame.c:47-432 deblock,
common_block.c:224-345 CLPF/CDEF cores).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import BETA_TABLE, TC_TABLE, MIN_PB_SIZE, MIN_BLOCK_SIZE
from ..tables import log2i

MODE_SKIP = 0
MODE_INTRA = 1


# ---------------------------------------------------------------- deblock

def _mv_ge4(dd):
    """Per-PB 'any MV component >= 4' (common_frame.c NEW_MV_TEST)."""
    return ((np.abs(dd.mv0) >= 4).any(axis=1) |
            (np.abs(dd.mv1) >= 4).any(axis=1))


def deblock_masks_y(dd, width, height):
    """Host: fold deblock_data into per-edge luma filter masks.

    Returns (maskv [H//4, Ev], maskh [Hh, W//4]) bool, where Ev/Hh count
    interior vertical/horizontal 8-px edges; rows/cols are in 4-px PB
    units (each mask row covers the 4 pixel rows of one PB).
    """
    bs = dd.bs
    gh, gw = height // MIN_PB_SIZE, width // MIN_PB_SIZE
    size = dd.size[:gh * bs].reshape(gh, bs)[:, :gw]
    tb = dd.tb_split[:gh * bs].reshape(gh, bs)[:, :gw]
    pb = dd.pb_part[:gh * bs].reshape(gh, bs)[:, :gw]
    cbp = dd.cbp_y[:gh * bs].reshape(gh, bs)[:, :gw].astype(bool)
    intra = (dd.mode[:gh * bs].reshape(gh, bs)[:, :gw] == MODE_INTRA)
    mv = _mv_ge4(dd)[:gh * bs].reshape(gh, bs)[:, :gw]

    # vertical edges: q blocks at even grid cols >= 2
    qc = np.arange(2, gw, 2)
    q_size = size[:, qc].astype(np.int64)
    halve = ((tb[:, qc] != 0) | (pb[:, qc] == 2) | (pb[:, qc] == 3))
    q_size = np.where(halve & (q_size > MIN_BLOCK_SIZE), q_size // 2, q_size)
    j = (qc * MIN_PB_SIZE)[None, :]
    interior = (j % q_size) > 0
    act = (mv[:, qc] | mv[:, qc - 1] | cbp[:, qc] | cbp[:, qc - 1] |
           intra[:, qc] | intra[:, qc - 1])
    maskv = (~interior) & act                                # [gh, Ev]

    # horizontal edges: q blocks at even grid rows >= 2
    qr = np.arange(2, gh, 2)
    q_size = size[qr, :].astype(np.int64)
    halve = ((tb[qr, :] != 0) | (pb[qr, :] == 1) | (pb[qr, :] == 3))
    q_size = np.where(halve & (q_size > MIN_BLOCK_SIZE), q_size // 2, q_size)
    i = (qr * MIN_PB_SIZE)[:, None]
    interior = (i % q_size) > 0
    act = (mv[qr, :] | mv[qr - 1, :] | cbp[qr, :] | cbp[qr - 1, :] |
           intra[qr, :] | intra[qr - 1, :])
    maskh = (~interior) & act                                # [Eh, gw]
    return maskv, maskh


def deblock_masks_uv(dd, width, height):
    """Host: chroma deblock masks (intra-only, whole-block edges)."""
    bs = dd.bs
    gh, gw = height // MIN_PB_SIZE, width // MIN_PB_SIZE
    size = dd.size[:gh * bs].reshape(gh, bs)[:, :gw].astype(np.int64)
    intra = (dd.mode[:gh * bs].reshape(gh, bs)[:, :gw] == MODE_INTRA)

    qc = np.arange(2, gw, 2)
    j = (qc * MIN_PB_SIZE)[None, :]
    maskv = ((j % size[::2, qc]) == 0) & \
        (intra[::2, qc] | intra[::2, qc - 1])                # [gh/2, Ev]
    qr = np.arange(2, gh, 2)
    i = (qr * MIN_PB_SIZE)[:, None]
    maskh = ((i % size[qr, ::2]) == 0) & \
        (intra[qr, ::2] | intra[qr - 1, ::2])                # [Eh, gw/2]
    return maskv, maskh


def _delta_luma(p1, p0, q0, q1, tc):
    delta = (18 * (q0 - p0) - 6 * (q1 - p1) + 16) >> 5
    return jnp.clip(delta, -tc, tc)


def _half_trunc(delta):
    """C (delta/2): truncation toward zero."""
    return jnp.where(delta >= 0, delta >> 1, -((-delta) >> 1))


@partial(jax.jit, static_argnames=("qp", "bitdepth"))
def deblock_plane_y(r: jax.Array, maskv: jax.Array, maskh: jax.Array,
                    qp: int, bitdepth: int = 8):
    """Luma deblock on device: vertical-edge pass then horizontal-edge
    pass, each a dense masked stencil (common_frame.c:47-352)."""
    beta = int(BETA_TABLE[qp]) << (bitdepth - 8)
    tc = (int(TC_TABLE[qp]) << (bitdepth - 12) if bitdepth > 12
          else int(TC_TABLE[qp]) >> (12 - bitdepth))
    hi = (1 << bitdepth) - 1
    H, W = r.shape
    r = r.astype(jnp.int32)

    # ---- vertical edges (cols 8, 16, ..., W-8) ----
    ev = W // 8 - 1
    if ev > 0:
        p1 = r[:, 6:W - 8:8]
        p0 = r[:, 7:W - 8:8]
        q0 = r[:, 8:W - 7:8]
        q1 = r[:, 9:W - 6:8]
        # d15 from band rows 1,5; d26 from rows 2,6 (per 8-row band)
        dif_in = jnp.abs(p1 - p0) + jnp.abs(q1 - q0)       # [H, ev]
        band = dif_in.reshape(H // 8, 8, ev)
        d15 = band[:, 1] + band[:, 5]
        d26 = band[:, 2] + band[:, 6]
        d = jnp.stack([d15, d26, d15, d26, d15, d26, d15, d26],
                      1).reshape(H, ev)
        cond = jnp.repeat(maskv, 4, axis=0) & (d < beta)
        delta = _delta_luma(p1, p0, q0, q1, tc)
        half = _half_trunc(delta)
        r = r.at[:, 6:W - 8:8].set(
            jnp.where(cond, jnp.clip(p1 + half, 0, hi), p1))
        r = r.at[:, 7:W - 8:8].set(
            jnp.where(cond, jnp.clip(p0 + delta, 0, hi), p0))
        r = r.at[:, 8:W - 7:8].set(
            jnp.where(cond, jnp.clip(q0 - delta, 0, hi), q0))
        r = r.at[:, 9:W - 6:8].set(
            jnp.where(cond, jnp.clip(q1 - half, 0, hi), q1))

    # ---- horizontal edges (rows 8, 16, ..., H-8) ----
    eh = H // 8 - 1
    if eh > 0:
        p1 = r[6:H - 8:8, :]
        p0 = r[7:H - 8:8, :]
        q0 = r[8:H - 7:8, :]
        q1 = r[9:H - 6:8, :]
        dif_in = jnp.abs(p1 - p0) + jnp.abs(q1 - q0)       # [eh, W]
        band = dif_in.reshape(eh, W // 8, 8)
        d15 = band[:, :, 1] + band[:, :, 5]
        d26 = band[:, :, 2] + band[:, :, 6]
        d = jnp.stack([d15, d26, d15, d26, d15, d26, d15, d26],
                      2).reshape(eh, W)
        cond = jnp.repeat(maskh, 4, axis=1) & (d < beta)
        delta = _delta_luma(p1, p0, q0, q1, tc)
        half = _half_trunc(delta)
        r = r.at[6:H - 8:8, :].set(
            jnp.where(cond, jnp.clip(p1 + half, 0, hi), p1))
        r = r.at[7:H - 8:8, :].set(
            jnp.where(cond, jnp.clip(p0 + delta, 0, hi), p0))
        r = r.at[8:H - 7:8, :].set(
            jnp.where(cond, jnp.clip(q0 - delta, 0, hi), q0))
        r = r.at[9:H - 6:8, :].set(
            jnp.where(cond, jnp.clip(q1 - half, 0, hi), q1))
    return r


@partial(jax.jit, static_argnames=("qpc", "sub", "bitdepth"))
def deblock_plane_uv(c: jax.Array, maskv: jax.Array, maskh: jax.Array,
                     qpc: int, sub: int = 1, bitdepth: int = 8):
    """Chroma deblock on device, one plane (common_frame.c:354-432).

    c: chroma plane.  Edges every 8 luma px = (8>>sub) chroma px; the
    2-tap filter writes only p0/q0 so adjacent edges stay independent.
    """
    tc = (int(TC_TABLE[qpc]) << (bitdepth - 12) if bitdepth > 12
          else int(TC_TABLE[qpc]) >> (12 - bitdepth))
    hi = (1 << bitdepth) - 1
    H, W = c.shape
    c = c.astype(jnp.int32)
    step = MIN_BLOCK_SIZE >> sub
    rows_per_edge = MIN_BLOCK_SIZE >> sub

    ev = W // step - 1
    if ev > 0:
        p1 = c[:, step - 2:W - step - 1:step]
        p0 = c[:, step - 1:W - step:step]
        q0 = c[:, step:W - step + 1:step]
        q1 = c[:, step + 1:W - step + 2:step]
        delta = jnp.clip((4 * (q0 - p0) + (p1 - q1) + 4) >> 3, -tc, tc)
        cond = jnp.repeat(maskv, rows_per_edge, axis=0)
        c = c.at[:, step - 1:W - step:step].set(
            jnp.where(cond, jnp.clip(p0 + delta, 0, hi), p0))
        c = c.at[:, step:W - step + 1:step].set(
            jnp.where(cond, jnp.clip(q0 - delta, 0, hi), q0))

    eh = H // step - 1
    if eh > 0:
        p1 = c[step - 2:H - step - 1:step, :]
        p0 = c[step - 1:H - step:step, :]
        q0 = c[step:H - step + 1:step, :]
        q1 = c[step + 1:H - step + 2:step, :]
        delta = jnp.clip((4 * (q0 - p0) + (p1 - q1) + 4) >> 3, -tc, tc)
        cond = jnp.repeat(maskh, rows_per_edge, axis=1)
        c = c.at[step - 1:H - step:step, :].set(
            jnp.where(cond, jnp.clip(p0 + delta, 0, hi), p0))
        c = c.at[step:H - step + 1:step, :].set(
            jnp.where(cond, jnp.clip(q0 - delta, 0, hi), q0))
    return c


# ----------------------------------------------------------------- CLPF

def _constrain_j(diff, strength, shift):
    ad = jnp.abs(diff)
    mag = jnp.minimum(ad, jnp.maximum(0, strength - (ad >> shift)))
    return jnp.sign(diff) * mag


def clpf_pixel_mask(dd, width, height, plane, fb_size_log2, sub,
                    decision_bits=None):
    """Host: per-pixel CLPF application mask for one plane.

    Folds the per-fb allskip/decision logic and the per-block (8x8 luma /
    4x4 420-chroma) skip test, including the reference's plane-local
    deblock_data stride quirk (common_frame.c:1050,1074).  Returns a bool
    [ph, pw] array in plane resolution and the number of decision bits
    consumed.
    """
    psub = sub if plane != 0 else 0
    bs = 4 if (plane != 0 and sub) else 8
    ph, pw = height >> psub, width >> psub
    bstr = pw // MIN_PB_SIZE          # normative stride quirk
    nfh = (pw + (1 << fb_size_log2) - 1) >> fb_size_log2
    nfv = (ph + (1 << fb_size_log2) - 1) >> fb_size_log2

    mask = np.zeros((ph, pw), bool)
    consumed = 0
    for k in range(nfv):
        for l in range(nfh):
            xoff, yoff = l << fb_size_log2, k << fb_size_log2
            allskip = True
            for m in range((1 << fb_size_log2) // bs):
                for n in range((1 << fb_size_log2) // bs):
                    xpos, ypos = xoff + n * bs, yoff + m * bs
                    if xpos < pw and ypos < ph:
                        idx = (((ypos << psub) // MIN_PB_SIZE) * bstr +
                               ((xpos << psub) // MIN_PB_SIZE))
                        if dd.mode[idx] != MODE_SKIP:
                            allskip = False
            if allskip:
                continue
            if decision_bits is not None:
                bit = decision_bits[consumed]
                consumed += 1
                if not bit:
                    continue
            h = min(ph, (k + 1) << fb_size_log2) & ((1 << fb_size_log2) - 1)
            w = min(pw, (l + 1) << fb_size_log2) & ((1 << fb_size_log2) - 1)
            h += (not h) << fb_size_log2
            w += (not w) << fb_size_log2
            for m in range((h + bs - 1) // bs):
                for n in range((w + bs - 1) // bs):
                    xpos, ypos = xoff + n * bs, yoff + m * bs
                    sizex = min(pw - xpos, bs)
                    sizey = min(ph - ypos, bs)
                    idx = (((ypos << psub) // MIN_PB_SIZE) * bstr +
                           ((xpos << psub) // MIN_PB_SIZE))
                    if dd.mode[idx] == MODE_SKIP:
                        continue
                    mask[ypos:ypos + sizey, xpos:xpos + sizex] = True
    return mask, consumed


@partial(jax.jit, static_argnames=("strength", "damping"))
def clpf_plane(src: jax.Array, mask: jax.Array, strength: int,
               damping: int):
    """CLPF one plane on device (common_block.c:315-345).

    The per-block +-2 tap clamping only binds at frame borders (interior
    blocks read their neighbours' pre-pass pixels), so the whole plane is
    one edge-replicated 8-tap stencil, masked per pixel.
    """
    s = src.astype(jnp.int32)
    p = jnp.pad(s, 2, mode="edge")
    H, W = s.shape
    shift = damping - log2i(strength) if strength else 0

    def tap(dy, dx):
        return p[2 + dy:2 + dy + H, 2 + dx:2 + dx + W]

    X = s
    delta = (1 * _constrain_j(tap(-2, 0) - X, strength, shift) +
             3 * _constrain_j(tap(-1, 0) - X, strength, shift) +
             1 * _constrain_j(tap(0, -2) - X, strength, shift) +
             3 * _constrain_j(tap(0, -1) - X, strength, shift) +
             3 * _constrain_j(tap(0, 1) - X, strength, shift) +
             1 * _constrain_j(tap(0, 2) - X, strength, shift) +
             3 * _constrain_j(tap(1, 0) - X, strength, shift) +
             1 * _constrain_j(tap(2, 0) - X, strength, shift))
    d = (8 + delta - (delta < 0).astype(jnp.int32)) >> 4
    return jnp.where(mask, X + d, X)


# ----------------------------------------------------------------- CDEF

from ..tables import (CDEF_DIRECTIONS_X, CDEF_DIRECTIONS_Y, CDEF_PRI_TAPS,
                      CDEF_SEC_TAPS, CDEF_VERY_LARGE)


def _dir_projection_matrices():
    """One-hot (i,j)->bin maps for the 8 directional partial sums
    (common_block.c:94-130).  Shape [8, 64, 15] int32."""
    m = np.zeros((8, 64, 15), np.int32)
    for i in range(8):
        for j in range(8):
            p = i * 8 + j
            m[0, p, i + j] = 1
            m[1, p, i + j // 2] = 1
            m[2, p, i] = 1
            m[3, p, 3 + i - j // 2] = 1
            m[4, p, 7 + i - j] = 1
            m[5, p, 3 - i // 2 + j] = 1
            m[6, p, j] = 1
            m[7, p, i // 2 + j] = 1
    return m


_DIR_PROJ = _dir_projection_matrices()
_DIV_TABLE = np.array([0, 840, 420, 280, 210, 168, 140, 120, 105], np.int64)


def _log2i_j(v):
    """floor(log2(v)) for v>0 on device (int32)."""
    return 31 - jax.lax.clz(v.astype(jnp.int32))


@partial(jax.jit, static_argnames=("coeff_shift",))
def cdef_dirs(src: jax.Array, coeff_shift: int = 0):
    """Per-8x8-block direction + variance (common_block.c:94-162).

    src: [ph, pw] (multiple-of-8 dims; pad with anything first if not).
    Returns (dirs [ph//8, pw//8] int32, var same shape int64).
    """
    ph, pw = src.shape
    nby, nbx = ph // 8, pw // 8
    x = ((src.astype(jnp.int32) >> coeff_shift) - 128).reshape(nby, 8,
                                                               nbx, 8)
    # contract (i,j) straight out of the blocked 4D view: an explicit
    # [n,64] block transpose costs ~2ms at 1080p, the einsum ~0.02ms
    proj = jnp.asarray(_DIR_PROJ.reshape(8, 8, 8, 15))
    # [n, 8, 15] partial sums; values fit int32, costs need int64
    partial = (jnp.einsum("yixj,kijb->yxkb", x, proj)
               .reshape(nby * nbx, 8, 15).astype(jnp.int64))
    sq = partial * partial
    div = jnp.asarray(_DIV_TABLE)
    cost = []
    for k in (2, 6):
        cost.append((k, jnp.sum(sq[:, k, :8], axis=1) * div[8]))
    for k in (0, 4):
        c = sq[:, k, 7] * div[8]
        for i in range(7):
            c = c + (sq[:, k, i] + sq[:, k, 14 - i]) * div[i + 1]
        cost.append((k, c))
    for k in (1, 3, 5, 7):
        c = jnp.sum(sq[:, k, 3:8], axis=1) * div[8]
        for j in range(3):
            c = c + (sq[:, k, j] + sq[:, k, 10 - j]) * div[2 * j + 2]
        cost.append((k, c))
    costs = [None] * 8
    for k, c in cost:
        costs[k] = c
    call = jnp.stack(costs, axis=1)                    # [n, 8]
    # strictly-greater update -> first maximum wins ties, but never picks
    # index 0 unless cost[0] > 0 is false for all: best stays 0 when all
    # costs <= 0 (they are sums of squares, >= 0, so argmax matches)
    best = jnp.argmax(call, axis=1)
    bc = jnp.max(call, axis=1)
    opp = jnp.take_along_axis(call, ((best + 4) & 7)[:, None], 1)[:, 0]
    var = (bc - opp) >> 10
    return (best.astype(jnp.int32).reshape(nby, nbx),
            var.reshape(nby, nbx))


def _cdef_taps_for_dir(p, d, H, W):
    """All 12 tap planes for direction d from padded plane p."""
    def tap(dy, dx):
        return p[2 + dy:2 + dy + H, 2 + dx:2 + dx + W]
    pri, sec = [], []
    for k in range(2):
        dy = int(CDEF_DIRECTIONS_Y[d, k])
        dx = int(CDEF_DIRECTIONS_X[d, k])
        pri.append((k, tap(dy, dx), tap(-dy, -dx)))
        for dirn in ((d + 2) & 7, (d + 6) & 7):
            sy = int(CDEF_DIRECTIONS_Y[dirn, k])
            sx = int(CDEF_DIRECTIONS_X[dirn, k])
            sec.append((k, tap(sy, sx), tap(-sy, -sx)))
    return pri, sec


@partial(jax.jit, static_argnames=("bs", "plane", "pri_damping",
                                   "sec_damping", "coeff_shift"))
def cdef_plane(src: jax.Array, dirs: jax.Array, var: jax.Array,
               level: jax.Array, sec_strength: jax.Array, mask: jax.Array,
               bs: int, plane: int, pri_damping: int, sec_damping: int,
               coeff_shift: int = 0):
    """CDEF one plane on device (common_block.c:224-279 per block; frame
    drive common_frame.c:826-1002 with VERY_LARGE only at frame borders).

    src: [ph, pw]; dirs/var: per-luma-8x8-block maps [nby, nbx] (chroma
    reuses luma's); level/sec_strength: per-block maps (fb-constant);
    mask: [ph, pw] bool where the filter applies.  bs: block size in this
    plane (8 luma, 4 for 420 chroma).  Dense: all 8 direction variants are
    computed and selected per block - the TPU-friendly alternative to
    per-block control flow.
    """
    ph, pw = src.shape
    s = src.astype(jnp.int32)
    p = jnp.pad(s, 2, constant_values=CDEF_VERY_LARGE)

    def expand(m):
        return jnp.repeat(jnp.repeat(m, bs, axis=0), bs, axis=1)

    lvl = expand(level)[:ph, :pw]
    varx = expand(var)[:ph, :pw].astype(jnp.int32)
    # adjust_strength (common_frame.h:61-65), luma only
    if plane == 0:
        v6 = varx >> 6
        i = jnp.minimum(jnp.where(v6 > 0, _log2i_j(jnp.maximum(v6, 1)), 0),
                        12)
        adj = jnp.where(varx != 0, (lvl * (4 + i) + 8) >> 4, 0)
    else:
        adj = lvl
    sec = expand(sec_strength)[:ph, :pw]
    dirmap = expand(dirs)[:ph, :pw]
    dir_eff = jnp.where(lvl > 0, dirmap, 0)

    # strengths at coeff_shift scale; per-pixel constrain shifts
    pri_t = adj << coeff_shift
    sec_t = sec << coeff_shift
    pd = jnp.where(adj > 0,
                   jnp.maximum(_log2i_j(jnp.maximum(adj, 1)), pri_damping),
                   pri_damping) + coeff_shift
    pri_shift = pd - _log2i_j(jnp.maximum(pri_t, 1))
    sec_shift = (sec_damping + coeff_shift) - _log2i_j(jnp.maximum(sec_t, 1))

    def constrain(diff, threshold, shift):
        ad = jnp.abs(diff)
        mag = jnp.minimum(ad, jnp.maximum(0, threshold - (ad >> shift)))
        return jnp.where(threshold > 0, jnp.sign(diff) * mag, 0)

    tap0 = jnp.where((pri_t >> coeff_shift) & 1,
                     int(CDEF_PRI_TAPS[1][0]), int(CDEF_PRI_TAPS[0][0]))
    tap1 = jnp.where((pri_t >> coeff_shift) & 1,
                     int(CDEF_PRI_TAPS[1][1]), int(CDEF_PRI_TAPS[0][1]))
    pri_tap = (tap0, tap1)
    sec_tap = (int(CDEF_SEC_TAPS[0][0]), int(CDEF_SEC_TAPS[0][1]))

    total = jnp.zeros_like(s)
    mx = s
    mn = s
    for d in range(8):
        pri, secs = _cdef_taps_for_dir(p, d, ph, pw)
        t = jnp.zeros_like(s)
        dmx = s
        dmn = s
        for k, a, b in pri:
            t = t + pri_tap[k] * (constrain(a - s, pri_t, pri_shift) +
                                  constrain(b - s, pri_t, pri_shift))
            dmx = jnp.maximum(dmx, jnp.where(a == CDEF_VERY_LARGE, dmx, a))
            dmx = jnp.maximum(dmx, jnp.where(b == CDEF_VERY_LARGE, dmx, b))
            dmn = jnp.minimum(dmn, jnp.minimum(a, b))
        for k, a, b in secs:
            t = t + sec_tap[k] * (constrain(a - s, sec_t, sec_shift) +
                                  constrain(b - s, sec_t, sec_shift))
            dmx = jnp.maximum(dmx, jnp.where(a == CDEF_VERY_LARGE, dmx, a))
            dmx = jnp.maximum(dmx, jnp.where(b == CDEF_VERY_LARGE, dmx, b))
            dmn = jnp.minimum(dmn, jnp.minimum(a, b))
        sel = dir_eff == d
        total = jnp.where(sel, t, total)
        mx = jnp.where(sel, dmx, mx)
        mn = jnp.where(sel, dmn, mn)

    y = s + ((8 + total - (total < 0).astype(jnp.int32)) >> 4)
    out = jnp.maximum(mn, jnp.minimum(mx, y))
    return jnp.where(mask, out, s)


@partial(jax.jit, static_argnames=("plane", "bs", "pri_damping",
                                   "sec_damping", "coeff_shift"))
def cdef_search_sums(src, org, dirs, var, levels, secs, plane: int,
                     bs: int, pri_damping: int, sec_damping: int,
                     coeff_shift: int):
    """Per-strength-candidate CDEF trial sums for the encoder search
    (enc/encode_frame.c:228-419): filter the whole plane once per
    candidate (lax.map over the strength list) and reduce to per-block
    sums, so the host only assembles the tiny mse tables.

    src/org: [ph,pw] (ph,pw multiples of bs); dirs/var: per-block grids
    [ph/bs, pw/bs]; levels/secs: [G] int32 candidate strengths.
    Returns luma: [G, 3, nby, nbx] int64 (sum_d, sum_d^2, sum_d*s);
    chroma: [G, nby, nbx] int64 SSD."""
    ph, pw = src.shape
    nby, nbx = ph // bs, pw // bs
    ones = jnp.ones((ph, pw), bool)
    o64 = org.astype(jnp.int64)

    def bsum(a):
        return a.reshape(nby, bs, nbx, bs).sum(axis=(1, 3))

    def body(ls):
        lvl_s, sec_s = ls
        lvl = jnp.full(dirs.shape, lvl_s, jnp.int32)
        sec = jnp.full(dirs.shape, sec_s, jnp.int32)
        out = cdef_plane(src, dirs, var, lvl, sec, ones, bs, plane,
                         pri_damping, sec_damping,
                         coeff_shift).astype(jnp.int64)
        if plane == 0:
            return jnp.stack([bsum(out), bsum(out * out), bsum(out * o64)])
        d = out - o64
        return bsum(d * d)

    return jax.lax.map(body, (levels, secs))


def cdef_block_maps(dd, presets_per_fb, width_l, height_l, plane, sub):
    """Host: per-block level/sec_strength maps + application mask for one
    plane (frame drive common_frame.c:826-1002).  Block grid is the luma
    8x8 grid (chroma blocks are co-located).  Returns (level [nby,nbx],
    sec [nby,nbx], mask [ph,pw] bool)."""
    from ..spec.filters import cdef_allskip
    fb_size_log2 = 6
    psub = sub if plane != 0 else 0
    bs = 4 if psub else 8
    ph, pw = height_l >> psub, width_l >> psub
    nby, nbx = (height_l + 7) // 8, (width_l + 7) // 8
    level = np.zeros((nby, nbx), np.int32)
    sec = np.zeros((nby, nbx), np.int32)
    mask = np.zeros((ph, pw), bool)
    nfh = (width_l + (1 << fb_size_log2) - 1) >> fb_size_log2
    nfv = (height_l + (1 << fb_size_log2) - 1) >> fb_size_log2
    ci = 0
    for k in range(nfv):
        for l in range(nfh):
            xoff, yoff = l << fb_size_log2, k << fb_size_log2
            pr = presets_per_fb[ci]
            allskip = cdef_allskip(xoff, yoff, width_l, height_l, dd,
                                   fb_size_log2)
            hl = min(height_l, (k + 1) << fb_size_log2) & 63
            wl = min(width_l, (l + 1) << fb_size_log2) & 63
            hl += (not hl) << 6
            wl += (not wl) << 6
            if not allskip:
                for m in range((hl + bs - 1) >> (log2i(bs) + psub)):
                    for n in range((wl + bs - 1) >> (log2i(bs) + psub)):
                        by = yoff // 8 + m
                        bx = xoff // 8 + n
                        level[by, bx] = pr["level"]
                        sec[by, bx] = (pr["sec_strength"] +
                                       (pr["sec_strength"] == 3))
                        idx = (((yoff + m * 8) // MIN_PB_SIZE) * dd.bs +
                               ((xoff + n * 8) // MIN_PB_SIZE))
                        if dd.mode[idx] == MODE_SKIP:
                            continue
                        xpos = (xoff >> psub) + n * bs
                        ypos = (yoff >> psub) + m * bs
                        sizex = min(pw - xpos, bs)
                        sizey = min(ph - ypos, bs)
                        mask[ypos:ypos + sizey, xpos:xpos + sizex] = True
            ci += 1
    return level, sec, mask


# ------------------------------------------------------- fused frame pass

@partial(jax.jit, static_argnames=("qp", "qpc", "bd", "sub", "mono",
                                   "deblocking", "cdef_damping", "cs",
                                   "s_y", "s_u", "s_v", "qpclpf"))
def filters_exec(y, u, v, mv_, mh_, cmv, cmh, lv0, sec0, m0, lv1, sec1,
                 m1, m2, clpf_my, clpf_mu, clpf_mv, qp: int, qpc: int,
                 bd: int, sub: int, mono: bool, deblocking: bool,
                 cdef_damping: int, cs: int, s_y: int, s_u: int, s_v: int,
                 qpclpf: int):
    """Whole in-loop chain (deblock -> CDEF -> CLPF) in ONE dispatch.

    All block-metadata masks and the stream-read parameters are host
    inputs; returns one packed int16 buffer [H + Hc, W] (luma on top,
    u|v side by side) so the frame costs a single device->host pull."""
    H, W = y.shape
    y = y.astype(jnp.int32)
    if not mono:
        u = u.astype(jnp.int32)
        v = v.astype(jnp.int32)

    if deblocking:
        y = deblock_plane_y(y, mv_, mh_, qp, bd)
        if not mono:
            u = deblock_plane_uv(u, cmv, cmh, qpc, sub, bd)
            v = deblock_plane_uv(v, cmv, cmh, qpc, sub, bd)

    dirs, var = cdef_dirs(y, cs)
    y = cdef_plane(y, dirs, var, lv0, sec0, m0, 8, 0, cdef_damping,
                   cdef_damping, cs)
    if not mono:
        bsc = 4 if sub else 8
        u = cdef_plane(u, dirs, var, lv1, sec1, m1, bsc, 1,
                       cdef_damping - 1, cdef_damping - 1, cs)
        v = cdef_plane(v, dirs, var, lv1, sec1, m2, bsc, 2,
                       cdef_damping - 1, cdef_damping - 1, cs)

    if s_y:
        y = clpf_plane(y, clpf_my, (s_y + (s_y == 3)) << cs,
                       bd - 4 + qpclpf)
    if not mono:
        if s_u:
            u = clpf_plane(u, clpf_mu, (s_u + (s_u == 3)) << cs,
                           bd - 5 + qpclpf)
        if s_v:
            v = clpf_plane(v, clpf_mv, (s_v + (s_v == 3)) << cs,
                           bd - 5 + qpclpf)

    if mono:
        return y.astype(jnp.int16)
    # pack into one [H + Hc', W] buffer: u|v side by side (4:2:0) or
    # stacked (4:4:4) so one pull returns the whole frame
    uv = (jnp.concatenate([u, v], axis=1) if sub
          else jnp.concatenate([u, v], axis=0))
    return jnp.concatenate([y.astype(jnp.int16),
                            uv.astype(jnp.int16)], axis=0)


@partial(jax.jit, static_argnames=("qp", "qpc", "bd", "sub", "mono"))
def deblock_exec(y, u, v, mv_, mh_, cmv, cmh, qp: int, qpc: int, bd: int,
                 sub: int, mono: bool):
    """Deblock all three planes in one dispatch; packed int16 return
    (encoder tail uses this; the decoder's full chain is filters_exec)."""
    y = deblock_plane_y(y.astype(jnp.int32), mv_, mh_, qp, bd)
    if mono:
        return y.astype(jnp.int16)
    u = deblock_plane_uv(u.astype(jnp.int32), cmv, cmh, qpc, sub, bd)
    v = deblock_plane_uv(v.astype(jnp.int32), cmv, cmh, qpc, sub, bd)
    uv = (jnp.concatenate([u, v], axis=1) if sub
          else jnp.concatenate([u, v], axis=0))
    return jnp.concatenate([y.astype(jnp.int16),
                            uv.astype(jnp.int16)], axis=0)
