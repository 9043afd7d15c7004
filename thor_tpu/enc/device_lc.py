"""Device (TPU) encoder decision pass - LDB low-complexity path.

Implements the wavefront superblock scheduler from docs/ENCODER_TPU_PLAN.md:
the full RDO quadtree of enc/encode_block.c:2401 (reference) is evaluated on
device as a static z-order "node program" per superblock, batched over the
superblocks of an anti-diagonal (dependencies: left, top-left, top,
top-right), with every decision - early-skip, skip/merge/inter/intra mode
costs, motion search trajectories, quadtree split compares - replicated
bit-exactly.  The host then replays only the winning syntax through the
ordinary BitWriter (no numerics), producing a bitstream byte-identical with
the sequential encoder.

Scope (this module): P and I frames of the LDB low-complexity preset family:
encoder_speed 2, no tb/pb split, no bipred, no intra_rdo (4 intra modes),
early-skip on, 4:2:0, 8-bit, fixed QP.  Matches the decision flow of
/root/reference/enc/encode_block.c:517 (motion_estimate), :1835
(mode_decision_rdo), :2231 (check_early_skip_block), :2401 (process_block).

Structure:
  - node program: static pre-order walk with fused 16-subtrees
  - per-lane state: local rec tiles (SB + halo), local deblock-data grid,
    mvcand accumulator, per-depth cost stack
  - one jitted megastep per wavefront diagonal (lax.scan over the program,
    lax.switch over node kinds); decision records accumulate on device and
    are pulled once per frame
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..tables import CHROMA_QP, GQUANT, log2i
from ..ops.enc_kernels import (sad_batch, ssd_batch, widesad_batch,
                               fasthalf_batch, fastquarter_batch)
from ..ops.transform import (fwd_transform_batch, dequantize_batch,
                             inv_transform_batch, reconstruct_batch)
from ..ops.quant import quantize_batch
from ..ops.coeff_cost import coeff_bits_batch
from ..ops import intra_batch as IB
from ..tables import ZIGZAG

MAX_MV_EXT = 144
MAX_UINT32 = 1 << 31          # the encoder's MAX_UINT32 sentinel
MODE_SKIP, MODE_INTRA, MODE_INTER, MODE_BIPRED, MODE_MERGE = 0, 1, 2, 3, 4
I_FRAME, P_FRAME, B_FRAME = 0, 1, 2
SB = 128                       # log2_sb_size 7 (LDB defaults)
NCAND = 64                     # mvcand slots per ref

# ---------------------------------------------------------------------------
# node program
# ---------------------------------------------------------------------------
# Node ids: z-order enumeration; sizes 128,64,32,16,8.
# slots: 128 -> id 0; 64 -> 1+q64; 32 -> 5 + q64*4 + q32 ; 16 -> 21 + ...;
# 8 -> 85 + ...
N_OFF = {128: 0, 64: 1, 32: 5, 16: 21, 8: 85}
N_NODES = 341

K_E128, K_E64, K_E32, K_D32, K_D64, K_D128, K_16SUB = range(7)


def node_id(size, oy, ox):
    """z-order node slot for a block at SB-local offset (oy, ox)."""
    if size == 128:
        return 0
    # index within depth by z-order of ancestors
    idx = 0
    s = 128
    y, x = oy, ox
    while s > size:
        s //= 2
        q = (y // s % 2) * 2 + (x // s % 2)
        idx = idx * 4 + q
    return N_OFF[size] + idx


# quadtree recursion order in the reference is (ypos,xpos), (ypos+ns,xpos),
# (ypos,xpos+ns), (ypos+ns,xpos+ns) - i.e. NW, SW, NE, SE (column-major)
# (enc/encode_block.c:2505-2512).  Keep exactly: it orders every
# neighbour-state dependency.
def child_offsets(size):
    h = size // 2
    return [(0, 0), (h, 0), (0, h), (h, h)]


def build_program():
    """The static step program for one SB (LC path, fused 16-subtrees).

    Returns list of (kind, oy, ox).  106 steps.
    """
    prog = []

    def walk(size, oy, ox):
        if size == 16:
            prog.append((K_16SUB, oy, ox))
            return
        prog.append(({128: K_E128, 64: K_E64, 32: K_E32}[size], oy, ox))
        for dy, dx in child_offsets(size):
            walk(size // 2, oy + dy, ox + dx)
        prog.append(({128: K_D128, 64: K_D64, 32: K_D32}[size], oy, ox))

    walk(128, 0, 0)
    assert len(prog) == 106
    return prog


# ---------------------------------------------------------------------------
# VLC length helpers (jnp, vectorized)
# ---------------------------------------------------------------------------

def _log2i_j(v):
    return 31 - jax.lax.clz(jnp.maximum(v, 1).astype(jnp.int32))


def len_vlc_low(n: int, cn):
    """Length of put_vlc(n, cn) for tables 0..5 (bitstream.py:119-125)."""
    e = 5
    thr = e * (1 << n)
    code = cn - thr + (1 << n)
    return jnp.where(cn < thr, 1 + n + (cn >> n),
                     (e - n) + 1 + 2 * _log2i_j(code))


def len_vlc7(cn):
    """put_vlc(7, cn) length: 0->2, 1->3, 2..3->4, else table 3 on cn+4."""
    return jnp.where(cn == 0, 2,
                     jnp.where(cn == 1, 3,
                               jnp.where(cn < 4, 4, len_vlc_low(3, cn + 4))))


def len_unary_hi(n: int, cn):
    """put_vlc(n, cn) for 11<=n<=18: cn==n-10 -> n-10 bits else cn+1."""
    return jnp.where(cn == n - 10, n - 10, cn + 1)


def mv_bits_exact(dy, dx):
    """write_mv length (enc/write_bits.c:123-143)."""
    ax, ay = jnp.abs(dx), jnp.abs(dy)
    return (len_vlc7(ax) + (ax > 0) + len_vlc7(ay) + (ay > 0))


def quote_mv_bits_j(dy, dx):
    """quote_mv_bits (enc/encode_block.c:467-515) for ME cost."""
    def ln(m):
        return jnp.where(m < 1, 2,
               jnp.where(m < 2, 4,
               jnp.where(m < 4, 5,
               jnp.where(m < 36, 6 + ((m - 4) >> 3),
                         11 + ((m - 36) >> 4)))))
    return ln(jnp.abs(dx)) + ln(jnp.abs(dy))


def mv_cost_j(sqrt_lam, dy, dx):
    bits = quote_mv_bits_j(dy, dx)
    return jnp.floor(sqrt_lam * bits.astype(jnp.float64) + 0.5).astype(
        jnp.int64)


def super_mode_bits(mode_code_args, size: int, num_ref: int,
                    encode_this: bool):
    """Length of write_super_mode for a non-split block at LC
    (enc/write_bits.c:257-358; interp_ref=0, bipred off).

    mode_code_args: (mode, ref_idx0, ctx_index) [L] arrays.
    Returns bits [L] int32.  encode_this False -> 1 bit.
    """
    mode, ref_idx0, ctx_index = mode_code_args
    if not encode_this:
        return jnp.ones_like(mode)
    split_possible = 1 if size > 8 else 0
    maxbit = 2 + num_ref + split_possible        # bipred_possible = 0
    code = jnp.where(mode == MODE_SKIP, 0,
           jnp.where((mode == MODE_INTER) & (ref_idx0 == 0), 2,
           jnp.where(mode == MODE_MERGE, 3,
           jnp.where(mode == MODE_BIPRED, 4,
           jnp.where(mode == MODE_INTRA, 5, 5 + ref_idx0)))))
    code = jnp.where(code > 4, code - 1, code)   # bipred impossible
    if not split_possible:
        code = jnp.where(code > 1, code - 1, code)
    ctx_hit = (ctx_index == 2) | (ctx_index > 3)
    if size > 8:
        code = jnp.where(ctx_hit & (code < 4), (code + 3) % 4, code)
    return len_unary_hi(10 + maxbit, code).astype(jnp.int32)


def super_mode_bits_split(ctx_index, size: int, num_ref: int):
    """Split super-mode length (vlc code 1, context-reordered)."""
    split_possible = 1 if size > 8 else 0
    maxbit = 2 + num_ref + split_possible
    ctx_hit = (ctx_index == 2) | (ctx_index > 3)
    code = jnp.where(ctx_hit, (1 + 3) % 4, 1)
    return len_unary_hi(10 + maxbit, code).astype(jnp.int32)


def super_mode_bits_i(size: int, encode_this: bool):
    """I-frame super mode: 1 bit if size > 8 (or split)."""
    return 1 if (encode_this and size > 8) else 0


CBP_TABLE = np.array([1, 0, 5, 2, 6, 3, 7, 4], np.int32)


def cbp_bits(cbp_y, cbp_u, cbp_v, ctx_cbp, merge):
    """CBP code length for the no-tb-split 4:2:0 path
    (enc/write_bits.c:500-525, max_num_tb_part == 1)."""
    cbp = ((cbp_y > 0).astype(jnp.int32) + ((cbp_u > 0) << 1) +
           ((cbp_v > 0) << 2))
    code = jnp.asarray(CBP_TABLE)[cbp]
    code_m = jnp.where(code == 1, 7, jnp.where(code > 1, code - 1, code))
    code_n = jnp.where((ctx_cbp == 0) & (code < 2), 1 - code, code)
    code = jnp.where(merge, code_m, code_n)
    return len_vlc_low(0, code).astype(jnp.int32)


# intra mode bits at <=4 modes: put_flc(2, .) = 2 bits
INTRA_MODE_BITS = 2


# ---------------------------------------------------------------------------
# lane-local grid helpers
# ---------------------------------------------------------------------------

def _gat(arr2d_l, iy, ix):
    """arr2d_l: [L, H, W]; iy/ix: [L] -> [L] values."""
    return jnp.take_along_axis(
        jnp.take_along_axis(arr2d_l, iy[:, None, None], axis=1)[:, 0],
        ix[:, None], axis=1)[:, 0]


def _win(arr2d_l, y0, x0, h: int, w: int):
    """Per-lane windows [L,h,w] at (y0[l], x0[l]) from [L,H,W]."""
    def f(a, y, x):
        return jax.lax.dynamic_slice(a, (y, x), (h, w))
    return jax.vmap(f)(arr2d_l, y0.astype(jnp.int32), x0.astype(jnp.int32))


def _wins(arr2d, y0, x0, h: int, w: int):
    """Windows [..., h, w] from a shared 2D array; y0/x0 any shape."""
    sh = y0.shape

    def f(y, x):
        return jax.lax.dynamic_slice(arr2d, (y, x), (h, w))
    return jax.vmap(f)(y0.reshape(-1).astype(jnp.int32),
                       x0.reshape(-1).astype(jnp.int32)).reshape(
        sh + (h, w))


def _wins3(arr3d, k, y0, x0, h: int, w: int):
    """Windows from a stacked variant array [V,H,W] at (k, y0, x0)."""
    sh = y0.shape

    def f(kk, y, x):
        return jax.lax.dynamic_slice(arr3d, (kk, y, x), (1, h, w))[0]
    return jax.vmap(f)(k.reshape(-1).astype(jnp.int32),
                       y0.reshape(-1).astype(jnp.int32),
                       x0.reshape(-1).astype(jnp.int32)).reshape(
        sh + (h, w))


def _upd(arr_l, y0, x0, patch):
    """Per-lane dynamic_update_slice into [L,H,W]."""
    def f(a, p, y, x):
        return jax.lax.dynamic_update_slice(a, p.astype(a.dtype), (y, x))
    return jax.vmap(f)(arr_l, patch, y0.astype(jnp.int32),
                       x0.astype(jnp.int32))



def _ds(arr, idxs, sizes):
    """dynamic_slice with uniform int32 index casting."""
    idxs = tuple(jnp.asarray(i, jnp.int32) for i in idxs)
    return jax.lax.dynamic_slice(arr, idxs, sizes)


def _dus(arr, patch, idxs):
    """dynamic_update_slice with uniform int32 index casting."""
    idxs = tuple(jnp.asarray(i, jnp.int32) for i in idxs)
    return jax.lax.dynamic_update_slice(arr, patch, idxs)


def trunc_div4(v):
    """C truncation toward zero of v/4."""
    return jnp.where(v >= 0, v >> 2, -((-v) >> 2))


def clip_mv_j(mvy, mvx, ypos, xpos, fw: int, fh: int, bw, bh, sign: int = 0):
    """inter_prediction.c:51-63 vectorized (sign static)."""
    if sign:
        mvy, mvx = -mvy, -mvx
    mvy = jnp.where(ypos + trunc_div4(mvy) < -MAX_MV_EXT,
                    4 * (-MAX_MV_EXT - ypos), mvy)
    mvy = jnp.where(ypos + trunc_div4(mvy) + bh > fh + MAX_MV_EXT,
                    4 * (fh + MAX_MV_EXT - ypos - bh), mvy)
    mvx = jnp.where(xpos + trunc_div4(mvx) < -MAX_MV_EXT,
                    4 * (-MAX_MV_EXT - xpos), mvx)
    mvx = jnp.where(xpos + trunc_div4(mvx) + bw > fw + MAX_MV_EXT,
                    4 * (fw + MAX_MV_EXT - xpos - bw), mvx)
    if sign:
        mvy, mvx = -mvy, -mvx
    return mvy, mvx


# ---------------------------------------------------------------------------
# motion compensation via pre-filtered variant stacks
# ---------------------------------------------------------------------------

def make_luma_variants(ref_full, bitdepth: int = 8):
    """16 quarter-pel variants of a padded plane (mc.py layout), int16."""
    from ..ops.mc import _luma_variants
    return _luma_variants(ref_full.astype(jnp.int32), 0,
                          bitdepth).astype(jnp.int16)


def make_chroma_variants(ref_full_c, bitdepth: int = 8):
    from ..tables import COEFFS_CHROMA
    r = ref_full_c.astype(jnp.int32)
    hp, wp = r.shape
    maxval = (1 << bitdepth) - 1
    horiz = []
    for g in range(8):
        t = jnp.zeros((hp, wp - 3), jnp.int32)
        for m in range(4):
            c = int(COEFFS_CHROMA[g][m])
            if c:
                t = t + c * r[:, m:wp - 3 + m]
        horiz.append(t)
    out = []
    for f in range(8):
        for g in range(8):
            if f == 0 and g == 0:
                out.append(r[1:hp - 2, 1:wp - 2])
                continue
            t = jnp.zeros((hp - 3, wp - 3), jnp.int32)
            for m in range(4):
                c = int(COEFFS_CHROMA[f][m])
                if c:
                    t = t + c * horiz[g][m:hp - 3 + m]
            out.append(jnp.clip((t + 2048) >> 12, 0, maxval))
    return jnp.stack(out).astype(jnp.int16)


# ---------------------------------------------------------------------------
# local deblock-data derivation (per-lane [L,34,34] grids, origin (1,1))
# ---------------------------------------------------------------------------

DD_FIELDS = ("mode", "size", "tb", "pb", "cbp_y", "cbp_u", "cbp_v",
             "mv0y", "mv0x", "mv1y", "mv1x", "ref0", "ref1", "bip")


def _avail_flags(ypos, xpos, size: int, fw: int, fh: int):
    up = ypos > 0
    left = xpos > 0
    ur = (ypos > 0) & (xpos + size < fw)
    size2 = size
    while size2 < SB:
        bad = (((ypos % (size2 << 1)) == size2) &
               ((xpos % size2) == (size2 - size)))
        ur = ur & ~bad
        size2 *= 2
    dl = (xpos > 0) & (ypos + size < fh)
    bad = ((ypos % SB) == (SB - size)) & ((xpos % SB) == 0)
    dl = dl & ~bad
    size2 = 2 * size
    while size2 <= SB:
        bad = ((ypos % size2) == (size2 - size)) & ((xpos % size2) > 0)
        dl = dl & ~bad
        size2 *= 2
    return up, ur, left, dl


def _cell(grid, cy, cx):
    """grid [L,H,W] at scalar (possibly traced) cell coords -> [L]."""
    Lb = grid.shape[0]
    return _ds(grid, (0, cy, cx), (Lb, 1, 1))[:, 0, 0]


def mv_pred_local(st, oy, ox, size: int, ypos, xpos, fw: int, fh: int):
    """Median MVP from the per-lane local dd grids
    (inter_prediction.c:413-526).  oy/ox: scalar SB-local offsets."""
    bsz = size // 4
    by, bx = 1 + oy // 4, 1 + ox // 4          # local grid coords (scalar)
    U, UR, Lv, DL = _avail_flags(ypos, xpos, size, fw, fh)
    gy, gx = st["dd_mv0y"], st["dd_mv0x"]

    def cell(dy, dx):
        return (_cell(gy, by + dy, bx + dx), _cell(gx, by + dy, bx + dx))

    up0 = cell(-1, 0)
    up1 = cell(-1, (bsz - 1) // 2)
    up2 = cell(-1, bsz - 1)
    left0 = cell(0, -1)
    left1 = cell((bsz - 1) // 2, -1)
    left2 = cell(bsz - 1, -1)
    downleft = cell(bsz, -1)
    upright = cell(-1, bsz)
    upleft = cell(-1, -1)
    z = jnp.zeros_like(up0[0])
    zero = (z, z)
    cases = [
        ((U & ~UR & ~Lv & ~DL), (up0, up1, up2)),
        ((U & UR & ~Lv & ~DL), (up0, up2, upright)),
        ((~U & ~UR & Lv & ~DL), (left0, left1, left2)),
        ((U & ~UR & Lv & ~DL), (upleft, up2, left2)),
        ((U & UR & Lv & ~DL), (up0, upright, left2)),
        ((~U & ~UR & Lv & DL), (left0, left2, downleft)),
        ((U & ~UR & Lv & DL), (up2, left0, downleft)),
        ((U & UR & Lv & DL), (up0, upright, left0)),
    ]
    mva, mvb, mvc = zero, zero, zero
    for cond, (a, b, c) in cases:
        mva = (jnp.where(cond, a[0], mva[0]), jnp.where(cond, a[1], mva[1]))
        mvb = (jnp.where(cond, b[0], mvb[0]), jnp.where(cond, b[1], mvb[1]))
        mvc = (jnp.where(cond, c[0], mvc[0]), jnp.where(cond, c[1], mvc[1]))

    def median(a, b, c):
        return jnp.where(a < b, jnp.minimum(b, jnp.maximum(a, c)),
                         jnp.minimum(a, jnp.maximum(b, c)))

    return (median(mva[0], mvb[0], mvc[0]).astype(jnp.int32),
            median(mva[1], mvb[1], mvc[1]).astype(jnp.int32))


def two_cands_local(st, oy, ox, size: int, ypos, xpos, fw: int, fh: int):
    """Skip/merge candidates from local dd (inter_prediction.c:565-679).
    Returns cand [L,2,7] int32 and count [L]."""
    bsz = size // 4
    by, bx = 1 + oy // 4, 1 + ox // 4
    up = ypos > 0
    left = xpos > 0
    ur = _avail_flags(ypos, xpos, size, fw, fh)[1]

    l2_dy = jnp.where(ypos + size > fh, 0, bsz - 1)
    u2_dx = jnp.where(xpos + size > fw, 0, bsz - 1)

    def pred_at(cy, cx):
        return jnp.stack([_cell(st["dd_mv0y"], cy, cx),
                          _cell(st["dd_mv0x"], cy, cx),
                          _cell(st["dd_mv1y"], cy, cx),
                          _cell(st["dd_mv1x"], cy, cx),
                          _cell(st["dd_ref0"], cy, cx),
                          _cell(st["dd_ref1"], cy, cx),
                          _cell(st["dd_bip"], cy, cx)],
                         axis=-1).astype(jnp.int32)

    def pred_dyn(cy, cx):
        """cy/cx [L] dynamic per-lane cell coords."""
        fields = []
        for f in ("dd_mv0y", "dd_mv0x", "dd_mv1y", "dd_mv1x", "dd_ref0",
                  "dd_ref1", "dd_bip"):
            fields.append(_gat(st[f], cy, cx))
        return jnp.stack(fields, axis=-1).astype(jnp.int32)

    Lanes = st["dd_mv0y"].shape[0]
    c_left2 = pred_dyn(jnp.full((Lanes,), by, jnp.int32) + l2_dy,
                       jnp.full((Lanes,), bx - 1, jnp.int32))
    c_up2 = pred_dyn(jnp.full((Lanes,), by - 1, jnp.int32),
                     jnp.full((Lanes,), bx, jnp.int32) + u2_dx)
    c_upright = pred_at(by - 1, bx + bsz)
    zero = jnp.zeros_like(c_left2)
    c0 = jnp.where(left[:, None], c_left2, zero)
    c1 = jnp.where(ur[:, None], c_upright,
                   jnp.where(up[:, None], c_up2, zero))
    eq6 = jnp.all(c0[:, :6] == c1[:, :6], axis=1)
    dup = eq6 & ((c0[:, 6] == c1[:, 6]) | (c1[:, 6] == -1))
    n = jnp.where(dup, 1, 2).astype(jnp.int32)
    return jnp.stack([c0, c1], axis=1), n


def contexts_local(st, oy: int, ox: int, size: int, ypos, xpos, fw: int,
                   fh: int, enable: int):
    """find_block_contexts (common/common_block.c:283-303) on local dd."""
    by, bx = 1 + oy // 4, 1 + ox // 4
    ok = (ypos >= 8) & (xpos >= 8) & (ypos + size < fh) & (xpos + size < fw)
    if not enable:
        ok = jnp.zeros_like(ypos, dtype=bool)
    s_up = st["dd_size"][:, by - 1, bx].astype(jnp.int32)
    s_left = st["dd_size"][:, by, bx - 1].astype(jnp.int32)
    cyu = st["dd_cbp_y"][:, by - 1, bx]
    cyl = st["dd_cbp_y"][:, by, bx - 1]
    cuu = st["dd_cbp_u"][:, by - 1, bx]
    cul = st["dd_cbp_u"][:, by, bx - 1]
    cvu = st["dd_cbp_v"][:, by - 1, bx]
    cvl = st["dd_cbp_v"][:, by, bx - 1]
    split = (s_up < size).astype(jnp.int32) + (s_left < size)
    cbp1 = (cyu > 0).astype(jnp.int32) + (cyl > 0)
    cbp2 = (((cyu > 0) | (cuu > 0) | (cvu > 0)).astype(jnp.int32) +
            ((cyl > 0) | (cul > 0) | (cvl > 0)))
    m1 = jnp.full_like(split, -1)
    return (jnp.where(ok, split, m1), jnp.where(ok, cbp1, m1),
            jnp.where(ok, 3 * split + cbp2, m1))


# ---------------------------------------------------------------------------
# motion estimation (lockstep, LC fast path), batched candidate probes
# ---------------------------------------------------------------------------

def me_lc(org, ref_stack, ref_idx, pad: int, ypos, xpos, size: int,
          mvp_y, mvp_x, sqrt_lam, cand_y, cand_x, cand_n, fw: int,
          fh: int):
    """Reference motion_estimate (enc/encode_block.c:517-711), LC path:
    candidate stage (+widesad at 16) -> hexagon (sizes<=16) -> fast
    half/quarter-pel.  sign=0 (P frames).  org [L,s,s] int32; ref_stack
    [R,Hp,Wp] with per-lane ref_idx [L]; cand_* [L,NCAND]; returns
    (sad [L] i64, mv_y, mv_x [L] i32)."""
    Lb = org.shape[0]
    y0 = pad + ypos
    x0 = pad + xpos
    org = org.astype(jnp.int32)

    min_sad = jnp.full((Lb,), MAX_UINT32, jnp.int64)
    opt_y = jnp.zeros((Lb,), jnp.int32)
    opt_x = jnp.zeros((Lb,), jnp.int32)

    # ---- candidate stage (:575-605): all NCAND probes in one gather ----
    cy = cand_y << 2
    cx = cand_x << 2
    cy, cx = clip_mv_j(cy, cx, ypos[:, None], xpos[:, None], fw, fh,
                       size, size)
    wy = y0[:, None] + (cy >> 2)
    rsel = jnp.broadcast_to(ref_idx[:, None], cy.shape)
    if size == 16:
        wx = x0[:, None] + (cx >> 2) - 3
        win = _wins3(ref_stack, rsel, wy, wx, size, size + 6
                     ).astype(jnp.int32)
        sad, xoff = widesad_batch(
            jnp.broadcast_to(org[:, None], (Lb, NCAND, size, size)
                             ).reshape(Lb * NCAND, size, size),
            win.reshape(Lb * NCAND, size, size + 6))
        sad = sad.reshape(Lb, NCAND).astype(jnp.int64)
        cx = cx + (xoff.reshape(Lb, NCAND) << 2)
    else:
        wx = x0[:, None] + (cx >> 2)
        win = _wins3(ref_stack, rsel, wy, wx, size, size).astype(jnp.int32)
        d = jnp.abs(org[:, None] - win)
        sad = d.sum(axis=(2, 3)).astype(jnp.int64)
    sad = sad + mv_cost_j(sqrt_lam[:, None], cy - mvp_y[:, None],
                          cx - mvp_x[:, None])
    live = jnp.arange(NCAND)[None, :] < cand_n[:, None]
    key = jnp.where(live, sad * NCAND + jnp.arange(NCAND)[None, :],
                    jnp.int64(1) << 62)
    bi = jnp.argmin(key, axis=1)
    bsad = jnp.take_along_axis(sad, bi[:, None], 1)[:, 0]
    take = bsad < min_sad
    min_sad = jnp.where(take, bsad, min_sad)
    opt_y = jnp.where(take, jnp.take_along_axis(cy, bi[:, None], 1)[:, 0],
                      opt_y)
    opt_x = jnp.where(take, jnp.take_along_axis(cx, bi[:, None], 1)[:, 0],
                      opt_x)
    ref_y, ref_x = opt_y, opt_x

    # ---- hexagon refinement (:607-641), sizes <= 16 ----
    if size <= 16:
        diy = jnp.asarray(np.array([1, 2, 1, -1, -2, -1], np.int32))
        dix = jnp.asarray(np.array([-1, 0, 1, 1, 0, -1], np.int32))

        def hex_round(_step, carry):
            ref_y, ref_x, start, end, active, min_sad, opt_y, opt_x = carry
            # NB: C indexes dix with the y-delta and diy with x (quirk)
            cy6 = ref_y[:, None] + dix[None, :] * 4
            cx6 = ref_x[:, None] + diy[None, :] * 4
            cy6, cx6 = clip_mv_j(cy6, cx6, ypos[:, None], xpos[:, None],
                                 fw, fh, size, size)
            win = _wins3(ref_stack,
                         jnp.broadcast_to(ref_idx[:, None], cy6.shape),
                         y0[:, None] + (cy6 >> 2),
                         x0[:, None] + (cx6 >> 2), size, size
                         ).astype(jnp.int32)
            sad6 = jnp.abs(org[:, None] - win).sum(axis=(2, 3)
                                                   ).astype(jnp.int64)
            sad6 = sad6 + mv_cost_j(sqrt_lam[:, None],
                                    cy6 - mvp_y[:, None],
                                    cx6 - mvp_x[:, None])
            # visit order (start..end mod 6) with first-better-wins
            direc = jnp.arange(6)[None, :]
            pos = (direc - start[:, None]) % 6
            length = ((end - start) % 6) + 1
            livex = active[:, None] & (pos < length[:, None])
            key = jnp.where(livex & (sad6 < min_sad[:, None]),
                            sad6 * 8 + pos, jnp.int64(1) << 62)
            bj = jnp.argmin(key, axis=1)
            bkey = jnp.take_along_axis(key, bj[:, None], 1)[:, 0]
            found = bkey < (jnp.int64(1) << 62)
            bsad = jnp.take_along_axis(sad6, bj[:, None], 1)[:, 0]
            min_sad = jnp.where(found, bsad, min_sad)
            opt_y = jnp.where(found,
                              jnp.take_along_axis(cy6, bj[:, None], 1)[:, 0],
                              opt_y)
            opt_x = jnp.where(found,
                              jnp.take_along_axis(cx6, bj[:, None], 1)[:, 0],
                              opt_x)
            best_dir = jnp.where(found, bj.astype(jnp.int32), -1)
            start = jnp.where(best_dir != 0, best_dir - 1, 5)
            end = jnp.where(start + 2 >= 6, start + 2 - 6, start + 2)
            active = active & (best_dir >= 0)
            return (opt_y, opt_x, start, end, active, min_sad, opt_y, opt_x)

        carry = (ref_y, ref_x, jnp.zeros((Lb,), jnp.int32),
                 jnp.full((Lb,), 5, jnp.int32), jnp.ones((Lb,), bool),
                 min_sad, opt_y, opt_x)
        carry = jax.lax.fori_loop(1, 6, hex_round, carry)
        ref_y, ref_x, _, _, _, min_sad, opt_y, opt_x = carry

    # ---- fast bilinear sub-pel (:653-700) ----
    cmin = min_sad
    hwin = _wins3(ref_stack, ref_idx, y0 + (ref_y >> 2) - 2,
                  x0 + (ref_x >> 2) - 2, size + 4, size + 4
                  ).astype(jnp.int32)
    hsad, spx, spy = fasthalf_batch(org, hwin)
    hsad = hsad.astype(jnp.int64) + mv_cost_j(
        sqrt_lam, ref_y + spy - mvp_y, ref_x + spx - mvp_x)
    better = hsad < cmin
    cmin = jnp.where(better, hsad, cmin)
    ydelta_hp = jnp.where(better, spy, 0)
    xdelta_hp = jnp.where(better, spx, 0)
    spx, spy = xdelta_hp, ydelta_hp
    mr_y = opt_y + spy
    mr_x = opt_x + spx
    opt_y = opt_y + ydelta_hp
    opt_x = opt_x + xdelta_hp

    qwin = _wins3(ref_stack, ref_idx, y0 + (mr_y >> 2) - 1,
                  x0 + (mr_x >> 2) - 1, size + 2, size + 2
                  ).astype(jnp.int32)
    ydelta_qp = jnp.zeros((Lb,), jnp.int32)
    xdelta_qp = jnp.zeros((Lb,), jnp.int32)
    for inx in (0, 1):
        for iny in (0, 1):
            qsad, qx2, qy2 = fastquarter_batch(org, qwin, inx, iny)
            qsad = qsad.astype(jnp.int64) + mv_cost_j(
                sqrt_lam, mr_y + qy2 - mvp_y, mr_x + qx2 - mvp_x)
            phase = ((spx != 0) == bool(inx)) & ((spy != 0) == bool(iny))
            better = phase & (qsad < cmin)
            cmin = jnp.where(better, qsad, cmin)
            ydelta_qp = jnp.where(better, qy2, ydelta_qp)
            xdelta_qp = jnp.where(better, qx2, xdelta_qp)
    opt_y = opt_y + ydelta_qp
    opt_x = opt_x + xdelta_qp
    return jnp.minimum(cmin, min_sad), opt_y, opt_x


def add_mvcand(mvc_y, mvc_x, mvc_mask, mvc_num, mvy, mvx, enable):
    """add_mvcandidate (enc/encode_block.c:69-82) for one ref column.
    mvc_y/x [L,NCAND]; mask [L] int64; num [L]; mv [L]; enable [L] bool."""
    iy = (mvy + 2) >> 2
    ix = (mvx + 2) >> 2
    bit = (((iy << 3) ^ ix) & 63).astype(jnp.int64)
    m = (jnp.int64(1) << bit)
    fresh = enable & ((m & mvc_mask) == 0)
    slot = jnp.arange(NCAND)[None, :] == mvc_num[:, None]
    upd = slot & fresh[:, None]
    mvc_y = jnp.where(upd, iy[:, None], mvc_y)
    mvc_x = jnp.where(upd, ix[:, None], mvc_x)
    mvc_num = mvc_num + fresh.astype(jnp.int32)
    mvc_mask = jnp.where(enable, mvc_mask | m, mvc_mask)
    return mvc_y, mvc_x, mvc_mask, mvc_num


# ---------------------------------------------------------------------------
# motion compensation + trial encodes
# ---------------------------------------------------------------------------
PADY = 160
PADC = 80


def _zz_order(size):
    qsize = min(16, size)
    zz = ZIGZAG[qsize]
    return np.argsort(zz).astype(np.int32)


_ZZINV = {s: _zz_order(s) for s in (4, 8, 16, 32, 64)}


def _mc_luma(vars_y, ref_sel, mvy, mvx, ypos, xpos, size: int, bw, bh,
             fw: int, fh: int, cl_y, cl_x):
    """Quarter-pel luma MC window via the per-ref 16-variant stack
    (inter_prediction.c:117-181).  vars_y: [R*16, Hv, Wv]; all other args
    arrays of a common shape S; returns [S, size, size] int32.  bw/bh are
    the rectangular extents used by the integer clamps; cl_y/cl_x the
    clamp origins (the C passes the parent block origin for sub-PBs)."""
    fv = mvy & 3
    fhh = mvx & 3
    vi = mvy >> 2
    hi = mvx >> 2
    vi = jnp.minimum(vi, fh - cl_y)
    vi = jnp.maximum(vi, -cl_x - bh)      # (sic) reference quirk uses xpos
    hi = jnp.minimum(hi, fw - cl_x)
    hi = jnp.maximum(hi, -cl_x - bw)
    oy = PADY + ypos + vi - 2
    ox = PADY + xpos + hi - 2
    k = ref_sel * 16 + fv * 4 + fhh
    return _wins3(vars_y, k, oy, ox, size, size).astype(jnp.int32)


def _mc_chroma(vars_c, ref_sel, mvy, mvx, ypos_c, xpos_c, size_c: int,
               bw_c, bh_c, fw_c: int, fh_c: int, cl_y, cl_x):
    """Eighth-pel chroma MC window via the per-ref 64-variant stack
    (inter_prediction.c:65-115).  Coordinates in chroma units; mv in luma
    quarter-pel units."""
    fv = mvy & 7
    fhh = mvx & 7
    vi = mvy >> 3
    hi = mvx >> 3
    vi = jnp.minimum(vi, fh_c - cl_y)
    vi = jnp.maximum(vi, -cl_x - bh_c)
    hi = jnp.minimum(hi, fw_c - cl_x)
    hi = jnp.maximum(hi, -cl_x - bw_c)
    oy = PADC + ypos_c + vi - 1
    ox = PADC + xpos_c + hi - 1
    k = ref_sel * 64 + fv * 8 + fhh
    return _wins3(vars_c, k, oy, ox, size_c, size_c).astype(jnp.int32)


def mc_yuv(fc, cfg, ref_sel, mvy, mvx, ypos, xpos, size: int, bw, bh):
    """get_inter_prediction_yuv (inter_prediction.c:185-226), LC path:
    no pb split, 4:2:0, sign 0.  All array args share a common shape S;
    returns (py [S,size,size], pu, pv [S,size/2,size/2]) int32.  Pixels
    beyond (bw, bh) are garbage and must be masked by the caller."""
    fw, fh = cfg["w"], cfg["h"]
    mvy, mvx = clip_mv_j(mvy, mvx, ypos, xpos, fw, fh, bw, bh)
    sC = size // 2
    py = _mc_luma(fc["vars_y"], ref_sel, mvy, mvx, ypos, xpos, size,
                  bw, bh, fw, fh, ypos, xpos)
    pu = _mc_chroma(fc["vars_u"], ref_sel, mvy, mvx, ypos >> 1, xpos >> 1,
                    sC, bw >> 1, bh >> 1, fw >> 1, fh >> 1, ypos >> 1,
                    xpos >> 1)
    pv = _mc_chroma(fc["vars_v"], ref_sel, mvy, mvx, ypos >> 1, xpos >> 1,
                    sC, bw >> 1, bh >> 1, fw >> 1, fh >> 1, ypos >> 1,
                    xpos >> 1)
    return py, pu, pv


def _i16_j(x):
    return ((x + 32768) & 0xFFFF) - 32768


def ssd_masked(a, b, bw, bh, s: int):
    """SSD over the (bh, bw) valid region of [L,s,s] blocks."""
    d = (a - b).astype(jnp.int64)
    rows = jnp.arange(s)[None, :, None] < bh[:, None, None]
    cols = jnp.arange(s)[None, None, :] < bw[:, None, None]
    return (d * d * (rows & cols)).sum(axis=(1, 2))


def cost_calc_j(ssd, nbits, lam):
    """enc/encode_block.c:916-926 (8-bit: ssd >> 0)."""
    cost = ssd.astype(jnp.int64) + jnp.floor(
        lam * nbits.astype(jnp.float64) + 0.5).astype(jnp.int64)
    return jnp.minimum(cost, 1 << 30)


def coeff_bits(cq, size: int, chroma: int, intra: int):
    """write_coeff bit count; cq raster [N,qs,qs] -> bits [N] (callers mask
    by cbp)."""
    qs = min(16, size)
    sc = cq.reshape(cq.shape[0], qs * qs)
    sc = jnp.take(sc, jnp.asarray(_ZZINV[size]), axis=1)
    return coeff_bits_batch(sc, size, chroma, intra)


def trial_encode_plane(org, pred, size: int, qp, intra_q: int,
                       chroma: int, intra_bits: int):
    """encode_and_reconstruct_block_inter, one plane, no tb-split
    (enc/encode_block.c:1275-1338) + exact coefficient bit count.

    org/pred: [N,s,s] int32.  intra_q: quantizer offset class (frame type);
    intra_bits: coeff VLC class (block mode).  fast transform: LC speed 2.
    Returns (cbp [N] i32, cq [N,qs,qs] i32, rec [N,s,s] i32, bits [N])."""
    res = (org - pred).astype(jnp.int16).astype(jnp.int32)
    co = fwd_transform_batch(res, size, True, 8)
    cq, cbp = quantize_dyn(co, qp, size, intra_q)
    rco = dequantize_dyn(cq, qp, size)
    rb = inv_transform_batch(rco, size, 8)
    rec = reconstruct_batch(rb, pred, 8)
    rec = jnp.where((cbp > 0)[:, None, None], rec, pred)
    bits = jnp.where(cbp > 0, coeff_bits(cq, size, chroma, intra_bits), 0)
    return cbp, cq, rec, bits


def pad16(cq, size: int):
    """Pad [L,qs,qs] raster coeffs into the [L,16,16] record slot."""
    qs = min(16, size)
    if qs == 16:
        return cq
    out = jnp.zeros((cq.shape[0], 16, 16), cq.dtype)
    return out.at[:, :qs, :qs].set(cq)


# ---------------------------------------------------------------------------
# early skip (enc/encode_block.c:2123-2392)
# ---------------------------------------------------------------------------

def early_skip_thresholds(qp: int, qpC: int, thr_f: float, sb_bump: bool):
    """Host-side threshold derivation (exact float semantics).
    Returns (luma thresholds by s2 {4,8,16}, chroma threshold)."""
    thr = np.float32(thr_f)
    if sb_bump:
        thr = np.float32(thr + thr / np.float32(4))
    thr = float(thr)
    out = {}
    scale = int(GQUANT[qp % 6])
    for s2 in (4, 8, 16):
        shift2 = 21 - log2i(s2) + qp // 6
        fql = float(1 << shift2) / float(scale)
        out[s2] = int(0.5 * thr * fql)
    scale_c = int(GQUANT[qpC % 6])
    shift2 = 21 - 5 + qpC // 6
    fql = float(1 << shift2) / float(scale_c)
    thr_c = int(thr * fql)
    return out, thr_c


def early_skip_check(fc, cfg, cand, nsv, ypos, xpos, size: int,
                     org_y, org_u, org_v, thr_l, thr_c):
    """check_early_skip_block (enc/encode_block.c:2231-2350) for both skip
    candidates in lockstep.  org_*: [L,s,s]/[L,sC,sC] int32 (full block).
    Returns skippable [L,2] bool (candidate passes the early-skip test)."""
    Lb = cand.shape[0]
    s0 = min(size, 32)
    nt = size // s0                      # tiles per side
    T = nt * nt
    s2 = s0 // 2
    s0c = s0 // 2
    # tile origins [T]
    toy = (np.arange(T) // nt * s0).astype(np.int32)
    tox = (np.arange(T) % nt * s0).astype(np.int32)
    toy_j = jnp.asarray(toy)[None, None, :]
    tox_j = jnp.asarray(tox)[None, None, :]

    # broadcast [L, 2, T]
    yy = jnp.broadcast_to(ypos[:, None, None] + toy_j, (Lb, 2, T))
    xx = jnp.broadcast_to(xpos[:, None, None] + tox_j, (Lb, 2, T))
    mvy = cand[:, :, 0:1] + jnp.zeros((1, 1, T), jnp.int32)
    mvx = cand[:, :, 1:2] + jnp.zeros((1, 1, T), jnp.int32)
    ref = cand[:, :, 4:5] + jnp.zeros((1, 1, T), jnp.int32)
    bwa = jnp.full((Lb, 2, T), s0, jnp.int32)
    py, pu, pv = mc_yuv(fc, cfg, ref, mvy, mvx, yy, xx, s0, bwa, bwa)
    # originals per tile
    oy_t = _win(jnp.broadcast_to(org_y[:, None], (Lb, 2 * T,) + org_y.shape[1:]
                                 ).reshape(Lb * 2 * T, size, size),
                (yy - ypos[:, None, None]).reshape(-1),
                (xx - xpos[:, None, None]).reshape(-1), s0, s0)
    ou_t = _win(jnp.broadcast_to(org_u[:, None], (Lb, 2 * T,) + org_u.shape[1:]
                                 ).reshape(Lb * 2 * T, size // 2, size // 2),
                (yy - ypos[:, None, None]).reshape(-1) >> 1,
                (xx - xpos[:, None, None]).reshape(-1) >> 1, s0c, s0c)
    ov_t = _win(jnp.broadcast_to(org_v[:, None], (Lb, 2 * T,) + org_v.shape[1:]
                                 ).reshape(Lb * 2 * T, size // 2, size // 2),
                (yy - ypos[:, None, None]).reshape(-1) >> 1,
                (xx - xpos[:, None, None]).reshape(-1) >> 1, s0c, s0c)

    # luma: 2x2 aggregate -> fwd transform (non-fast) -> |coeff| > thr
    res = (oy_t - py.reshape(Lb * 2 * T, s0, s0)).astype(jnp.int16
                                                         ).astype(jnp.int32)
    agg = res.reshape(-1, s2, 2, s2, 2)
    tmp = (agg[:, :, 0, :, 0] + agg[:, :, 0, :, 1] + agg[:, :, 1, :, 0] +
           agg[:, :, 1, :, 1] + 2) >> 2
    co = fwd_transform_batch(tmp, s2, False, 8)
    sig_y = (jnp.abs(co) > thr_l).any(axis=(1, 2))

    # chroma: int16 column sums (SIMD calc_cbp semantics, enc_kernels.c:828)
    def chroma_sig(oc, pc):
        resc = _i16_j(oc - pc.reshape(Lb * 2 * T, s0c, s0c))
        sums = _i16_j(resc.sum(axis=1))
        if s0c >= 8:
            absd = _i16_j(jnp.abs(sums))
            return (absd > thr_c).any(axis=1)
        c0, c1 = sums[:, 0], sums[:, 1]
        c2, c3 = sums[:, 2], sums[:, 3]
        a0 = _i16_j(jnp.abs(_i16_j(c0)))
        a2 = _i16_j(jnp.abs(_i16_j(c2)))
        return ((c1 + a0 > thr_c) | (c3 + a2 > thr_c))

    sig = sig_y | chroma_sig(ou_t, pu) | chroma_sig(ov_t, pv)
    sig = sig.reshape(Lb, 2, T).any(axis=2)
    live = jnp.arange(2)[None, :] < nsv[:, None]
    return ~sig & live


# ---------------------------------------------------------------------------
# intra: local-tile reference samples + CFL
# ---------------------------------------------------------------------------

def make_refs_local(tile, oy, ox, size: int, ur, dl, ypos, xpos):
    """make_top_and_left (intra_prediction.c:57-116) reading the per-lane
    local rec tile (origin (1,1); row/col 0 = halo).  oy/ox: scalar local
    pixel offsets; ur/dl/ypos/xpos: [L].
    Returns (left [L,2n], top [L,2n], top_left [L]) int32."""
    n = size
    Lb = tile.shape[0]
    trow = _ds(tile, (0, oy, ox + 1),
               (Lb, 1, n + 1))[:, 0].astype(jnp.int32)
    lcol = _ds(tile, (0, oy + 1, ox),
               (Lb, n + 1, 1))[:, :, 0].astype(jnp.int32)
    tl_px = _cell(tile, oy, ox).astype(jnp.int32)
    half = 128
    idx = jnp.arange(2 * n, dtype=jnp.int32)
    toplen = n + ur.astype(jnp.int32)
    leftlen = n + dl.astype(jnp.int32)
    top = jnp.take_along_axis(
        trow, jnp.minimum(idx[None, :], toplen[:, None] - 1), axis=1)
    left = jnp.take_along_axis(
        lcol, jnp.minimum(idx[None, :], leftlen[:, None] - 1), axis=1)
    top = jnp.where((ypos == 0)[:, None], half, top)
    left = jnp.where((xpos == 0)[:, None], half, left)
    top_left = jnp.where(ypos == 0, left[:, 0],
                         jnp.where(xpos > 0, tl_px, top[:, 0]))
    return left, top, top_left


def improve_uv_pred_j(pred_y, pred_u, pred_v, rec_y, n: int):
    """improve_uv_prediction (common/common_block.c:347-428), 4:2:0, 8-bit.
    pred_y/rec_y: [L,n,n] int32; pred_u/v: [L,n/2,n/2].
    Returns updated (pred_u, pred_v)."""
    nc = n // 2
    lognc = log2i(nc)
    logn = log2i(n)
    py = pred_y.astype(jnp.int64)
    ry = rec_y.astype(jnp.int64)
    sqres = ((ry - py) ** 2).sum(axis=(1, 2))
    apply_any = (sqres >> (2 * logn)) > 64

    ys = (py[:, 0::2, 0::2] + py[:, 0::2, 1::2] +
          py[:, 1::2, 0::2] + py[:, 1::2, 1::2] + 2) >> 2
    us = pred_u.astype(jnp.int64)
    vs = pred_v.astype(jnp.int64)
    ysum = ys.sum(axis=(1, 2))
    yysum = (ys * ys).sum(axis=(1, 2))
    ssyy = yysum - ((ysum * ysum) >> (lognc * 2))
    apply_any = apply_any & (ssyy != 0)

    def remap(xs, dst):
        xsum = xs.sum(axis=(1, 2))
        yxsum = (ys * xs).sum(axis=(1, 2))
        xxsum = (xs * xs).sum(axis=(1, 2))
        ssxx = xxsum - ((xsum * xsum) >> (lognc * 2))
        ssyx = yxsum - ((ysum * xsum) >> (lognc * 2))
        cond = apply_any & (ssyx * ssyx * 2 > ssyy * ssxx)
        num = ssyx << 16
        den = jnp.where(ssyy == 0, 1, ssyy)
        a64 = jnp.where(num < 0, -((-num) // den), num // den)
        b64 = ((xsum << 16) - a64 * ysum) >> (lognc * 2)
        a = jnp.clip(a64, -(1 << 23), 1 << 23).astype(jnp.int32)
        b = jnp.clip(b64 + (1 << 15), -(1 << 31),
                     (1 << 31) - 1).astype(jnp.int32)
        ry32 = rec_y.astype(jnp.int32)
        m = jnp.clip((a[:, None, None] * ry32 + b[:, None, None]) >> 16,
                     0, 255)
        m2 = (m[:, 0::2, 0::2] + m[:, 0::2, 1::2] +
              m[:, 1::2, 0::2] + m[:, 1::2, 1::2] + 2) >> 2
        return jnp.where(cond[:, None, None], m2, dst)

    return remap(us, pred_u), remap(vs, pred_v)


def intra_predict4(st, plane: str, oy, ox, size: int, ypos, xpos,
                   fw: int, fh: int):
    """4-mode intra predictions + search refs from the local tiles.
    Returns (preds [4,L,size,size] by mode id, left, top)."""
    up, ur, left_a, dl = _avail_flags(ypos, xpos, size, fw, fh)
    left, top, tl = make_refs_local(st[plane], oy, ox, size, ur, dl,
                                    ypos, xpos)
    preds = IB.predict_all_modes(left, top, tl, ypos, xpos, size, 8,
                                 num_modes=4)
    return preds, left, top


# mode id order of the SAD search visits (enc/encode_block.c:943-1020):
# DC, HOR, VER, PLANAR  (ids 0, 2, 3, 1)
SEARCH_ORDER4 = (0, 2, 3, 1)


def search_intra_mode_j(st, oy, ox, size: int, ypos, xpos, org_y,
                        cfg):
    """search_intra_prediction_params (enc/encode_block.c:928-1031),
    4 modes.  Returns (best_mode [L], min_sad [L] i64, preds)."""
    fw, fh = cfg["w"], cfg["h"]
    preds, left, top = intra_predict4(st, "rec_y", oy, ox, size, ypos, xpos,
                                      fw, fh)
    # the search's DC variant ignores the edge rule (left/top always)
    dc = IB.search_dc_pred(left, top, size)
    sad_dc = jnp.abs(org_y - dc[:, None, None]).sum(axis=(1, 2)
                                                    ).astype(jnp.int64)
    min_sad = sad_dc
    best = jnp.zeros((org_y.shape[0],), jnp.int32)
    for m in SEARCH_ORDER4[1:]:
        sad = jnp.abs(org_y - preds[m]).sum(axis=(1, 2)).astype(jnp.int64)
        better = sad < min_sad
        min_sad = jnp.where(better, sad, min_sad)
        best = jnp.where(better, m, best)
    return best, min_sad, preds


# ---------------------------------------------------------------------------
# mode decision (enc/encode_block.c:1835-2121, LC feature set)
# ---------------------------------------------------------------------------

def _idx_bits(n, idx):
    """Skip/merge index signalling length (enc/write_bits.c:467-489):
    n==4 -> 2 bits, n==3 -> vlc12 (idx+1 capped), n==2 -> 1, n==1 -> 0."""
    return jnp.where(n == 4, 2,
           jnp.where(n == 3, jnp.where(idx == 2, 2, idx + 1),
           jnp.where(n == 2, 1, 0))).astype(jnp.int32)


def _org_block(st, oy, ox, size: int):
    Lb = st["org_y"].shape[0]
    o_y = _ds(st["org_y"], (0, oy, ox), (Lb, size, size))
    o_u = _ds(st["org_u"], (0, oy // 2, ox // 2),
              (Lb, size // 2, size // 2))
    o_v = _ds(st["org_v"], (0, oy // 2, ox // 2),
              (Lb, size // 2, size // 2))
    return o_y, o_u, o_v


def _best_init(Lb, size: int):
    z = jnp.zeros((Lb,), jnp.int32)
    return {
        "cost": jnp.full((Lb,), MAX_UINT32, jnp.int64),
        "mode": z, "idx": z, "intra_mode": z,
        "mvp_y": z, "mvp_x": z, "mv0y": z, "mv0x": z, "mv1y": z, "mv1x": z,
        "ref0": z, "ref1": z, "dir": z,
        "cbp_y": z, "cbp_u": z, "cbp_v": z,
        "coeff_y": jnp.zeros((Lb, 16, 16), jnp.int32),
        "coeff_u": jnp.zeros((Lb, 16, 16), jnp.int32),
        "coeff_v": jnp.zeros((Lb, 16, 16), jnp.int32),
        "rec_y": jnp.zeros((Lb, size, size), jnp.int32),
        "rec_u": jnp.zeros((Lb, size // 2, size // 2), jnp.int32),
        "rec_v": jnp.zeros((Lb, size // 2, size // 2), jnp.int32),
    }


def _best_update(best, take, fields):
    out = dict(best)
    for k, v in fields.items():
        cur = best[k]
        if v.ndim == 1:
            out[k] = jnp.where(take, v.astype(cur.dtype), cur)
        elif v.ndim == 2:
            out[k] = jnp.where(take[:, None], v.astype(cur.dtype), cur)
        else:
            out[k] = jnp.where(take[:, None, None], v.astype(cur.dtype), cur)
    return out


def _sm_bits_sel(cfg, mode, ref0, ctx_index, size: int, encode_this):
    """Per-lane super-mode bits: full code where encode_this else 1 bit."""
    if cfg["is_i"]:
        full = jnp.full_like(mode, super_mode_bits_i(size, True))
        return jnp.where(encode_this, full, 0)
    full = super_mode_bits((mode, ref0, ctx_index), size, cfg["num_ref"],
                           True)
    return jnp.where(encode_this, full, 1)


def skip_trials(fc, cfg, st, oy, ox, size: int, ypos, xpos, bw, bh,
                encode_this, cand, nsv, ctx_index, org_y, org_u, org_v,
                ok_mask=None):
    """Evaluate both skip candidates (SSD + exact bits); returns
    (cost [L,2], preds (py,pu,pv) [L,2,...])."""
    Lb = cand.shape[0]
    mvy = cand[:, :, 0]
    mvx = cand[:, :, 1]
    ref = cand[:, :, 4]
    yy = jnp.broadcast_to(ypos[:, None], (Lb, 2))
    xx = jnp.broadcast_to(xpos[:, None], (Lb, 2))
    bww = jnp.broadcast_to(bw[:, None], (Lb, 2))
    bhh = jnp.broadcast_to(bh[:, None], (Lb, 2))
    py, pu, pv = mc_yuv(fc, cfg, ref, mvy, mvx, yy, xx, size, bww, bhh)
    o_y = jnp.broadcast_to(org_y[:, None], (Lb, 2, size, size)
                           ).reshape(Lb * 2, size, size)
    o_u = jnp.broadcast_to(org_u[:, None], (Lb, 2, size // 2, size // 2)
                           ).reshape(Lb * 2, size // 2, size // 2)
    o_v = jnp.broadcast_to(org_v[:, None], (Lb, 2, size // 2, size // 2)
                           ).reshape(Lb * 2, size // 2, size // 2)
    bw2 = bww.reshape(-1)
    bh2 = bhh.reshape(-1)
    ssd = (ssd_masked(o_y, py.reshape(Lb * 2, size, size), bw2, bh2, size) +
           ssd_masked(o_u, pu.reshape(Lb * 2, size // 2, size // 2),
                      bw2 >> 1, bh2 >> 1, size // 2) +
           ssd_masked(o_v, pv.reshape(Lb * 2, size // 2, size // 2),
                      bw2 >> 1, bh2 >> 1, size // 2)).reshape(Lb, 2)
    mode = jnp.full((Lb, 2), MODE_SKIP, jnp.int32)
    sm = _sm_bits_sel(cfg, mode.reshape(-1), ref.reshape(-1),
                      jnp.broadcast_to(ctx_index[:, None], (Lb, 2)
                                       ).reshape(-1), size,
                      jnp.broadcast_to(encode_this[:, None], (Lb, 2)
                                       ).reshape(-1)).reshape(Lb, 2)
    nbits = sm + _idx_bits(nsv[:, None], jnp.arange(2)[None, :])
    cost = cost_calc_j(ssd, nbits, fc["dyn"]["lam"])
    live = jnp.arange(2)[None, :] < nsv[:, None]
    if ok_mask is not None:
        live = live & ok_mask
    cost = jnp.where(live, cost, jnp.int64(MAX_UINT32))
    return cost, (py, pu, pv)


def _pick_first_min(cost2):
    """First-minimum over axis 1 with strict '<' order semantics."""
    n = cost2.shape[1]
    key = cost2 * n + jnp.arange(n, dtype=jnp.int64)[None, :]
    idx = jnp.argmin(key, axis=1).astype(jnp.int32)
    return idx, jnp.take_along_axis(cost2, idx[:, None], 1)[:, 0]


def _skip_best_fields(cand, idx, preds, size: int):
    """Best-candidate field bundle for a skip/merge pick."""
    py, pu, pv = preds
    c = jnp.take_along_axis(cand, idx[:, None, None], axis=1)[:, 0]
    rec_y = jnp.take_along_axis(
        py, idx[:, None, None, None], axis=1)[:, 0]
    rec_u = jnp.take_along_axis(
        pu, idx[:, None, None, None], axis=1)[:, 0]
    rec_v = jnp.take_along_axis(
        pv, idx[:, None, None, None], axis=1)[:, 0]
    z = jnp.zeros_like(idx)
    return {
        "mode": jnp.full_like(idx, MODE_SKIP), "idx": idx, "intra_mode": z,
        "mv0y": c[:, 0], "mv0x": c[:, 1], "mv1y": c[:, 2], "mv1x": c[:, 3],
        "ref0": c[:, 4], "ref1": c[:, 5], "dir": c[:, 6],
        "cbp_y": z, "cbp_u": z, "cbp_v": z,
        "coeff_y": jnp.zeros((idx.shape[0], 16, 16), jnp.int32),
        "coeff_u": jnp.zeros((idx.shape[0], 16, 16), jnp.int32),
        "coeff_v": jnp.zeros((idx.shape[0], 16, 16), jnp.int32),
        "rec_y": rec_y, "rec_u": rec_u, "rec_v": rec_v,
    }


def inter_style_trial(fc, cfg, st, size: int, ypos, xpos, bw, bh,
                      encode_this, mvy, mvx, ref, mode_const: int,
                      idx_or_mvp, ctx_cbp, ctx_index, org_y, org_u, org_v,
                      nmv=None):
    """Full trial encode for MERGE (idx signalling) or INTER (mv
    signalling) with tb_param 0 (enc/encode_block.c:1340-1514).
    idx_or_mvp: merge -> idx [L]; inter -> (mvp_y, mvp_x).
    Returns (cost [L], fields dict)."""
    Lb = org_y.shape[0]
    qp, qpC = fc["dyn"]["qp"], fc["dyn"]["qpC"]
    py, pu, pv = mc_yuv(fc, cfg, ref, mvy, mvx, ypos, xpos, size, bw, bh)
    cbp_y, cq_y, rec_y, bits_y = trial_encode_plane(
        org_y, py, size, qp, cfg["is_i"], 0, 0)
    cbp_u, cq_u, rec_u, bits_u = trial_encode_plane(
        org_u, pu, size // 2, qpC, cfg["is_i"], 1, 0)
    cbp_v, cq_v, rec_v, bits_v = trial_encode_plane(
        org_v, pv, size // 2, qpC, cfg["is_i"], 1, 0)
    ssd = (ssd_masked(org_y, rec_y, bw, bh, size) +
           ssd_masked(org_u, rec_u, bw >> 1, bh >> 1, size // 2) +
           ssd_masked(org_v, rec_v, bw >> 1, bh >> 1, size // 2))
    mode = jnp.full((Lb,), mode_const, jnp.int32)
    nbits = _sm_bits_sel(cfg, mode, ref, ctx_index, size, encode_this)
    if mode_const == MODE_MERGE:
        nbits = nbits + _idx_bits(nmv, idx_or_mvp)
    else:
        mvp_y, mvp_x = idx_or_mvp
        nbits = nbits + mv_bits_exact(mvy - mvp_y, mvx - mvp_x)
    nbits = (nbits + cbp_bits(cbp_y, cbp_u, cbp_v, ctx_cbp,
                              mode_const == MODE_MERGE) +
             bits_y + bits_u + bits_v)
    cost = cost_calc_j(ssd, nbits, fc["dyn"]["lam"])
    z = jnp.zeros((Lb,), jnp.int32)
    fields = {
        "mode": mode, "cbp_y": cbp_y, "cbp_u": cbp_u, "cbp_v": cbp_v,
        "coeff_y": pad16(cq_y, size), "coeff_u": pad16(cq_u, size // 2),
        "coeff_v": pad16(cq_v, size // 2),
        "rec_y": rec_y, "rec_u": rec_u, "rec_v": rec_v,
        "mv0y": mvy, "mv0x": mvx, "mv1y": mvy, "mv1x": mvx,
        "ref0": ref, "ref1": ref, "idx": z, "dir": z,
        "intra_mode": z,
    }
    if mode_const == MODE_MERGE:
        fields["idx"] = idx_or_mvp
    else:
        fields["mvp_y"], fields["mvp_x"] = idx_or_mvp
    return cost, fields


def intra_trial(fc, cfg, st, oy, ox, size: int, ypos, xpos, bw, bh,
                encode_this, imode, ctx_cbp, ctx_index,
                org_y, org_u, org_v, preds_y):
    """MODE_INTRA trial encode (enc/encode_block.c:1100-1273), no tb-split,
    CFL intra on.  imode [L]; preds_y [4,L,s,s] luma predictions."""
    Lb = org_y.shape[0]
    qp, qpC = fc["dyn"]["qp"], fc["dyn"]["qpC"]
    fw, fh = cfg["w"], cfg["h"]
    sC = size // 2
    intra_q = 1 if cfg["is_i"] else 0
    pred_y = jnp.take_along_axis(
        jnp.moveaxis(preds_y, 0, 1), imode[:, None, None, None], axis=1
    )[:, 0]
    cbp_y, cq_y, rec_y, bits_y = trial_encode_plane(
        org_y, pred_y, size, qp, intra_q, 0, 1)
    # chroma predictions from the local u/v tiles (same mode), then CFL
    up, ur, left_a, dl = _avail_flags(ypos, xpos, size, fw, fh)
    lu, tu, tlu = make_refs_local(st["rec_u"], oy // 2, ox // 2, sC, ur, dl,
                                  ypos, xpos)
    lv, tv, tlv = make_refs_local(st["rec_v"], oy // 2, ox // 2, sC, ur, dl,
                                  ypos, xpos)
    # chroma DC edge rule uses chroma block coords (yposC, xposC)
    pu4 = IB.predict_all_modes(lu, tu, tlu, ypos >> 1, xpos >> 1, sC, 8,
                               num_modes=4)
    pv4 = IB.predict_all_modes(lv, tv, tlv, ypos >> 1, xpos >> 1, sC, 8,
                               num_modes=4)
    pu = jnp.take_along_axis(jnp.moveaxis(pu4, 0, 1),
                             imode[:, None, None, None], axis=1)[:, 0]
    pv = jnp.take_along_axis(jnp.moveaxis(pv4, 0, 1),
                             imode[:, None, None, None], axis=1)[:, 0]
    if cfg["cfl_intra"]:
        pu, pv = improve_uv_pred_j(pred_y, pu, pv, rec_y, size)
    cbp_u, cq_u, rec_u, bits_u = trial_encode_plane(
        org_u, pu, sC, qpC, intra_q, 1, 1)
    cbp_v, cq_v, rec_v, bits_v = trial_encode_plane(
        org_v, pv, sC, qpC, intra_q, 1, 1)
    ssd = (ssd_masked(org_y, rec_y, bw, bh, size) +
           ssd_masked(org_u, rec_u, bw >> 1, bh >> 1, sC) +
           ssd_masked(org_v, rec_v, bw >> 1, bh >> 1, sC))
    mode = jnp.full((Lb,), MODE_INTRA, jnp.int32)
    nbits = (_sm_bits_sel(cfg, mode, jnp.zeros((Lb,), jnp.int32), ctx_index,
                          size, encode_this) + INTRA_MODE_BITS +
             cbp_bits(cbp_y, cbp_u, cbp_v, ctx_cbp, False) +
             bits_y + bits_u + bits_v)
    cost = cost_calc_j(ssd, nbits, fc["dyn"]["lam"])
    z = jnp.zeros((Lb,), jnp.int32)
    fields = {
        "mode": mode, "idx": z, "intra_mode": imode,
        "mv0y": z, "mv0x": z, "mv1y": z, "mv1x": z,
        "ref0": z, "ref1": z, "dir": jnp.full_like(z, -1),
        "cbp_y": cbp_y, "cbp_u": cbp_u, "cbp_v": cbp_v,
        "coeff_y": pad16(cq_y, size), "coeff_u": pad16(cq_u, sC),
        "coeff_v": pad16(cq_v, sC),
        "rec_y": rec_y, "rec_u": rec_u, "rec_v": rec_v,
    }
    return cost, fields


def mode_decision(fc, cfg, st, oy, ox, size: int, ypos, xpos, bw, bh,
                  encode_this, cand, nsv, mcand, nmv, ctx_cbp, ctx_index,
                  skip_only: bool):
    """mode_decision_rdo (enc/encode_block.c:1835-2121), LC feature set.
    Returns (best dict, st) - st carries mvcand/best_ref updates."""
    Lb = st["org_y"].shape[0]
    fw, fh = cfg["w"], cfg["h"]
    org_y, org_u, org_v = _org_block(st, oy, ox, size)
    best = _best_init(Lb, size)
    best["mvp_y"] = jnp.zeros((Lb,), jnp.int32)
    best["mvp_x"] = jnp.zeros((Lb,), jnp.int32)

    if not cfg["is_i"]:
        cost2, preds = skip_trials(fc, cfg, st, oy, ox, size, ypos, xpos,
                                   bw, bh, encode_this, cand, nsv,
                                   ctx_index, org_y, org_u, org_v)
        idx, c = _pick_first_min(cost2)
        fields = _skip_best_fields(cand, idx, preds, size)
        fields["cost"] = c
        best = _best_update(best, c < best["cost"], fields)

    if skip_only:
        return best, st

    full = encode_this
    sqrt_lam = jnp.broadcast_to(fc["dyn"]["sqrt_lam"], (Lb,))

    def rep(a, n):
        """[L,...] -> [L*n,...] repeat along a new axis 1."""
        return jnp.broadcast_to(a[:, None], (Lb, n) + a.shape[1:]
                                ).reshape((Lb * n,) + a.shape[1:])

    def sel_axis(fields, cost2, idx, n):
        """Gather the idx-th of n batched trials from a fields dict."""
        out = {}
        for k, v in fields.items():
            vr = v.reshape((Lb, n) + v.shape[1:])
            ix = idx.reshape((Lb, 1) + (1,) * (v.ndim - 1))
            out[k] = jnp.take_along_axis(vr, ix, axis=1)[:, 0]
        out["cost"] = jnp.take_along_axis(cost2, idx[:, None], 1)[:, 0]
        return out

    if not cfg["is_i"]:
        # ---- merge (tb_param 0 only), both candidates in one batch ----
        K = 2
        cf = mcand.reshape(Lb * K, 7)
        cost, fields = inter_style_trial(
            fc, cfg, st, size, rep(ypos, K), rep(xpos, K), rep(bw, K),
            rep(bh, K), rep(encode_this, K), cf[:, 0], cf[:, 1], cf[:, 4],
            MODE_MERGE, jnp.tile(jnp.arange(K, dtype=jnp.int32), Lb),
            rep(ctx_cbp, K), rep(ctx_index, K), rep(org_y, K),
            rep(org_u, K), rep(org_v, K), nmv=rep(nmv, K))
        fields["mv1y"] = cf[:, 2]
        fields["mv1x"] = cf[:, 3]
        fields["ref1"] = cf[:, 5]
        fields["dir"] = cf[:, 6]
        cost2 = jnp.where(jnp.arange(K)[None, :] < nmv[:, None],
                          cost.reshape(Lb, K), jnp.int64(MAX_UINT32))
        kidx, kcost = _pick_first_min(cost2)
        mf = sel_axis(fields, cost2, kidx, K)
        best = _best_update(best, full & (kcost < best["cost"]), mf)

        # ---- intra SAD gate (speed > 0: intra_inter_sad) ----
        best_im, sad_i, preds_y = search_intra_mode_j(
            st, oy, ox, size, ypos, xpos, org_y, cfg)
        sad_intra = sad_i + fc["dyn"]["isqrt_bias"]

        # ---- inter: ME + trial, both references in one batch ----
        R = cfg["num_ref"]
        mvp_y, mvp_x = mv_pred_local(st, oy, ox, size, ypos, xpos, fw, fh)
        refs = jnp.tile(jnp.arange(R, dtype=jnp.int32), Lb)      # [L*R]
        ref_live = (rep(full, R) &
                    ((rep(st["best_ref"], R) < 0) |
                     (rep(st["best_ref"], R) == refs)))
        my = st["mvc_y"][:, :R].reshape(Lb * R, NCAND)
        mx = st["mvc_x"][:, :R].reshape(Lb * R, NCAND)
        mm = st["mvc_mask"][:, :R].reshape(Lb * R)
        mn = st["mvc_num"][:, :R].reshape(Lb * R)
        my, mx, mm, mn = add_mvcand(my, mx, mm, mn, rep(mvp_y, R),
                                    rep(mvp_x, R), ref_live)
        sad_r, mv_y, mv_x = me_lc(
            rep(org_y, R), fc["raw_y"], refs, PADY, rep(ypos, R),
            rep(xpos, R), size, rep(mvp_y, R), rep(mvp_x, R),
            rep(sqrt_lam, R), my, mx, mn, fw, fh)
        my, mx, mm, mn = add_mvcand(my, mx, mm, mn, mv_y, mv_x, ref_live)
        st = dict(st)
        st["mvc_y"] = st["mvc_y"].at[:, :R].set(
            my.reshape(Lb, R, NCAND))
        st["mvc_x"] = st["mvc_x"].at[:, :R].set(
            mx.reshape(Lb, R, NCAND))
        st["mvc_mask"] = st["mvc_mask"].at[:, :R].set(mm.reshape(Lb, R))
        st["mvc_num"] = st["mvc_num"].at[:, :R].set(mn.reshape(Lb, R))
        do_inter_r = sad_r < rep(sad_intra, R)
        do_intra = full & ~(ref_live & do_inter_r).reshape(Lb, R
                                                           ).any(axis=1)
        cost, fields = inter_style_trial(
            fc, cfg, st, size, rep(ypos, R), rep(xpos, R), rep(bw, R),
            rep(bh, R), rep(encode_this, R), mv_y, mv_x, refs, MODE_INTER,
            (rep(mvp_y, R), rep(mvp_x, R)), rep(ctx_cbp, R),
            rep(ctx_index, R), rep(org_y, R), rep(org_u, R), rep(org_v, R))
        execd = ref_live & do_inter_r
        cost2 = jnp.where(execd.reshape(Lb, R), cost.reshape(Lb, R),
                          jnp.int64(MAX_UINT32))
        ridx, rcost = _pick_first_min(cost2)
        rf = sel_axis(fields, cost2, ridx, R)
        best = _best_update(best, (rcost < best["cost"]) &
                            execd.reshape(Lb, R).any(axis=1), rf)
        worst = jnp.where(execd.reshape(Lb, R),
                          cost.reshape(Lb, R), 0).max(axis=1)
        bestc = jnp.where(execd.reshape(Lb, R), cost.reshape(Lb, R),
                          jnp.int64(MAX_UINT32)).min(axis=1)
        st["best_ref"] = jnp.where(full & (worst > 0) &
                                   (worst * 3 > bestc * 4),
                                   0, st["best_ref"])

        # ---- intra trial (mode from the SAD search) ----
        cost, fields = intra_trial(fc, cfg, st, oy, ox, size, ypos, xpos,
                                   bw, bh, encode_this, best_im, ctx_cbp,
                                   ctx_index, org_y, org_u, org_v, preds_y)
        fields["cost"] = cost
        best = _best_update(best, do_intra & (cost < best["cost"]), fields)
    else:
        best_im, _, preds_y = search_intra_mode_j(
            st, oy, ox, size, ypos, xpos, org_y, cfg)
        cost, fields = intra_trial(fc, cfg, st, oy, ox, size, ypos, xpos,
                                   bw, bh, encode_this, best_im, ctx_cbp,
                                   ctx_index, org_y, org_u, org_v, preds_y)
        fields["cost"] = cost
        best = _best_update(best, full & (cost < best["cost"]), fields)

    return best, st


# ---------------------------------------------------------------------------
# node finalize: rec tile + dd + record writes
# ---------------------------------------------------------------------------
FLAG_DECIDED, FLAG_EARLY, FLAG_SELF = 1, 2, 4
REC_W = 18
(RF_FLAGS, RF_MODE, RF_IDX, RF_IMODE, RF_MVPY, RF_MVPX, RF_MVY, RF_MVX,
 RF_REF, RF_CBPY, RF_CBPU, RF_CBPV, RF_NSV, RF_NMV, RF_CTXCBP, RF_CTXIDX,
 RF_COSTLO, RF_COSTHI) = range(REC_W)


def finalize_node(st, oy, ox, size: int, best, mask):
    """copy_block_to_frame + copy_deblock_data
    (enc/encode_block.c:1516-1613) into the per-lane local state."""
    st = dict(st)
    Lb = mask.shape[0]

    def wr(plane, y, x, patch, s):
        cur = _ds(st[plane], (0, y, x), (Lb, s, s))
        new = jnp.where(mask[:, None, None], patch.astype(cur.dtype), cur)
        st[plane] = _dus(st[plane], new, (0, y, x))

    wr("rec_y", 1 + oy, 1 + ox, best["rec_y"], size)
    wr("rec_u", 1 + oy // 2, 1 + ox // 2, best["rec_u"], size // 2)
    wr("rec_v", 1 + oy // 2, 1 + ox // 2, best["rec_v"], size // 2)

    bsz = size // 4
    by, bx = 1 + oy // 4, 1 + ox // 4

    def wcell(field, val):
        cur = _ds(st[field], (0, by, bx), (Lb, bsz, bsz))
        v = jnp.broadcast_to(val[:, None, None].astype(cur.dtype),
                             (Lb, bsz, bsz))
        new = jnp.where(mask[:, None, None], v, cur)
        st[field] = _dus(st[field], new, (0, by, bx))

    wcell("dd_mode", best["mode"])
    wcell("dd_size", jnp.full((Lb,), size, jnp.int32))
    wcell("dd_cbp_y", best["cbp_y"])
    wcell("dd_cbp_u", best["cbp_u"])
    wcell("dd_cbp_v", best["cbp_v"])
    wcell("dd_mv0y", best["mv0y"])
    wcell("dd_mv0x", best["mv0x"])
    wcell("dd_mv1y", best["mv1y"])
    wcell("dd_mv1x", best["mv1x"])
    wcell("dd_ref0", best["ref0"])
    wcell("dd_ref1", best["ref1"])
    wcell("dd_bip", best["dir"])
    wcell("dd_tb", jnp.zeros((Lb,), jnp.int32))
    wcell("dd_pb", jnp.zeros((Lb,), jnp.int32))
    return st


def write_record(st, nid: int, best, flags, nsv, nmv, ctx_cbp, ctx_index,
                 cost, mask):
    """Store the node decision into the per-lane record buffers."""
    st = dict(st)
    Lb = mask.shape[0]
    vals = jnp.stack([
        flags.astype(jnp.int32), best["mode"], best["idx"],
        best["intra_mode"], best["mvp_y"], best["mvp_x"],
        best["mv0y"], best["mv0x"], best["ref0"],
        best["cbp_y"], best["cbp_u"], best["cbp_v"],
        nsv, nmv, ctx_cbp, ctx_index,
        (cost & 0x7FFFFFFF).astype(jnp.int32),
        (cost >> 31).astype(jnp.int32)], axis=-1)
    old = st["recA"][:, nid]
    st["recA"] = st["recA"].at[:, nid].set(
        jnp.where(mask[:, None], vals, old))
    coeffs = jnp.stack([best["coeff_y"], best["coeff_u"], best["coeff_v"]],
                       axis=1)
    oldc = st["recC"][:, nid]
    st["recC"] = st["recC"].at[:, nid].set(
        jnp.where(mask[:, None, None, None], coeffs.astype(jnp.int16),
                  oldc.astype(jnp.int16)))
    return st


# ---------------------------------------------------------------------------
# node bodies
# ---------------------------------------------------------------------------

class LCCfg:
    """Static per-frame configuration (hashable: jit static argument)."""

    def __init__(self, **kw):
        self._d = dict(kw)
        self._k = tuple(sorted(kw.items()))

    def __getitem__(self, k):
        return self._d[k]

    def __hash__(self):
        return hash(self._k)

    def __eq__(self, other):
        return isinstance(other, LCCfg) and self._k == other._k


DEPTH = {128: 0, 64: 1, 32: 2, 16: 3}


def _geom(st, cfg, oy, ox, size: int):
    ypos = st["sby"] + oy
    xpos = st["sbx"] + ox
    exists = st["live"] & (ypos + 8 <= cfg["h"]) & (xpos + 8 <= cfg["w"])
    encode_this = (ypos + size <= cfg["h"]) & (xpos + size <= cfg["w"])
    bw = jnp.minimum(size, cfg["w"] - xpos)
    bh = jnp.minimum(size, cfg["h"] - ypos)
    return ypos, xpos, exists, encode_this, bw, bh


def _dead_above(st, d: int):
    if d == 0:
        return jnp.zeros_like(st["live"])
    return st["dead"][:, :d].any(axis=1)


def _early_eval(fc, cfg, st, oy, ox, size: int, ypos, xpos, encode_this,
                alive, cand, nsv, ctx_index, nid):
    """search_early_skip_candidates (enc/encode_block.c:2352-2392) +
    final encode of the winner.  Returns (st, early [L], cost [L])."""
    Lb = cand.shape[0]
    org_y, org_u, org_v = _org_block(st, oy, ox, size)
    thr_c = fc["dyn"]["thr_c128"] if size == SB else fc["dyn"]["thr_c"]
    ok = early_skip_check(fc, cfg, cand, nsv, ypos, xpos, size,
                          org_y, org_u, org_v,
                          fc["dyn"]["thr_l_%d" % size], thr_c)
    early = alive & encode_this & ok.any(axis=1)
    bws = jnp.full((Lb,), size, jnp.int32)
    cost2, preds = skip_trials(fc, cfg, st, oy, ox, size, ypos, xpos,
                               bws, bws, encode_this, cand, nsv,
                               ctx_index, org_y, org_u, org_v, ok_mask=ok)
    idx, c = _pick_first_min(cost2)
    fields = _skip_best_fields(cand, idx, preds, size)
    fields["mvp_y"] = jnp.zeros((Lb,), jnp.int32)
    fields["mvp_x"] = jnp.zeros((Lb,), jnp.int32)
    st = finalize_node(st, oy, ox, size, fields, early)
    flags = jnp.where(early, FLAG_DECIDED | FLAG_EARLY | FLAG_SELF, 0)
    st = write_record(st, nid, fields, flags, nsv,
                      jnp.zeros((Lb,), jnp.int32), ctx_index * 0 - 1,
                      ctx_index, c, early)
    return st, early, c


def body_enter(st, fc, oy, ox, nid, size: int, cfg):
    """K_E<size>: process_block prologue - early-skip test + children
    cost accumulator reset (enc/encode_block.c:2401-2439)."""
    d = DEPTH[size]
    ypos, xpos, exists, encode_this, bw, bh = _geom(st, cfg, oy, ox, size)
    alive = exists & ~_dead_above(st, d)
    st = dict(st)
    st["cs"] = st["cs"].at[:, d].set(0)
    if cfg["is_i"]:
        st["dead"] = st["dead"].at[:, d].set(False)
        return st
    cand, nsv = two_cands_local(st, oy, ox, size, ypos, xpos,
                                cfg["w"], cfg["h"])
    ctx_split, ctx_cbp, ctx_index = contexts_local(
        st, oy, ox, size, ypos, xpos, cfg["w"], cfg["h"], cfg["ctx"])
    st, early, c = _early_eval(fc, cfg, st, oy, ox, size, ypos, xpos,
                               encode_this, alive, cand, nsv, ctx_index,
                               nid)
    st["dead"] = st["dead"].at[:, d].set(early)
    if d > 0:
        st["cs"] = st["cs"].at[:, d - 1].add(jnp.where(early, c, 0))
    return st


def body_decide(st, fc, oy, ox, nid, size: int, cfg):
    """K_D<size>: mode_decision_rdo + split compare + winner finalize
    (enc/encode_block.c:2514-2549)."""
    d = DEPTH[size]
    ypos, xpos, exists, encode_this, bw, bh = _geom(st, cfg, oy, ox, size)
    not_early = ~st["dead"][:, d]
    alive = exists & ~_dead_above(st, d) & not_early
    rect = (~encode_this) & exists if not cfg["is_i"] else \
        jnp.zeros_like(exists)
    ran = (encode_this | rect) & alive
    cand, nsv = two_cands_local(st, oy, ox, size, ypos, xpos,
                                cfg["w"], cfg["h"])
    mcand, nmv = cand, nsv     # merge derivation is identical at LC
    ctx_split, ctx_cbp, ctx_index = contexts_local(
        st, oy, ox, size, ypos, xpos, cfg["w"], cfg["h"], cfg["ctx"])
    md, st = mode_decision(fc, cfg, st, oy, ox, size, ypos, xpos, bw, bh,
                           encode_this & alive, cand, nsv, mcand, nmv,
                           ctx_cbp, ctx_index, skip_only=(size == SB))
    cost = jnp.where(ran, md["cost"], jnp.int64(1 << 28))
    cost_small = st["cs"][:, d]
    chose = ran & (cost <= cost_small)
    st = finalize_node(st, oy, ox, size, md, chose)
    flags = (jnp.where(ran, FLAG_DECIDED, 0) |
             jnp.where(chose, FLAG_SELF, 0))
    st = write_record(st, nid, md, flags, nsv, nmv, ctx_cbp, ctx_index,
                      cost, alive)
    st = dict(st)
    if d > 0:
        contrib = jnp.where(exists & ~_dead_above(st, d) & not_early,
                            jnp.minimum(cost, cost_small), 0)
        st["cs"] = st["cs"].at[:, d - 1].add(contrib)
    st["dead"] = st["dead"].at[:, d].set(False)
    return st


def body_16sub(st, fc, oy, ox, nid, cfg):
    """Fused 16-subtree: early-skip@16, mode_decision@16 (top-down), the
    four 8x8 children, and the split compare
    (enc/encode_block.c:2401-2565 at sizes 16 and 8)."""
    size = 16
    d = 3
    Lb = st["live"].shape[0]
    ypos, xpos, exists, encode_this, bw, bh = _geom(st, cfg, oy, ox, size)
    alive = exists & ~_dead_above(st, d)
    rect = (~encode_this) & exists if not cfg["is_i"] else \
        jnp.zeros_like(exists)
    ran = (encode_this | rect) & alive

    cand, nsv = two_cands_local(st, oy, ox, size, ypos, xpos,
                                cfg["w"], cfg["h"])
    ctx_split, ctx_cbp, ctx_index = contexts_local(
        st, oy, ox, size, ypos, xpos, cfg["w"], cfg["h"], cfg["ctx"])

    if not cfg["is_i"]:
        st, early, ecost = _early_eval(fc, cfg, st, oy, ox, size, ypos,
                                       xpos, encode_this, alive, cand, nsv,
                                       ctx_index, nid)
    else:
        early = jnp.zeros_like(alive)
        ecost = jnp.zeros((Lb,), jnp.int64)

    # 16-level mode decision (top-down order for P encode_this lanes;
    # identical data for the I/rect orders - see module docstring)
    md, st = mode_decision(fc, cfg, st, oy, ox, size, ypos, xpos, bw, bh,
                           encode_this & alive & ~early, cand, nsv,
                           cand, nsv, ctx_cbp, ctx_index, skip_only=False)
    cost16 = jnp.where(ran & ~early, md["cost"], jnp.int64(1 << 28))

    if cfg["is_i"]:
        descend = alive & ~early
    else:
        descend = alive & ~early & (
            (~encode_this) | (cost16 > fc["dyn"]["thr16"]))

    # ---- children (NW, SW, NE, SE) as a fori_loop (one trace) ----
    cs0 = jnp.where(descend, jnp.int64(0), jnp.int64(1 << 28))

    def child_body(i, carry):
        st, cs = carry
        dy = (i & 1) * 8
        dx = (i >> 1) * 8
        coy, cox = oy + dy, ox + dx
        cnid = N_OFF[8] + (nid - N_OFF[16]) * 4 + (dy // 8) * 2 + (dx // 8)
        y8 = ypos + dy
        x8 = xpos + dx
        exists8 = descend & (y8 + 8 <= cfg["h"]) & (x8 + 8 <= cfg["w"])
        et8 = (y8 + 8 <= cfg["h"]) & (x8 + 8 <= cfg["w"])  # size 8 fits
        bw8 = jnp.minimum(8, cfg["w"] - x8)
        bh8 = jnp.minimum(8, cfg["h"] - y8)
        cand8, nsv8 = two_cands_local(st, coy, cox, 8, y8, x8,
                                      cfg["w"], cfg["h"])
        cs1, ccbp, cidx = contexts_local(st, coy, cox, 8, y8, x8,
                                         cfg["w"], cfg["h"], cfg["ctx"])
        if not cfg["is_i"]:
            st, early8, ec8 = _early_eval(fc, cfg, st, coy, cox, 8, y8, x8,
                                          et8, exists8, cand8, nsv8, cidx,
                                          cnid)
        else:
            early8 = jnp.zeros_like(exists8)
            ec8 = jnp.zeros((Lb,), jnp.int64)
        ran8 = exists8 & ~early8     # size 8: encode_this == exists
        md8, st = mode_decision(fc, cfg, st, coy, cox, 8, y8, x8, bw8, bh8,
                                et8 & ran8, cand8, nsv8, cand8, nsv8,
                                ccbp, cidx, skip_only=False)
        cost8 = jnp.where(ran8, md8["cost"], jnp.int64(1 << 28))
        chose8 = ran8 & (cost8 <= (1 << 28))
        st = finalize_node(st, coy, cox, 8, md8, chose8)
        flags8 = jnp.where(ran8, FLAG_DECIDED | FLAG_SELF, 0)
        st = write_record(st, cnid, md8, flags8, nsv8, nsv8, ccbp, cidx,
                          cost8, ran8)
        contrib = jnp.where(early8, ec8,
                            jnp.where(exists8,
                                      jnp.minimum(cost8, 1 << 28), 0))
        return st, cs + jnp.where(descend, contrib, 0)

    st, cs = jax.lax.fori_loop(0, 4, child_body, (st, cs0))

    # ---- split compare (cost <= cost_small keeps the 16 winner) ----
    chose16 = ran & ~early & (cost16 <= cs)
    st = finalize_node(st, oy, ox, size, md, chose16)
    flags = (jnp.where(ran & ~early, FLAG_DECIDED, 0) |
             jnp.where(chose16, FLAG_SELF, 0))
    st = write_record(st, nid, md, flags, nsv, nsv, ctx_cbp, ctx_index,
                      cost16, alive & ~early)
    contrib16 = jnp.where(early, ecost,
                          jnp.where(exists & alive,
                                    jnp.minimum(cost16, cs), 0))
    st = dict(st)
    st["cs"] = st["cs"].at[:, 2].add(contrib16)
    return st


# ---------------------------------------------------------------------------
# frame state + diagonal gather/flush
# ---------------------------------------------------------------------------

def alloc_frame_state(w: int, h: int, nsb: int):
    """Device frame-resident state (origin (1,1) aprons for halo reads)."""
    fs = {
        "rec_y": jnp.zeros((1 + h + 144, 1 + w + 144), jnp.int16),
        "rec_u": jnp.zeros((1 + h // 2 + 80, 1 + w // 2 + 80), jnp.int16),
        "rec_v": jnp.zeros((1 + h // 2 + 80, 1 + w // 2 + 80), jnp.int16),
        "recA": jnp.zeros((nsb + 1, N_NODES, REC_W), jnp.int32),
        "recC": jnp.zeros((nsb + 1, N_NODES, 3, 16, 16), jnp.int16),
    }
    hc, wc = h // 4, w // 4
    for f in ("mode", "size", "tb", "pb", "cbp_y", "cbp_u", "cbp_v",
              "mv0y", "mv0x", "mv1y", "mv1x", "ref0", "ref1", "bip"):
        fs["dd_" + f] = jnp.zeros((1 + hc + 40, 1 + wc + 40), jnp.int16)
    return fs


@partial(jax.jit, static_argnames=("L",))
def gather_lanes(fs, org_y, org_u, org_v, sby, sbx, live, L: int):
    """Per-diagonal lane state from the frame state."""
    st = {
        "sby": sby, "sbx": sbx, "live": live,
        "rec_y": _wins(fs["rec_y"], sby, sbx, 130, 130),
        "rec_u": _wins(fs["rec_u"], sby >> 1, sbx >> 1, 66, 66),
        "rec_v": _wins(fs["rec_v"], sby >> 1, sbx >> 1, 66, 66),
        "org_y": _wins(org_y, sby, sbx, 128, 128).astype(jnp.int32),
        "org_u": _wins(org_u, sby >> 1, sbx >> 1, 64, 64).astype(jnp.int32),
        "org_v": _wins(org_v, sby >> 1, sbx >> 1, 64, 64).astype(jnp.int32),
        "mvc_y": jnp.zeros((L, 2, NCAND), jnp.int32),
        "mvc_x": jnp.zeros((L, 2, NCAND), jnp.int32),
        "mvc_mask": jnp.zeros((L, 2), jnp.int64),
        "mvc_num": jnp.zeros((L, 2), jnp.int32),
        "best_ref": jnp.full((L,), -1, jnp.int32),
        "cs": jnp.zeros((L, 4), jnp.int64),
        "dead": jnp.zeros((L, 4), bool),
        "recA": jnp.zeros((L, N_NODES, REC_W), jnp.int32),
        "recC": jnp.zeros((L, N_NODES, 3, 16, 16), jnp.int16),
    }
    for f in DD_FIELDS:
        st["dd_" + f] = _wins(fs["dd_" + f], sby >> 2, sbx >> 2, 34, 34
                              ).astype(jnp.int32)
    return st


@partial(jax.jit, static_argnames=("L", "nsb"))
def flush_lanes(fs, st, sb_index, L: int, nsb: int):
    """Write lane interiors + records back into the frame state."""
    fs = dict(fs)
    live = st["live"]

    def put(frame, tile, y0, x0, hh: int, ww: int):
        for lane in range(L):
            cur = _ds(frame, (y0[lane], x0[lane]), (hh, ww))
            new = jnp.where(live[lane], tile[lane].astype(frame.dtype), cur)
            frame = _dus(frame, new, (y0[lane], x0[lane]))
        return frame

    fs["rec_y"] = put(fs["rec_y"], st["rec_y"][:, 1:129, 1:129],
                      1 + st["sby"], 1 + st["sbx"], 128, 128)
    fs["rec_u"] = put(fs["rec_u"], st["rec_u"][:, 1:65, 1:65],
                      1 + (st["sby"] >> 1), 1 + (st["sbx"] >> 1), 64, 64)
    fs["rec_v"] = put(fs["rec_v"], st["rec_v"][:, 1:65, 1:65],
                      1 + (st["sby"] >> 1), 1 + (st["sbx"] >> 1), 64, 64)
    for f in DD_FIELDS:
        fs["dd_" + f] = put(fs["dd_" + f], st["dd_" + f][:, 1:33, 1:33],
                            1 + (st["sby"] >> 2), 1 + (st["sbx"] >> 2),
                            32, 32)
    sbi = jnp.where(live, sb_index, nsb)
    fs["recA"] = fs["recA"].at[sbi].set(st["recA"], mode="drop")
    fs["recC"] = fs["recC"].at[sbi].set(st["recC"], mode="drop")
    return fs


_BODY_JIT = {}


def _body_call(kind: int, st, fc, oy: int, ox: int, nid: int, cfg):
    """Dispatch one program step through the per-kind jitted bodies."""
    if kind not in _BODY_JIT:
        if kind == K_16SUB:
            f = jax.jit(lambda st, fc, oy, ox, nid, cfg:
                        body_16sub(st, fc, oy, ox, nid, cfg),
                        static_argnames=("cfg",))
        elif kind in (K_E128, K_E64, K_E32):
            size = {K_E128: 128, K_E64: 64, K_E32: 32}[kind]
            f = jax.jit(lambda st, fc, oy, ox, nid, cfg, _s=size:
                        body_enter(st, fc, oy, ox, nid, _s, cfg),
                        static_argnames=("cfg",))
        else:
            size = {K_D128: 128, K_D64: 64, K_D32: 32}[kind]
            f = jax.jit(lambda st, fc, oy, ox, nid, cfg, _s=size:
                        body_decide(st, fc, oy, ox, nid, _s, cfg),
                        static_argnames=("cfg",))
        _BODY_JIT[kind] = f
    return _BODY_JIT[kind](st, fc, jnp.int32(oy), jnp.int32(ox),
                           jnp.int32(nid), cfg)


_PROGRAM = build_program()
_PROG_NID = [node_id({K_E128: 128, K_E64: 64, K_E32: 32, K_D128: 128,
                      K_D64: 64, K_D32: 32, K_16SUB: 16}[k], oy, ox)
             for (k, oy, ox) in _PROGRAM]


def run_diagonal(fs, fc, cfg, org, lanes, sb_index, Lmax: int, nsb: int):
    """Run the 106-step node program for one wavefront diagonal."""
    L = Lmax
    sby = jnp.asarray([p[0] for p in lanes] + [0] * (L - len(lanes)),
                      jnp.int32)
    sbx = jnp.asarray([p[1] for p in lanes] + [0] * (L - len(lanes)),
                      jnp.int32)
    live = jnp.asarray([True] * len(lanes) + [False] * (L - len(lanes)))
    sbi = jnp.asarray(sb_index + [nsb] * (L - len(lanes)), jnp.int32)
    st = gather_lanes(fs, org[0], org[1], org[2], sby, sbx, live, L)
    for step, (kind, oy, ox) in enumerate(_PROGRAM):
        st = _body_call(kind, st, fc, oy, ox, _PROG_NID[step], cfg)
    return flush_lanes(fs, st, sbi, L, nsb)


# ---------------------------------------------------------------------------
# frame driver
# ---------------------------------------------------------------------------

def lc_supported(enc) -> bool:
    """Feature gate for the device decision pass (LDB LC preset family)."""
    p = enc.params
    fi = enc.fi
    return (p.subsample == 420 and p.bitdepth == 8 and
            p.input_bitdepth == 8 and p.encoder_speed == 2 and
            not p.enable_tb_split and not p.enable_pb_split and
            not p.enable_bipred and not p.intra_rdo and
            not p.qmtx and p.bitrate == 0 and p.max_delta_qp == 0 and
            not p.sync and p.interp_ref == 0 and
            p.log2_sb_size == 7 and p.early_skip_thr > 0 and
            fi.frame_type in (I_FRAME, P_FRAME) and fi.num_ref <= 2 and
            fi.num_intra_modes == 4 and
            p.width % 8 == 0 and p.height % 8 == 0)


def build_frame_consts(enc):
    """Per-frame device constants: org planes + per-ref raw/variant stacks."""
    p = enc.params
    fi = enc.fi
    h, w = p.height, p.width
    org_y = np.zeros((h + 136, w + 136), np.int16)
    org_y[:h, :w] = enc.orig.y
    org_u = np.zeros((h // 2 + 72, w // 2 + 72), np.int16)
    org_u[:h // 2, :w // 2] = enc.orig.u
    org_v = np.zeros_like(org_u)
    org_v[:h // 2, :w // 2] = enc.orig.v
    org = (jnp.asarray(org_y), jnp.asarray(org_u), jnp.asarray(org_v))

    raws, vy, vu, vv = [], [], [], []
    nref = max(1, fi.num_ref)
    for r in range(2):
        ref = enc.ref[fi.ref_array[min(r, nref - 1)]] if fi.num_ref \
            else enc.ref[0]
        raws.append(jnp.asarray(ref.y_full.astype(np.int16)))
        vy.append(make_luma_variants(jnp.asarray(
            ref.y_full.astype(np.int32))))
        vu.append(make_chroma_variants(jnp.asarray(
            ref.u_full.astype(np.int32))))
        vv.append(make_chroma_variants(jnp.asarray(
            ref.v_full.astype(np.int32))))
    fc = {
        "raw_y": jnp.stack(raws),
        "vars_y": jnp.concatenate(vy, axis=0),
        "vars_u": jnp.concatenate(vu, axis=0),
        "vars_v": jnp.concatenate(vv, axis=0),
    }
    return fc, org


IQ8 = [6, 7, 8, 8, 10, 11, 12, 13, 15, 17, 19, 21, 24, 27, 30, 34,
       38, 43, 48, 54, 60, 68, 76, 86, 96, 108, 121, 136, 152, 171,
       192, 216, 242, 272, 305, 342, 384, 431, 484, 543, 610, 684,
       768, 862, 968, 1086, 1219, 1368, 1536, 1724, 1935, 2172]


def build_cfg(enc):
    """Static jit config (frame type / geometry / feature flags only -
    everything qp-derived is traced via build_dyn, so a whole sequence
    compiles each body once per frame type)."""
    p = enc.params
    fi = enc.fi
    return LCCfg(w=p.width, h=p.height,
                 num_ref=max(fi.num_ref, 1),
                 is_i=(fi.frame_type == I_FRAME),
                 cfl_intra=p.cfl_intra, ctx=p.use_block_contexts)


def build_dyn(enc):
    """Traced per-frame scalars (qp ladder, lambda, early-skip
    thresholds, the 16->8 top-down threshold)."""
    p = enc.params
    fi = enc.fi
    qp = fi.qp
    qpC = int(CHROMA_QP[qp])
    from .encoder import SQUARED_LAMBDA_QP
    lam = fi.lambda_coeff * SQUARED_LAMBDA_QP[qp]
    sqrt_lam = math.sqrt(lam)
    dyn = {
        "qp": jnp.int32(qp), "qpC": jnp.int32(qpC),
        "lam": jnp.float64(lam), "sqrt_lam": jnp.float64(sqrt_lam),
        "isqrt_bias": jnp.int64(int(sqrt_lam * 2 + 0.5)),
        "thr16": jnp.int64(16 * 16 * IQ8[qp] // 8),
    }
    for size in (8, 16, 32, 64, 128):
        tl, tc = early_skip_thresholds(qp, qpC, p.early_skip_thr,
                                       sb_bump=(size == SB))
        s2 = min(size, 32) // 2
        dyn["thr_l_%d" % size] = jnp.int32(tl[s2])
        if size == 8:
            dyn["thr_c"] = jnp.int32(tc)
        if size == 128:
            dyn["thr_c128"] = jnp.int32(tc)
    return dyn


class _CfgView:
    """Kept for compatibility: plain pass-through of the static cfg."""

    def __init__(self, cfg: LCCfg):
        self._cfg = cfg

    def __getitem__(self, k):
        return self._cfg[k]

    def __hash__(self):
        return hash(self._cfg)

    def __eq__(self, other):
        return isinstance(other, _CfgView) and self._cfg == other._cfg


def encode_frame_device(enc):
    """Run the SB loop of encode_frame on device, then replay the syntax.

    Replaces the raster process_block loop of enc/encode_frame.c:697-758
    bit-exactly: identical bitstream, recon and deblock data."""
    p = enc.params
    fi = enc.fi
    h, w = p.height, p.width
    nsh = (w + SB - 1) // SB
    nsv = (h + SB - 1) // SB
    nsb = nsh * nsv
    cfg0 = build_cfg(enc)
    cfg = _CfgView(cfg0)
    fc, org = build_frame_consts(enc)
    fc["dyn"] = build_dyn(enc)
    fs = alloc_frame_state(w, h, nsb)

    # wavefront schedule: s = 2k + l (deps: left, top-left, top, top-right)
    diagonals = []
    for s in range(2 * (nsv - 1) + (nsh - 1) + 1):
        lanes = [(k * SB, (s - 2 * k) * SB)
                 for k in range(nsv) if 0 <= s - 2 * k < nsh]
        if lanes:
            idx = [(yy // SB) * nsh + (xx // SB) for yy, xx in lanes]
            diagonals.append((lanes, idx))
    Lmax = max(len(lanes) for lanes, _ in diagonals)

    import os
    if os.environ.get("THOR_LC_MEGAKERNEL", "1") == "1":
        D = len(diagonals)
        sby_d = np.zeros((D, Lmax), np.int32)
        sbx_d = np.zeros((D, Lmax), np.int32)
        live_d = np.zeros((D, Lmax), bool)
        sbi_d = np.full((D, Lmax), nsb, np.int32)
        for di, (lanes, idx) in enumerate(diagonals):
            for li, ((yy, xx), ii) in enumerate(zip(lanes, idx)):
                sby_d[di, li] = yy
                sbx_d[di, li] = xx
                live_d[di, li] = True
                sbi_d[di, li] = ii
        fs = frame_megakernel(fs, fc, org[0], org[1], org[2],
                              jnp.asarray(sby_d), jnp.asarray(sbx_d),
                              jnp.asarray(live_d), jnp.asarray(sbi_d),
                              cfg, Lmax, nsb)
    else:
        for lanes, idx in diagonals:
            fs = run_diagonal(fs, fc, cfg, org, lanes, idx, Lmax, nsb)

    # pull results
    recA = np.asarray(fs["recA"][:nsb])
    recC = np.asarray(fs["recC"][:nsb])
    enc.rec.y[:, :] = np.asarray(fs["rec_y"][1:1 + h, 1:1 + w])
    enc.rec.u[:, :] = np.asarray(fs["rec_u"][1:1 + h // 2, 1:1 + w // 2])
    enc.rec.v[:, :] = np.asarray(fs["rec_v"][1:1 + h // 2, 1:1 + w // 2])
    dd = enc.dd
    hc, wc = h // 4, w // 4
    for f, arr in (("mode", dd.mode), ("size", dd.size),
                   ("tb_split", dd.tb_split), ("pb_part", dd.pb_part),
                   ("cbp_y", dd.cbp_y), ("cbp_u", dd.cbp_u),
                   ("cbp_v", dd.cbp_v), ("ref_idx0", dd.ref_idx0),
                   ("ref_idx1", dd.ref_idx1), ("bipred_flag",
                                               dd.bipred_flag)):
        key = {"mode": "dd_mode", "size": "dd_size", "tb_split": "dd_tb",
               "pb_part": "dd_pb", "cbp_y": "dd_cbp_y",
               "cbp_u": "dd_cbp_u", "cbp_v": "dd_cbp_v",
               "ref_idx0": "dd_ref0", "ref_idx1": "dd_ref1",
               "bipred_flag": "dd_bip"}[f]
        arr[:] = np.asarray(fs[key][1:1 + hc, 1:1 + wc]).astype(
            np.int32).reshape(-1)
    dd.mv0[:, 0] = np.asarray(fs["dd_mv0y"][1:1 + hc, 1:1 + wc]
                              ).reshape(-1)
    dd.mv0[:, 1] = np.asarray(fs["dd_mv0x"][1:1 + hc, 1:1 + wc]
                              ).reshape(-1)
    dd.mv1[:, 0] = np.asarray(fs["dd_mv1y"][1:1 + hc, 1:1 + wc]
                              ).reshape(-1)
    dd.mv1[:, 1] = np.asarray(fs["dd_mv1x"][1:1 + hc, 1:1 + wc]
                              ).reshape(-1)

    emit_frame(enc, recA, recC, nsh, nsv)


# ---------------------------------------------------------------------------
# syntax emission replay (host, no numerics)
# ---------------------------------------------------------------------------

class _EmitBI:
    """Minimal BlockInfo stand-in for writer.write_block."""
    pass


def emit_frame(enc, recA, recC, nsh: int, nsv: int):
    from . import writer as W
    p = enc.params
    fi = enc.fi
    h, w = p.height, p.width

    def emit(sbi, sby, sbx, size, oy, ox):
        ypos, xpos = sby + oy, sbx + ox
        if ypos + 8 > h or xpos + 8 > w:
            return
        encode_this = ypos + size <= h and xpos + size <= w
        nid = node_id(size, oy, ox)
        rec = recA[sbi, nid]
        flags = int(rec[RF_FLAGS])
        leaf = bool(flags & FLAG_SELF)
        bi = _EmitBI()
        bi.size = size
        bi.ypos, bi.xpos = ypos, xpos
        bi.sub = 1
        bi.max_num_tb_part = 1
        bi.max_num_pb_part = 1
        bi.num_skip_vec = int(rec[RF_NSV])
        bi.num_merge_vec = int(rec[RF_NMV])
        bi.mvp = (int(rec[RF_MVPY]), int(rec[RF_MVPX]))
        bi.ctx_cbp = int(rec[RF_CTXCBP])
        bi.ctx_index = int(rec[RF_CTXIDX])
        bi.delta_qp = 0
        if leaf:
            mode = int(rec[RF_MODE])
            mv = (int(rec[RF_MVY]), int(rec[RF_MVX]))
            qs = min(16, size)
            qsc = min(16, size // 2)
            bp = {
                "mode": mode, "tb_split": 0, "pb_part": 0,
                "skip_idx": int(rec[RF_IDX]),
                "intra_mode": int(rec[RF_IMODE]),
                "ref_idx0": int(rec[RF_REF]), "ref_idx1": int(rec[RF_REF]),
                "mv_arr0": [mv] * 4, "mv_arr1": [mv] * 4,
                "cbp": (int(rec[RF_CBPY]), int(rec[RF_CBPU]),
                        int(rec[RF_CBPV])),
                "coeff_y": recC[sbi, nid, 0, :qs, :qs].astype(np.int32),
                "coeff_u": recC[sbi, nid, 1, :qsc, :qsc].astype(np.int32),
                "coeff_v": recC[sbi, nid, 2, :qsc, :qsc].astype(np.int32),
            }
            W.write_block(enc.writer, enc, bi, bp)
            return
        # split: super-mode split signal then recurse
        W.write_super_mode(enc.writer, enc, bi, MODE_SKIP, 0, 1,
                           encode_this)
        half = size // 2
        for dy, dx in child_offsets(size):
            emit(sbi, sby, sbx, half, oy + dy, ox + dx)

    for k in range(nsv):
        for sl in range(nsh):
            emit(k * nsh + sl, k * SB, sl * SB, SB, 0, 0)


# ---------------------------------------------------------------------------
# dynamic-qp quantizer / dequantizer (traced qp: one compile per frame type)
# ---------------------------------------------------------------------------

def quantize_dyn(coeff, qp, size: int, intra_block):
    """ops.quant.quantize_batch with traced qp and intra flag
    (enc/encode_block.c:84-160)."""
    from ..ops.quant import _zz_perms, _compose
    tr_log2size = log2i(size)
    qsize = min(16, size)
    n2 = qsize * qsize
    scale = jnp.asarray(GQUANT)[qp % 6].astype(jnp.int32)
    shift2 = 21 - tr_log2size + qp // 6
    zz, inv = _zz_perms(qsize)
    c = coeff.reshape(coeff.shape[0], n2).astype(jnp.int32)
    sc = jnp.take(c, jnp.asarray(inv), axis=1)
    absc = jnp.abs(sc)
    sign = jnp.where(sc < 0, -1, 1).astype(jnp.int32)
    a = absc * scale
    off_r = jnp.where(intra_block, 38, -26) << (shift2 - 8)
    lev_r = jnp.abs(a + off_r) >> shift2
    nz = lev_r != 0
    idx = jnp.arange(n2, dtype=jnp.int32)
    last_pos = jnp.max(jnp.where(nz, idx, -1), axis=1)
    offset0 = jnp.where(intra_block, 102, 51)
    offset1 = jnp.where(intra_block, 115, 90)
    level0 = a >> shift2
    off_s0 = jnp.where(level0 > 1, offset1, offset0) << (shift2 - 8)
    off_s1 = jnp.where(level0 > 0, offset1, offset0) << (shift2 - 8)
    lv0 = (a + off_s0) >> shift2
    lv1 = (a + off_s1) >> shift2
    active = idx[None, :] <= last_pos[:, None]
    m0 = jnp.where(active, (lv0 > 1).astype(jnp.int32), 0)
    m1 = jnp.where(active, (lv1 != 0).astype(jnp.int32), 1)
    cm0, cm1 = jax.lax.associative_scan(_compose, (m0, m1), axis=1)
    state = jnp.concatenate(
        [jnp.ones((sc.shape[0], 1), jnp.int32), cm1[:, :-1]], axis=1)
    level = jnp.where(state == 1, lv1, lv0)
    level = jnp.where(active, level, 0)
    scq = sign * level
    cbp = jnp.any(scq != 0, axis=1).astype(jnp.int32)
    cq = jnp.take(scq, jnp.asarray(zz), axis=1).reshape(
        coeff.shape[0], qsize, qsize)
    return cq, cbp


def dequantize_dyn(coeff, qp, size: int):
    """ops.transform.dequantize_batch with traced qp
    (common/common_block.c:45-73, unweighted)."""
    from ..tables import GDEQUANT
    tr_log2size = log2i(size)
    lshift = qp // 6
    qsize = min(16, size)
    rshift = tr_log2size - 1
    scale = jnp.asarray(GDEQUANT)[qp % 6].astype(jnp.int64)
    c = coeff[:, :qsize, :qsize].astype(jnp.int64)
    hi = (c * scale) << jnp.maximum(lshift - rshift, 0)
    add = jnp.int64(1) << jnp.maximum(rshift - lshift - 1, 0)
    lo = (c * scale + add) >> jnp.maximum(rshift - lshift, 0)
    r = jnp.where(lshift >= rshift, hi, lo)
    r = _i16_j(r.astype(jnp.int32))
    out = jnp.zeros((coeff.shape[0], size, size), jnp.int32)
    return out.at[:, :qsize, :qsize].set(r)


# ---------------------------------------------------------------------------
# one-call-per-frame megakernel (scan over diagonals / program / switch)
# ---------------------------------------------------------------------------

def _step_switch(st, fc, cfg, kind, oy, ox, nid):
    """lax.switch over the node-body kinds (each branch traced once)."""
    def b_e128(s):
        return body_enter(s, fc, oy, ox, nid, 128, cfg)

    def b_e64(s):
        return body_enter(s, fc, oy, ox, nid, 64, cfg)

    def b_e32(s):
        return body_enter(s, fc, oy, ox, nid, 32, cfg)

    def b_d32(s):
        return body_decide(s, fc, oy, ox, nid, 32, cfg)

    def b_d64(s):
        return body_decide(s, fc, oy, ox, nid, 64, cfg)

    def b_d128(s):
        return body_decide(s, fc, oy, ox, nid, 128, cfg)

    def b_16(s):
        return body_16sub(s, fc, oy, ox, nid, cfg)

    return jax.lax.switch(kind, [b_e128, b_e64, b_e32, b_d32, b_d64,
                                 b_d128, b_16], st)


@partial(jax.jit, static_argnames=("cfg", "L", "nsb"),
         donate_argnames=("fs",))
def frame_megakernel(fs, fc, org_y, org_u, org_v, sby_d, sbx_d, live_d,
                     sbi_d, cfg, L: int, nsb: int):
    """Whole-frame SB decision pass in one device call.

    sby_d/sbx_d [D, L], live_d [D, L], sbi_d [D, L]: per-diagonal lane
    tables (padded to L lanes).  Scans diagonals sequentially; each
    diagonal gathers lane state, runs the 106-step node program with a
    kind switch, and flushes back into the frame state.
    """
    prog_kind = jnp.asarray([k for k, _, _ in _PROGRAM], jnp.int32)
    prog_oy = jnp.asarray([oy for _, oy, _ in _PROGRAM], jnp.int32)
    prog_ox = jnp.asarray([ox for _, _, ox in _PROGRAM], jnp.int32)
    prog_nid = jnp.asarray(_PROG_NID, jnp.int32)

    def diag_body(fs, xs):
        sby, sbx, live, sbi = xs
        st = gather_lanes(fs, org_y, org_u, org_v, sby, sbx, live, L)

        def prog_body(st, step):
            kind, oy, ox, nid = step
            st = _step_switch(st, fc, cfg, kind, oy, ox, nid)
            return st, ()

        st, _ = jax.lax.scan(prog_body, st,
                             (prog_kind, prog_oy, prog_ox, prog_nid))
        fs = flush_lanes(fs, st, sbi, L, nsb)
        return fs, ()

    fs, _ = jax.lax.scan(diag_body, fs, (sby_d, sbx_d, live_d, sbi_d))
    return fs
