"""Device (TPU) temporal frame interpolation (interp_ref).

Replicates spec/tempinterp.py (reference common/temporal_interp.c:
interpolate_frames:909, motion_estimate_bi:786, adaptive_search_v2:584,
skip_test:458, merge_candidate_search:661, interpolate_frame:880)
bit-exactly with batched device passes:

  - block pass: the per-16x16-block skip test + candidate search has a
    left/top-left/top/top-right dependency through the MV grid, so it
    runs as a 2:1-skewed wavefront (s = 2*bi + bj) with all blocks of a
    diagonal evaluated in lockstep (masked candidate slots, fori_loop
    cross refinement mirroring the C trajectory decision-for-decision)
  - merge pass: reads only the pre-merge grid -> one batched call
  - motion-compensated averaging: per-cell, one batched call

The C in-range SAD fast path and its clipped fallback compute identical
values, so the device uses the clipped gather everywhere; the skip test
(which rejects out-of-range windows instead of clipping) keeps explicit
bounds masks.  All arithmetic is int32 (matches the reference's int).
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..frame import YuvFrame

I32 = jnp.int32
ACC_BITS = 3
ACC_ROUND = 4
LAMBDA = 3000            # (3000 * BLOCK_STEP) // 16
LAMBDA_SHIFT = 4
COST_MAX = 0x3FFFFFFF
SKIP_THR = 8 * 8 * 8     # skip_thr * 8 * 8


def _ar(n):
    return jnp.arange(n, dtype=I32)


def _scale1(v, numer, denom):
    """scale_val (temporal_interp.c helper): round half away from zero."""
    prod = v * numer
    q = (jnp.abs(prod) + denom // 2) // denom
    return jnp.where(prod >= 0, q, -q).astype(I32)


def _scale(mx, my, numer, denom):
    return _scale1(mx, numer, denom), _scale1(my, numer, denom)


def _win(plane, pad, ys, xs, size: int, lo, hi_x, hi_y):
    """Clipped [N,size,size] window gather at visible coords (ys,xs)."""
    rr = jnp.clip(ys[:, None] + _ar(size)[None, :], lo, hi_y) + pad
    cc = jnp.clip(xs[:, None] + _ar(size)[None, :], lo, hi_x) + pad
    return plane[rr[:, :, None], cc[:, None, :]]


# ---------------------------------------------------------------------------
# block pass (wavefront)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("w", "h", "pad", "bw", "bh", "guided"))
def me_bi_level(y0, y1, guide, wt0, wt1, *, w: int, h: int, pad: int,
                bw: int, bh: int, guided: bool):
    """motion_estimate_bi block pass for one pyramid level.

    y0/y1: padded int32 luma planes in pics order (already swapped when
    reversed).  guide: [bh,bw,2] (x,y) spatial guide grid (ignored when
    not guided).  Returns (mv1 [bh,bw,2], mv0, bgmap [bh,bw])."""
    step = 2
    nbx, nby = bw // step, bh // step
    L = 0
    for s in range(2 * (nby - 1) + nbx):
        lo = max(0, (s - nbx + 2) // 2)
        hi = min(nby - 1, s // 2)
        L = max(L, hi - lo + 1)
    S = 2 * (nby - 1) + nbx - 1 + 1

    lam = LAMBDA // 4 if guided else LAMBDA
    shift0 = (0 if guided else 3) + ACC_BITS
    count0 = 8 if guided else 64
    niter = count0 // 4

    def rd(g, ci, cj):
        return g[jnp.clip(ci, 0, bh - 1), jnp.clip(cj, 0, bw - 1)]

    def sad16(m0x, m0y, m1x, m1y, py0, px0):
        xs0 = px0 + ((m0x + ACC_ROUND) >> ACC_BITS)
        ys0 = py0 + ((m0y + ACC_ROUND) >> ACC_BITS)
        xs1 = px0 + ((m1x + ACC_ROUND) >> ACC_BITS)
        ys1 = py0 + ((m1y + ACC_ROUND) >> ACC_BITS)
        a = _win(y0, pad, ys0, xs0, 16, -pad, w + pad - 1, h + pad - 1)
        b = _win(y1, pad, ys1, xs1, 16, -pad, w + pad - 1, h + pad - 1)
        return jnp.abs(a - b).sum(axis=(1, 2)).astype(I32)

    def diag_body(carry, s):
        mv1g, mv0g, bgg = carry
        lo = jnp.maximum(0, (s - nbx + 2) // 2)
        bi = lo + _ar(L)
        bj = s - 2 * bi
        valid = (bi <= jnp.minimum(nby - 1, s // 2)) & (bj >= 0)
        i = bi * step
        j = bj * step
        py0, px0 = i * 8, j * 8

        condA = (i > 0) & (j < bw - step)      # top-right
        condB = j > 0                          # left
        condC = i > 0                          # top
        vA = rd(mv1g, i - step, j + step)
        vB = rd(mv1g, i, j - step)
        vC = rd(mv1g, i - step, j)

        # ---- skip vector: absdist filter over present [A,B,C] --------
        pres = (condA, condB, condC)
        vs = (vA, vB, vC)
        f_cost = jnp.full((L,), COST_MAX, I32)
        skx = jnp.zeros((L,), I32)
        sky = jnp.zeros((L,), I32)
        for k in range(3):
            ck = jnp.zeros((L,), I32)
            for m in range(3):
                d = (jnp.abs(vs[m][:, 0] - vs[k][:, 0]) +
                     jnp.abs(vs[m][:, 1] - vs[k][:, 1]))
                ck = ck + jnp.where(pres[m], d, 0)
            upd = pres[k] & (ck <= f_cost)
            f_cost = jnp.where(upd, ck, f_cost)
            skx = jnp.where(upd, vs[k][:, 0], skx)
            sky = jnp.where(upd, vs[k][:, 1], sky)
        ssx, ssy = _scale(skx, sky, -wt1, wt0)

        # ---- skip test (8x8 quadrants; OOB window -> no skip) --------
        skipf = jnp.ones((L,), bool)
        for dy in (0, 8):
            for dx in (0, 8):
                qx, qy = px0 + dx, py0 + dy
                xs0 = qx + ((ssx + ACC_ROUND) >> ACC_BITS)
                ys0 = qy + ((ssy + ACC_ROUND) >> ACC_BITS)
                xs1 = qx + ((skx + ACC_ROUND) >> ACC_BITS)
                ys1 = qy + ((sky + ACC_ROUND) >> ACC_BITS)
                inb = ((xs0 >= -pad) & (xs0 + 8 <= w + pad) &
                       (ys0 >= -pad) & (ys0 + 8 <= h + pad) &
                       (xs1 >= -pad) & (xs1 + 8 <= w + pad) &
                       (ys1 >= -pad) & (ys1 + 8 <= h + pad))
                a = _win(y0, pad, ys0, xs0, 8, -pad, w + pad - 1,
                         h + pad - 1)
                b = _win(y1, pad, ys1, xs1, 8, -pad, w + pad - 1,
                         h + pad - 1)
                sad = jnp.abs(a - b).sum(axis=(1, 2)).astype(I32)
                skipf = skipf & inb & (sad <= SKIP_THR)

        # ---- mv-cost neighbour context (temporal_interp.c:302-314) ---
        case4 = (i > 0) & (j > 0) & (j < bw - step)
        case_y0 = (i == 0) & (j > 0)
        case_x0 = (j == 0) & (i > 0)
        nTL = rd(mv1g, i - step, j - step)
        nbrs = (vA, vC, nTL, vB)               # TR, T, TL, L
        nbw = (case4 | case_x0, case4 | case_x0, case4, case4 | case_y0)

        def mv_cost(rmx, rmy):
            diff = jnp.zeros((L,), I32)
            for nb, wgt in zip(nbrs, nbw):
                d = jnp.abs(rmx - nb[:, 0]) + jnp.abs(rmy - nb[:, 1])
                diff = diff + jnp.where(wgt, d, 0)
            return (diff * lam) >> (LAMBDA_SHIFT + ACC_BITS)

        # ---- candidate slots (zero, guide, TR, L, T) with dedup ------
        gmv = rd(guide, i, j)
        slots = [(jnp.zeros((L,), I32), jnp.zeros((L,), I32),
                  jnp.ones((L,), bool))]
        if guided:
            slots.append((gmv[:, 0], gmv[:, 1], jnp.ones((L,), bool)))
        slots.append((vA[:, 0], vA[:, 1], condA))
        slots.append((vB[:, 0], vB[:, 1], condB))
        slots.append((vC[:, 0], vC[:, 1], condC))
        kept = []
        for k, (mx, my, av) in enumerate(slots):
            dup = jnp.zeros((L,), bool)
            for m in range(k):
                pmx, pmy, _ = slots[m]
                dup = dup | (kept[m] & (pmx == mx) & (pmy == my))
            kept.append(av & ~dup)

        best_cost = jnp.full((L,), COST_MAX, I32)
        best_x = jnp.zeros((L,), I32)
        best_y = jnp.zeros((L,), I32)
        cidx = jnp.zeros((L,), I32)
        for k, (mx, my, _) in enumerate(slots):
            kc = kept[k]
            m0x, m0y = _scale(mx, my, -wt1, wt0)
            cost = mv_cost(mx, my) + sad16(m0x, m0y, mx, my, py0, px0)
            gate = kc & (((4 + cidx) * cost) // 8 < best_cost)

            def rbody(_t, st):
                cost, rx, ry, shift, count, act = st
                bx, by = rx, ry
                better = jnp.zeros((L,), bool)
                off = jnp.left_shift(jnp.int32(1), shift)
                for sx, sy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                    rmx = bx + sx * off
                    rmy = by + sy * off
                    r0x, r0y = _scale(rmx, rmy, -wt1, wt0)
                    bc = mv_cost(rmx, rmy) + sad16(r0x, r0y, rmx, rmy,
                                                   py0, px0)
                    upd = act & (bc < cost)
                    cost = jnp.where(upd, bc, cost)
                    rx = jnp.where(upd, rmx, rx)
                    ry = jnp.where(upd, rmy, ry)
                    better = better | upd
                shift = jnp.where(act & ~better, shift - 1, shift)
                count = count - 4
                act = act & (shift >= ACC_BITS) & (count > 0)
                return (cost, rx, ry, shift, count, act)

            st = (cost, mx, my, jnp.full((L,), shift0, I32),
                  jnp.full((L,), count0, I32), gate)
            cost, rx, ry, _, _, _ = jax.lax.fori_loop(0, niter, rbody, st)
            upd = kc & (cost < best_cost)
            best_cost = jnp.where(upd, cost, best_cost)
            best_x = jnp.where(upd, rx, best_x)
            best_y = jnp.where(upd, ry, best_y)
            cidx = cidx + kc.astype(I32)

        selx = jnp.where(skipf, skx, best_x)
        sely = jnp.where(skipf, sky, best_y)
        s0x, s0y = _scale(selx, sely, -wt1, wt0)

        ri = i[:, None, None] + _ar(step)[None, :, None]
        cj = j[:, None, None] + _ar(step)[None, None, :]
        ri = jnp.where(valid[:, None, None], ri, bh)
        v1 = jnp.broadcast_to(jnp.stack([selx, sely], -1)[:, None, None, :],
                              (L, step, step, 2))
        v0 = jnp.broadcast_to(jnp.stack([s0x, s0y], -1)[:, None, None, :],
                              (L, step, step, 2))
        bgv = jnp.broadcast_to(skipf.astype(I32)[:, None, None],
                               (L, step, step))
        mv1g = mv1g.at[ri, cj].set(v1, mode="drop")
        mv0g = mv0g.at[ri, cj].set(v0, mode="drop")
        bgg = bgg.at[ri, cj].set(bgv, mode="drop")
        return (mv1g, mv0g, bgg), ()

    z2 = jnp.zeros((bh, bw, 2), I32)
    zg = jnp.zeros((bh, bw), I32)
    (mv1g, mv0g, bgg), _ = jax.lax.scan(diag_body, (z2, z2, zg),
                                        jnp.arange(S, dtype=I32))
    return mv1g, mv0g, bgg


# ---------------------------------------------------------------------------
# merge pass (parallel)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("w", "h", "pad", "bw", "bh"))
def merge_level(y0, y1, mv1g, mv0g, wt0, wt1, *, w: int, h: int, pad: int,
                bw: int, bh: int):
    """merge_candidate_search over the whole grid (reads pre-merge mvs)."""
    ii, jj = jnp.meshgrid(_ar(bh), _ar(bw), indexing="ij")
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    N = bh * bw
    off = 1 + (ii & 1)

    def rd(ci, cj):
        return mv1g[jnp.clip(ci, 0, bh - 1), jnp.clip(cj, 0, bw - 1)]

    slots = [(rd(ii, jj), jnp.ones((N,), bool)),
             (rd(ii - off, jj), ii - off >= 0),
             (rd(ii + off, jj), ii + off < bh),
             (rd(ii, jj - off), jj - off >= 0),
             (rd(ii, jj + off), jj + off < bw)]
    kept = []
    for k, (mv, av) in enumerate(slots):
        dup = jnp.zeros((N,), bool)
        for m in range(k):
            pmv, _ = slots[m]
            dup = dup | (kept[m] & (pmv[:, 0] == mv[:, 0]) &
                         (pmv[:, 1] == mv[:, 1]))
        kept.append(av & ~dup)
    nkept = sum(k.astype(I32) for k in kept)

    px0, py0 = jj * 8, ii * 8
    best_cost = jnp.full((N,), COST_MAX, I32)
    best_x = jnp.zeros((N,), I32)
    best_y = jnp.zeros((N,), I32)
    for k, (mv, _) in enumerate(slots):
        m1x, m1y = mv[:, 0], mv[:, 1]
        m0x, m0y = _scale(m1x, m1y, -wt1, wt0)
        xs0 = px0 + ((m0x + ACC_ROUND) >> ACC_BITS)
        ys0 = py0 + ((m0y + ACC_ROUND) >> ACC_BITS)
        xs1 = px0 + ((m1x + ACC_ROUND) >> ACC_BITS)
        ys1 = py0 + ((m1y + ACC_ROUND) >> ACC_BITS)
        a = _win(y0, pad, ys0, xs0, 8, -pad, w + pad - 1, h + pad - 1)
        b = _win(y1, pad, ys1, xs1, 8, -pad, w + pad - 1, h + pad - 1)
        cost = jnp.abs(a - b).sum(axis=(1, 2)).astype(I32)
        upd = kept[k] & (cost < best_cost)
        best_cost = jnp.where(upd, cost, best_cost)
        best_x = jnp.where(upd, m1x, best_x)
        best_y = jnp.where(upd, m1y, best_y)

    b0x, b0y = _scale(best_x, best_y, -wt1, wt0)
    mg = (nkept > 1).reshape(bh, bw)
    new1 = jnp.where(mg[..., None],
                     jnp.stack([best_x, best_y], -1).reshape(bh, bw, 2),
                     mv1g)
    new0 = jnp.where(mg[..., None],
                     jnp.stack([b0x, b0y], -1).reshape(bh, bw, 2),
                     mv0g)
    return new1, new0


# ---------------------------------------------------------------------------
# motion-compensated averaging (parallel)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("w", "h", "pad", "pad_c", "bw", "bh",
                                   "mono"))
def interp_exec(p0y, p1y, p0u, p1u, p0v, p1v, mv0g, mv1g, wt0, wt1, *,
                w: int, h: int, pad: int, pad_c: int, bw: int, bh: int,
                mono: bool):
    """interpolate_frame: per-cell MC averaging.  Bounds pad is bs//2=4
    (2 chroma) regardless of the storage pad (temporal_interp.c:880)."""
    ii, jj = jnp.meshgrid(_ar(bh), _ar(bw), indexing="ij")
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    m0 = mv0g.reshape(-1, 2)
    m1 = mv1g.reshape(-1, 2)

    def plane_mc(f0, f1, spad, m0x, m0y, m1x, m1y, bs, bpad, wp, hp):
        xs0 = jj * bs + ((m0x + ACC_ROUND) >> ACC_BITS)
        ys0 = ii * bs + ((m0y + ACC_ROUND) >> ACC_BITS)
        xs1 = jj * bs + ((m1x + ACC_ROUND) >> ACC_BITS)
        ys1 = ii * bs + ((m1y + ACC_ROUND) >> ACC_BITS)
        in0 = ((xs0 >= -bpad) & (xs0 + bs <= wp) &
               (ys0 >= -bpad) & (ys0 + bs <= hp))
        in1 = ((xs1 >= -bpad) & (xs1 + bs <= wp) &
               (ys1 >= -bpad) & (ys1 + bs <= hp))
        a = _win(f0, spad, ys0, xs0, bs, -bpad, wp - 1, hp - 1)
        b = _win(f1, spad, ys1, xs1, bs, -bpad, wp - 1, hp - 1)
        avg = (a + b + 1) >> 1
        out = jnp.where((in0 & ~in1)[:, None, None], a,
                        jnp.where((in1 & ~in0)[:, None, None], b, avg))
        return (out.reshape(bh, bw, bs, bs).transpose(0, 2, 1, 3)
                .reshape(bh * bs, bw * bs))

    bpad = 4
    lum = plane_mc(p0y, p1y, pad, m0[:, 0], m0[:, 1], m1[:, 0], m1[:, 1],
                   8, bpad, w + bpad, h + bpad)
    if mono:
        return lum, None, None
    c1x, c1y = m1[:, 0] >> 1, m1[:, 1] >> 1
    c0x, c0y = _scale(c1x, c1y, -wt1, wt0)
    wpc, hpc = (w + bpad) >> 1, (h + bpad) >> 1
    u = plane_mc(p0u, p1u, pad_c, c0x, c0y, c1x, c1y, 4, bpad >> 1,
                 wpc, hpc)
    v = plane_mc(p0v, p1v, pad_c, c0x, c0y, c1x, c1y, 4, bpad >> 1,
                 wpc, hpc)
    return lum, u, v


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def _upscale_mv1(src1, bh_d: int, bw_d: int, bw_s: int, bh_s: int):
    """_upscale_mv_data (mv[1] only; flat-index semantics preserved)."""
    ii, jj = jnp.meshgrid(_ar(bh_d), _ar(bw_d), indexing="ij")
    flat = jnp.clip((ii // 2) * bw_s + (jj // 2), 0, bh_s * bw_s - 1)
    return 2 * src1.reshape(-1, 2)[flat]


def interpolate_frames(new_frame: YuvFrame, ref0: YuvFrame,
                       ref1: YuvFrame, ratio: int, pos: int):
    """Drop-in device twin of spec.tempinterp.interpolate_frames."""
    w, h = ref0.width, ref0.height
    max_levels = min(4, int(math.log10(min(w, h)) / math.log10(2.0) - 4.0))
    reversed_ = int(pos > ratio // 2)
    wt0 = pos if reversed_ else ratio - pos
    wt1 = ratio - wt0
    wt0j, wt1j = jnp.int32(wt0), jnp.int32(wt1)

    levels = []
    for j in range(max_levels):
        wj, hj = w >> j, h >> j
        levels.append((wj, hj, 2 * ((wj + 15) // 16),
                       2 * ((hj + 15) // 16)))

    from ..spec.tempinterp import _downscale_luma
    in_down = [[ref0, ref1]]
    for i in range(1, max_levels):
        f0 = YuvFrame(w >> i, h >> i, ref0.subsample, 32, ref0.bitdepth,
                      ref0.input_bitdepth)
        f1 = YuvFrame(w >> i, h >> i, ref0.subsample, 32, ref0.bitdepth,
                      ref0.input_bitdepth)
        in_down.append([f0, f1])
    for lvl in range(max_levels - 1):
        _downscale_luma(in_down[lvl][0], in_down[lvl + 1][0])
        _downscale_luma(in_down[lvl][1], in_down[lvl + 1][1])

    guide = None
    for lvl in range(max_levels - 1, -1, -1):
        wj, hj, bw, bh = levels[lvl]
        f0, f1 = in_down[lvl]
        pic0, pic1 = (f1, f0) if reversed_ else (f0, f1)
        y0 = jnp.asarray(pic0.y_full.astype(np.int32))
        y1 = jnp.asarray(pic1.y_full.astype(np.int32))
        pad = f0.pad
        guided = lvl != max_levels - 1
        g = guide if guided else jnp.zeros((bh, bw, 2), I32)
        mv1g, mv0g, _bg = me_bi_level(y0, y1, g, wt0j, wt1j, w=wj, h=hj,
                                      pad=pad, bw=bw, bh=bh, guided=guided)
        mv1g, mv0g = merge_level(y0, y1, mv1g, mv0g, wt0j, wt1j, w=wj,
                                 h=hj, pad=pad, bw=bw, bh=bh)
        if lvl > 0:
            bw_d, bh_d = levels[lvl - 1][2], levels[lvl - 1][3]
            guide = _upscale_mv1(mv1g, bh_d, bw_d, bw, bh)
        else:
            mono = ref0.mono
            pu0 = jnp.asarray(pic0.u_full.astype(np.int32)) if not mono \
                else y0
            pu1 = jnp.asarray(pic1.u_full.astype(np.int32)) if not mono \
                else y1
            pv0 = jnp.asarray(pic0.v_full.astype(np.int32)) if not mono \
                else y0
            pv1 = jnp.asarray(pic1.v_full.astype(np.int32)) if not mono \
                else y1
            lum, u, v = interp_exec(y0, y1, pu0, pu1, pv0, pv1, mv0g,
                                    mv1g, wt0j, wt1j, w=wj, h=hj, pad=pad,
                                    pad_c=pic0.pad_c, bw=bw, bh=bh,
                                    mono=mono)
            op = new_frame.pad
            new_frame.y_full[op:op + bh * 8, op:op + bw * 8] = \
                np.asarray(lum).astype(new_frame.dtype)
            if not mono:
                oc = new_frame.pad_c
                new_frame.u_full[oc:oc + bh * 4, oc:oc + bw * 4] = \
                    np.asarray(u).astype(new_frame.dtype)
                new_frame.v_full[oc:oc + bh * 4, oc:oc + bw * 4] = \
                    np.asarray(v).astype(new_frame.dtype)


_gate = None


def device_ok() -> bool:
    """Lazy backend probe shared by encoder/decoder call sites."""
    global _gate
    if _gate is None:
        import os
        if os.environ.get("THOR_DEVICE_TEMPINTERP", "1") == "0":
            _gate = False
        else:
            try:
                jax.devices()
                _gate = True
            except Exception:
                _gate = False
    return _gate


def interpolate_frames_auto(new_frame, ref0, ref1, ratio, pos):
    """Device path when available; spec fallback (non-420, no backend)."""
    if ref0.subsample == 420 and device_ok():
        interpolate_frames(new_frame, ref0, ref1, ratio, pos)
    else:
        from ..spec.tempinterp import interpolate_frames as spec_if
        spec_if(new_frame, ref0, ref1, ratio, pos)
