"""Batched lockstep motion estimation (encoder plan milestone 2).

Replicates the reference's per-PU search trajectory
(enc/encode_block.c:517-711, LC/MC path: candidate list + hexagon
full-pel refinement + fast bilinear sub-pel) for a whole batch of
independent blocks at once, decision-for-decision: every stage evaluates
its candidates for all blocks in lockstep, with per-block masks carrying
each block's own control flow (candidate counts, hexagon direction
windows, early termination).  Bit-exact with enc.me.motion_estimate for
encoder_speed > 0 without bipred-telescope (the LDB low/medium paths).

This is the integration target for the wavefront encoder
(docs/ENCODER_TPU_PLAN.md): the decision pass calls this once per
(depth, size) over all SBs on an anti-diagonal.  Runs on any JAX backend;
on TPU the window gathers become the Pallas DMA pattern of ops/mc_pallas.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .enc_kernels import (fasthalf_batch, fastquarter_batch, sad_batch,
                          widesad_batch)

MAX_MV_EXT = 144
MAX_UINT32 = (1 << 32) - 1


def _trunc4(v):
    """C truncation toward zero of v/4 (vectorized)."""
    return jnp.where(v >= 0, v >> 2, -((-v) >> 2))


def clip_mv_batch(mvy, mvx, ypos, xpos, fwidth, fheight, bwidth, bheight,
                  sign):
    """inter_prediction.c:51-63 over arrays."""
    if sign:
        mvy, mvx = -mvy, -mvx
    mvy = jnp.where(ypos + _trunc4(mvy) < -MAX_MV_EXT,
                    4 * (-MAX_MV_EXT - ypos), mvy)
    mvy = jnp.where(ypos + _trunc4(mvy) + bheight > fheight + MAX_MV_EXT,
                    4 * (fheight + MAX_MV_EXT - ypos - bheight), mvy)
    mvx = jnp.where(xpos + _trunc4(mvx) < -MAX_MV_EXT,
                    4 * (-MAX_MV_EXT - xpos), mvx)
    mvx = jnp.where(xpos + _trunc4(mvx) + bwidth > fwidth + MAX_MV_EXT,
                    4 * (fwidth + MAX_MV_EXT - xpos - bwidth), mvx)
    if sign:
        mvy, mvx = -mvy, -mvx
    return mvy, mvx


def quote_mv_bits_batch(dy, dx):
    """enc/encode_block.c:467-515 over arrays."""
    def ln(mvabs):
        return jnp.where(
            mvabs < 1, 2,
            jnp.where(mvabs < 2, 4,
                      jnp.where(mvabs < 4, 5,
                                jnp.where(mvabs < 36,
                                          6 + ((mvabs - 4) >> 3),
                                          11 + ((mvabs - 36) >> 4)))))
    return ln(jnp.abs(dx)) + ln(jnp.abs(dy))


def _mv_cost(lam, dy, dx):
    """int(lam * quote_mv_bits + 0.5) with C float->int truncation."""
    bits = quote_mv_bits_batch(dy, dx)
    return jnp.floor(lam * bits.astype(jnp.float64) + 0.5).astype(jnp.int64)


def _gather(ref, y0, x0, h, w):
    """[N,h,w] windows at per-block (y0,x0) from the padded plane."""
    return jax.vmap(
        lambda a, b: jax.lax.dynamic_slice(ref, (a, b), (h, w)))(
        y0.astype(jnp.int32), x0.astype(jnp.int32))


@partial(jax.jit, static_argnames=("width", "height", "size", "sign",
                                   "fwidth", "fheight", "bitdepth",
                                   "maxcand", "telescope", "widesad32",
                                   "mvc_y", "mvc_x", "speed0", "bipred"))
def motion_estimate_batch(org, ref_full, pad, ypos, xpos, mvp_y, mvp_x,
                          lam, cand_y, cand_x, cand_n, width: int,
                          height: int, size: int, sign: int, fwidth: int,
                          fheight: int, bitdepth: int = 8,
                          maxcand: int = 4, telescope: bool = False,
                          widesad32: bool = False, mvc_y: int = 0,
                          mvc_x: int = 0, speed0: bool = False,
                          bipred: int = 0):
    """Lockstep ME for N same-sized PUs (the reference search, fast
    sub-pel path: encoder_speed > 0).

    org: [N,h,w] original blocks; ref_full: padded reference plane;
    ypos/xpos: [N] parent block positions; mvp_*: [N] MV predictors
    (quarter-pel); lam: [N] lambdas; cand_*: [N,maxcand] full-pel
    candidates with per-block counts cand_n.  telescope enables the
    +-64 coarse-to-fine grid stage ((size==16 and bipred) or speed==0;
    mvc_* is the common centre, widesad32 the speed<2 size-16 fast row
    scan at step 32).  Returns (sad [N], mv_y [N], mv_x [N]) identical
    to enc.me.motion_estimate per block.
    """
    n = org.shape[0]
    s = -1 if sign else 1
    shift = bitdepth - 8
    y0 = pad + ypos            # per-block reference anchors
    x0 = pad + xpos
    org = org.astype(jnp.int32)

    min_sad = jnp.full((n,), MAX_UINT32, jnp.int64)
    opt_y = jnp.zeros((n,), jnp.int32)
    opt_x = jnp.zeros((n,), jnp.int32)

    def plain_sad(cy, cx):
        win = _gather(ref_full, y0 + s * _ashr2(cy), x0 + s * _ashr2(cx),
                      height, width)
        return sad_batch(org, win).astype(jnp.int64)

    def _ashr2(v):
        return v >> 2   # trajectory MVs stay full-pel multiples here

    # ---- telescope stage (enc/encode_block.c:541-573) ----
    if telescope:
        ref_y = jnp.full((n,), ((mvc_y + 2) >> 2) << 2, jnp.int32)
        ref_x = jnp.full((n,), ((mvc_x + 2) >> 2) << 2, jnp.int32)
        step = 32
        while step >= 4:
            rng_ = 2 * step
            for k in range(-rng_, rng_ + 1, step):
                for l in range(-rng_, rng_ + 1, step):
                    if step < 32 and k == 0 and l == 0:
                        continue
                    cy, cx = clip_mv_batch(ref_y + k, ref_x + l, ypos,
                                           xpos, fwidth, fheight, size,
                                           size, sign)
                    if step == 32 and size == 16 and widesad32:
                        win = _gather(ref_full, y0 + s * _ashr2(cy),
                                      x0 + s * _ashr2(cx) - 3, height,
                                      width + 6)
                        sad, xoff = widesad_batch(org, win)
                        sad = sad.astype(jnp.int64)
                        cx = cx + ((s * xoff) << 2)
                    else:
                        sad = plain_sad(cy, cx)
                    sad = (sad >> shift) + _mv_cost(lam, cy - mvp_y,
                                                    cx - mvp_x)
                    better = sad < min_sad
                    min_sad = jnp.where(better, sad, min_sad)
                    opt_y = jnp.where(better, cy, opt_y)
                    opt_x = jnp.where(better, cx, opt_x)
            ref_y, ref_x = opt_y, opt_x
            step >>= 1

    # ---- candidate stage (enc/encode_block.c:575-605) ----
    for idx in range(maxcand):
        live = idx < cand_n
        cy = cand_y[:, idx] << 2
        cx = cand_x[:, idx] << 2
        cy, cx = clip_mv_batch(cy, cx, ypos, xpos, fwidth, fheight, size,
                               size, sign)
        if size == 16:
            win = _gather(ref_full, y0 + s * _ashr2(cy),
                          x0 + s * _ashr2(cx) - 3, height, width + 6)
            sad, xoff = widesad_batch(org, win)
            sad = sad.astype(jnp.int64)
            cx = cx + ((s * xoff) << 2)
        else:
            sad = plain_sad(cy, cx)
        sad = (sad >> shift) + _mv_cost(lam, cy - mvp_y, cx - mvp_x)
        better = live & (sad < min_sad)
        min_sad = jnp.where(better, sad, min_sad)
        opt_y = jnp.where(better, cy, opt_y)
        opt_x = jnp.where(better, cx, opt_x)

    ref_y, ref_x = opt_y, opt_x

    # ---- hexagon full-pel refinement (enc/encode_block.c:607-641) ----
    diy = jnp.asarray(np.array([1, 2, 1, -1, -2, -1], np.int32))
    dix = jnp.asarray(np.array([-1, 0, 1, 1, 0, -1], np.int32))
    maxsteps = 6 if (size <= 16 or speed0) else 1
    start = jnp.zeros((n,), jnp.int32)
    end = jnp.full((n,), 5, jnp.int32)
    active = jnp.ones((n,), bool)
    for _step in range(1, maxsteps):
        best_dir = jnp.full((n,), -1, jnp.int32)
        # visit order: start, start+1, ... until end (mod 6): evaluate the
        # six rotations in per-block order via position-in-sequence masks
        length = ((end - start) % 6) + 1
        for pos in range(6):
            direc = (start + pos) % 6
            live = active & (pos < length)
            cy = ref_y + dix[direc] * 4   # NB: C indexes dix with the
            cx = ref_x + diy[direc] * 4   # y-delta and diy with x (quirk)
            cy, cx = clip_mv_batch(cy, cx, ypos, xpos, fwidth, fheight,
                                   size, size, sign)
            sad = (plain_sad(cy, cx) >> shift) + \
                _mv_cost(lam, cy - mvp_y, cx - mvp_x)
            better = live & (sad < min_sad)
            min_sad = jnp.where(better, sad, min_sad)
            opt_y = jnp.where(better, cy, opt_y)
            opt_x = jnp.where(better, cx, opt_x)
            best_dir = jnp.where(better, direc, best_dir)
        ref_y, ref_x = opt_y, opt_x
        start = jnp.where(best_dir != 0, best_dir - 1, 5)
        end = jnp.where(start + 2 >= 6, start + 2 - 6, start + 2)
        active = active & (best_dir >= 0)

    if speed0:
        # ---- exact sub-pel (enc/encode_block.c:643-652): 8 half-pel
        # then 8 quarter-pel MC evaluations around the full-pel optimum,
        # integer clamps at the block origin ----
        from .mc import mc_luma_tiles

        def mc_sad_at(cy, cx):
            oy, ox, fvv, fhh = _mc_params_batch(
                cy, cx, ypos, xpos, height, width, fwidth, fheight, sign)
            pred = mc_luma_tiles(ref_full, pad + oy - 2, pad + ox - 2,
                                 fvv, fhh, tile=width, bipred=bipred,
                                 bitdepth=bitdepth)
            return sad_batch(org, pred).astype(jnp.int64) >> shift

        cmin = min_sad
        hm = [0, 0, -2, 2, 0, -2, -2, 2, 2]
        hn = [0, -1 * 2, 0, 0, 2, -2, 2, -2, 2]
        ydelta_hp = jnp.zeros((n,), jnp.int32)
        xdelta_hp = jnp.zeros((n,), jnp.int32)
        for i in range(1, 9):
            cy = ref_y + hm[i]
            cx = ref_x + hn[i]
            sad = mc_sad_at(cy, cx) + _mv_cost(lam, cy - mvp_y, cx - mvp_x)
            better = sad < cmin
            cmin = jnp.where(better, sad, cmin)
            ydelta_hp = jnp.where(better, hm[i], ydelta_hp)
            xdelta_hp = jnp.where(better, hn[i], xdelta_hp)
        opt_y = opt_y + ydelta_hp
        opt_x = opt_x + xdelta_hp
        qm = [0, 0, -1, 1, 0, -1, -1, 1, 1]
        qn = [0, -1, 0, 0, 1, -1, 1, -1, 1]
        ydelta_qp = jnp.zeros((n,), jnp.int32)
        xdelta_qp = jnp.zeros((n,), jnp.int32)
        for i in range(1, 9):
            cy = opt_y + qm[i]
            cx = opt_x + qn[i]
            sad = mc_sad_at(cy, cx) + _mv_cost(lam, cy - mvp_y, cx - mvp_x)
            better = sad < cmin
            cmin = jnp.where(better, sad, cmin)
            ydelta_qp = jnp.where(better, qm[i], ydelta_qp)
            xdelta_qp = jnp.where(better, qn[i], xdelta_qp)
        opt_y = opt_y + ydelta_qp
        opt_x = opt_x + xdelta_qp
        return jnp.minimum(cmin, min_sad), opt_y, opt_x

    # ---- fast bilinear sub-pel (enc/encode_block.c:653-700) ----
    cmin = min_sad
    mr_y = ref_y * s
    mr_x = ref_x * s
    hwin = _gather(ref_full, y0 + (mr_y >> 2) - 2, x0 + (mr_x >> 2) - 2,
                   height + 4, width + 4)
    hsad, spx, spy = fasthalf_batch(org, hwin)
    hsad = (hsad.astype(jnp.int64) >> shift) + \
        _mv_cost(lam, mr_y + s * spy - mvp_y, mr_x + s * spx - mvp_x)
    better = hsad < cmin
    cmin = jnp.where(better, hsad, cmin)
    ydelta_hp = jnp.where(better, s * spy, 0)
    xdelta_hp = jnp.where(better, s * spx, 0)

    spx, spy = xdelta_hp, ydelta_hp
    mr_y = opt_y + s * spy
    mr_x = opt_x + s * spx
    opt_y = opt_y + ydelta_hp
    opt_x = opt_x + xdelta_hp

    # NB: C applies the sign AFTER the shift here (s*(mr>>2)), unlike the
    # half-pel centre where it multiplies the value first
    qy = y0 + s * (mr_y >> 2) - 1
    qx = x0 + s * (mr_x >> 2) - 1
    qwin = _gather(ref_full, qy, qx, height + 2, width + 2)
    # the quarter search is specialised on the half-pel phase flags; all
    # four (inx,iny) variants are evaluated and selected per block
    ydelta_qp = jnp.zeros((n,), jnp.int32)
    xdelta_qp = jnp.zeros((n,), jnp.int32)
    for inx in (0, 1):
        for iny in (0, 1):
            qsad, qx2, qy2 = fastquarter_batch(org, qwin, inx, iny)
            qsad = (qsad.astype(jnp.int64) >> shift) + \
                _mv_cost(lam, mr_y + s * qy2 - mvp_y,
                         mr_x + s * qx2 - mvp_x)
            phase = ((spx != 0) == bool(inx)) & ((spy != 0) == bool(iny))
            better = phase & (qsad < cmin)
            cmin = jnp.where(better, qsad, cmin)
            ydelta_qp = jnp.where(better, s * qy2, ydelta_qp)
            xdelta_qp = jnp.where(better, s * qx2, xdelta_qp)

    opt_y = opt_y + ydelta_qp
    opt_x = opt_x + xdelta_qp
    return jnp.minimum(cmin, min_sad), opt_y, opt_x


def _mc_params_batch(my, mx, ypos, xpos, bh, bw, fwidth, fheight, sign):
    """Vectorized mc_luma offset/frac derivation incl. the reference's
    integer clamps and its -xpos-bheight quirk (inter_prediction.c:117-181,
    whole-block path: clamp origin == block origin)."""
    if sign:
        my, mx = -my, -mx
    fv = my & 3
    fh = mx & 3
    vi = my >> 2
    hi = mx >> 2
    vi = jnp.minimum(vi, fheight - ypos)
    vi = jnp.maximum(vi, -xpos - bh)   # (sic) the C quirk uses xpos here
    hi = jnp.minimum(hi, fwidth - xpos)
    hi = jnp.maximum(hi, -xpos - bw)
    return ypos + vi, xpos + hi, fv, fh


@partial(jax.jit, static_argnames=("width", "height", "size", "sign",
                                   "fwidth", "fheight", "bitdepth",
                                   "bipred", "mvc_y", "mvc_x"))
def motion_estimate_bi_batch(org, ref0_full, ref1_full, pad, ypos, xpos,
                             mvp_y, mvp_x, lam, cand_y, cand_x, cand_n,
                             width: int, height: int, size: int, sign: int,
                             fwidth: int, fheight: int, bitdepth: int = 8,
                             bipred: int = 1, mvc_y: int = 0,
                             mvc_x: int = 0):
    """Lockstep simultaneous bi-prediction ME (enc/encode_block.c:798-913):
    mv1 = -mv0 telescope (step 32..1 with the quarter-pel parity pattern
    at step 1) + the 6 persistent candidate slots.  Every candidate is
    evaluated with the exact quarter-pel MC on both references.

    cand_*: [N,4] slots with per-block counts cand_n; slots [n..3] are
    zero-filled and [4]=mvp, [5]=0 exactly as the reference mutates its
    persistent array (the caller owns writing those back).  Returns
    (sad [N], mv_y [N], mv_x [N]) matching enc.me.motion_estimate_bi.
    """
    from .mc import mc_luma_tiles
    n = org.shape[0]
    shift = bitdepth - 8
    org = org.astype(jnp.int32)

    def bi_sad(cy, cx):
        m0y, m0x = clip_mv_batch(cy, cx, ypos, xpos, fwidth, fheight,
                                 size, size, sign)
        oy0, ox0, fv0, fh0 = _mc_params_batch(
            m0y, m0x, ypos, xpos, height, width, fwidth, fheight, sign)
        p0 = mc_luma_tiles(ref0_full, pad + oy0 - 2, pad + ox0 - 2,
                           fv0, fh0, tile=width, bipred=bipred,
                           bitdepth=bitdepth)
        # the C clips in place: the second clip sees the first's output
        m1y, m1x = clip_mv_batch(m0y, m0x, ypos, xpos, fwidth, fheight,
                                 size, size, 1 - sign)
        oy1, ox1, fv1, fh1 = _mc_params_batch(
            m1y, m1x, ypos, xpos, height, width, fwidth, fheight, 1 - sign)
        p1 = mc_luma_tiles(ref1_full, pad + oy1 - 2, pad + ox1 - 2,
                           fv1, fh1, tile=width, bipred=bipred,
                           bitdepth=bitdepth)
        rf = (p0 + p1) >> 1
        sad = sad_batch(org, rf).astype(jnp.int64) >> shift
        return sad, m1y, m1x

    min_sad = jnp.full((n,), MAX_UINT32, jnp.int64)
    opt_y = jnp.zeros((n,), jnp.int32)
    opt_x = jnp.zeros((n,), jnp.int32)
    ref_y = jnp.full((n,), ((mvc_y + 2) >> 2) << 2, jnp.int32)
    ref_x = jnp.full((n,), ((mvc_x + 2) >> 2) << 2, jnp.int32)

    step = 32
    while step > 0:
        for k in range(-step, step + 1, step):
            for l in range(-step, step + 1, step):
                if step < 32 and k == 0 and l == 0:
                    continue
                if step == 1:
                    # quarter-pel parity pattern: full-pel centres probe
                    # diagonals, half-pel centres probe the cross, the
                    # (2,2) centre probes nothing (encode_block.c:836-848)
                    vf = ref_y & 3
                    hf = ref_x & 3
                    centre00 = (vf == 0) & (hf == 0)
                    centre22 = (vf == 2) & (hf == 2)
                    if abs(k) != abs(l):
                        live = ~(centre00 | centre22)
                    else:
                        live = centre00
                else:
                    live = jnp.ones((n,), bool)
                sad, my, mx = bi_sad(ref_y + k, ref_x + l)
                sad = sad + _mv_cost(lam, my - mvp_y, mx - mvp_x)
                better = live & (sad < min_sad)
                min_sad = jnp.where(better, sad, min_sad)
                opt_y = jnp.where(better, my, opt_y)
                opt_x = jnp.where(better, mx, opt_x)
        ref_y, ref_x = opt_y, opt_x
        step >>= 1

    # persistent slots: zero-fill [num..3], [4]=mvp, [5]=0
    for idx in range(6):
        if idx < 4:
            live = jnp.ones((n,), bool)
            cy = jnp.where(idx < cand_n, cand_y[:, idx], 0)
            cx = jnp.where(idx < cand_n, cand_x[:, idx], 0)
        elif idx == 4:
            cy, cx = mvp_y, mvp_x
        else:
            cy = jnp.zeros((n,), jnp.int32)
            cx = jnp.zeros((n,), jnp.int32)
        sad, my, mx = bi_sad(cy, cx)
        sad = sad + _mv_cost(lam, my - mvp_y, mx - mvp_x)
        better = sad < min_sad
        min_sad = jnp.where(better, sad, min_sad)
        opt_y = jnp.where(better, my, opt_y)
        opt_x = jnp.where(better, mx, opt_x)
    return min_sad, opt_y, opt_x


@partial(jax.jit, static_argnames=("width", "height", "size", "sign",
                                   "fwidth", "fheight", "bitdepth",
                                   "bipred", "mvc_y", "mvc_x"))
def motion_estimate_sync_batch(org, ref_full, pad, ypos, xpos, boy, box,
                               mvp_y, mvp_x, lam, cand_y, cand_x,
                               width: int, height: int, size: int,
                               sign: int, fwidth: int, fheight: int,
                               bitdepth: int = 8, bipred: int = 0,
                               mvc_y: int = 0, mvc_x: int = 0):
    """Lockstep wavefront-safe ME (enc/encode_block.c:713-796): the
    telescope runs to quarter-pel resolution with exact MC, then the 6
    persistent candidate slots.  boy/box: [N] sub-PU offsets from the
    parent block (the MC integer clamps use the parent origin -
    inter_prediction.c:214 quirk).  cand_*: [N,6] with slot [4]=mvp and
    [5]=0 prefilled by the caller (as the C mutates in place; slots
    [n..3] hold stale persistent values).  Matches
    enc.me.motion_estimate_sync per block.
    """
    from .mc import mc_luma_tiles
    n = org.shape[0]
    shift = bitdepth - 8
    org = org.astype(jnp.int32)

    def mc_sad(cy, cx):
        my, mx = clip_mv_batch(cy, cx, ypos, xpos, fwidth, fheight,
                               size, size, sign)
        oy, ox, fv, fh = _mc_params_batch(
            my, mx, ypos, xpos, height, width, fwidth, fheight, sign)
        # window base at the sub-PU, integer offsets clamped at the parent
        pred = mc_luma_tiles(ref_full, pad + (oy - ypos) + ypos + boy - 2,
                             pad + (ox - xpos) + xpos + box - 2, fv, fh,
                             tile=width, bipred=bipred, bitdepth=bitdepth)
        sad = sad_batch(org, pred).astype(jnp.int64) >> shift
        sad = sad + _mv_cost(lam, my - mvp_y, mx - mvp_x)
        return sad, my, mx

    min_sad = jnp.full((n,), MAX_UINT32, jnp.int64)
    opt_y = jnp.zeros((n,), jnp.int32)
    opt_x = jnp.zeros((n,), jnp.int32)
    ref_y = jnp.full((n,), ((mvc_y + 2) >> 2) << 2, jnp.int32)
    ref_x = jnp.full((n,), ((mvc_x + 2) >> 2) << 2, jnp.int32)

    step = 32
    while step > 0:
        for k in range(-step, step + 1, step):
            for l in range(-step, step + 1, step):
                if step < 32 and k == 0 and l == 0:
                    continue
                if step == 1:
                    vf = ref_y & 3
                    hf = ref_x & 3
                    centre00 = (vf == 0) & (hf == 0)
                    centre22 = (vf == 2) & (hf == 2)
                    if abs(k) != abs(l):
                        live = ~(centre00 | centre22)
                    else:
                        live = centre00
                else:
                    live = jnp.ones((n,), bool)
                sad, my, mx = mc_sad(ref_y + k, ref_x + l)
                better = live & (sad < min_sad)
                min_sad = jnp.where(better, sad, min_sad)
                opt_y = jnp.where(better, my, opt_y)
                opt_x = jnp.where(better, mx, opt_x)
        ref_y, ref_x = opt_y, opt_x
        step >>= 1

    for idx in range(6):
        sad, my, mx = mc_sad(cand_y[:, idx], cand_x[:, idx])
        better = sad < min_sad
        min_sad = jnp.where(better, sad, min_sad)
        opt_y = jnp.where(better, my, opt_y)
        opt_x = jnp.where(better, mx, opt_x)
    return min_sad, opt_y, opt_x
