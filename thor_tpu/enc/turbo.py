"""Turbo (throughput) encoder mode - TPU-batched decisions, exact emission.

The exact device encoder (enc/device_lc.py) replicates the reference's
sequential RDO decision-for-decision, which serialises the frame into
~19k wavefront node steps.  Turbo mode is the TPU-first redesign of the
*decision* problem: all heavy numerics (motion search, trial
transform/quantize/bit-count, intra mode search) run fully batched over
the whole frame with no sequential feedback, using approximate
neighbour context; the final encode then replays the chosen decisions
through the standard bit-exact machinery (enc/writer.py syntax,
spec-layer prediction/transform/recon), deriving every NORMATIVE
element - skip/merge candidate lists, MVP, contexts - from true coded
state.  The bitstream is therefore fully compliant (Thordec-decodable,
decoder recon == encoder recon byte-exact); only the RD *choices*
differ from the reference encoder's.

Scope: I/P/B frames (LDB + RA/HDB GOP families incl. interp_ref=1),
4:2:0 8/10/12-bit, qmtx supported, no pb split, fixed QP
(tb-split presets emit tb_split=0).  B frames decide between skip,
uni inter per list, bipred (average of the two uni predictions) and
intra.  Cf. the reference decision flow at enc/encode_block.c:517
(motion_estimate), :798 (motion_estimate_bi), :1835 (mode_decision_rdo),
:2401 (process_block) - same search spaces, batched shapes.
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..tables import COEFFS_STANDARD, ZIGZAG, CHROMA_QP, log2i
from ..ops.transform import fwd_transform_batch, inv_transform_batch
from ..ops.quant import quantize_batch
from ..ops.coeff_cost import coeff_bits_batch
from ..ops import intra_batch as IB
from ..ops.me_batch import quote_mv_bits_batch

I32 = jnp.int32
MODE_SKIP, MODE_INTRA, MODE_INTER, MODE_BIPRED, MODE_MERGE = 0, 1, 2, 3, 4
I_FRAME, P_FRAME, B_FRAME = 0, 1, 2
MAX_MV_EXT = 144
INF = float(1 << 50)

_LOWPASS_K = np.array([[0, 1, 1, 0], [1, 2, 2, 1],
                       [1, 2, 2, 1], [0, 1, 1, 0]], np.int32)


def turbo_reject_reason(enc):
    """Name of the first parameter that forces the host path, or None.

    pb_split presets are supported (every *_high_efficiency config sets
    -enable_pb_split 1): turbo codes pb_part=NONE on every inter block
    (one VLC-13 code, enc/write_bits.c:405-406), which is fully
    compliant syntax; the HOR/VER/QUAD partition *search* remains a
    host-path RD refinement."""
    p = enc.params
    fi = enc.fi
    for cond, name in (
            (p.subsample == 420, "subsample!=420"),
            (p.bitdepth in (8, 10, 12), "bitdepth"),
            (p.input_bitdepth <= p.bitdepth, "input_bitdepth>bitdepth"),
            (p.bitrate == 0, "bitrate (rate control)"),
            (p.max_delta_qp == 0, "max_delta_qp"),
            (not p.sync, "sync"),
            (p.log2_sb_size == 7, "log2_sb_size!=7"),
            (p.width % 8 == 0 and p.height % 8 == 0, "size%8"),
    ):
        if not cond:
            return name
    if fi.frame_type in (I_FRAME, P_FRAME):
        return None
    # B frames (RA/HDB families): uni per list + bipred + approximate
    # skip decisions; interp_ref=1 streams use the interpolated frame
    # as the skip/zero reference (interp_ref=2's temporal-MV skip mode
    # is host-path only)
    if fi.frame_type == B_FRAME and p.interp_ref > 1:
        return "interp_ref=2 (B frames)"
    return None


def turbo_supported(enc) -> bool:
    import sys
    reason = turbo_reject_reason(enc)
    if reason is None:
        return True
    # LOUD fallback: a user asking for THOR_TURBO must never silently
    # get the ~100x slower host path
    if not getattr(enc, "_turbo_warned", False):
        print(f"thor_tpu: THOR_TURBO unavailable for this frame "
              f"(rejecting parameter: {reason}); falling back to the "
              f"exact host encoder (much slower)", file=sys.stderr)
        try:
            enc._turbo_warned = True
        except AttributeError:
            pass
    return False


# ---------------------------------------------------------------------------
# device: exact single-list motion-compensated prediction at any size
# ---------------------------------------------------------------------------

def _clip_mv_b(mvy, mvx, ypos, xpos, W: int, H: int, s: int):
    """clip_mv (inter_prediction.c:51-63), sign 0, square s-blocks."""
    def trunc4(v):
        return jnp.where(v >= 0, v >> 2, -((-v) >> 2))
    mvy = jnp.where(ypos + trunc4(mvy) < -MAX_MV_EXT,
                    4 * (-MAX_MV_EXT - ypos), mvy)
    mvy = jnp.where(ypos + trunc4(mvy) + s > H + MAX_MV_EXT,
                    4 * (H + MAX_MV_EXT - ypos - s), mvy)
    mvx = jnp.where(xpos + trunc4(mvx) < -MAX_MV_EXT,
                    4 * (-MAX_MV_EXT - xpos), mvx)
    mvx = jnp.where(xpos + trunc4(mvx) + s > W + MAX_MV_EXT,
                    4 * (W + MAX_MV_EXT - xpos - s), mvx)
    return mvy, mvx


def _mc_pred(reff, pad: int, ypos, xpos, mvy, mvx, s: int, W: int, H: int,
             bd: int):
    """Exact luma MC (spec.inter.mc_luma, standard filters, uni-pred):
    [N] blocks of size s at visible (ypos,xpos), quarter-pel (mvy,mvx)
    already clip_mv'ed.  Returns [N,s,s] int32."""
    vf = mvy & 3
    hf = mvx & 3
    vi = mvy >> 2
    hi = mvx >> 2
    vi = jnp.minimum(vi, H - ypos)
    vi = jnp.maximum(vi, -xpos - s)   # (sic) reference quirk
    hi = jnp.minimum(hi, W - xpos)
    hi = jnp.maximum(hi, -xpos - s)
    y0 = ypos + vi
    x0 = xpos + hi
    Wn = s + 5
    dy = jnp.arange(Wn, dtype=I32)
    win = reff[(y0[:, None] + pad - 2 + dy)[:, :, None],
               (x0[:, None] + pad - 2 + dy)[:, None, :]]
    p_copy = win[:, 2:2 + s, 2:2 + s]
    bank = jnp.asarray(COEFFS_STANDARD.astype(np.int32))
    fv = bank[vf]
    fh = bank[hf]
    tmp = jnp.zeros((win.shape[0], s, Wn), I32)
    for m in range(6):
        tmp = tmp + fv[:, m, None, None] * win[:, m:m + s, :]
    six = jnp.zeros((win.shape[0], s, s), I32)
    for m in range(6):
        six = six + fh[:, m, None, None] * tmp[:, :, m:m + s]
    maxv = (1 << bd) - 1
    p_six = jnp.clip((six + 2048) >> 12, 0, maxv)
    lp = jnp.zeros((win.shape[0], s, s), I32)
    for ky in range(4):
        for kx in range(4):
            kv = int(_LOWPASS_K[ky, kx])
            if kv:
                lp = lp + kv * win[:, 1 + ky:1 + ky + s, 1 + kx:1 + kx + s]
    p_lp = jnp.clip((lp + 8) >> 4, 0, maxv)
    zero_f = (vf == 0) & (hf == 0)
    centre = (vf == 2) & (hf == 2)
    sel = jnp.where(zero_f, 0, jnp.where(centre, 1, 2))[:, None, None]
    return jnp.where(sel == 0, p_copy, jnp.where(sel == 1, p_lp, p_six))


def _grid_pos(H: int, W: int, s: int):
    nh, nw = H // s, W // s
    ii, jj = np.meshgrid(np.arange(nh) * s, np.arange(nw) * s,
                         indexing="ij")
    return (jnp.asarray(ii.reshape(-1), jnp.int32),
            jnp.asarray(jj.reshape(-1), jnp.int32), nh, nw)


def _org_tiles(org, H: int, W: int, s: int):
    nh, nw = H // s, W // s
    return (org.reshape(nh, s, nw, s).transpose(0, 2, 1, 3)
            .reshape(nh * nw, s, s))


# ---------------------------------------------------------------------------
# device: motion search
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("Hh", "Wh"))
def prepass_half(orgh, refh, Hh: int, Wh: int):
    """Two-stage +-8 integer full search at half resolution, 8x8 blocks
    (16x16 at full res).  Returns int half-pel MVs [N,2] (y,x)."""
    yy, xx, nh, nw = _grid_pos(Hh, Wh, 8)
    ot = _org_tiles(orgh, Hh, Wh, 8)
    pad = refh.shape[0] - Hh >> 1  # symmetric pad

    def sad_at(dy, dx):
        r = jax.lax.dynamic_slice(refh, (0, 0), refh.shape)
        w = r[(yy[:, None] + pad + dy + jnp.arange(8, dtype=I32))[:, :, None],
              (xx[:, None] + pad + dx + jnp.arange(8, dtype=I32))[:, None, :]]
        return jnp.abs(w - ot).sum(axis=(1, 2))

    best = jnp.full((yy.shape[0],), 1 << 30, I32)
    bdy = jnp.zeros_like(best)
    bdx = jnp.zeros_like(best)
    for dy in range(-8, 9, 2):
        for dx in range(-8, 9, 2):
            c = sad_at(dy, dx)
            upd = c < best
            best = jnp.where(upd, c, best)
            bdy = jnp.where(upd, dy, bdy)
            bdx = jnp.where(upd, dx, bdx)

    # +-1 refine around the coarse winner (dynamic offsets)
    def sad_dyn(dy, dx):
        w = refh[(yy + pad + bdy + dy)[:, None, None] +
                 jnp.arange(8, dtype=I32)[None, :, None],
                 (xx + pad + bdx + dx)[:, None, None] +
                 jnp.arange(8, dtype=I32)[None, None, :]]
        return jnp.abs(w - ot).sum(axis=(1, 2))

    rdy = jnp.zeros_like(best)
    rdx = jnp.zeros_like(best)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            c = sad_dyn(dy, dx)
            upd = c < best
            best = jnp.where(upd, c, best)
            rdy = jnp.where(upd, dy, rdy)
            rdx = jnp.where(upd, dx, rdx)
    return jnp.stack([bdy + rdy, bdx + rdx], -1)


@partial(jax.jit, static_argnames=("H", "W", "bd"))
def refine16(org, reff, mv_half, H: int, W: int, bd: int):
    """Full-res +-1 integer + half + quarter refinement (exact MC SADs)
    for the 16x16 field.  Returns quarter-pel MVs [N,2]."""
    s = 16
    pad = (reff.shape[0] - H) >> 1
    yy, xx, nh, nw = _grid_pos(H, W, s)
    ot = _org_tiles(org, H, W, s)
    mvy0 = mv_half[:, 0] * 8   # half-pel int at half res = 2 full px = 8 q
    mvx0 = mv_half[:, 1] * 8

    def probe(mvy, mvx, best, bmy, bmx):
        cy, cx = _clip_mv_b(mvy, mvx, yy, xx, W, H, s)
        p = _mc_pred(reff, pad, yy, xx, cy, cx, s, W, H, bd)
        c = jnp.abs(p - ot).sum(axis=(1, 2))
        upd = c < best
        return (jnp.where(upd, c, best), jnp.where(upd, cy, bmy),
                jnp.where(upd, cx, bmx))

    def probe_int(mvy, mvx, best, bmy, bmx):
        # integer-pel candidates: the MC is a plain copy, skip the taps
        cy, cx = _clip_mv_b(mvy, mvx, yy, xx, W, H, s)
        y0 = yy + (cy >> 2) + pad
        x0 = xx + (cx >> 2) + pad
        w = reff[(y0[:, None] + jnp.arange(s, dtype=I32))[:, :, None],
                 (x0[:, None] + jnp.arange(s, dtype=I32))[:, None, :]]
        c = jnp.abs(w - ot).sum(axis=(1, 2))
        upd = c < best
        return (jnp.where(upd, c, best), jnp.where(upd, cy, bmy),
                jnp.where(upd, cx, bmx))

    best = jnp.full((yy.shape[0],), 1 << 30, I32)
    bmy = jnp.zeros_like(best)
    bmx = jnp.zeros_like(best)
    for dy in (-4, 0, 4):
        for dx in (-4, 0, 4):
            best, bmy, bmx = probe_int(mvy0 + dy, mvx0 + dx, best, bmy,
                                       bmx)
    cy, cx = bmy, bmx
    for dy in (-2, 0, 2):
        for dx in (-2, 0, 2):
            if dy or dx:
                best, bmy, bmx = probe(cy + dy, cx + dx, best, bmy, bmx)
    cy, cx = bmy, bmx
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                best, bmy, bmx = probe(cy + dy, cx + dx, best, bmy, bmx)
    return jnp.stack([bmy, bmx], -1)


@partial(jax.jit, static_argnames=("H", "W", "s", "bd"))
def upsize_mv(org, reff, mv_child, H: int, W: int, s: int, bd: int):
    """MV for size-s blocks: best of the 4 child MVs + zero by exact-MC
    SAD at size s."""
    pad = (reff.shape[0] - H) >> 1
    yy, xx, nh, nw = _grid_pos(H, W, s)
    ot = _org_tiles(org, H, W, s)
    ch = mv_child.reshape(2 * nh, 2 * nw, 2)
    cands = [ch[0::2, 0::2], ch[0::2, 1::2], ch[1::2, 0::2],
             ch[1::2, 1::2]]
    cands = [c.reshape(-1, 2) for c in cands]
    cands.append(jnp.zeros_like(cands[0]))
    best = jnp.full((yy.shape[0],), 1 << 30, I32)
    bmy = jnp.zeros_like(best)
    bmx = jnp.zeros_like(best)
    for c in cands:
        cy, cx = _clip_mv_b(c[:, 0], c[:, 1], yy, xx, W, H, s)
        p = _mc_pred(reff, pad, yy, xx, cy, cx, s, W, H, bd)
        sad = jnp.abs(p - ot).sum(axis=(1, 2))
        upd = sad < best
        best = jnp.where(upd, sad, best)
        bmy = jnp.where(upd, cy, bmy)
        bmx = jnp.where(upd, cx, bmx)
    return jnp.stack([bmy, bmx], -1)


# ---------------------------------------------------------------------------
# device: per-size mode costs
# ---------------------------------------------------------------------------

def _zz_fwd(qsize: int):
    """Flat indices that reorder a [qsize,qsize] block into zigzag scan."""
    zz = ZIGZAG[qsize]
    n2 = qsize * qsize
    perm = np.zeros(n2, np.int32)
    for i in range(n2):
        perm[i] = int(zz[i])
    return jnp.asarray(perm)


def _trial_bits_ssd(ot, pred, qp, s: int, intra: bool, bd: int):
    """Trial encode: residual -> transform -> quantize -> bits + recon
    SSD (enc/encode_block.c:1340-1514 single-TB path)."""
    res = ot - pred
    co = fwd_transform_batch(res, s, False, bd)
    q, cbp = quantize_batch(co.astype(jnp.int16), qp, s,
                            int(intra))
    qs = min(16, s)
    sc = jnp.take(q.reshape(q.shape[0], qs * qs).astype(jnp.int32),
                  _zz_fwd(qs), axis=1)
    bits = jnp.where(cbp != 0,
                     coeff_bits_batch(sc, s, 0, int(intra)), 0)
    rq = _dequant_j(q.astype(jnp.int32), qp, s)
    rec = jnp.clip(pred + inv_transform_batch(rq, s, bd), 0,
                   (1 << bd) - 1)
    d = (ot - rec)
    ssd = (d * d).sum(axis=(1, 2))
    return ssd, bits, cbp


def _trial_bits_ssd_tb1(ot, pred, qp, s: int, bd: int):
    """Trial encode with tb_split=1: four s/2 quadrant TBs per block
    (enc/encode_block.c:1275-1313).  Returns (ssd, bits) summed over the
    quadrants.  Quadrant order (0,0),(0,s/2),(s/2,0),(s/2,s/2)."""
    s2 = s // 2
    N = ot.shape[0]

    def quads(x):
        return (x.reshape(N, 2, s2, 2, s2).transpose(0, 1, 3, 2, 4)
                .reshape(N * 4, s2, s2))

    res = quads(ot - pred)
    co = fwd_transform_batch(res, s2, False, bd)
    q, cbp = quantize_batch(co.astype(jnp.int16), qp, s2, 0)
    qs = min(16, s2)
    sc = jnp.take(q.reshape(q.shape[0], qs * qs).astype(jnp.int32),
                  _zz_fwd(qs), axis=1)
    bits = jnp.where(cbp != 0,
                     coeff_bits_batch(sc, s2, 0, 0), 0)
    rq = _dequant_j(q.astype(jnp.int32), qp, s2)
    rec = jnp.clip(quads(pred) + inv_transform_batch(rq, s2, bd), 0,
                   (1 << bd) - 1)
    d = quads(ot) - rec
    ssd = (d * d).sum(axis=(1, 2))
    return (ssd.reshape(N, 4).sum(axis=1),
            bits.reshape(N, 4).sum(axis=1))


def _dequant_j(q, qp, s: int):
    """Unweighted dequantize (common_block.c:45-73); qp may be traced
    (one compiled kernel per size, shared across the QP ladder)."""
    from ..tables import GDEQUANT
    qs = min(16, s)
    qp = jnp.asarray(qp, I32)
    lshift = qp // 6
    rshift = log2i(s) - 1
    scale = jnp.asarray(np.asarray(GDEQUANT, np.int32))[qp % 6]
    c = q * scale
    d = lshift - rshift
    dpos = jnp.maximum(d, 0)
    dneg = jnp.maximum(-d, 0)
    bias = jnp.where(d < 0, I32(1) << jnp.maximum(dneg - 1, 0), 0)
    r = jnp.where(d >= 0, c << dpos, (c + bias) >> dneg)
    r = ((r << 16) >> 16)
    out = jnp.zeros((q.shape[0], s, s), I32)
    return out.at[:, :qs, :qs].set(r)


@partial(jax.jit, static_argnames=("H", "W", "s", "bd", "tb_trial"))
def eval_inter(org, reff, mv_s, lam, qp, H: int, W: int, s: int,
               bd: int, tb_trial: bool = False):
    """Inter cost at size s for every block: exact MC pred, trial
    transform/quant, coeff+mv bits, recon SSD.  With tb_trial (HE
    presets, enable_tb_split=1) both tb_split=0 and =1 are trial-encoded
    and the min is taken (enc/encode_block.c:2031-2049); the returned tb
    flag drives the finalizer's TB geometry."""
    pad = (reff.shape[0] - H) >> 1
    yy, xx, nh, nw = _grid_pos(H, W, s)
    ot = _org_tiles(org, H, W, s)
    cy, cx = _clip_mv_b(mv_s[:, 0], mv_s[:, 1], yy, xx, W, H, s)
    pred = _mc_pred(reff, pad, yy, xx, cy, cx, s, W, H, bd)
    ssd, bits, cbp = _trial_bits_ssd(ot, pred, qp, s, False, bd)
    # mv bits vs the left neighbour (approximate MVP for the decision)
    mvg = jnp.stack([cy, cx], -1).reshape(nh, nw, 2)
    mvp = jnp.concatenate([jnp.zeros((nh, 1, 2), I32), mvg[:, :-1]],
                          axis=1).reshape(-1, 2)
    # +8: super-mode code (~4b at HE ref counts) + cbp code (~3b) +
    # pb_part flag on split-capable presets - per-leaf syntax the
    # trial bits don't include
    mvbits = quote_mv_bits_batch(cy - mvp[:, 0], cx - mvp[:, 1])
    base = lam * (mvbits + 8).astype(jnp.float32)
    cost0 = ssd.astype(jnp.float32) + lam * bits.astype(jnp.float32) + base
    if not tb_trial:
        return cost0, jnp.stack([cy, cx], -1), jnp.zeros_like(cy)
    ssd1, bits1 = _trial_bits_ssd_tb1(ot, pred, qp, s, bd)
    # +8: approximate extra syntax of the three additional cbp codes
    cost1 = (ssd1.astype(jnp.float32) +
             lam * (bits1 + 8).astype(jnp.float32) + base)
    tb = (cost1 < cost0).astype(I32)
    return jnp.minimum(cost0, cost1), jnp.stack([cy, cx], -1), tb


@partial(jax.jit, static_argnames=("H", "W", "s", "bd"))
def eval_skip(org, reff, mv_s, lam, H: int, W: int, s: int, bd: int):
    """Skip cost at size s: best of {zero, left, top, top-left} MVs
    (approximating the normative candidate list), no residual."""
    pad = (reff.shape[0] - H) >> 1
    yy, xx, nh, nw = _grid_pos(H, W, s)
    ot = _org_tiles(org, H, W, s)
    mvg = mv_s.reshape(nh, nw, 2)
    zero = jnp.zeros((nh, nw, 2), I32)
    left = jnp.concatenate([zero[:, :1], mvg[:, :-1]], axis=1)
    top = jnp.concatenate([zero[:1], mvg[:-1]], axis=0)
    tl = jnp.concatenate([zero[:1],
                          jnp.concatenate([zero[1:, :1], mvg[:-1, :-1]],
                                          axis=1)], axis=0)
    best = jnp.full((nh * nw,), jnp.inf, jnp.float32)
    bmy = jnp.zeros((nh * nw,), I32)
    bmx = jnp.zeros((nh * nw,), I32)
    for cand in (zero, left, top, tl):
        c = cand.reshape(-1, 2)
        cy, cx = _clip_mv_b(c[:, 0], c[:, 1], yy, xx, W, H, s)
        p = _mc_pred(reff, pad, yy, xx, cy, cx, s, W, H, bd)
        d = ot - p
        ssd = (d * d).sum(axis=(1, 2)).astype(jnp.float32)
        cost = ssd + lam * 3.0
        upd = cost < best
        best = jnp.where(upd, cost, best)
        bmy = jnp.where(upd, cy, bmy)
        bmx = jnp.where(upd, cx, bmx)
    return best, jnp.stack([bmy, bmx], -1)


@partial(jax.jit, static_argnames=("H", "W", "s", "bd", "nim"))
def eval_intra(orgp, org, lam, qp, H: int, W: int, s: int, bd: int,
               nim: int = 4):
    """Intra cost at size s: nim-mode search on ORG-neighbour reference
    samples (decision approximation; the final encode re-derives coeffs
    from true reconstructed neighbours).  nim mirrors the preset's
    frame_info.num_intra_modes (reference searches every mode,
    enc/encode_block.c:2082-2097)."""
    yy, xx, nh, nw = _grid_pos(H, W, s)
    ot = _org_tiles(org, H, W, s)
    ur = jnp.zeros((nh * nw,), bool)
    dl = jnp.zeros((nh * nw,), bool)
    left, top, tl = IB.make_refs_batch(orgp, yy, xx, s, ur, dl, bd)
    preds = IB.predict_all_modes(left, top, tl, yy, xx, s, bd,
                                 num_modes=nim)
    sads = jnp.stack([jnp.abs(preds[m] - ot).sum(axis=(1, 2))
                      for m in range(nim)])
    mode = jnp.argmin(sads, axis=0)
    pred = IB.select_mode(preds, mode)
    ssd, bits, cbp = _trial_bits_ssd(ot, pred, qp, s, True, bd)
    # +9: per-leaf syntax the trial doesn't count - super-mode code
    # (~3b), intra mode (2b at 4 modes / vlc8 at 10), cbp code (~3b),
    # chroma cbp.  Underestimating this biases the quadtree toward
    # deep splits (every split multiplies the per-leaf overhead 4x),
    # the dominant term of the round-5 I-frame rate gap vs Thorenc.
    cost = ssd.astype(jnp.float32) + lam * (bits + 9).astype(jnp.float32)
    return cost, mode.astype(I32)


@partial(jax.jit, static_argnames=("H", "W", "s", "bd", "tb_trial"))
def eval_bipred(org, reffA, reffB, mvAs, mvBs, lam, qp, H: int,
                W: int, s: int, bd: int, tb_trial: bool = False):
    """Bipred cost at size s: average of the two uni predictions (decision
    approximation of the bipred filter pair), trial transform/quant bits.
    List-1 MV bits are quoted against list 0 (enc/write_bits.c:478)."""
    pad = (reffA.shape[0] - H) >> 1
    yy, xx, nh, nw = _grid_pos(H, W, s)
    ot = _org_tiles(org, H, W, s)
    cyA, cxA = _clip_mv_b(mvAs[:, 0], mvAs[:, 1], yy, xx, W, H, s)
    cyB, cxB = _clip_mv_b(mvBs[:, 0], mvBs[:, 1], yy, xx, W, H, s)
    pA = _mc_pred(reffA, pad, yy, xx, cyA, cxA, s, W, H, bd)
    pB = _mc_pred(reffB, pad, yy, xx, cyB, cxB, s, W, H, bd)
    pred = (pA + pB) >> 1
    ssd, bits, cbp = _trial_bits_ssd(ot, pred, qp, s, False, bd)
    mvg = jnp.stack([cyA, cxA], -1).reshape(nh, nw, 2)
    mvp = jnp.concatenate([jnp.zeros((nh, 1, 2), I32), mvg[:, :-1]],
                          axis=1).reshape(-1, 2)
    mvbA = quote_mv_bits_batch(cyA - mvp[:, 0], cxA - mvp[:, 1])
    # emitted list-1 MV is the negated displacement (future ref, sign=1)
    mvbB = quote_mv_bits_batch(-cyB - cyA, -cxB - cxA)
    base = lam * (mvbA + mvbB + 8).astype(jnp.float32)
    cost0 = ssd.astype(jnp.float32) + lam * bits.astype(jnp.float32) + base
    if not tb_trial:
        return cost0, jnp.zeros_like(cyA)
    ssd1, bits1 = _trial_bits_ssd_tb1(ot, pred, qp, s, bd)
    cost1 = (ssd1.astype(jnp.float32) +
             lam * (bits1 + 8).astype(jnp.float32) + base)
    tb = (cost1 < cost0).astype(I32)
    return jnp.minimum(cost0, cost1), tb


# ---------------------------------------------------------------------------
# host: frame decision + quadtree assembly
# ---------------------------------------------------------------------------

SIZES = (8, 16, 32, 64, 128)


@partial(jax.jit, static_argnames=("H", "W"))
def _stage_org(org_u8, H: int, W: int):
    """Zero-pad the native-dtype original to the decision geometry and
    widen on device (cheap VPU work; saves 4x on tunnel upload)."""
    H0, W0 = org_u8.shape
    o = org_u8.astype(jnp.int32)
    orgj = jnp.zeros((H, W), jnp.int32).at[:H0, :W0].set(o)
    orgpj = jnp.zeros((H + 130, W + 130), jnp.int32).at[:H0, :W0].set(o)
    return orgj, orgpj


@partial(jax.jit, static_argnames=("H", "W"))
def _stage_ref(ref_i16, H: int, W: int):
    """Edge-extend the padded reference plane to the decision geometry
    on device (replaces a host repad + int32 upload)."""
    sh, sw = ref_i16.shape
    r = ref_i16.astype(jnp.int32)
    if (H + 320, W + 320) == (sh, sw):
        return r
    return jnp.pad(r, ((0, H + 320 - sh), (0, W + 320 - sw)), mode="edge")


def decide_frame(enc, pull=True):
    """Run the batched decision pass; returns per-size numpy decision
    grids + the final leaf map."""
    p = enc.params
    fi = enc.fi
    from .encoder import SQUARED_LAMBDA_QP
    qp = fi.qp
    lam = jnp.float32(fi.lambda_coeff * SQUARED_LAMBDA_QP[qp])
    H0, W0 = p.height, p.width
    H = ((H0 + 127) // 128) * 128
    W = ((W0 + 127) // 128) * 128
    bd = p.bitdepth

    # upload the original at its native 8-bit dtype (tunnel uploads are
    # the dominant decide cost at 1080p); zero-pad + widen on device
    orgj, orgpj = _stage_org(jnp.asarray(np.ascontiguousarray(enc.orig.y)),
                             H, W)

    is_i = fi.frame_type == I_FRAME
    is_b = fi.frame_type == B_FRAME
    # real tb-split decisions on the HE presets: trial-encode both TB
    # geometries per inter/bipred candidate and keep the min
    tb_on = (p.enable_tb_split == 1) and not is_i
    # sizes whose first block already overhangs the visible frame can
    # never be leaves (fits=False forces INF below) - skip their device
    # evals entirely.  On small clips this drops the largest kernel
    # families (s=128 on a 64x64 test clip), which matters because the
    # decision pass is compile-bound on cold caches.
    eval_sizes = tuple(s for s in SIZES if s <= H0 and s <= W0)
    out = {"qp": qp, "is_b": is_b, "tb_on": tb_on,
           "eval_sizes": eval_sizes}

    def me_chain(reff, orgh):
        refh = scale2(reff)
        mv_h = prepass_half(orgh, refh, H // 2, W // 2)
        mv = {16: refine16(orgj, reff, mv_h, H, W, bd)}
        for s in (32, 64, 128):
            if s in eval_sizes:
                mv[s] = upsize_mv(orgj, reff, mv[s // 2], H, W, s, bd)
            else:
                mv[s] = jnp.zeros(((H // s) * (W // s), 2), I32)
        mv[8] = jnp.repeat(jnp.repeat(
            mv[16].reshape(H // 16, W // 16, 2), 2, 0), 2, 1).reshape(-1, 2)
        return mv

    def stage(ref):
        # device-resident ring hit (encoder._note_dev_ref): no upload;
        # miss (interp frames, host-only runs): native int16 upload.
        # Either way the edge-extend to the padded decision geometry
        # runs on device.
        getp = getattr(enc, "_dev_ref_planes", None)
        planes = getp(ref) if getp is not None else None
        if planes is not None:
            return _stage_ref(planes[0], H, W)
        return _stage_ref(jnp.asarray(ref.y_full.astype(np.int16)), H, W)

    if is_b:
        # two uni lists (past / future) + the skip/zero reference, which
        # under interp_ref=1 is the interpolated frame (ref slot 0)
        r0i = 1 if fi.interp_ref else 0
        r1i = 2 if fi.interp_ref else 1
        reffA = stage(enc._ref_frame(fi.ref_array[r0i]))
        reffB = stage(enc._ref_frame(fi.ref_array[r1i]))
        reffS = (stage(enc._ref_frame(fi.ref_array[0]))
                 if fi.interp_ref else reffA)
        orgh = scale2(orgj)
        mvA = me_chain(reffA, orgh)
        mvB = me_chain(reffB, orgh)
    elif not is_i:
        reff = stage(enc._ref_frame(fi.ref_array[0]))
        mv = me_chain(reff, scale2(orgj))

    fseg, iseg = [], []
    for s in eval_sizes:
        n = (H // s) * (W // s)
        if is_b:
            ci, mvc, tb0 = eval_inter(orgj, reffA, mvA[s], lam, qp, H, W,
                                      s, bd, tb_trial=tb_on)
            ciB, mvcB, tb1 = eval_inter(orgj, reffB, mvB[s], lam, qp, H,
                                        W, s, bd, tb_trial=tb_on)
            cbi, tbb = eval_bipred(orgj, reffA, reffB, mvA[s], mvB[s],
                                   lam, qp, H, W, s, bd, tb_trial=tb_on)
            cs, mvs = eval_skip(orgj, reffS, mvA[s], lam, H, W, s, bd)
            tbc = tb0 | (tb1 << 1) | (tbb << 2)
        elif not is_i:
            ci, mvc, tb0 = eval_inter(orgj, reff, mv[s], lam, qp, H, W, s,
                                      bd, tb_trial=tb_on)
            cs, mvs = eval_skip(orgj, reff, mv[s], lam, H, W, s, bd)
            tbc = tb0
        else:
            ci = jnp.full((n,), jnp.inf, jnp.float32)
            cs = jnp.full((n,), jnp.inf, jnp.float32)
            mvc = mvs = jnp.zeros((n, 2), I32)
            tbc = jnp.zeros((n,), I32)
        if s <= 64:
            cn, imode = eval_intra(orgpj, orgj, lam, qp, H, W, s, bd,
                                   nim=fi.num_intra_modes)
        else:
            cn = jnp.full((n,), jnp.inf, jnp.float32)
            imode = jnp.zeros((n,), I32)
        fseg += [cs, ci, cn]
        iseg += [mvs.reshape(-1), mvc.reshape(-1), imode]
        if is_b:
            fseg += [ciB, cbi]
            iseg += [mvcB.reshape(-1)]
        if tb_on:
            iseg += [tbc]

    # ONE pull each for costs and metadata (a tunneled pull has a fixed
    # ~55ms charge; 30 pulls/frame would dominate the decision pass).
    # pull=False defers the pull: the device work stays in flight and
    # the GOP-lane prefetcher (enc/gop_lanes.py) resolves it at the
    # frame's coding turn.
    fpk_dev = jnp.concatenate(fseg)
    ipk_dev = jnp.concatenate(iseg)
    if not pull:
        return PendingDecision(fpk_dev, ipk_dev, out,
                               (H, W, H0, W0, float(lam)))
    return _finish_decide(np.asarray(fpk_dev), np.asarray(ipk_dev), out,
                          (H, W, H0, W0, float(lam)))


class PendingDecision:
    """A dispatched-but-not-pulled decision pass (device arrays)."""

    def __init__(self, fpk, ipk, out, geom):
        self.fpk, self.ipk, self.out, self.geom = fpk, ipk, out, geom

    def resolve(self):
        return _finish_decide(np.asarray(self.fpk), np.asarray(self.ipk),
                              self.out, self.geom)


def _finish_decide(fpk, ipk, out, geom):
    """Host unpack + quadtree aggregation over the pulled cost/meta."""
    H, W, H0, W0, lamf = geom
    is_b = out["is_b"]
    tb_on = out.get("tb_on", False)
    eval_sizes = out.get("eval_sizes", SIZES)
    nf, ni = (5, 7) if is_b else (3, 5)
    if tb_on:
        ni += 1
    cost, meta = {}, {}
    fo = io = 0
    for s in SIZES:
        n = (H // s) * (W // s)
        if s not in eval_sizes:
            # size skipped on device (no block of this size fits the
            # visible frame): INF costs force a split, zero meta
            cost[s] = tuple(np.full((n,), INF, np.float32)
                            for _ in range(nf))
            m = (np.zeros((n, 2), np.int64), np.zeros((n, 2), np.int64),
                 np.zeros((n,), np.int64))
            if is_b:
                m += (np.zeros((n, 2), np.int64),)
            if tb_on:
                m += (np.zeros((n,), np.int64),)
            meta[s] = m
            continue
        cost[s] = tuple(fpk[fo + k * n:fo + (k + 1) * n]
                        for k in range(nf))
        fo += nf * n
        m = (ipk[io:io + 2 * n].reshape(n, 2),
             ipk[io + 2 * n:io + 4 * n].reshape(n, 2),
             ipk[io + 4 * n:io + 5 * n])
        j = 5
        if is_b:
            m += (ipk[io + 5 * n:io + 7 * n].reshape(n, 2),)
            j = 7
        if tb_on:
            # packed tb flags: bit0 inter(list0), bit1 inter(list1),
            # bit2 bipred
            m += (ipk[io + j * n:io + (j + 1) * n],)
        meta[s] = m
        io += ni * n

    # blocks that don't fit the visible frame can't be leaves
    best = {}
    choice = {}
    for s in SIZES:
        nh, nw = H // s, W // s
        # cost order: skip, inter(list0), intra[, inter(list1), bipred];
        # choice codes: 0 skip, 1 inter0, 2 intra, 3 split, 4 inter1,
        # 5 bipred
        stackc = np.stack([c.reshape(nh, nw) for c in cost[s]])
        ch = np.argmin(stackc, axis=0)
        if is_b:
            ch = np.array([0, 1, 2, 4, 5])[ch]
        bc = np.min(stackc, axis=0)
        yy, xx = np.meshgrid(np.arange(nh) * s, np.arange(nw) * s,
                             indexing="ij")
        fits = (yy + s <= H0) & (xx + s <= W0)
        bc = np.where(fits, bc, INF)
        best[s] = bc
        choice[s] = ch
        if s > 8:
            quads = (best[s // 2].reshape(nh, 2, nw, 2)
                     .transpose(0, 2, 1, 3).reshape(nh, nw, 4))
            split_cost = np.minimum(quads, INF).sum(axis=2) + lamf * 2.0
            take_split = split_cost < bc
            best[s] = np.where(take_split, split_cost, bc)
            choice[s] = np.where(take_split, 3, ch)  # 3 = split

    out.update(cost=cost, meta=meta, choice=choice, H=H, W=W)
    return out


@jax.jit
def scale2(plane):
    s = plane.astype(I32)
    a = s[0::2, 0::2]
    b = s[1::2, 0::2]
    c = s[0::2, 1::2]
    d = s[1::2, 1::2]
    return (((a + b + 1) >> 1) + ((c + d + 1) >> 1)) >> 1


# ---------------------------------------------------------------------------
# host: emission (exact normative finalisation)
# ---------------------------------------------------------------------------

def encode_frame_turbo(enc):
    """Emit the decided frame through the standard bit-exact machinery
    (cf. process_block enc/encode_block.c:2401 minus the RDO)."""
    import os
    from . import writer as W
    from .encoder import BlockInfo, SQUARED_LAMBDA_QP
    from ..spec import inter

    p = enc.params
    fi = enc.fi
    # GOP-lane prefetch (enc/gop_lanes.py): the decision pass for this
    # frame may already be in flight from an earlier coding turn
    pend = getattr(enc, "_lane_decisions", {}).pop(fi.frame_num, None)
    dec = pend.resolve() if pend is not None else decide_frame(enc)
    # B frames always use the device finalizer (the host fallback below
    # predates multi-list support)
    if os.environ.get("THOR_TURBO_FINAL", "1") == "1" or dec["is_b"]:
        # device finalization (all pixel numerics in one dispatch)
        from .turbo_final import encode_frame_turbo_final
        encode_frame_turbo_final(enc, dec)
        return
    qp = fi.qp
    h, w = p.height, p.width
    sb = 1 << p.log2_sb_size

    def emit(size, ypos, xpos):
        if ypos + 8 > h or xpos + 8 > w:
            return
        encode_this = ypos + size <= h and xpos + size <= w
        bi = BlockInfo()
        bi.size = size
        bi.ypos, bi.xpos = ypos, xpos
        bi.bwidth = min(size, w - xpos)
        bi.bheight = min(size, h - ypos)
        bi.sub = enc.sub
        bi.qp = qp
        bi.delta_qp = 0
        bi.max_num_tb_part = 2 if p.enable_tb_split == 1 else 1
        bi.max_num_pb_part = 4 if p.enable_pb_split else 1
        bi.lambda_ = fi.lambda_coeff * SQUARED_LAMBDA_QP[qp]
        bi.best = None
        bi.rec = None
        bi.rec_best = None
        bi.mvp = (0, 0)
        bi.final_encode = 0
        bi.ctx_split, bi.ctx_cbp, bi.ctx_index = \
            enc._find_block_context(ypos, xpos, size)

        ch = dec["choice"][size][ypos // size, xpos // size] \
            if encode_this else 3
        if ch == 3 and size > 8:
            W.write_super_mode(enc.writer, enc, bi, MODE_SKIP, 0, 1,
                               encode_this)
            ns = size // 2
            emit(ns, ypos, xpos)
            emit(ns, ypos + ns, xpos)
            emit(ns, ypos, xpos + ns)
            emit(ns, ypos + ns, xpos + ns)
            return

        # ---- leaf: build the true normative context, then encode ----
        bi.org_y = np.zeros((size, size), np.int32)
        bi.org_y[:bi.bheight, :bi.bwidth] = \
            enc.orig.y[ypos:ypos + bi.bheight, xpos:xpos + bi.bwidth]
        sC = size >> enc.sub
        bi.org_u = np.zeros((sC, sC), np.int32)
        bi.org_v = np.zeros((sC, sC), np.int32)
        bhc, bwc = bi.bheight >> enc.sub, bi.bwidth >> enc.sub
        yC, xC = ypos >> enc.sub, xpos >> enc.sub
        bi.org_u[:bhc, :bwc] = enc.orig.u[yC:yC + bhc, xC:xC + bwc]
        bi.org_v[:bhc, :bwc] = enc.orig.v[yC:yC + bhc, xC:xC + bwc]

        if fi.frame_type != I_FRAME:
            bi.skip_candidates = inter.get_mv_skip(
                ypos, xpos, w, h, size, size, sb, enc.dd)
            bi.num_skip_vec = len(bi.skip_candidates)
            bi.merge_candidates = inter.get_mv_merge(
                ypos, xpos, w, h, size, size, sb, enc.dd)
            bi.num_merge_vec = len(bi.merge_candidates)
        else:
            bi.skip_candidates = []
            bi.merge_candidates = []
            bi.num_skip_vec = bi.num_merge_vec = 0

        gi = (ypos // size, xpos // size)
        meta = dec["meta"][size]
        mvs, mvc, imode = meta[0], meta[1], meta[2]
        nw_ = dec["W"] // size
        flat = gi[0] * nw_ + gi[1]

        if ch == 2 or fi.frame_type == I_FRAME:
            bp = {"mode": MODE_INTRA, "tb_param": 0, "pb_part": 0,
                  "intra_mode": int(imode[flat]), "ref_idx0": 0,
                  "ref_idx1": 0, "dir": -1, "skip_idx": 0,
                  "mv_arr0": [(0, 0)] * 4, "mv_arr1": [(0, 0)] * 4}
        elif ch == 0:
            # exact-match the decided skip MV onto the true candidate
            # list; a probe MV absent from the list demotes to inter
            # with the probed MV (twin of turbo_final.plan_frame /
            # blockemit.c; this host path codes P frames only)
            want = (int(mvs[flat, 0]), int(mvs[flat, 1]))
            bidx = 0
            bdist = 1 << 30
            for i, c in enumerate(bi.skip_candidates):
                d = abs(c[0] - want[0]) + abs(c[1] - want[1])
                if d < bdist:
                    bdist = d
                    bidx = i
            if bdist != 0:
                bi.mvp = inter.get_mv_pred(ypos, xpos, w, h, size, size,
                                           sb, enc.dd)
                bp = {"mode": MODE_INTER, "tb_param": 0, "pb_part": 0,
                      "ref_idx0": 0, "ref_idx1": 0, "mv_arr0": [want] * 4,
                      "mv_arr1": [want] * 4, "dir": 0, "skip_idx": 0}
            else:
                c = bi.skip_candidates[bidx]
                bp = {"mode": MODE_SKIP, "tb_param": 0, "pb_part": 0,
                      "skip_idx": bidx, "ref_idx0": c[4], "ref_idx1": c[5],
                      "mv_arr0": [(c[0], c[1])] * 4,
                      "mv_arr1": [(c[2], c[3])] * 4, "dir": c[6]}
        else:
            mv = (int(mvc[flat, 0]), int(mvc[flat, 1]))
            bi.mvp = inter.get_mv_pred(ypos, xpos, w, h, size, size, sb,
                                       enc.dd)
            bp = {"mode": MODE_INTER, "tb_param": 0, "pb_part": 0,
                  "ref_idx0": 0, "ref_idx1": 0, "mv_arr0": [mv] * 4,
                  "mv_arr1": [mv] * 4, "dir": 0, "skip_idx": 0}
        bi.best = bp
        enc.encode_block(bi, bp)
        enc._copy_to_frame(bi)
        enc._copy_deblock(bi)

    nsh = (w + sb - 1) // sb
    nsv = (h + sb - 1) // sb
    for k in range(nsv):
        for sl in range(nsh):
            emit(sb, k * sb, sl * sb)
