"""Fully-resident fused device frame decoder.

One jitted dispatch per frame runs the ENTIRE pixel pipeline on device:
dense residuals (dequant + inverse transform), inter MC, the intra
wavefront (sequential scan over intra blocks with true reconstructed
neighbours, including chroma-from-luma), the in-loop filter chain
(deblock -> CDEF -> CLPF), and edge-replicate reference padding.

Reference frames stay RESIDENT on device across frames (a ring keyed by
frame number); per frame the host uploads only the parsed plan tensors
(cheap on the tunnel) and pulls ONE packed uint8/uint16 display buffer
(the tunnel's expensive direction).  Mirrors dec/decode_frame.c:52-212 +
dec/decode_block.c pixel semantics; exactness is enforced by the golden
suite (the two-stage path and the host path remain as fallbacks).

Scope: 4:2:0 (incl. qmtx via weighted dequant banks), no cfl_inter, no
tb-split intra in the frame (gates checked per frame; ineligible frames
use the existing paths).
"""
from __future__ import annotations

from collections import OrderedDict
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..tables import CHROMA_QP, log2i
from ..spec import inter, filters as SF
from ..ops import filters as OF
from ..ops import intra_batch as IB
from . import device_pixels as DP
from . import native_parse as NP

I32 = jnp.int32
AP = 136                     # apron: window writes + ref reads
PADDING = 160                # luma ref padding (common/global.h:62)
MODE_INTRA = 1
I_FRAME = 0

LY_KEYS = ("op0", "y0_0", "x0_0", "vf0", "hf0", "fs0", "r0",
           "op1", "y0_1", "x0_1", "vf1", "hf1", "fs1", "r1")
CH_KEYS = ("op0", "y0_0", "x0_0", "vf0", "hf0",
           "op1", "y0_1", "x0_1", "vf1", "hf1")
SEG_BUCKETS = (8, 32, 128, 512, 2048)
INTRA_SIZES = (8, 16, 32, 64, 128)


def _bucket(n):
    for b in SEG_BUCKETS:
        if n <= b:
            return b
    raise ValueError(n)


# ---------------------------------------------------------------------------
# device CFL (common/common_block.c:347-428) - int64 regression
# ---------------------------------------------------------------------------

def _cfl_j(pred_y, pu, pv, rec_y, n: int, bd: int):
    """improve_uv_prediction for one block (4:2:0), traced under x64."""
    i64 = jnp.int64
    py = pred_y.astype(i64)
    ry = rec_y.astype(i64)
    sqres = ((ry - py) * (ry - py)).sum()
    skip_all = (sqres >> (2 * log2i(n))) <= (64 << (2 * (bd - 8)))
    nc = n >> 1
    lognc = log2i(nc)
    ys = ((py[0::2, 0::2] + py[0::2, 1::2] +
           py[1::2, 0::2] + py[1::2, 1::2] + 2) >> 2)
    us = pu.astype(i64)
    vs = pv.astype(i64)
    ysum = ys.sum()
    usum = us.sum()
    vsum = vs.sum()
    yysum = (ys * ys).sum()
    yusum = (ys * us).sum()
    yvsum = (ys * vs).sum()
    uusum = (us * us).sum()
    vvsum = (vs * vs).sum()
    sh = 2 * lognc
    ssyy = yysum - ((ysum * ysum) >> sh)
    ssuu = uusum - ((usum * usum) >> sh)
    ssvv = vvsum - ((vsum * vsum) >> sh)
    ssyu = yusum - ((ysum * usum) >> sh)
    ssyv = yvsum - ((ysum * vsum) >> sh)
    gate = (~skip_all) & (ssyy != 0)
    ssyy_s = jnp.where(ssyy == 0, 1, ssyy)
    hi = (1 << bd) - 1
    ry32 = rec_y.astype(jnp.int32)

    def remap(ssyx, xsum):
        num = ssyx << 16
        a64 = jnp.where(num < 0, -((-num) // ssyy_s), num // ssyy_s)
        b64 = ((xsum << 16) - a64 * ysum) >> sh
        a = jnp.clip(a64, -(1 << (31 - bd)), 1 << (31 - bd)).astype(
            jnp.int32)
        b = jnp.clip(b64 + (1 << 15), -(1 << 31),
                     (1 << 31) - 1).astype(jnp.int32)
        m = jnp.clip((a * ry32 + b) >> 16, 0, hi)
        return ((m[0::2, 0::2] + m[0::2, 1::2] +
                 m[1::2, 0::2] + m[1::2, 1::2] + 2) >> 2).astype(jnp.int32)

    do_u = gate & (ssyu * ssyu * 2 > ssyy * ssuu)
    do_v = gate & (ssyv * ssyv * 2 > ssyy * ssvv)
    pu2 = jnp.where(do_u, remap(ssyu, usum), pu)
    pv2 = jnp.where(do_v, remap(ssyv, vsum), pv)
    return pu2, pv2


# ---------------------------------------------------------------------------
# intra wavefront scan (wave-batched; inter cells are final)
# ---------------------------------------------------------------------------

LANES = 64          # intra blocks processed per wave segment


def _intra_waves(y_pl, u_pl, v_pl, segs, segcls, res_y, res_u, res_v,
                 bd: int, cfl: bool, sizes):
    """segs: [S, LANES, 7] int32 (act, yy, xx, log2size, mode, ur, dl);
    segcls: [S] size-class per segment (0 inactive, i+1 -> sizes[i]).
    All blocks in a segment are one size and mutually independent (the
    host wave builder guarantees it), so each scan step reconstructs up
    to LANES intra blocks batched.  Writes happen OUTSIDE the size
    switch as masked read-modify-write windows, so the plane carries
    stay buffer-aliased in place across steps."""
    maxv = (1 << bd) - 1
    WMAX = max(sizes)
    WC = max(WMAX // 2, 4)

    def _pred16(p):
        return ((p.astype(jnp.int32) << 16) >> 16)

    def _slices(plane, yy, xx, n: int):
        def f(y, x):
            return jax.lax.dynamic_slice(plane, (y, x), (n, n))
        return jax.vmap(f)(yy, xx)

    def make_case(n):
        nc = n >> 1

        def case(y_pl, u_pl, v_pl, nd):
            yy, xx = nd[:, 1], nd[:, 2]
            mode = nd[:, 4]
            ur, dl = nd[:, 5] > 0, nd[:, 6] > 0
            l, t, tl = IB.make_refs_batch(y_pl, yy, xx, n, ur, dl, bd)
            preds = IB.predict_all_modes(l, t, tl, yy, xx, n, bd, 10)
            pred = IB.select_mode(preds, mode)
            rec = jnp.clip(_slices(res_y, yy, xx, n) + _pred16(pred), 0,
                           maxv)
            yc, xc = yy >> 1, xx >> 1
            lu, tu, tlu = IB.make_refs_batch(u_pl, yc, xc, nc, ur, dl, bd)
            pu = IB.select_mode(
                IB.predict_all_modes(lu, tu, tlu, yc, xc, nc, bd, 10),
                mode)
            lv, tv, tlv = IB.make_refs_batch(v_pl, yc, xc, nc, ur, dl, bd)
            pv = IB.select_mode(
                IB.predict_all_modes(lv, tv, tlv, yc, xc, nc, bd, 10),
                mode)
            if cfl:
                pu, pv = jax.vmap(
                    lambda p_, u_, v_, r_: _cfl_j(p_, u_, v_, r_, n, bd))(
                        pred, pu, pv, rec)
            recu = jnp.clip(_slices(res_u, yc, xc, nc) + _pred16(pu), 0,
                            maxv)
            recv = jnp.clip(_slices(res_v, yc, xc, nc) + _pred16(pv), 0,
                            maxv)
            L = yy.shape[0]
            py = jnp.zeros((L, WMAX, WMAX), jnp.int32).at[
                :, :n, :n].set(rec)
            pu_ = jnp.zeros((L, WC, WC), jnp.int32).at[
                :, :nc, :nc].set(recu)
            pv_ = jnp.zeros((L, WC, WC), jnp.int32).at[
                :, :nc, :nc].set(recv)
            return py, pu_, pv_

        return case

    zeros_case = lambda y_pl, u_pl, v_pl, nd: (  # noqa: E731
        jnp.zeros((nd.shape[0], WMAX, WMAX), jnp.int32),
        jnp.zeros((nd.shape[0], WC, WC), jnp.int32),
        jnp.zeros((nd.shape[0], WC, WC), jnp.int32))
    cases = [zeros_case] + [make_case(n) for n in sizes]

    ii = jnp.arange(WMAX)[:, None]
    jj = jnp.arange(WMAX)[None, :]
    iic = jnp.arange(WC)[:, None]
    jjc = jnp.arange(WC)[None, :]

    def step(carry, xs):
        y_pl, u_pl, v_pl = carry
        nd, cls = xs
        py, pu_, pv_ = jax.lax.switch(cls, cases, y_pl, u_pl, v_pl, nd)
        n = jnp.where(cls > 0, 8 << jnp.maximum(cls - 1, 0), 0)
        nc = n >> 1
        act = nd[:, 0]
        ymask = (ii < n) & (jj < n)
        cmask = (iic < nc) & (jjc < nc)

        def write(i, pls):
            y_pl, u_pl, v_pl = pls
            yy, xx = nd[i, 1], nd[i, 2]
            yc, xc = yy >> 1, xx >> 1
            on = act[i] > 0
            wy = jax.lax.dynamic_slice(y_pl, (yy, xx), (WMAX, WMAX))
            wy = jnp.where(ymask & on, py[i], wy)
            y_pl = jax.lax.dynamic_update_slice(y_pl, wy, (yy, xx))
            wu = jax.lax.dynamic_slice(u_pl, (yc, xc), (WC, WC))
            wu = jnp.where(cmask & on, pu_[i], wu)
            u_pl = jax.lax.dynamic_update_slice(u_pl, wu, (yc, xc))
            wv = jax.lax.dynamic_slice(v_pl, (yc, xc), (WC, WC))
            wv = jnp.where(cmask & on, pv_[i], wv)
            v_pl = jax.lax.dynamic_update_slice(v_pl, wv, (yc, xc))
            return (y_pl, u_pl, v_pl)

        carry = jax.lax.fori_loop(0, nd.shape[0], write,
                                  (y_pl, u_pl, v_pl))
        return carry, 0

    (y_pl, u_pl, v_pl), _ = jax.lax.scan(step, (y_pl, u_pl, v_pl),
                                         (segs, segcls))
    return y_pl, u_pl, v_pl


def build_wave_segments(recs, H, W, sizes, lanes=LANES):
    """Host: conservative dependency waves over the intra records
    (coding order), then (wave, size) groups cut into <=lanes segments.

    A block's nominal read set is the row above (x-1 .. x+2n-1) and the
    column left (y-1 .. y+2n-1); true reads are a subset (the
    availability clamps in make_top_and_left), so ordering by these
    levels preserves exact decoding."""
    gh8, gw8 = (H + 7) // 8, (W + 7) // 8
    g8 = np.zeros((gh8, gw8), np.int32)
    n_rec = len(recs)
    waves = np.zeros(n_rec, np.int32)
    ys = recs[:, NP.B_YPOS]
    xs = recs[:, NP.B_XPOS]
    szs = recs[:, NP.B_SIZE]
    for i in range(n_rec):
        y, x, n = int(ys[i]), int(xs[i]), int(szs[i])
        lvl = 0
        if y > 0:
            x0 = max(x - 1, 0) // 8
            xe = min((x + 2 * n - 1) // 8, gw8 - 1)
            lvl = int(g8[(y - 1) // 8, x0:xe + 1].max())
        if x > 0:
            y0 = max(y - 1, 0) // 8
            ye = min((y + 2 * n - 1) // 8, gh8 - 1)
            lvl = max(lvl, int(g8[y0:ye + 1, (x - 1) // 8].max()))
        w = lvl + 1
        g8[y // 8:(y + n) // 8, x // 8:(x + n) // 8] = w
        waves[i] = w
    segs = []
    size_cls = {s: k + 1 for k, s in enumerate(sizes)}
    order = np.lexsort((np.arange(n_rec), waves))
    wsorted = waves[order]
    starts = np.searchsorted(wsorted, np.arange(1, waves.max() + 2)
                             if n_rec else np.array([1]))
    for wi in range(len(starts) - 1):
        idx = order[starts[wi]:starts[wi + 1]]
        if not len(idx):
            continue
        for s in sizes:
            ii_ = idx[szs[idx] == s]
            for k in range(0, len(ii_), lanes):
                segs.append((size_cls[s], ii_[k:k + lanes]))
    return segs


# ---------------------------------------------------------------------------
# fused per-frame kernel
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=(
    "H", "W", "bd", "pad", "pad_c", "has_inter", "has_avg", "cfl",
    "has_qm"))
def pixel_core(ystack, ustack, vstack, gstack, cstack, coef_y, coef_uv,
               q4y, q4c, segs, segcls, qm, H: int, W: int, bd: int,
               pad: int, pad_c: int, has_inter: bool, has_avg: bool,
               cfl: bool, has_qm: bool = False):
    """Residuals + inter MC + intra scan in one dispatch (qp-free
    statics, so the expensive compile is shared across the QP ladder).

    gstack [14, gh*gw] luma plan grids; cstack [12, gh*gw] chroma grids +
    avg + inter; coef_y [hp,wp] i16; coef_uv [2,hc,wc]; q4y/q4c
    [2,*,*] (qp4, ls4); segs [S,LANES,7] + segcls [S] intra wave
    segments (build_wave_segments).
    Returns unfiltered (y, u, v) int32 planes."""
    gh, gw = H // 4, W // 4
    H2, W2 = H // 2, W // 2
    maxv = (1 << bd) - 1

    # ---- dense residuals for ALL TBs ----
    if has_qm:
        wsy, wsc, wby, wbu, wbv = (qm["wsel_y"], qm["wsel_c"], qm["y"],
                                   qm["u"], qm["v"])
    else:
        wsy = wsc = wby = wbu = wbv = None
    res_y = DP._dense_residual(coef_y, q4y[0], q4y[1], bd,
                               (4, 8, 16, 32, 64, 128), wsy, wby)[:H, :W]
    res_u = DP._dense_residual(coef_uv[0], q4c[0], q4c[1], bd,
                               (4, 8, 16, 32, 64), wsc, wbu)[:H2, :W2]
    res_v = DP._dense_residual(coef_uv[1], q4c[0], q4c[1], bd,
                               (4, 8, 16, 32, 64), wsc, wbv)[:H2, :W2]

    # ---- inter MC + reconstruct into base planes ----
    if has_inter:
        lg = {k: gstack[i] for i, k in enumerate(LY_KEYS)}
        cg = {k: cstack[i] for i, k in enumerate(CH_KEYS)}
        avg = cstack[10]
        inter_m = cstack[11]
        ys32 = ystack.astype(jnp.int32)
        us32 = ustack.astype(jnp.int32)
        vs32 = vstack.astype(jnp.int32)
        p0 = DP.mc_cells_luma(ys32, lg["r0"], lg["y0_0"] + pad,
                              lg["x0_0"] + pad, lg["op0"], lg["vf0"],
                              lg["hf0"], lg["fs0"], 4, bd)
        if has_avg:
            p1 = DP.mc_cells_luma(ys32, lg["r1"], lg["y0_1"] + pad,
                                  lg["x0_1"] + pad, lg["op1"], lg["vf1"],
                                  lg["hf1"], lg["fs1"], 4, bd)
            p0 = jnp.where(avg[:, None, None] == 1, (p0 + p1) >> 1, p0)
        pred_y = p0.reshape(gh, gw, 4, 4).transpose(0, 2, 1, 3).reshape(
            H, W)
        pu0 = DP.mc_cells_chroma(us32, lg["r0"], cg["y0_0"] + pad_c,
                                 cg["x0_0"] + pad_c, cg["op0"], cg["vf0"],
                                 cg["hf0"], 2, bd)
        pv0 = DP.mc_cells_chroma(vs32, lg["r0"], cg["y0_0"] + pad_c,
                                 cg["x0_0"] + pad_c, cg["op0"], cg["vf0"],
                                 cg["hf0"], 2, bd)
        if has_avg:
            pu1 = DP.mc_cells_chroma(us32, lg["r1"], cg["y0_1"] + pad_c,
                                     cg["x0_1"] + pad_c, cg["op1"],
                                     cg["vf1"], cg["hf1"], 2, bd)
            pv1 = DP.mc_cells_chroma(vs32, lg["r1"], cg["y0_1"] + pad_c,
                                     cg["x0_1"] + pad_c, cg["op1"],
                                     cg["vf1"], cg["hf1"], 2, bd)
            pu0 = jnp.where(avg[:, None, None] == 1, (pu0 + pu1) >> 1, pu0)
            pv0 = jnp.where(avg[:, None, None] == 1, (pv0 + pv1) >> 1, pv0)
        pred_u = pu0.reshape(gh, gw, 2, 2).transpose(0, 2, 1, 3).reshape(
            H2, W2)
        pred_v = pv0.reshape(gh, gw, 2, 2).transpose(0, 2, 1, 3).reshape(
            H2, W2)

        def recon(pred, res):
            return jnp.clip(((pred << 16) >> 16) + res, 0, maxv)

        im_y = jnp.repeat(jnp.repeat(
            inter_m.reshape(gh, gw) == 1, 4, 0), 4, 1)
        im_c = jnp.repeat(jnp.repeat(
            inter_m.reshape(gh, gw) == 1, 2, 0), 2, 1)
        base_y = jnp.where(im_y, recon(pred_y, res_y), 0)
        base_u = jnp.where(im_c, recon(pred_u, res_u), 0)
        base_v = jnp.where(im_c, recon(pred_v, res_v), 0)
    else:
        base_y = jnp.zeros((H, W), jnp.int32)
        base_u = jnp.zeros((H2, W2), jnp.int32)
        base_v = jnp.zeros((H2, W2), jnp.int32)

    # ---- intra scan over apron-extended planes ----
    y_pl = jnp.zeros((H + AP, W + AP), jnp.int32).at[:H, :W].set(base_y)
    u_pl = jnp.zeros((H2 + AP, W2 + AP), jnp.int32).at[:H2, :W2].set(
        base_u)
    v_pl = jnp.zeros((H2 + AP, W2 + AP), jnp.int32).at[:H2, :W2].set(
        base_v)
    sizes = tuple(s for s in INTRA_SIZES if s <= min(H, W))
    y_pl, u_pl, v_pl = _intra_waves(y_pl, u_pl, v_pl, segs, segcls,
                                    res_y, res_u, res_v, bd, cfl, sizes)
    return y_pl[:H, :W], u_pl[:H2, :W2], v_pl[:H2, :W2]


@partial(jax.jit, static_argnames=(
    "bd", "pad", "pad_c", "qp", "qpc", "deblocking", "cdef_damping",
    "cs", "s_y", "s_u", "s_v", "qpclpf", "out8"))
def filter_pack(y, u, v, mv_, mh_, cmv, cmh, lv0, sec0, m0, lv1, sec1,
                m1, m2, clpf_my, clpf_mu, clpf_mv2, bd: int, pad: int,
                pad_c: int, qp: int, qpc: int, deblocking: bool,
                cdef_damping: int, cs: int, s_y: int, s_u: int, s_v: int,
                qpclpf: int, out8: bool):
    """In-loop filter chain + display packing + reference padding (the
    cheap per-QP compile; masks in filters_exec's layout,
    ops/filters.py:545).  Returns (packed, ref_y, ref_u, ref_v)."""
    if deblocking:
        y = OF.deblock_plane_y(y, mv_, mh_, qp, bd)
        u = OF.deblock_plane_uv(u, cmv, cmh, qpc, 1, bd)
        v = OF.deblock_plane_uv(v, cmv, cmh, qpc, 1, bd)
    dirs, var = OF.cdef_dirs(y, cs)
    y = OF.cdef_plane(y, dirs, var, lv0, sec0, m0, 8, 0,
                      cdef_damping, cdef_damping, cs)
    u = OF.cdef_plane(u, dirs, var, lv1, sec1, m1, 4, 1,
                      cdef_damping - 1, cdef_damping - 1, cs)
    v = OF.cdef_plane(v, dirs, var, lv1, sec1, m2, 4, 2,
                      cdef_damping - 1, cdef_damping - 1, cs)
    if s_y:
        y = OF.clpf_plane(y, clpf_my, (s_y + (s_y == 3)) << cs,
                          bd - 4 + qpclpf)
    if s_u:
        u = OF.clpf_plane(u, clpf_mu, (s_u + (s_u == 3)) << cs,
                          bd - 5 + qpclpf)
    if s_v:
        v = OF.clpf_plane(v, clpf_mv2, (s_v + (s_v == 3)) << cs,
                          bd - 5 + qpclpf)

    # ---- pack display output + padded reference planes ----
    dt = jnp.uint8 if out8 else jnp.uint16
    packed = jnp.concatenate(
        [y.astype(dt), jnp.concatenate([u, v], axis=1).astype(dt)], axis=0)
    ref_y = jnp.pad(y.astype(jnp.int16), pad, mode="edge")
    ref_u = jnp.pad(u.astype(jnp.int16), pad_c, mode="edge")
    ref_v = jnp.pad(v.astype(jnp.int16), pad_c, mode="edge")
    return packed, ref_y, ref_u, ref_v


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

class DeviceFrameDecoder:
    """Per-stream device state: resident reference ring + fused dispatch.

    Frame pipelining: run() leaves the packed display pull IN FLIGHT
    (self._pending) so the host can parse/plan frame N+1 while the
    device executes frame N (the syntax layer has no pixel dependence,
    dec/decode_frame.c:52-212).  flush() resolves the pull; the decoder
    calls it before any host-pixel consumer (tempinterp, host-path
    fallbacks, output writing)."""

    # resident-reference capacity; tests shrink this to force evictions
    # of still-referenced entries (the flush()-on-ring-miss path)
    RING_CAP = 34

    def __init__(self):
        self.ring = OrderedDict()   # frame_num -> (y, u, v) device planes
        self._pending = None        # (packed, rec, H, W, Wc)
        self._late = []             # deferred ref-window host copies

    def _resolve(self, pend):
        packed, rec, H, W, Wc = pend
        out = np.asarray(packed)
        rec.y[:] = out[:H].astype(rec.dtype)
        rec.u[:] = out[H:, :Wc].astype(rec.dtype)
        rec.v[:] = out[H:, Wc:].astype(rec.dtype)
        lates = [l for l in self._late if l[1] is rec]
        self._late = [l for l in self._late if l[1] is not rec]
        for dst, src in lates:
            dst.copy_from(src)

    def flush(self):
        """Resolve the in-flight frame (no-op when none)."""
        if self._pending is not None:
            p, self._pending = self._pending, None
            self._resolve(p)

    def note_ref(self, dst, src):
        """Defer `dst.copy_from(src)` until src's pixels are pulled.
        Returns True when deferred (src is the in-flight frame).

        The frame METADATA must propagate immediately even though the
        pixel copy is deferred: the next frame's `_ref_planes` keys the
        resident ring by `frame_num`, and a stale number would miss the
        ring and upload the buffer's stale host pixels."""
        if self._pending is not None and self._pending[1] is src:
            dst.frame_num = src.frame_num
            dst.host_pixels_valid = False  # set again by copy_from
            self._late.append((dst, src))
            return True
        return False

    def _ref_planes(self, dec, r):
        """Device planes for one reference frame (ring hit or upload)."""
        is_interp = (dec.interp_frames and r is dec.interp_frames[0])
        key = None if is_interp else r.frame_num
        if key is not None and key in self.ring:
            return self.ring[key]
        if key is not None and any(dst is r for dst, _ in self._late):
            # ring miss on a ref whose host copy is still deferred
            # (evicted entry): resolve the pipeline before uploading
            self.flush()
        assert getattr(r, "host_pixels_valid", True), (
            "reading host pixels of a reference whose deferred device "
            "copy has not been resolved (frame_num=%s)" % r.frame_num)
        planes = (jnp.asarray(r.y_full.astype(np.int16)),
                  jnp.asarray(r.u_full.astype(np.int16)),
                  jnp.asarray(r.v_full.astype(np.int16)))
        if key is not None:
            self.ring[key] = planes
            while len(self.ring) > self.RING_CAP:
                self.ring.popitem(last=False)
        return planes

    def eligible(self, dec, blks):
        h = dec.h
        if h.subsample != 420 or h.cfl_inter:
            return False
        if len(blks) == 0:
            return False
        intra = blks[:, NP.B_MODE] == MODE_INTRA
        if (intra & (blks[:, NP.B_TBSPLIT] > 0)).any():
            return False
        return True

    def run(self, dec, s, blks, plan, refs):
        """Execute one parsed frame; fills dec.rec; consumes the filter
        stream reads (CDEF presets, CLPF bits) in reference order."""
        import os as _os
        import time as _time
        prof = _os.environ.get("THOR_PROF", "0") == "1"
        t0 = _time.time()
        h = dec.h
        fi = dec.fi
        H, W = dec.height, dec.width
        Hc, Wc = H >> 1, W >> 1
        bd = h.bitdepth
        qp = fi.qpb
        qpc = int(CHROMA_QP[qp])

        # ---- intra wave segments (dependency-batched) ----
        sb_size = 1 << h.log2_sb_size
        recs = blks[blks[:, NP.B_MODE] == MODE_INTRA]
        sizes = tuple(s for s in INTRA_SIZES if s <= min(H, W))
        seg_list = build_wave_segments(recs, H, W, sizes)
        scap = _bucket(max(len(seg_list), 1))
        segs = np.zeros((scap, LANES, 7), np.int32)
        segcls = np.zeros(scap, np.int32)
        for si, (cls, idx) in enumerate(seg_list):
            segcls[si] = cls
            for li, ri in enumerate(idx):
                r = recs[ri]
                y, x, size = int(r[NP.B_YPOS]), int(r[NP.B_XPOS]), int(
                    r[NP.B_SIZE])
                ur = inter.get_upright_available(y, x, size, size, W, H,
                                                 sb_size)
                dl = inter.get_downleft_available(y, x, size, size, W, H,
                                                  sb_size)
                segs[si, li] = (1, y, x, log2i(size),
                                int(r[NP.B_INTRA_MODE]), ur, dl)

        # ---- filter-stage host reads + masks (reference order) ----
        if h.deblocking:
            mv_, mh_ = OF.deblock_masks_y(dec.dd, W, H)
            cmv, cmh = OF.deblock_masks_uv(dec.dd, W, H)
        else:
            mv_ = mh_ = np.zeros((H, W), bool)
            cmv = cmh = np.zeros((Hc, Wc), bool)
        presets_y, presets_uv = dec._read_cdef_presets(s)
        cs = bd - 8
        lv0, sec0, m0 = OF.cdef_block_maps(dec.dd, presets_y, W, H, 0, 1)
        lv1, sec1, m1 = OF.cdef_block_maps(dec.dd, presets_uv, W, H, 1, 1)
        _, _, m2 = OF.cdef_block_maps(dec.dd, presets_uv, W, H, 2, 1)
        s_y = s_u = s_v = 0
        clpf_my = np.zeros((H, W), bool)
        clpf_mu = clpf_mv2 = np.zeros((Hc, Wc), bool)
        if h.clpf:
            s_y = s.get_flc(2)
            s_u = s.get_flc(2)
            s_v = s.get_flc(2)
            if s_y:
                fb_size_log2 = s.get_flc(2) + 4
                enable_fb = fb_size_log2 != 4
                if fb_size_log2 == 4:
                    fb_size_log2 = 7
                if enable_fb:
                    nbits = SF.count_clpf_decisions(dec.dd, W, H, 0,
                                                    fb_size_log2, 1)
                    bits = [s.get_flc(1) for _ in range(nbits)]
                else:
                    bits = None
                clpf_my, _ = OF.clpf_pixel_mask(dec.dd, W, H, 0,
                                                fb_size_log2, 1,
                                                decision_bits=bits)
            if s_u:
                clpf_mu, _ = OF.clpf_pixel_mask(dec.dd, W, H, 1, 4, 1)
            if s_v:
                clpf_mv2, _ = OF.clpf_pixel_mask(dec.dd, W, H, 2, 4, 1)

        # ---- reference stacks (resident ring) ----
        has_inter = fi.frame_type != I_FRAME and bool(plan.inter.any())
        if has_inter:
            rp = [self._ref_planes(dec, r) for r in refs]
            ystack = jnp.stack([p[0] for p in rp])
            ustack = jnp.stack([p[1] for p in rp])
            vstack = jnp.stack([p[2] for p in rp])
            pad, pad_c = refs[0].pad, refs[0].pad_c
        else:
            ystack = jnp.zeros((1, 1, 1), jnp.int16)
            ustack = vstack = ystack
            pad = pad_c = 0

        gstack = np.stack([plan.ly[k].reshape(-1) for k in LY_KEYS])
        cstack = np.stack([plan.ch[k].reshape(-1) for k in CH_KEYS] +
                          [plan.avg.reshape(-1), plan.inter.reshape(-1)])
        q4y = np.stack([plan.qp4["y"], plan.ls4["y"]])
        q4c = np.stack([plan.qp4["c"], plan.ls4["c"]])
        coef_uv = np.stack([plan.coef["u"], plan.coef["v"]])

        qm = {}
        has_qm = False
        if h.qmtx:
            wsel_y, wsel_c, banks = DP.build_qm_operands(dec, plan, blks)
            qm = {"wsel_y": jnp.asarray(wsel_y),
                  "wsel_c": jnp.asarray(wsel_c),
                  "y": banks["y"], "u": banks["u"], "v": banks["v"]}
            has_qm = True

        t_prep = _time.time() - t0
        with jax.enable_x64():
            yf, uf, vf = pixel_core(
                ystack, ustack, vstack, jnp.asarray(gstack),
                jnp.asarray(cstack), jnp.asarray(plan.coef["y"]),
                jnp.asarray(coef_uv), jnp.asarray(q4y), jnp.asarray(q4c),
                jnp.asarray(segs), jnp.asarray(segcls), qm,
                H=H, W=W, bd=bd, pad=PADDING, pad_c=PADDING >> 1,
                has_inter=has_inter, has_avg=bool(plan.avg.any()),
                cfl=bool(h.cfl_intra), has_qm=has_qm)
            packed, ry, ru, rv = filter_pack(
                yf, uf, vf, jnp.asarray(mv_), jnp.asarray(mh_),
                jnp.asarray(cmv), jnp.asarray(cmh), jnp.asarray(lv0),
                jnp.asarray(sec0), jnp.asarray(m0), jnp.asarray(lv1),
                jnp.asarray(sec1), jnp.asarray(m1), jnp.asarray(m2),
                jnp.asarray(clpf_my), jnp.asarray(clpf_mu),
                jnp.asarray(clpf_mv2), bd=bd, pad=PADDING,
                pad_c=PADDING >> 1, qp=qp, qpc=qpc,
                deblocking=bool(h.deblocking),
                cdef_damping=dec.cdef_damping, cs=cs, s_y=s_y, s_u=s_u,
                s_v=s_v, qpclpf=qp >> 4, out8=(bd == 8))
        if has_inter and pad != PADDING:
            raise AssertionError("ref pad mismatch")

        # resident ring update (before the blocking pull: both are queued)
        self.ring[dec.rec.frame_num] = (ry, ru, rv)
        while len(self.ring) > self.RING_CAP:
            self.ring.popitem(last=False)

        if prof:
            # profiling mode keeps the pull synchronous so stage times
            # attribute to the frame that caused them
            t1 = _time.time()
            jax.block_until_ready(packed)
            t_dev = _time.time() - t1
            t1 = _time.time()
            out = np.asarray(packed)
            t_pull = _time.time() - t1
            import sys as _sys
            # stderr, never stdout: decoder stdout is byte-identical to
            # the reference oracle (cli.py) and must stay that way even
            # under THOR_PROF=1
            print(f"[THOR_PROF] frame {dec.rec.frame_num}: "
                  f"prep={t_prep:.3f}s segs={len(seg_list)} "
                  f"dev={t_dev:.3f}s pull={t_pull:.3f}s",
                  file=_sys.stderr, flush=True)
            self.flush()
            rec = dec.rec
            rec.y[:] = out[:H].astype(rec.dtype)
            rec.u[:] = out[H:, :Wc].astype(rec.dtype)
            rec.v[:] = out[H:, Wc:].astype(rec.dtype)
            return
        # pipelined: leave this frame's pull in flight, resolve the
        # previous one (its device work overlapped this frame's host
        # parse/plan, and frame N+1's dispatch is already queued)
        prev, self._pending = self._pending, (packed, dec.rec, H, W, Wc)
        if prev is not None:
            self._resolve(prev)
