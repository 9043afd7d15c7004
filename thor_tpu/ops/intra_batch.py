"""Batched device intra prediction (all 10 modes + reference builder).

Device twin of spec.intra (reference common/intra_prediction.c:39-428),
vectorized over a lane axis for the encoder decision pass and the decoder
device pipeline.  The non-tb-split reference-sample path is implemented
(the tb-split TU path reads partial CB recon and is composed by the caller
from the same primitives).

The plane passed to `make_refs_batch` must have >= size+1 readable cells
to the right/below every queried block (the device rec planes carry a
small right/bottom apron) so dynamic_slice never shifts a window.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MODE_DC, MODE_PLANAR, MODE_HOR, MODE_VER = 0, 1, 2, 3
MODE_UPLEFT, MODE_UPRIGHT, MODE_UPUPRIGHT, MODE_UPUPLEFT = 4, 5, 6, 7
MODE_UPLEFTLEFT, MODE_DOWNLEFTLEFT = 8, 9


def _cdiv8(v):
    return jnp.sign(v) * (jnp.abs(v) // 8)


def filter_121(a):
    """(1,2,1)/4 smoothing with edge replication along the last axis."""
    prev = jnp.concatenate([a[..., :1], a[..., :-1]], axis=-1)
    nxt = jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)
    return (prev + 2 * a + nxt + 2) >> 2


def select_mode(preds, mode):
    """preds[mode[i], i, ...] without take_along_axis (select chain).

    preds: [M, L, ...] stacked per-mode predictions; mode: [L] int.
    A dynamic gather along the mode axis devectorizes on TPU; M selects
    are pure VPU elementwise work that fuses into the surrounding code.
    """
    r = preds[0]
    exp = (slice(None),) + (None,) * (preds.ndim - 2)
    for k in range(1, preds.shape[0]):
        r = jnp.where((mode == k)[exp], preds[k], r)
    return r


def make_refs_batch(plane, cb_y, cb_x, size: int, ur, dl, bitdepth: int):
    """Reference samples for whole-CB intra (intra_prediction.c:57-116).

    plane: [>=H+size+1, >=W+size+1] int32 (visible frame at origin).
    cb_y/cb_x: [L]; ur/dl: [L] bool availability.
    Returns (left [L,2*size], top [L,2*size], top_left [L]) int32.
    """
    n = size
    half = 128 << (bitdepth - 8)

    def row_read(y, x):
        return jax.lax.dynamic_slice(plane, (y, x), (1, n + 1))[0]

    def col_read(y, x):
        return jax.lax.dynamic_slice(plane, (y, x), (n + 1, 1))[:, 0]

    y0 = jnp.maximum(cb_y - 1, 0).astype(jnp.int32)
    x0 = jnp.maximum(cb_x - 1, 0).astype(jnp.int32)
    trow = jax.vmap(row_read)(y0, cb_x.astype(jnp.int32))   # [L, n+1]
    lcol = jax.vmap(col_read)(cb_y.astype(jnp.int32), x0)   # [L, n+1]
    tl_px = plane[y0, x0]

    # edge-clamp replicate without a dynamic gather (take_along_axis
    # lowers to a lane-crossing gather, hostile on TPU): the clamp index
    # is n-1 (neighbour unavailable) or n (available) - two selects
    def _clamp_ext(row, avail):
        base = jnp.concatenate(
            [row[:, :n], jnp.broadcast_to(row[:, n - 1:n], (row.shape[0],
                                                            n))], axis=1)
        ext = jnp.concatenate(
            [row[:, :n], jnp.broadcast_to(row[:, n:n + 1], (row.shape[0],
                                                            n))], axis=1)
        return jnp.where(avail[:, None], ext, base)

    top = _clamp_ext(trow, ur)
    left = _clamp_ext(lcol, dl)

    top = jnp.where((cb_y == 0)[:, None], half, top)
    left = jnp.where((cb_x == 0)[:, None], half, left)
    top_left = jnp.where(cb_y == 0, left[:, 0],
                         jnp.where(cb_x > 0, tl_px, top[:, 0]))
    return left.astype(jnp.int32), top.astype(jnp.int32), \
        top_left.astype(jnp.int32)


def _planar_filt(v, n):
    """5-tap (1,2,2,2,1) with the reference's edge handling
    (intra_prediction.c:229-247); v: [L, >=n]."""
    i = jnp.arange(n)
    km2 = jnp.clip(i - 2, 0, n - 1)
    km1 = jnp.clip(i - 1, 0, n - 1)
    kp1 = jnp.clip(i + 1, 0, n - 1)
    kp2 = jnp.clip(i + 2, 0, n - 1)
    # interior taps
    out = (v[:, km2] + 2 * v[:, km1] + 2 * v[:, i] + 2 * v[:, kp1] +
           v[:, kp2])
    # the reference's explicit edge rows replicate v[0]/v[n-1] differently:
    e0 = v[:, 0] + 2 * v[:, 0] + 2 * v[:, 0] + 2 * v[:, 1] + v[:, 2]
    e1 = v[:, 0] + 2 * v[:, 0] + 2 * v[:, 1] + 2 * v[:, 2] + v[:, 3]
    em2 = (v[:, n - 4] + 2 * v[:, n - 3] + 2 * v[:, n - 2] +
           2 * v[:, n - 1] + v[:, n - 1])
    em1 = (v[:, n - 3] + 2 * v[:, n - 2] + 2 * v[:, n - 1] +
           2 * v[:, n - 1] + v[:, n - 1])
    out = out.at[:, 0].set(e0).at[:, 1].set(e1)
    out = out.at[:, n - 2].set(em2).at[:, n - 1].set(em1)
    return out


@partial(jax.jit, static_argnames=("size", "bitdepth", "num_modes"))
def predict_all_modes(left, top, top_left, ypos, xpos, size: int,
                      bitdepth: int, num_modes: int = 10):
    """All intra mode predictions (intra_prediction.c:185-428).

    left/top: [L, 2*size]; top_left/ypos/xpos: [L].
    Returns [num_modes, L, size, size] int32 indexed by mode id.
    """
    n = size
    Lb = left.shape[0]
    ii = jnp.arange(n)[:, None]
    jj = jnp.arange(n)[None, :]
    maxval = (1 << bitdepth) - 1
    out = []

    # DC (predictor rule: left unless xpos==0, top unless ypos==0)
    l_ = jnp.where((xpos != 0)[:, None], left[:, :n], top[:, :n])
    t_ = jnp.where((ypos != 0)[:, None], top[:, :n], left[:, :n])
    dc = (t_.sum(axis=1) + l_.sum(axis=1) + n) // (2 * n)
    out.append(jnp.broadcast_to(dc[:, None, None], (Lb, n, n)))

    # PLANAR
    tF = _planar_filt(top, n)
    lF = _planar_filt(left, n)
    tlF = (left[:, 1] + 2 * left[:, 0] + 2 * top_left + 2 * top[:, 0] +
           top[:, 1])
    val = lF[:, :, None] + tF[:, None, :] - tlF[:, None, None] + 4
    out.append(jnp.clip(_cdiv8(val), 0, maxval))

    # HOR / VER
    out.append(jnp.broadcast_to(left[:, :n, None], (Lb, n, n)))
    out.append(jnp.broadcast_to(top[:, None, :n], (Lb, n, n)))

    if num_modes > 4:
        lF1 = filter_121(left[:, :n])
        tF1 = filter_121(top[:, :n])
        tl1 = (2 * top_left + left[:, 0] + top[:, 0] + 2) >> 2
        lF2 = filter_121(left)          # 2n
        tF2 = filter_121(top)

        # UPLEFT
        diag = ii - jj
        g_l = lF1[:, jnp.clip(diag - 1, 0, n - 1)]
        g_t = tF1[:, jnp.clip(-diag - 1, 0, n - 1)]
        out.append(jnp.where(diag > 0, g_l,
                             jnp.where(diag == 0, tl1[:, None, None], g_t)))

        # UPRIGHT
        out.append(tF2[:, ii + jj + 1])

        # UPUPRIGHT
        diag = ii + 2 * jj
        odd = (diag & 1) == 1
        a = tF2[:, jnp.clip((diag + 1) // 2, 0, 2 * n - 1)]
        b = (tF2[:, jnp.clip(diag // 2, 0, 2 * n - 1)] +
             tF2[:, jnp.clip(diag // 2 + 1, 0, 2 * n - 1)]) >> 1
        out.append(jnp.where(odd, a, b))

        # UPUPLEFT
        diag = ii - 2 * jj
        nd = -diag
        t_odd = tF1[:, jnp.clip(nd // 2, 0, n - 1)]
        t_even = (tF1[:, jnp.clip(nd // 2, 0, n - 1)] +
                  tF1[:, jnp.clip(nd // 2 - 1, 0, n - 1)]) >> 1
        neg = jnp.where((diag & 1) == 1, t_odd, t_even)
        out.append(jnp.where(
            diag > 1, lF1[:, jnp.clip(diag - 2, 0, n - 1)],
            jnp.where(diag == 1, tl1[:, None, None],
                      jnp.where(diag == 0,
                                ((tl1[:, None, None] + tF1[:, 0:1, None])
                                 >> 1), neg))))

        # UPLEFTLEFT
        diag = 2 * ii - jj
        l_odd = lF1[:, jnp.clip(diag // 2, 0, n - 1)]
        l_even = (lF1[:, jnp.clip(diag // 2, 0, n - 1)] +
                  lF1[:, jnp.clip(diag // 2 - 1, 0, n - 1)]) >> 1
        pos = jnp.where((diag & 1) == 1, l_odd, l_even)
        out.append(jnp.where(
            diag < -1, tF1[:, jnp.clip(-diag - 2, 0, n - 1)],
            jnp.where(diag == -1, tl1[:, None, None],
                      jnp.where(diag == 0,
                                ((tl1[:, None, None] + lF1[:, 0:1, None])
                                 >> 1), pos))))

        # DOWNLEFTLEFT
        diag = 2 * ii + jj
        odd = (diag & 1) == 1
        a = lF2[:, jnp.clip((diag + 1) // 2, 0, 2 * n - 1)]
        b = (lF2[:, jnp.clip(diag // 2, 0, 2 * n - 1)] +
             lF2[:, jnp.clip(diag // 2 + 1, 0, 2 * n - 1)]) >> 1
        out.append(jnp.where(odd, a, b))

    return jnp.stack([o.astype(jnp.int32) for o in out])


def search_dc_pred(left, top, size: int):
    """The SAD search's DC variant (enc/encode_block.c:951: passes
    (left, top) unconditionally).  Returns [L] DC values."""
    n = size
    s = top[:, :n].sum(axis=1) + left[:, :n].sum(axis=1)
    return (s + n) // (2 * n)
