"""Device-side MV candidate derivation, MV prediction and block contexts.

Batched (per-lane) twins of spec.inter.get_mv_pred / get_mv_skip /
get_mv_merge (reference common/inter_prediction.c:413-736) and
find_block_contexts (common/common_block.c:283-303), operating on the
deblock-data grid tensors the device decision pass keeps resident.

All functions take [L] lane position arrays plus the dd grid tensors and
return [L]-shaped results; `size` is static (one specialization per block
size, as in the interpreter's schedule).
"""
from __future__ import annotations

import jax.numpy as jnp

MIN_PB_SIZE = 4


def _up_avail(ypos):
    return ypos > 0


def _left_avail(xpos):
    return xpos > 0


def upright_available(ypos, xpos, size: int, fwidth: int, fheight: int,
                      sb_size: int):
    """common/common_block.h:60-74 (square blocks)."""
    avail = (ypos > 0) & (xpos + size < fwidth)
    size2 = size
    while size2 < sb_size:
        bad = (((ypos % (size2 << 1)) == size2) &
               ((xpos % size2) == (size2 - size)))
        avail = avail & ~bad
        size2 *= 2
    return avail


def downleft_available(ypos, xpos, size: int, fwidth: int, fheight: int,
                       sb_size: int):
    """common/common_block.h:76-95 (square blocks)."""
    avail = (xpos > 0) & (ypos + size < fheight)
    bad = ((ypos % sb_size) == (sb_size - size)) & ((xpos % sb_size) == 0)
    avail = avail & ~bad
    size2 = 2 * size
    while size2 <= sb_size:
        bad = ((ypos % size2) == (size2 - size)) & ((xpos % size2) > 0)
        avail = avail & ~bad
        size2 *= 2
    return avail


def _g(grid, by, bx):
    """Single-element gather grid[by, bx] for [L] index arrays."""
    return grid[by, bx]


def mv_pred_batch(ypos, xpos, size: int, fwidth: int, fheight: int,
                  sb_size: int, dd_mv0y, dd_mv0x):
    """Median MVP (inter_prediction.c:413-526).  Returns (mvpy, mvpx) [L]."""
    bsz = size // MIN_PB_SIZE
    by = ypos // MIN_PB_SIZE
    bx = xpos // MIN_PB_SIZE

    U = _up_avail(ypos)
    UR = upright_available(ypos, xpos, size, fwidth, fheight, sb_size)
    L = _left_avail(xpos)
    DL = downleft_available(ypos, xpos, size, fwidth, fheight, sb_size)

    # neighbour cell coords (clamped to grid; masked selections below
    # never use out-of-range values)
    HB, WB = dd_mv0y.shape

    def cell(dy, dx):
        cy = jnp.clip(by + dy, 0, HB - 1)
        cx = jnp.clip(bx + dx, 0, WB - 1)
        return dd_mv0y[cy, cx], dd_mv0x[cy, cx]

    up0 = cell(-1, 0)
    up1 = cell(-1, (bsz - 1) // 2)
    up2 = cell(-1, bsz - 1)
    left0 = cell(0, -1)
    left1 = cell((bsz - 1) // 2, -1)
    left2 = cell(bsz - 1, -1)
    downleft = cell(bsz, -1)
    upright = cell(-1, bsz)
    upleft = cell(-1, -1)

    zero = (jnp.zeros_like(up0[0]), jnp.zeros_like(up0[1]))

    # availability-pattern table (inter_prediction.c:437-516)
    def sel3(a, b, c):
        return a, b, c

    # build each component by masked selection over the 9 cases
    cases = [
        ((U & ~UR & ~L & ~DL), sel3(up0, up1, up2)),
        ((U & UR & ~L & ~DL), sel3(up0, up2, upright)),
        ((~U & ~UR & L & ~DL), sel3(left0, left1, left2)),
        ((U & ~UR & L & ~DL), sel3(upleft, up2, left2)),
        ((U & UR & L & ~DL), sel3(up0, upright, left2)),
        ((~U & ~UR & L & DL), sel3(left0, left2, downleft)),
        ((U & ~UR & L & DL), sel3(up2, left0, downleft)),
        ((U & UR & L & DL), sel3(up0, upright, left0)),
    ]
    mva, mvb, mvc = zero, zero, zero
    for cond, (a, b, c) in cases:
        mva = (jnp.where(cond, a[0], mva[0]), jnp.where(cond, a[1], mva[1]))
        mvb = (jnp.where(cond, b[0], mvb[0]), jnp.where(cond, b[1], mvb[1]))
        mvc = (jnp.where(cond, c[0], mvc[0]), jnp.where(cond, c[1], mvc[1]))

    def median(a, b, c):
        return jnp.where(a < b,
                         jnp.minimum(b, jnp.maximum(a, c)),
                         jnp.minimum(a, jnp.maximum(b, c)))

    return (median(mva[0], mvb[0], mvc[0]).astype(jnp.int32),
            median(mva[1], mvb[1], mvc[1]).astype(jnp.int32))


def two_candidates_batch(ypos, xpos, size: int, fwidth: int, fheight: int,
                         sb_size: int, dd):
    """Skip/merge candidate gathering + dedup (inter_prediction.c:565-679).

    dd: dict of grid tensors (mv0y, mv0x, mv1y, mv1x, ref0, ref1, bip).
    Returns cand [L, 2, 7] int32 and count [L] (1 or 2).  Candidate layout
    matches the host tuples: (mv0y, mv0x, mv1y, mv1x, ref0, ref1, bipred).
    """
    bsz = size // MIN_PB_SIZE
    by = ypos // MIN_PB_SIZE
    bx = xpos // MIN_PB_SIZE
    HB, WB = dd["mv0y"].shape

    up = _up_avail(ypos)
    left = _left_avail(xpos)
    ur = upright_available(ypos, xpos, size, fwidth, fheight, sb_size)

    # cell offsets with the frame-edge adjustments (:577-580)
    l2_dy = jnp.where(ypos + size > fheight, 0, bsz - 1)
    u2_dx = jnp.where(xpos + size > fwidth, 0, bsz - 1)

    def pred_at(cy, cx):
        cy = jnp.clip(cy, 0, HB - 1)
        cx = jnp.clip(cx, 0, WB - 1)
        return jnp.stack([dd["mv0y"][cy, cx], dd["mv0x"][cy, cx],
                          dd["mv1y"][cy, cx], dd["mv1x"][cy, cx],
                          dd["ref0"][cy, cx], dd["ref1"][cy, cx],
                          dd["bip"][cy, cx]], axis=-1)   # [L, 7]

    zero = jnp.zeros_like(pred_at(by, bx))
    c_left2 = pred_at(by + l2_dy, bx - 1)
    c_upright = pred_at(by - 1, bx + bsz)
    c_up2 = pred_at(by - 1, bx + u2_dx)

    c0 = jnp.where(left[:, None], c_left2, zero)
    c1 = jnp.where(ur[:, None], c_upright,
                   jnp.where(up[:, None], c_up2, zero))

    # dedup (inter_prediction.c:661-679): c1 is dropped if it equals c0 on
    # the first six fields and (bip equal or c1.bip == -1)
    eq6 = jnp.all(c0[:, :6] == c1[:, :6], axis=1)
    dup = eq6 & ((c0[:, 6] == c1[:, 6]) | (c1[:, 6] == -1))
    n = jnp.where(dup, 1, 2).astype(jnp.int32)
    cand = jnp.stack([c0, c1], axis=1)    # [L, 2, 7]
    return cand.astype(jnp.int32), n


def block_contexts_batch(ypos, xpos, size: int, fwidth: int, fheight: int,
                         enable: int, dd_size, dd_cbp_y, dd_cbp_u, dd_cbp_v):
    """find_block_contexts (common/common_block.c:283-303).
    Returns (ctx_split, ctx_cbp, ctx_index) [L] int32 (-1 when disabled)."""
    by = ypos // MIN_PB_SIZE
    bx = xpos // MIN_PB_SIZE
    HB, WB = dd_size.shape
    ok = ((ypos >= 8) & (xpos >= 8) & (ypos + size < fheight) &
          (xpos + size < fwidth)) if enable and size <= 128 else \
        jnp.zeros_like(ypos, dtype=bool)
    byc = jnp.clip(by, 1, HB - 1)
    bxc = jnp.clip(bx, 1, WB - 1)
    s_up = dd_size[byc - 1, bxc]
    s_left = dd_size[byc, bxc - 1]
    cy_up, cy_left = dd_cbp_y[byc - 1, bxc], dd_cbp_y[byc, bxc - 1]
    cu_up, cu_left = dd_cbp_u[byc - 1, bxc], dd_cbp_u[byc, bxc - 1]
    cv_up, cv_left = dd_cbp_v[byc - 1, bxc], dd_cbp_v[byc, bxc - 1]
    split = (s_up < size).astype(jnp.int32) + (s_left < size)
    cbp1 = (cy_up > 0).astype(jnp.int32) + (cy_left > 0)
    cbp2 = (((cy_up > 0) | (cu_up > 0) | (cv_up > 0)).astype(jnp.int32) +
            ((cy_left > 0) | (cu_left > 0) | (cv_left > 0)))
    m1 = jnp.full_like(split, -1)
    return (jnp.where(ok, split, m1), jnp.where(ok, cbp1, m1),
            jnp.where(ok, 3 * split + cbp2, m1))
