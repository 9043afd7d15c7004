"""Batched lockstep ME vs the host reference search, decision-exact."""
import numpy as np
import pytest

from thor_tpu.enc import me
from thor_tpu.ops.me_batch import motion_estimate_batch
from thor_tpu.frame import YuvFrame


class _P:
    encoder_speed = 1


@pytest.mark.parametrize("size,sign", [
    (16, 0),
    pytest.param(16, 1, marks=pytest.mark.slow),
    pytest.param(8, 0, marks=pytest.mark.slow),
    (32, 0)])
def test_motion_estimate_batch(size, sign):
    rng = np.random.default_rng(7 + size + sign)
    W, H, pad = 128, 96, 160
    fr = YuvFrame(W, H, 420, pad, 8, 8)
    fr.y[:] = rng.integers(0, 256, (H, W))
    fr.pad_frame()

    N, maxc = 24, 4
    ys = rng.integers(0, (H - size) // 8, N) * 8
    xs = rng.integers(0, (W - size) // 8, N) * 8
    orgs = rng.integers(0, 256, (N, size, size)).astype(np.int32)
    mvps = rng.integers(-20, 21, (N, 2))
    lams = rng.uniform(1.0, 8.0, N)
    cn = rng.integers(1, maxc + 1, N)
    cy = rng.integers(-12, 13, (N, maxc))
    cx = rng.integers(-12, 13, (N, maxc))

    gs, gy, gx = (np.asarray(a) for a in motion_estimate_batch(
        orgs, fr.y_full.astype(np.int32), pad, ys.astype(np.int32),
        xs.astype(np.int32), mvps[:, 0].astype(np.int32),
        mvps[:, 1].astype(np.int32), lams, cy.astype(np.int32),
        cx.astype(np.int32), cn.astype(np.int32),
        width=size, height=size, size=size, sign=sign,
        fwidth=W, fheight=H, bitdepth=8, maxcand=maxc))

    for i in range(N):
        mvcand = [(int(cy[i, j]), int(cx[i, j])) for j in range(maxc)]
        sad, mv = me.motion_estimate(
            orgs[i], fr, int(ys[i]), int(xs[i]), size, size, size,
            (0, 0), (int(mvps[i, 0]), int(mvps[i, 1])), float(lams[i]),
            _P(), sign, W, H, mvcand, [int(cn[i])], 0, 8)
        assert int(gs[i]) == sad and (int(gy[i]), int(gx[i])) == mv, i


@pytest.mark.slow
@pytest.mark.parametrize("widesad32", [True, False])
def test_motion_estimate_batch_telescope(widesad32):
    """size-16 bipred path: telescope + candidates + hexagon + subpel."""
    rng = np.random.default_rng(31 + widesad32)
    W, H, pad, size = 192, 128, 160, 16
    fr = YuvFrame(W, H, 420, pad, 8, 8)
    fr.y[:] = rng.integers(0, 256, (H, W))
    fr.pad_frame()

    class _PS:
        encoder_speed = 1 if widesad32 else 2

    N, maxc = 16, 2
    ys = rng.integers(0, (H - size) // 8, N) * 8
    xs = rng.integers(0, (W - size) // 8, N) * 8
    orgs = rng.integers(0, 256, (N, size, size)).astype(np.int32)
    mvps = rng.integers(-20, 21, (N, 2))
    lams = rng.uniform(1.0, 8.0, N)
    cn = rng.integers(1, maxc + 1, N)
    cy = rng.integers(-12, 13, (N, maxc))
    cx = rng.integers(-12, 13, (N, maxc))
    mvc = (6, -10)

    gs, gy, gx = (np.asarray(a) for a in motion_estimate_batch(
        orgs, fr.y_full.astype(np.int32), pad, ys.astype(np.int32),
        xs.astype(np.int32), mvps[:, 0].astype(np.int32),
        mvps[:, 1].astype(np.int32), lams, cy.astype(np.int32),
        cx.astype(np.int32), cn.astype(np.int32),
        width=size, height=size, size=size, sign=0,
        fwidth=W, fheight=H, bitdepth=8, maxcand=maxc,
        telescope=True, widesad32=widesad32, mvc_y=mvc[0], mvc_x=mvc[1]))

    for i in range(N):
        mvcand = [(int(cy[i, j]), int(cx[i, j])) for j in range(maxc)]
        sad, mv = me.motion_estimate(
            orgs[i], fr, int(ys[i]), int(xs[i]), size, size, size,
            mvc, (int(mvps[i, 0]), int(mvps[i, 1])), float(lams[i]),
            _PS(), 0, W, H, mvcand, [int(cn[i])], 1, 8)
        assert int(gs[i]) == sad and (int(gy[i]), int(gx[i])) == mv, i


@pytest.mark.slow
@pytest.mark.parametrize("sign,bip", [(0, 1), (1, 1), (0, 2)])
def test_motion_estimate_bi_batch(sign, bip):
    from thor_tpu.ops.me_batch import motion_estimate_bi_batch
    rng = np.random.default_rng(13 + sign + bip)
    W, H, pad, size = 128, 96, 160, 16
    r0 = YuvFrame(W, H, 420, pad, 8, 8)
    r0.y[:] = rng.integers(0, 256, (H, W))
    r0.pad_frame()
    r1 = YuvFrame(W, H, 420, pad, 8, 8)
    r1.y[:] = rng.integers(0, 256, (H, W))
    r1.pad_frame()

    N, maxc = 10, 4
    ys = rng.integers(0, (H - size) // 8, N) * 8
    xs = rng.integers(0, (W - size) // 8, N) * 8
    orgs = rng.integers(0, 256, (N, size, size)).astype(np.int32)
    mvps = rng.integers(-12, 13, (N, 2))
    lams = rng.uniform(1.0, 6.0, N)
    cn = rng.integers(0, maxc + 1, N)
    cy = rng.integers(-10, 11, (N, maxc))
    cx = rng.integers(-10, 11, (N, maxc))
    mvc = (5, -7)

    gs, gy, gx = (np.asarray(a) for a in motion_estimate_bi_batch(
        orgs, r0.y_full.astype(np.int32), r1.y_full.astype(np.int32), pad,
        ys.astype(np.int32), xs.astype(np.int32),
        mvps[:, 0].astype(np.int32), mvps[:, 1].astype(np.int32), lams,
        cy.astype(np.int32), cx.astype(np.int32), cn.astype(np.int32),
        width=size, height=size, size=size, sign=sign, fwidth=W,
        fheight=H, bitdepth=8, bipred=bip, mvc_y=mvc[0], mvc_x=mvc[1]))

    for i in range(N):
        mvcand = [(int(cy[i, j]), int(cx[i, j]))
                  for j in range(maxc)] + [(0, 0)] * 2
        sad, mv = me.motion_estimate_bi(
            orgs[i], r0, r1, int(ys[i]), int(xs[i]), size, size, size,
            mvc, (int(mvps[i, 0]), int(mvps[i, 1])), float(lams[i]), _P(),
            sign, W, H, mvcand, [int(cn[i])], bip, 8)
        assert int(gs[i]) == sad and (int(gy[i]), int(gx[i])) == mv, i


@pytest.mark.slow
@pytest.mark.parametrize("sign,bip", [(0, 0), (1, 1)])
def test_motion_estimate_sync_batch(sign, bip):
    from thor_tpu.ops.me_batch import motion_estimate_sync_batch
    rng = np.random.default_rng(17 + sign)
    W, H, pad, size = 128, 96, 160, 16
    fr = YuvFrame(W, H, 420, pad, 8, 8)
    fr.y[:] = rng.integers(0, 256, (H, W))
    fr.pad_frame()

    N = 10
    ys = rng.integers(0, (H - size) // 8, N) * 8
    xs = rng.integers(0, (W - size) // 8, N) * 8
    orgs = rng.integers(0, 256, (N, size, size)).astype(np.int32)
    mvps = rng.integers(-12, 13, (N, 2))
    lams = rng.uniform(1.0, 6.0, N)
    cands = rng.integers(-10, 11, (N, 6, 2))
    mvc = (5, -7)
    cy = cands[:, :, 0].copy()
    cx = cands[:, :, 1].copy()
    cy[:, 4] = mvps[:, 0]
    cx[:, 4] = mvps[:, 1]
    cy[:, 5] = 0
    cx[:, 5] = 0

    gs, gy, gx = (np.asarray(a) for a in motion_estimate_sync_batch(
        orgs, fr.y_full.astype(np.int32), pad, ys.astype(np.int32),
        xs.astype(np.int32), np.zeros(N, np.int32), np.zeros(N, np.int32),
        mvps[:, 0].astype(np.int32), mvps[:, 1].astype(np.int32), lams,
        cy.astype(np.int32), cx.astype(np.int32),
        width=size, height=size, size=size, sign=sign, fwidth=W,
        fheight=H, bitdepth=8, bipred=bip, mvc_y=mvc[0], mvc_x=mvc[1]))

    for i in range(N):
        mvcand = [(int(cands[i, j, 0]), int(cands[i, j, 1]))
                  for j in range(6)]
        sad, mv = me.motion_estimate_sync(
            orgs[i], fr, int(ys[i]), int(xs[i]), size, size, size,
            mvc, (int(mvps[i, 0]), int(mvps[i, 1])), float(lams[i]), _P(),
            sign, W, H, mvcand, [4], bip, 8)
        assert int(gs[i]) == sad and (int(gy[i]), int(gx[i])) == mv, i


@pytest.mark.slow
@pytest.mark.parametrize("size,sign", [(16, 0), (8, 1), (32, 0)])
def test_motion_estimate_batch_speed0(size, sign):
    """HE path: telescope + hexagon (all sizes) + exact MC sub-pel."""

    class _P0:
        encoder_speed = 0

    rng = np.random.default_rng(23 + size + sign)
    W, H, pad = 128, 96, 160
    fr = YuvFrame(W, H, 420, pad, 8, 8)
    fr.y[:] = rng.integers(0, 256, (H, W))
    fr.pad_frame()

    N, maxc = 8, 3
    ys = rng.integers(0, (H - size) // 8, N) * 8
    xs = rng.integers(0, (W - size) // 8, N) * 8
    orgs = rng.integers(0, 256, (N, size, size)).astype(np.int32)
    mvps = rng.integers(-12, 13, (N, 2))
    lams = rng.uniform(1.0, 6.0, N)
    cn = rng.integers(0, maxc + 1, N)
    cy = rng.integers(-10, 11, (N, maxc))
    cx = rng.integers(-10, 11, (N, maxc))
    mvc = (3, -5)

    gs, gy, gx = (np.asarray(a) for a in motion_estimate_batch(
        orgs, fr.y_full.astype(np.int32), pad, ys.astype(np.int32),
        xs.astype(np.int32), mvps[:, 0].astype(np.int32),
        mvps[:, 1].astype(np.int32), lams, cy.astype(np.int32),
        cx.astype(np.int32), cn.astype(np.int32),
        width=size, height=size, size=size, sign=sign, fwidth=W,
        fheight=H, bitdepth=8, maxcand=maxc, telescope=True,
        widesad32=False, mvc_y=mvc[0], mvc_x=mvc[1], speed0=True,
        bipred=0))

    for i in range(N):
        mvcand = [(int(cy[i, j]), int(cx[i, j])) for j in range(maxc)]
        sad, mv = me.motion_estimate(
            orgs[i], fr, int(ys[i]), int(xs[i]), size, size, size,
            mvc, (int(mvps[i, 0]), int(mvps[i, 1])), float(lams[i]),
            _P0(), sign, W, H, mvcand, [int(cn[i])], 0, 8)
        assert int(gs[i]) == sad and (int(gy[i]), int(gx[i])) == mv, i
