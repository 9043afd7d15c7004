"""JAX ops must be bit-exact with the spec layer."""
import numpy as np
import pytest

from thor_tpu.spec.transform_quant import (transform_fwd, transform_inv,
                                           dequantize)
from thor_tpu.ops.transform import (inv_transform_batch, fwd_transform_batch,
                                    dequantize_batch, reconstruct_batch)


@pytest.mark.parametrize("size", [4, 8, 16, 32, 64, 128])
@pytest.mark.parametrize("bitdepth", [8, 10])
def test_inv_transform(size, bitdepth):
    rng = np.random.default_rng(size)
    qsize = min(size, 16)
    B = 17
    coeff = np.zeros((B, size, size), np.int16)
    for b in range(B):
        mag = [64, 512, 4096, 32767][b % 4]
        coeff[b, :qsize, :qsize] = rng.integers(-mag, mag, (qsize, qsize))
    out = np.asarray(inv_transform_batch(coeff.astype(np.int32), size,
                                         bitdepth))
    for b in range(B):
        ref = transform_inv(coeff[b], size, bitdepth)
        assert np.array_equal(out[b], ref), (size, b)


@pytest.mark.parametrize("size", [4, 8, 16, 32, 64, 128])
@pytest.mark.parametrize("fast", [False, True])
def test_fwd_transform(size, fast):
    rng = np.random.default_rng(size + fast)
    B = 9
    block = rng.integers(-1023, 1024, (B, size, size)).astype(np.int32)
    out = np.asarray(fwd_transform_batch(block, size, fast, 8))
    for b in range(B):
        ref = transform_fwd(block[b], size, fast, 8)
        assert np.array_equal(out[b], ref.astype(np.int32)), (size, fast, b)


@pytest.mark.parametrize("size", [4, 8, 16, 32, 64])
@pytest.mark.parametrize("qp", [3, 17, 32, 51])
def test_dequantize(size, qp):
    rng = np.random.default_rng(qp)
    qsize = min(size, 16)
    B = 8
    coeff = rng.integers(-32767, 32767, (B, qsize, qsize)).astype(np.int16)
    out = np.asarray(dequantize_batch(coeff.astype(np.int32), qp, size))
    for b in range(B):
        ref = dequantize(coeff[b], qp, size, None)
        assert np.array_equal(out[b], ref.astype(np.int32))


def test_dequantize_weighted():
    from thor_tpu.qmtx import get_iwmatrices
    from thor_tpu.tables import log2i
    import jax.numpy as jnp
    iw = get_iwmatrices()
    rng = np.random.default_rng(0)
    for size in (4, 8, 16, 32):
        qsize = min(size, 16)
        wt = iw[5][0][1][log2i(size // 4)]
        coeff = rng.integers(-2048, 2048, (4, qsize, qsize)).astype(np.int16)
        out = np.asarray(dequantize_batch(coeff.astype(np.int32), 30, size,
                                          jnp.asarray(np.array(wt, np.int32)),
                                          weighted=True))
        for b in range(4):
            ref = dequantize(coeff[b], 30, size, wt)
            assert np.array_equal(out[b], ref.astype(np.int32))


def test_reconstruct():
    rng = np.random.default_rng(1)
    res = rng.integers(-2000, 2000, (5, 16, 16)).astype(np.int32)
    pred = rng.integers(0, 256, (5, 16, 16)).astype(np.int32)
    out = np.asarray(reconstruct_batch(res, pred, 8))
    from thor_tpu.spec.transform_quant import reconstruct_block
    for b in range(5):
        ref = reconstruct_block(res[b].astype(np.int16), pred[b], 8)
        assert np.array_equal(out[b], ref)


@pytest.mark.parametrize("bipred", [0, 1, 2])
def test_mc_luma_tiles(bipred):
    import jax.numpy as jnp
    from thor_tpu.ops.mc import mc_luma_tiles
    from thor_tpu.spec.inter import mc_luma
    rng = np.random.default_rng(bipred)
    pad, W, H = 32, 64, 64
    ref = rng.integers(0, 256, (H + 2 * pad, W + 2 * pad)).astype(np.int32)
    N, tile = 64, 4
    ys = rng.integers(0, H - tile + 1, N)
    xs = rng.integers(0, W - tile + 1, N)
    mvy = rng.integers(-40, 41, N)
    mvx = rng.integers(-40, 41, N)
    # emulate metadata prep: ints+fracs with the C int-offset clamps
    vi, hi = mvy >> 2, mvx >> 2
    fv, fh = mvy & 3, mvx & 3
    vi = np.maximum(np.minimum(vi, H - ys), -xs - tile)
    hi = np.maximum(np.minimum(hi, W - xs), -xs - tile)
    oy = pad + ys + vi - 2
    ox = pad + xs + hi - 2
    out = np.asarray(mc_luma_tiles(jnp.asarray(ref), jnp.asarray(oy),
                                   jnp.asarray(ox), jnp.asarray(fv),
                                   jnp.asarray(fh), tile=tile,
                                   bipred=bipred))
    for n in range(N):
        ref_blk = mc_luma(ref, pad, int(ys[n]), int(xs[n]), tile, tile,
                          int(mvy[n]), int(mvx[n]), 0, bipred, W, H, 8)
        assert np.array_equal(out[n], ref_blk), n


def test_mc_chroma_tiles():
    import jax.numpy as jnp
    from thor_tpu.ops.mc import mc_chroma_tiles
    from thor_tpu.spec.inter import mc_chroma
    rng = np.random.default_rng(9)
    pad, W, H = 16, 32, 32
    ref = rng.integers(0, 256, (H + 2 * pad, W + 2 * pad)).astype(np.int32)
    N, tile = 64, 2
    ys = rng.integers(0, H - tile + 1, N)
    xs = rng.integers(0, W - tile + 1, N)
    mvy = rng.integers(-40, 41, N)
    mvx = rng.integers(-40, 41, N)
    vi, hi = mvy >> 3, mvx >> 3
    fv, fh = mvy & 7, mvx & 7
    vi = np.maximum(np.minimum(vi, H - ys), -xs - tile)
    hi = np.maximum(np.minimum(hi, W - xs), -xs - tile)
    oy = pad + ys + vi - 1
    ox = pad + xs + hi - 1
    out = np.asarray(mc_chroma_tiles(jnp.asarray(ref), jnp.asarray(oy),
                                     jnp.asarray(ox), jnp.asarray(fv),
                                     jnp.asarray(fh), tile=tile))
    for n in range(N):
        ref_blk = mc_chroma(ref, pad, int(ys[n]), int(xs[n]), tile, tile,
                            int(mvy[n]), int(mvx[n]), 0, W, H, 8)
        assert np.array_equal(out[n], ref_blk), n


# ---------------------------------------------------------------- filters

def _random_dd(rng, W, H, modes=(0, 0, 1, 2, 4)):
    from thor_tpu.spec import inter
    dd = inter.DeblockData(W, H)
    n = dd.size.shape[0]
    dd.size[:] = rng.choice([8, 16, 32, 64], n)
    dd.tb_split[:] = rng.integers(0, 2, n)
    dd.pb_part[:] = rng.integers(0, 4, n)
    dd.cbp_y[:] = rng.integers(0, 2, n)
    dd.mode[:] = rng.choice(list(modes), n)
    dd.mv0[:] = rng.integers(-8, 9, (n, 2))
    dd.mv1[:] = rng.integers(-8, 9, (n, 2))
    return dd


@pytest.mark.parametrize("bd", [8, 10])
def test_deblock_device(bd):
    from thor_tpu.spec import filters as SF
    from thor_tpu.ops import filters as OF
    from thor_tpu.tables import CHROMA_QP
    rng = np.random.default_rng(3 + bd)
    W, H = 128, 96
    dd = _random_dd(rng, W, H)
    qp = int(rng.integers(8, 50))
    y = rng.integers(0, 1 << bd, (H, W)).astype(np.int32)
    ref = y.copy()
    SF.deblock_frame_y(ref, dd, W, H, qp, bd)
    mv, mh = OF.deblock_masks_y(dd, W, H)
    assert (np.asarray(OF.deblock_plane_y(y, mv, mh, qp, bd)) == ref).all()

    u = rng.integers(0, 1 << bd, (H // 2, W // 2)).astype(np.int32)
    v = rng.integers(0, 1 << bd, (H // 2, W // 2)).astype(np.int32)
    ru, rv = u.copy(), v.copy()
    qpc = int(CHROMA_QP[qp])
    SF.deblock_frame_uv(ru, rv, dd, W, H, qpc, 1, bd)
    mvc, mhc = OF.deblock_masks_uv(dd, W, H)
    assert (np.asarray(OF.deblock_plane_uv(u, mvc, mhc, qpc, 1, bd)) == ru).all()
    assert (np.asarray(OF.deblock_plane_uv(v, mvc, mhc, qpc, 1, bd)) == rv).all()


@pytest.mark.parametrize("plane,fbl", [(0, 4), (0, 5), (0, 7), (1, 4),
                                       (2, 4)])
def test_clpf_device(plane, fbl):
    from thor_tpu.spec import filters as SF
    from thor_tpu.ops import filters as OF
    rng = np.random.default_rng(5 + plane + fbl)
    W, H, bd, sub = 128, 96, 8, 1
    dd = _random_dd(rng, W, H)
    qp = int(rng.integers(8, 50))
    strength = int(rng.choice([1, 2, 4]))
    psub = sub if plane else 0
    x = rng.integers(0, 256, (H >> psub, W >> psub)).astype(np.int32)
    nbits = SF.count_clpf_decisions(dd, W, H, plane, fbl, sub)
    bits = ([int(b) for b in rng.integers(0, 2, nbits)]
            if (plane == 0 and fbl == 5) else None)
    ref = x.copy()
    SF.clpf_frame(ref, dd, W, plane, strength, fbl, bd, qp, sub,
                  decision_bits=bits)
    mask, _ = OF.clpf_pixel_mask(dd, W, H, plane, fbl, sub,
                                 decision_bits=bits)
    damping = bd - 4 - (plane != 0) + (qp >> 4)
    out = np.asarray(OF.clpf_plane(x, mask, strength << (bd - 8), damping))
    assert (out == ref).all()


@pytest.mark.parametrize("bd", [8, 10])
def test_cdef_device(bd):
    from thor_tpu.spec import filters as SF
    from thor_tpu.ops import filters as OF
    rng = np.random.default_rng(11 + bd)
    W, H, cs = 128, 96, bd - 8
    dd = _random_dd(rng, W, H)
    nfb = ((H + 63) // 64) * ((W + 63) // 64)
    presets = [{"level": int(rng.integers(0, 16)),
                "sec_strength": int(rng.integers(0, 4)),
                "skip_condition": 0} for _ in range(nfb)]
    damping = [int(rng.integers(4, 7)), int(rng.integers(3, 6))]
    y = rng.integers(0, 1 << bd, (H, W)).astype(np.int32)
    u = rng.integers(0, 1 << bd, (H // 2, W // 2)).astype(np.int32)
    ry, ru = y.copy(), u.copy()
    dirs_out = {}
    SF.cdef_frame(ry, dd, W, H, 0, 1, bd, presets, damping, dirs_out)
    SF.cdef_frame(ru, dd, W, H, 1, 1, bd, presets, damping, dirs_out)
    dirs, var = OF.cdef_dirs(y, cs)
    lv0, sec0, m0 = OF.cdef_block_maps(dd, presets, W, H, 0, 1)
    assert (np.asarray(OF.cdef_plane(y, dirs, var, lv0, sec0, m0, 8, 0,
                                     damping[0], damping[1], cs)) == ry).all()
    lv1, sec1, m1 = OF.cdef_block_maps(dd, presets, W, H, 1, 1)
    assert (np.asarray(OF.cdef_plane(u, dirs, var, lv1, sec1, m1, 4, 1,
                                     damping[0] - 1, damping[1] - 1,
                                     cs)) == ru).all()


# --------------------------------------------------------- encoder kernels

def test_enc_kernels_batched():
    from thor_tpu.enc import me
    from thor_tpu.ops import enc_kernels as EK
    rng = np.random.default_rng(21)
    N, h, w = 40, 16, 16
    org = rng.integers(0, 256, (N, h, w)).astype(np.int32)
    cand = rng.integers(0, 256, (N, h, w)).astype(np.int32)
    assert (np.asarray(EK.sad_batch(org, cand)) ==
            [me.sad_calc(org[i], cand[i]) for i in range(N)]).all()
    assert (np.asarray(EK.ssd_batch(org, cand)) ==
            [me.ssd_calc(org[i], cand[i]) for i in range(N)]).all()
    from thor_tpu.spec.inter import average_blocks
    p0 = rng.integers(0, 256, (N, h, w)).astype(np.int32)
    p1 = rng.integers(0, 256, (N, h, w)).astype(np.int32)
    av = np.asarray(EK.avg_batch(p0, p1))
    for i in range(4):
        assert (av[i] == average_blocks(p0[i], p1[i])).all()

    # widesad: centre at column 3 of a w+6 window
    win = rng.integers(0, 256, (N, h, w + 6)).astype(np.int32)
    bs, bx = EK.widesad_batch(org, win)
    for i in range(N):
        es, ex = me.widesad_calc(org[i], win[i], 0, 3, w, h)
        assert int(bs[i]) == es and int(bx[i]) == ex

    # fast half-pel: centre at (2,2) of an (h+5, w+5) window (the trees
    # read rows -2..+2 and cols -2..+2 around the candidate block)
    win2 = rng.integers(0, 256, (N, h + 5, w + 5)).astype(np.int32)
    bs, bxx, byy = EK.fasthalf_batch(org, win2)
    for i in range(N):
        es, ex, ey = me.sad_calc_fasthalf(org[i], win2[i], 2, 2, w, h)
        assert (int(bs[i]), int(bxx[i]), int(byy[i])) == (es, ex, ey)

    # fast quarter-pel around each half-pel phase
    win3 = rng.integers(0, 256, (N, h + 3, w + 3)).astype(np.int32)
    for inx in (0, 1):
        for iny in (0, 1):
            bs, bxx, byy = EK.fastquarter_batch(org, win3, inx, iny)
            for i in range(N):
                es, ex, ey = me.sad_calc_fastquarter(
                    org[i], win3[i], 1, 1, w, h, inx, iny)
                assert (int(bs[i]), int(bxx[i]), int(byy[i])) == \
                    (es, ex, ey), (i, inx, iny)


def test_scale_down2x2_device():
    from thor_tpu.ops.enc_kernels import scale_down2x2
    rng = np.random.default_rng(23)
    src = rng.integers(0, 256, (96, 128)).astype(np.int32)
    a = src[0::2, 0::2]; b = src[1::2, 0::2]
    c = src[0::2, 1::2]; d = src[1::2, 1::2]
    want = (((a + b + 1) >> 1) + ((c + d + 1) >> 1)) >> 1
    assert (np.asarray(scale_down2x2(src)) == want).all()
