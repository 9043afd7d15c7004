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
