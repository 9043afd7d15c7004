"""Device encoder kernels vs the host spec (bit-exactness).

Covers the two sequential-scan kernels that the device decision pass
re-expresses as log-depth associative scans:
 - ops.quant.quantize_batch vs spec.transform_quant.quantize
   (reference enc/encode_block.c:84-160)
 - ops.coeff_cost.coeff_bits_batch vs enc.writer.write_coeff bit counts
   (reference enc/write_bits.c:145-242)
"""
import numpy as np
import pytest

import jax.numpy as jnp

from thor_tpu.bitstream import BitWriter
from thor_tpu.enc.writer import write_coeff
from thor_tpu.spec.transform_quant import quantize
from thor_tpu.ops.quant import quantize_batch
from thor_tpu.ops.coeff_cost import coeff_bits_batch
from thor_tpu.tables import ZIGZAG


@pytest.mark.parametrize("size,qp,intra", [
    (4, 32, 0), (8, 17, 2), (16, 32, 0), (16, 51, 2), (32, 7, 0),
    (64, 43, 2), (16, 0, 0)])
def test_quantize_batch_vs_spec(size, qp, intra):
    qs = min(16, size)
    rng = np.random.default_rng(size * 100 + qp)
    N = 48
    c = rng.integers(-60, 60, (N, qs, qs)).astype(np.int16)
    c[:N // 3] = (c[:N // 3] *
                  rng.integers(0, 2, (N // 3, qs, qs))).astype(np.int16)
    c[-1] = np.int16(-32768)
    c[-2] = 0
    cq, cbp = quantize_batch(jnp.asarray(c), qp, size, intra)
    cq, cbp = np.asarray(cq), np.asarray(cbp)
    for i in range(N):
        rq, rbp = quantize(c[i], qp, size, intra)
        assert np.array_equal(rq, cq[i]), i
        assert rbp == int(cbp[i]), i


@pytest.mark.parametrize("size,ctype", [
    (4, 0), (4, 1), (8, 1), (8, 3), (16, 0), (16, 2), (32, 0), (64, 1)])
def test_coeff_bits_batch_vs_writer(size, ctype):
    qs = min(16, size)
    zz = ZIGZAG[qs]
    chroma, intra = ctype & 1, (ctype >> 1) & 1
    rng = np.random.default_rng(size * 10 + ctype)
    N = 64
    c = rng.integers(-12, 12, (N, qs, qs)).astype(np.int16)
    mask = rng.random((N, qs, qs)) < rng.random((N, 1, 1)) * 0.8
    c = (c * mask).astype(np.int16)
    c[0] = 0
    c[0, 0, 0] = 1
    c[1] = 0
    c[1, -1, -1] = 7
    c[2] = rng.integers(-3000, 3000, (qs, qs)).astype(np.int16)
    sc = np.zeros((N, qs * qs), np.int32)
    sc[:, zz] = c.reshape(N, -1)
    bits = np.asarray(coeff_bits_batch(jnp.asarray(sc), size, chroma, intra))
    for i in range(N):
        if not c[i].any():
            continue
        w = BitWriter()
        write_coeff(w, c[i], size, ctype)
        assert w.get_bit_pos() == int(bits[i]), i
