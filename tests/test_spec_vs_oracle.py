"""Property tests of spec kernels vs the C oracle (when liboracle.so exists).

The oracle shared library is built from the reference at dev time
(tools/build_oracle.sh); these tests are skipped when it is absent so CI
remains self-contained (golden-stream tests provide coverage there).
"""
import ctypes
import os

import numpy as np
import pytest

LIB = "/tmp/liboracle.so"

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="oracle lib not built")


class MV(ctypes.Structure):
    _fields_ = [("x", ctypes.c_int16), ("y", ctypes.c_int16)]


class BlockPos(ctypes.Structure):
    _fields_ = [("ypos", ctypes.c_uint16), ("xpos", ctypes.c_uint16),
                ("size", ctypes.c_uint8), ("bwidth", ctypes.c_uint8),
                ("bheight", ctypes.c_uint8), ("sb_size", ctypes.c_uint8)]


class Yuv(ctypes.Structure):
    _fields_ = ([("y", ctypes.c_void_p), ("u", ctypes.c_void_p),
                 ("v", ctypes.c_void_p)] +
                [(n, ctypes.c_int) for n in
                 ("width", "height", "stride_y", "stride_c", "offset_y",
                  "offset_c", "pad_hor_y", "pad_hor_c", "pad_ver_y",
                  "pad_ver_c", "area_y", "area_c", "sub", "subsample",
                  "frame_num", "bitdepth", "input_bitdepth")])


@pytest.fixture(scope="module")
def lib():
    lb = ctypes.CDLL(LIB)
    ctypes.c_int.in_dll(lb, "use_simd").value = 1
    return lb


def c_yuv(ref):
    c = Yuv()
    c.width, c.height = ref.width, ref.height
    c.stride_y = ref.y_full.shape[1]
    c.stride_c = ref.u_full.shape[1]
    c.pad_hor_y = c.pad_ver_y = ref.pad
    c.pad_hor_c = c.pad_ver_c = ref.pad_c
    c.sub = ref.sub
    c.subsample = ref.subsample
    c.frame_num = ref.frame_num
    c.bitdepth = ref.bitdepth
    c.input_bitdepth = ref.input_bitdepth
    bpp = ref.dtype().nbytes
    c.y = ref.y_full.ctypes.data + (ref.pad * c.stride_y + ref.pad) * bpp
    c.u = ref.u_full.ctypes.data + (ref.pad_c * c.stride_c + ref.pad_c) * bpp
    c.v = ref.v_full.ctypes.data + (ref.pad_c * c.stride_c + ref.pad_c) * bpp
    return c


@pytest.mark.parametrize("bitdepth", [8, 10])
def test_mc_yuv_dispatch(lib, bitdepth):
    from thor_tpu.spec.inter import get_inter_prediction_yuv
    from thor_tpu.frame import new_ref_frame
    rng = np.random.default_rng(11)
    W = H = 64
    ref = new_ref_frame(W, H, 420, bitdepth, 8)
    mx = (1 << bitdepth)
    ref.y[:] = rng.integers(0, mx, (H, W)).astype(ref.dtype)
    ref.u[:] = rng.integers(0, mx, (H // 2, W // 2)).astype(ref.dtype)
    ref.v[:] = rng.integers(0, mx, (H // 2, W // 2)).astype(ref.dtype)
    ref.pad_frame()
    c = c_yuv(ref)
    fn = (lib.get_inter_prediction_yuv_lbd if bitdepth == 8
          else lib.get_inter_prediction_yuv_hbd)
    for t in range(600):
        size = [8, 16, 32, 64][t % 4]
        ypos = int(rng.integers(0, (H - size) // 8 + 1)) * 8
        xpos = int(rng.integers(0, (W - size) // 8 + 1)) * 8
        split = (t // 4) % 2
        bipred = (t // 8) % 3
        sign = t % 2
        mvs = [(int(rng.integers(-300, 300)), int(rng.integers(-300, 300)))
               for _ in range(4)]
        bp = BlockPos(ypos, xpos, size, size, size, 128)
        mvarr = (MV * 4)(*[MV(x, y) for (y, x) in mvs])
        py = np.zeros((size, size), ref.dtype)
        pu = np.zeros((size // 2, size // 2), ref.dtype)
        pv = np.zeros((size // 2, size // 2), ref.dtype)
        fn(ctypes.byref(c), py.ctypes.data_as(ctypes.c_void_p),
           pu.ctypes.data_as(ctypes.c_void_p),
           pv.ctypes.data_as(ctypes.c_void_p),
           ctypes.byref(bp), mvarr, sign, W, H, bipred, split, bitdepth)
        mine = get_inter_prediction_yuv(ref, mvs, ypos, xpos, size, size,
                                        size, sign, W, H, bipred, split,
                                        bitdepth)
        for a, b in zip((py, pu, pv), mine):
            assert np.array_equal(a.astype(np.int32), b), \
                (t, size, split, bipred, sign, mvs)


@pytest.mark.parametrize("bitdepth", [8, 10])
def test_dequant_itransform(lib, bitdepth):
    from thor_tpu.spec.transform_quant import dequantize, transform_inv
    from thor_tpu.qmtx import get_iwmatrices
    from thor_tpu.tables import log2i
    rng = np.random.default_rng(5)
    iw = get_iwmatrices()
    deq = lib.dequantize_lbd if bitdepth == 8 else lib.dequantize_hbd
    for t in range(800):
        size = [4, 8, 16, 32, 64][t % 5]
        qsize = min(size, 16)
        qp = int(rng.integers(0, 52))
        mag = [64, 512, 4096, 32767][t % 4]
        coeff = rng.integers(-mag, mag, (qsize, qsize)).astype(np.int16)
        usemtx = t % 3 == 0
        wt = (iw[int(rng.integers(0, 12))][int(rng.integers(0, 3))]
              [int(rng.integers(0, 2))][log2i(size // 4)] if usemtx else None)
        cout = np.zeros((size, size), np.int16)
        wtp = wt.astype(np.uint16).copy() if usemtx else None
        deq(coeff.ctypes.data_as(ctypes.c_void_p),
            cout.ctypes.data_as(ctypes.c_void_p), qp, size,
            wtp.ctypes.data_as(ctypes.c_void_p) if usemtx else None)
        mine = dequantize(coeff, qp, size, wt)
        assert np.array_equal(cout, mine)
        b1 = np.zeros((size, size), np.int16)
        lib.inverse_transform(cout.ctypes.data_as(ctypes.c_void_p),
                              b1.ctypes.data_as(ctypes.c_void_p), size,
                              bitdepth)
        assert np.array_equal(b1, transform_inv(cout, size, bitdepth))
