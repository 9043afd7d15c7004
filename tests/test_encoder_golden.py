"""Encoder bitstream-exactness vs the reference Thorenc.

The golden .bit files were produced by the reference encoder; our encoder
must reproduce them byte-for-byte (and the recon files too).
"""
import os

import pytest

from thor_tpu.enc import parse_config_file, encode_sequence
from conftest import make_tiny64, make_noise_cif, make_smooth_cif

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
LDB_LC = "/root/reference/config_LDB_low_complexity.txt"
_LOCAL_CFG = os.path.join(GOLDEN, "config_LDB_low_complexity.txt")


def _cfg():
    return LDB_LC if os.path.exists(LDB_LC) else _LOCAL_CFG


def _check(name, yuv, w, h, n, cfg=None, **overrides):
    p = parse_config_file(cfg or _cfg(), width=w, height=h, num_frames=n,
                          qp=32, frame_rate=30.0, **overrides)
    bits, recon = encode_sequence(p, yuv)
    ref = open(os.path.join(GOLDEN, name + ".bit"), "rb").read()
    rr = open(os.path.join(GOLDEN, name + "_rec.yuv"), "rb").read()
    assert bits == ref, "bitstream mismatch"
    assert recon == rr, "recon mismatch"


def test_encode_tiny64_ldb_low_complexity():
    _check("tiny64_ldblc", make_tiny64(6), 64, 64, 6)


@pytest.mark.slow
def test_encode_smooth_cif_ldb_low_complexity():
    _check("smooth_cif_ldblc", make_smooth_cif(10), 352, 288, 10)


@pytest.mark.slow
def test_encode_noise_cif_ldb_low_complexity():
    _check("noise_cif_ldblc", make_noise_cif(4), 352, 288, 4)
