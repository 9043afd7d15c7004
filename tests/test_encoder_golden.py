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


from conftest import make_hdb9, make_small256


def _cfgname(name):
    p = f"/root/reference/config_{name}.txt"
    return p if os.path.exists(p) else os.path.join(GOLDEN,
                                                    f"config_{name}.txt")


def test_encode_hdb_bframes():
    _check("hdb9_128", make_hdb9(9), 128, 96, 9,
           cfg=_cfgname("HDB_low_complexity"))


def test_encode_hbd_10bit():
    _check("hbd6_128", make_hdb9(9), 128, 96, 6, bitdepth=10)


def test_encode_max_delta_qp():
    _check("tiny64_dqp", make_tiny64(6), 64, 64, 4, max_delta_qp=1)


def test_encode_rate_control():
    _check("tiny64_rc", make_tiny64(6), 64, 64, 6, bitrate=200000)


@pytest.mark.veryslow
def test_encode_ldb_high_efficiency():
    _check("he2_256", make_small256(2), 256, 192, 2,
           cfg=_cfgname("LDB_high_efficiency"))


@pytest.mark.veryslow
def test_encode_ra_medium():
    _check("ra9_256", make_small256(9), 256, 192, 9,
           cfg=_cfgname("RA_medium_complexity"))


def test_encode_444():
    from conftest import make_c444
    _check("c444_128", make_c444(4), 128, 96, 4, subsample=444)


def test_encode_interp_ref2():
    _check("ir2_128", make_hdb9(9), 128, 96, 9,
           cfg=_cfgname("HDB_low_complexity"), interp_ref=2)


def test_encode_sync():
    _check("sync4_128", make_hdb9(9), 128, 96, 4, sync=1, encoder_speed=2)


@pytest.mark.slow
def test_encode_hbd_12bit():
    """12-bit HBD end to end (defaults + -cdef 0; the reference's own
    round-trip fails at this size with CDEF on)."""
    from thor_tpu.enc.params import EncParams, apply_args
    from conftest import make_hbd12
    p = EncParams()
    apply_args(p, ["-width", "128", "-height", "96", "-n", "6", "-qp", "32",
                   "-f", "30", "-input_bitdepth", "12", "-bitdepth", "12",
                   "-cdef", "0"])
    p.validate()
    bits, recon = encode_sequence(p, make_hbd12(6))
    ref = open(os.path.join(GOLDEN, "hbd12_128.bit"), "rb").read()
    rr = open(os.path.join(GOLDEN, "hbd12_128_rec.yuv"), "rb").read()
    assert bits == ref
    assert recon == rr
