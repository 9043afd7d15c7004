"""Decoder bit-exactness vs C-oracle golden streams.

Golden data was produced by the reference Thorenc (cisco/thor built from
/root/reference) and validated by the reference's own round-trip oracle
(check.sh semantics: Thordec output == Thorenc recon).
"""
import os

import pytest

from thor_tpu.dec import decode_stream

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _check(name):
    bit = os.path.join(GOLDEN, name + ".bit")
    rec = os.path.join(GOLDEN, name + "_rec.yuv")
    if not (os.path.exists(bit) and os.path.exists(rec)):
        pytest.skip(f"golden {name} not present")
    data = open(bit, "rb").read()
    _, frames = decode_stream(data)
    golden = open(rec, "rb").read()
    out = b"".join(frames)
    assert len(out) == len(golden)
    fs = len(golden) // len(frames)
    for i, f in enumerate(frames):
        assert f == golden[i * fs:(i + 1) * fs], f"frame {i} mismatch"


def test_tiny64_ldb_low_complexity():
    _check("tiny64_ldblc")


def test_tiny64_host_pixel_path(monkeypatch):
    """The numpy (spec) pixel path stays covered now that the device
    pixel pipeline (dec/device_pixels.py) is the default."""
    monkeypatch.setenv("THOR_DEVICE_PIXELS", "0")
    _check("tiny64_ldblc")


@pytest.mark.slow
def test_interp_ref2_host_pixel_path(monkeypatch):
    monkeypatch.setenv("THOR_DEVICE_PIXELS", "0")
    _check("ir2_128")


@pytest.mark.slow
def test_smooth_cif_ldb_low_complexity():
    _check("smooth_cif_ldblc")


@pytest.mark.slow
def test_noise_cif_ldb_low_complexity():
    _check("noise_cif_ldblc")


@pytest.mark.slow
def test_small256_ldb_medium_complexity():
    _check("small256_LDB_medium_complexity")


@pytest.mark.slow
def test_small256_ldb_high_efficiency():
    _check("small256_LDB_high_efficiency")


@pytest.mark.slow
def test_s17_hdb16_low_complexity():
    _check("s17_HDB16_low_complexity")


@pytest.mark.slow
def test_s17_ra_medium_complexity():
    _check("s17_RA_medium_complexity")


@pytest.mark.slow
def test_s17_hdb16_qm_he_10bit():
    _check("s17_hbd10")


@pytest.mark.slow
def test_small256_ldb_qm_medium():
    _check("small256_LDB_qm_medium_complexity")


def test_c444():
    _check("c444_128")


def test_ring_eviction_stress():
    """Fused-decoder pipelining under reference-ring pressure: with a
    2-entry resident ring, a 9-frame HDB stream (ref window wider than
    the ring) constantly evicts still-referenced frames, forcing the
    ring-miss -> flush() -> host re-upload path (the regression shape of
    the round-4 stale-frame_num bug, commit 6b001d4) on nearly every
    frame.  Output must stay bit-exact."""
    from thor_tpu.dec import device_frame as DF
    old = DF.DeviceFrameDecoder.RING_CAP
    DF.DeviceFrameDecoder.RING_CAP = 2
    try:
        _check("hdb9_128")
    finally:
        DF.DeviceFrameDecoder.RING_CAP = old


def test_interp_ref2():
    _check("ir2_128")


def test_hbd12():
    _check("hbd12_128")
