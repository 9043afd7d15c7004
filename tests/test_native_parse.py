"""Native (C) block-layer parser vs the Python syntax walk.

The C walk (thor_tpu/_native/blockparse.c) must produce identical
decoded frames, deblock-data state, and bit accounting as the Python
walk it mirrors - across config families (tb_split, B-frames, bipred,
interp_ref, qmtx, HBD, delta-qp, 4:4:4).
"""
import os

import numpy as np
import pytest

from thor_tpu.dec import decoder as D
from thor_tpu.dec import native_parse as NP
from thor_tpu.dec import decode_stream

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

needs_native = pytest.mark.skipif(not NP.available(),
                                  reason="native lib unavailable")


def _decode(name, native: bool, monkeypatch):
    monkeypatch.setenv("THOR_DEVICE_PIXELS", "0")
    monkeypatch.setenv("THOR_DEVICE_FILTERS", "0")
    monkeypatch.setattr(NP, "_DISABLED", not native)
    bit = os.path.join(GOLDEN, name + ".bit")
    if not os.path.exists(bit):
        pytest.skip(f"golden {name} not present")
    data = open(bit, "rb").read()
    decs = []
    h, frames = decode_stream(data, decoder_hook=decs.append)
    return h, frames, decs[0]


def _bc_state(bc):
    return {k: getattr(bc, k) for k in
            ("sequence_header", "frame_header", "frame_type", "super_mode",
             "intra_mode", "mv", "skip_idx", "coeff_y", "coeff_u",
             "coeff_v", "cbp", "mode", "size", "size_and_mode",
             "super_mode_stat", "size_and_ref_idx", "bi_ref")}


@needs_native
@pytest.mark.parametrize("name", [
    "tiny64_ldblc",       # LDB-LC P frames
    "tiny64_dqp",         # delta-qp threading
    "ir2_128",            # interp_ref=2 temporal skip + temp MC
    "hdb9_128",           # B-frames, bipred, tb_split
    "hbd6_128",           # 10-bit
    "c444_128",           # 4:4:4
])
def test_native_parse_matches_python(name, monkeypatch):
    hn, fn, dn = _decode(name, True, monkeypatch)
    hp, fp, dp = _decode(name, False, monkeypatch)
    assert len(fn) == len(fp)
    for i, (a, b) in enumerate(zip(fn, fp)):
        assert a == b, f"frame {i} differs"
    # deblock-data end state
    for fld in ("mode", "size", "tb_split", "pb_part", "cbp_y", "cbp_u",
                "cbp_v", "mv0", "mv1", "ref_idx0", "ref_idx1",
                "bipred_flag"):
        np.testing.assert_array_equal(getattr(dn.dd, fld),
                                      getattr(dp.dd, fld), err_msg=fld)
    # bit accounting (drives the Thordec statistics report)
    assert _bc_state(dn.bc) == _bc_state(dp.bc)


@needs_native
def test_native_parse_golden_recon(monkeypatch):
    """Native walk + host pixels reproduces the reference recon."""
    h, frames, _ = _decode("hdb9_128", True, monkeypatch)
    golden = open(os.path.join(GOLDEN, "hdb9_128_rec.yuv"), "rb").read()
    assert b"".join(frames) == golden


@needs_native
@pytest.mark.parametrize("name", ["tiny64_ldblc", "ir2_128"])
def test_native_parse_device_plan(name, monkeypatch):
    """C-filled dense MC-plan grids drive the device executor to the
    same reconstruction as the reference recon."""
    monkeypatch.setattr(NP, "_DISABLED", False)
    monkeypatch.setenv("THOR_DEVICE_PIXELS", "1")
    monkeypatch.setenv("THOR_DEVICE_FILTERS", "1")
    # the Python walk must not run at all
    monkeypatch.setattr(
        D.Decoder, "process_block",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("py walk")))
    bit = os.path.join(GOLDEN, name + ".bit")
    data = open(bit, "rb").read()
    h, frames = decode_stream(data)
    golden = open(os.path.join(GOLDEN, name + "_rec.yuv"), "rb").read()
    assert b"".join(frames) == golden
