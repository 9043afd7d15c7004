"""Device temporal interpolation vs the spec (numpy) ground truth.

The interp frame feeds prediction on both encode and decode, so it must
be bit-identical (common/temporal_interp.c:909 interpolate_frames).
"""
import numpy as np
import pytest

from thor_tpu.frame import YuvFrame
from thor_tpu.tables import PADDING_Y
from thor_tpu.spec.tempinterp import interpolate_frames as spec_if
from thor_tpu.ops.tempinterp import interpolate_frames as dev_if


def _mk(w, h, seed, bitdepth=8, moving=True):
    rng = np.random.default_rng(seed)
    f0 = YuvFrame(w, h, 420, PADDING_Y, bitdepth, bitdepth)
    f1 = YuvFrame(w, h, 420, PADDING_Y, bitdepth, bitdepth)
    maxv = (1 << bitdepth) - 1
    base = np.clip(np.linspace(20, maxv - 20, w)[None, :] +
                   np.linspace(0, 40, h)[:, None] +
                   rng.integers(-12, 12, (h, w)), 0, maxv)
    f0.y[:, :] = base.astype(f0.dtype)
    f1.y[:, :] = (np.roll(base, 5, axis=1) if moving
                  else base).astype(f1.dtype)
    for f in (f0, f1):
        f.u[:, :] = rng.integers(0, maxv + 1, (h // 2, w // 2)
                                 ).astype(f.dtype)
        f.v[:, :] = rng.integers(0, maxv + 1, (h // 2, w // 2)
                                 ).astype(f.dtype)
        f.pad_frame()
    return f0, f1


@pytest.mark.parametrize("ratio,pos", [(2, 1), (4, 1), (4, 3), (8, 5),
                                       (3, 1), (3, 2)])
def test_tempinterp_small(ratio, pos):
    f0, f1 = _mk(64, 64, seed=ratio * 10 + pos)
    outs = YuvFrame(64, 64, 420, PADDING_Y, 8, 8)
    outd = YuvFrame(64, 64, 420, PADDING_Y, 8, 8)
    spec_if(outs, f0, f1, ratio, pos)
    dev_if(outd, f0, f1, ratio, pos)
    np.testing.assert_array_equal(outd.y_full, outs.y_full)
    np.testing.assert_array_equal(outd.u_full, outs.u_full)
    np.testing.assert_array_equal(outd.v_full, outs.v_full)


@pytest.mark.slow
@pytest.mark.parametrize("w,h,bd,seed", [(160, 128, 8, 1), (128, 96, 10, 2)])
def test_tempinterp_multilevel(w, h, bd, seed):
    f0, f1 = _mk(w, h, seed=seed, bitdepth=bd)
    outs = YuvFrame(w, h, 420, PADDING_Y, bd, bd)
    outd = YuvFrame(w, h, 420, PADDING_Y, bd, bd)
    spec_if(outs, f0, f1, 4, 1)
    dev_if(outd, f0, f1, 4, 1)
    np.testing.assert_array_equal(outd.y_full, outs.y_full)
    np.testing.assert_array_equal(outd.u_full, outs.u_full)
    np.testing.assert_array_equal(outd.v_full, outs.v_full)
