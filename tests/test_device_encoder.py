"""Device (TPU) LC encoder decision pass vs the host encoder.

The device path must produce byte-identical bitstreams and recon
(enc/device_lc.py replicates enc/encode_block.c:2401's quadtree RDO on
device; the host replays only the syntax).
"""
import numpy as np
import pytest

from thor_tpu.enc.params import EncParams
from thor_tpu.enc import encoder as E

LC_KW = dict(qp=32, lambda_coeffI=0.8, lambda_coeffP=1.2,
             early_skip_thr=1.0, max_num_ref=2, HQperiod=12, mqpP=1.2,
             dqpI=-2, encoder_speed=2, cdef=0, clpf=1,
             use_block_contexts=1)


def _clip(W, H, N, seed):
    rng = np.random.default_rng(seed)
    base = np.clip(np.linspace(30, 200, W)[None, :] +
                   np.linspace(0, 50, H)[:, None] +
                   rng.integers(-10, 10, (H, W)), 0, 255).astype(np.uint8)
    out = []
    for i in range(N):
        f = np.roll(base, i * 2, axis=1)
        if i:
            f = np.clip(f.astype(np.int16) + rng.integers(-2, 3, (H, W)),
                        0, 255).astype(np.uint8)
        u = np.clip(128 + rng.integers(-8, 8, (H // 2, W // 2)), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + rng.integers(-8, 8, (H // 2, W // 2)), 0,
                    255).astype(np.uint8)
        out.append(f.tobytes() + u.tobytes() + v.tobytes())
    return b"".join(out)


def _run_both(W, H, N, seed):
    yuv = _clip(W, H, N, seed)
    bs_h, rec_h = E.encode_sequence(
        EncParams(width=W, height=H, num_frames=N, **LC_KW), yuv)
    orig_init = E.Encoder.__init__

    def patched(self, params):
        orig_init(self, params)
        self.device_sb_loop = True
    E.Encoder.__init__ = patched
    try:
        bs_d, rec_d = E.encode_sequence(
            EncParams(width=W, height=H, num_frames=N, **LC_KW), yuv)
    finally:
        E.Encoder.__init__ = orig_init
    assert bs_d == bs_h
    assert rec_d == rec_h


@pytest.mark.slow
def test_device_lc_single_sb():
    _run_both(128, 128, 3, 3)


@pytest.mark.veryslow
def test_device_lc_wavefront_edges():
    # multi-SB diagonals plus rectangular edge blocks (352x288)
    _run_both(352, 288, 3, 9)


def test_device_lc_default():
    """Default-suite exactness gate for the wavefront device encoder
    (same geometry as the slow single-SB test so the persistent compile
    cache is shared; 2 frames keeps it in the default budget)."""
    _run_both(128, 128, 2, 5)
