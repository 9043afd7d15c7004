"""Frame-parallel GOP lanes (enc/gop_lanes.py) vs the sequential turbo
encoder: the prefetched decision passes must leave the bitstream and
recon byte-identical, with >=2 decisions genuinely in flight."""
import numpy as np
import pytest

from thor_tpu.enc.params import EncParams
from thor_tpu.enc import encoder as E
from thor_tpu.enc.gop_lanes import encode_sequence_lanes

RA_KW = dict(qp=32, lambda_coeffI=0.8, lambda_coeffP=1.2,
             early_skip_thr=1.0, max_num_ref=2, mqpP=1.2, dqpI=-2,
             encoder_speed=2, cdef=0, clpf=1, use_block_contexts=1,
             num_reorder_pics=7, interp_ref=1, enable_bipred=1,
             dqpB0=3, dqpB1=1, mqpB=1.2, mqpB0=1.1, mqpB1=1.2,
             mqpB2=1.3, intra_period=64, HQperiod=8)


def _clip(W, H, N, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(60, 200, (H, W)).astype(np.int16)
    out = []
    for i in range(N):
        y = np.clip(np.roll(base, i * 2, axis=1) +
                    rng.integers(-3, 4, (H, W)), 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 130, np.uint8)
        out += [y.tobytes(), u.tobytes(), v.tobytes()]
    return b"".join(out)


@pytest.mark.slow
def test_gop_lanes_bit_exact(monkeypatch):
    import jax
    monkeypatch.setenv("THOR_TURBO", "1")
    clip = _clip(64, 64, 10, 9)
    bs_seq, rec_seq = E.encode_sequence(
        EncParams(width=64, height=64, num_frames=10, **RA_KW), clip)
    bs_l, rec_l, stats = encode_sequence_lanes(
        EncParams(width=64, height=64, num_frames=10, **RA_KW), clip,
        devices=jax.devices()[:2])
    assert stats["max_in_flight"] >= 2, stats
    assert bs_l == bs_seq
    assert rec_l == rec_seq


@pytest.mark.slow
def test_multistream_encode_sharded(monkeypatch):
    """Two concurrent turbo encodes pinned to separate mesh devices
    (enc/multistream.py) must equal the solo encodes byte-for-byte."""
    import jax
    from thor_tpu.enc.multistream import encode_streams_sharded
    monkeypatch.setenv("THOR_TURBO", "1")
    clip_a = _clip(64, 64, 5, 9)
    clip_b = _clip(64, 64, 5, 23)
    kw = dict(RA_KW, num_reorder_pics=3, HQperiod=4)

    def params():
        return EncParams(width=64, height=64, num_frames=5, **kw)

    solo = [E.encode_sequence(params(), clip_a),
            E.encode_sequence(params(), clip_b)]
    devs = jax.devices()[:2]
    out = encode_streams_sharded(
        [(params(), clip_a), (params(), clip_b)], devs)
    assert out[0] == solo[0]
    assert out[1] == solo[1]
