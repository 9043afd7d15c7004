#!/usr/bin/env python3
"""GOP-lane scaling measurement (enc/gop_lanes.py).

Encodes the same RA-style GOP8 clip twice in turbo mode - sequentially
and with frame-parallel GOP-lane decision prefetch - and reports wall
time for each, the speedup, and the prefetcher stats.  Byte-identity
between the two encodes is asserted (the lanes contract).

Run on the real chip (default env) for the production number; on CPU
the 'device' work shares the host core, so the overlap shows little.

Prints one JSON line: {"seq_s":..,"lanes_s":..,"speedup":..,
"prefetched":..,"max_in_flight":..,"identical":bool}
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from thor_tpu._cache import setup_env as _cache_setup  # noqa: E402

_cache_setup()


def main():
    import numpy as np
    os.environ["THOR_TURBO"] = "1"
    from thor_tpu.enc.params import EncParams
    from thor_tpu.enc import encoder as E
    from thor_tpu.enc.gop_lanes import encode_sequence_lanes

    W, H, N = 256, 192, 17
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:H, 0:W]
    tex = ((xx * 7 + yy * 13) % 61 * 4 + 16).astype(np.uint8)
    fr = []
    for t in range(N):
        y = np.roll(tex, (2 * t, 3 * t), (0, 1))
        u = np.full((H // 2, W // 2), 124, np.uint8)
        v = np.full((H // 2, W // 2), 132, np.uint8)
        fr += [y.tobytes(), u.tobytes(), v.tobytes()]
    clip = b"".join(fr)

    kw = dict(qp=32, lambda_coeffI=0.8, lambda_coeffP=1.2,
              early_skip_thr=1.0, max_num_ref=2, mqpP=1.2, dqpI=-2,
              encoder_speed=2, cdef=0, clpf=1, use_block_contexts=1,
              num_reorder_pics=7, interp_ref=1, enable_bipred=1,
              dqpB0=3, dqpB1=1, mqpB=1.2, mqpB0=1.1, mqpB1=1.2,
              mqpB2=1.3, intra_period=64, HQperiod=8)

    def params():
        return EncParams(width=W, height=H, num_frames=N, **kw)

    # warm both paths' compiles so the timed runs measure steady state
    warm = EncParams(width=W, height=H, num_frames=5, **kw)
    E.encode_sequence(warm, clip[:5 * (W * H * 3 // 2)])

    t0 = time.time()
    bs_seq, rec_seq = E.encode_sequence(params(), clip)
    seq_s = time.time() - t0

    t0 = time.time()
    bs_l, rec_l, stats = encode_sequence_lanes(params(), clip)
    lanes_s = time.time() - t0

    print(json.dumps({
        "seq_s": round(seq_s, 2),
        "lanes_s": round(lanes_s, 2),
        "speedup": round(seq_s / lanes_s, 3),
        "prefetched": stats["prefetched"],
        "max_in_flight": stats["max_in_flight"],
        "identical": bs_l == bs_seq and rec_l == rec_seq,
        "frames": N,
    }))


if __name__ == "__main__":
    main()
