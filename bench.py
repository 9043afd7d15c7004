#!/usr/bin/env python3
"""Benchmark driver: prints ONE JSON line for the round's headline metric.

Round-1 metric: 1080p decode pixel-pipeline throughput on one chip
(batched MC + dequant + inverse transform + reconstruct, the device side
of decoding a P frame of 16x16 inter tiles).

Baseline: reference Thordec full-decode at 1080p HE measured on the dev
host x86 (make ARCH=native SIMD build): 26.3 fps (8-frame clip, best of
3).  The reference publishes no numbers (BASELINE.md), so the locally
measured figure is the operational baseline.  vs_baseline is
pipeline_fps / 26.3 - an honest proxy until the full TPU decoder path
replaces it in later rounds (host entropy decode not yet included).
"""
import json
import time

THORDEC_1080P_FPS_X86 = 26.3


def main():
    from functools import partial
    from thor_tpu.models.pipeline import decode_inter_frame_16, make_example

    import numpy as np

    H, W = 1088, 1920  # 1080p rounded to the 16-tile grid
    args = make_example(height=H, width=W)
    # force a large device->host transfer first: the axon tunnel reports
    # async completions optimistically until one happens, which would make
    # timings look ~100x faster than the hardware really runs
    np.asarray(args[0])
    fn = partial(decode_inter_frame_16, height=H, width=W, qp=32, bitdepth=8)
    out = fn(*args)
    out.block_until_ready()  # compile
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    out.block_until_ready()
    dt = (time.time() - t0) / n
    fps = 1.0 / dt
    print(json.dumps({
        "metric": "1080p decode pixel-pipeline fps (single chip)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / THORDEC_1080P_FPS_X86, 3),
    }))


if __name__ == "__main__":
    main()
