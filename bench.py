#!/usr/bin/env python3
"""Benchmark driver: prints ONE JSON line for the round's headline metric.

Metric: 1080p FULL decode pixel-pipeline throughput on one chip - the
complete device side of decoding a 4:2:0 P frame of 16x16 inter tiles:
luma quarter-pel + chroma eighth-pel MC (Pallas DMA-gather kernels),
dequantize + inverse transform (MXU), reconstruction, and the whole
in-loop chain deblock -> CDEF (incl. on-device direction search) -> CLPF
on all three planes.  Host entropy decode not included.

Baseline: reference Thordec full-decode at 1080p HE measured on the dev
host x86 (make ARCH=native SIMD build): 26.3 fps (8-frame clip, best of
3).  The reference publishes no numbers (BASELINE.md), so the locally
measured figure is the operational baseline.
"""
import json
import time

THORDEC_1080P_FPS_X86 = 26.3


def main():
    from functools import partial
    import jax
    from thor_tpu.models.pipeline import decode_p_frame_420, \
        make_example_full

    import numpy as np

    H, W = 1088, 1920  # 1080p rounded to the 16-tile grid
    args, _dd, _presets = make_example_full(height=H, width=W)
    # force a large device->host transfer first: the axon tunnel reports
    # async completions optimistically until one happens, which would make
    # timings look ~100x faster than the hardware really runs
    np.asarray(args[0])
    fn = partial(decode_p_frame_420, height=H, width=W, qp=32, bitdepth=8,
                 clpf_strengths=(2, 1, 4))
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    fps = 1.0 / dt
    print(json.dumps({
        "metric": "1080p full decode pixel-pipeline fps (single chip, "
                  "MC+transform+recon+deblock+CDEF+CLPF)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / THORDEC_1080P_FPS_X86, 3),
    }))


if __name__ == "__main__":
    main()
