"""TPU timing for the device LC encoder decision pass.

Times the device-side frame pass (wavefront megakernel) and the host
syntax replay separately at a chosen resolution, then reports an
end-to-end encode fps.  Runs on whatever backend JAX selects (axon =
one real TPU chip; set JAX_PLATFORMS=cpu for the host fallback).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

from thor_tpu.enc.params import EncParams  # noqa: E402
from thor_tpu.enc import encoder as E  # noqa: E402
from thor_tpu.enc import device_lc as DL  # noqa: E402
from tools.dev_devlc import make_clip  # noqa: E402


def run(W=1920, H=1088, N=3, qp=32, seed=3):
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    yuv = make_clip(W, H, N, seed)
    kw = dict(width=W, height=H, num_frames=N, qp=qp,
              lambda_coeffI=0.8, lambda_coeffP=1.2, early_skip_thr=1.0,
              max_num_ref=2, HQperiod=12, mqpP=1.2, dqpI=-2,
              encoder_speed=2, cdef=0, clpf=1, use_block_contexts=1)

    times = {"device": [], "emit": [], "tail": []}
    orig_efd = DL.encode_frame_device
    orig_emit = DL.emit_frame

    def timed_emit(enc, recA, recC, nsh, nsv):
        t0 = time.time()
        orig_emit(enc, recA, recC, nsh, nsv)
        times["emit"].append(time.time() - t0)

    def timed_efd(enc):
        t0 = time.time()
        DL.emit_frame = timed_emit
        try:
            orig_efd(enc)
        finally:
            DL.emit_frame = orig_emit
        dt = time.time() - t0
        times["device"].append(dt - times["emit"][-1])

    DL.encode_frame_device = timed_efd
    orig_init = E.Encoder.__init__

    def patched(self, params):
        orig_init(self, params)
        self.device_sb_loop = True
    E.Encoder.__init__ = patched
    try:
        t0 = time.time()
        bs, rec = E.encode_sequence(EncParams(**kw), yuv)
        ttot = time.time() - t0
    finally:
        E.Encoder.__init__ = orig_init
        DL.encode_frame_device = orig_efd

    print(f"total: {ttot:.2f}s for {N} frames ({len(bs)} bytes)")
    for k, v in times.items():
        if v:
            print(f"  {k}: " + " ".join(f"{x:.2f}" for x in v))
    # steady-state fps from the last frame (first includes compile)
    if len(times["device"]) >= 2:
        dev = times["device"][-1]
        emit = times["emit"][-1]
        print(f"steady-state device pass: {dev:.3f}s/frame "
              f"({1/dev:.2f} fps device-only)")
        print(f"steady-state emit       : {emit:.3f}s/frame")
        fps = 1.0 / (dev + emit)
        print(f"end-to-end (device+emit): {fps:.2f} fps")
    return bs


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--qp", type=int, default=32)
    a = ap.parse_args()
    run(a.w, a.h, a.n, a.qp)
