#!/usr/bin/env python3
"""Benchmark driver: prints ONE JSON line for the round's headline metric.

Headline: REAL end-to-end 1080p decode throughput on one chip - the
production CLI path on a checked-in 1 Mbyte 8-frame 1080p LDB-LC stream
(benchmarks/stream_1080p_lc.bit, produced by the reference Thorenc on a
textured clip with global motion): host entropy/syntax decode feeding
the single-dispatch device pixel executor (dec/device_pixels.py) and
the fused device in-loop filter chain (ops/filters.py:filters_exec).
Output is checked against the reference decoder's YUV (sha256) - a run
only counts if it is bit-exact.

Baselines (BASELINE.md, measured x86 `make ARCH=native` SIMD build):
Thordec full decode 26.3 fps at 1080p; Thorenc LC encode 3.19 fps.

Extras reported alongside: the synthetic device pixel-pipeline fps
(models/pipeline.py, round-1 metric) and the turbo-encoder status.
"""
import hashlib
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

def _baseline_fps(pattern, default):
    """Parse a baseline number out of BASELINE.md (single source of
    truth for reference-build measurements)."""
    import re
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.md")
    try:
        m = re.search(pattern, open(path).read())
        return float(m.group(1)) if m else default
    except OSError:
        return default


THORDEC_1080P_FPS_X86 = _baseline_fps(
    r"bench\.py:\s*([0-9.]+)\s*fps", 26.3)
THORENC_LC_1080P_FPS_X86 = _baseline_fps(
    r"LDB low-complexity \| ([0-9.]+)", 3.19)
REC_SHA256 = "287b83855649b54ea8deb70db12cb222f16561eb25150ecdb1217823111425ef"
STREAM = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "benchmarks", "stream_1080p_lc.bit")


def real_decode_fps():
    import numpy as np
    import jax
    import jax.numpy as jnp
    # warm the tunnel's first device->host pull (fixed multi-minute cost
    # on tunneled chips; not part of the steady-state product rate)
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8, 8), jnp.int16)))

    from thor_tpu.dec import decoder as D
    data = open(STREAM, "rb").read()

    times = []
    orig = D.Decoder.decode_frame

    def timed(self, s, n):
        t0 = time.time()
        r = orig(self, s, n)
        times.append(time.time() - t0)
        return r

    D.Decoder.decode_frame = timed
    try:
        _, frames = D.decode_stream(data)
    finally:
        D.Decoder.decode_frame = orig
    out = b"".join(frames)
    ok = hashlib.sha256(out).hexdigest() == REC_SHA256
    steady = times[3:] if len(times) > 4 else times
    return len(steady) / sum(steady), ok


def synthetic_pipeline_fps():
    from functools import partial
    import numpy as np
    import jax
    from thor_tpu.models.pipeline import decode_p_frame_420, \
        make_example_full
    H, W = 1088, 1920
    args, _dd, _presets = make_example_full(height=H, width=W)
    np.asarray(args[0])
    fn = partial(decode_p_frame_420, height=H, width=W, qp=32, bitdepth=8,
                 clpf_strengths=(2, 1, 4))
    out = fn(*args)
    jax.block_until_ready(out)
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return n / (time.time() - t0)


def turbo_encode_fps(H=1088, W=1920, N=6):
    """Measure the turbo encoder end-to-end at 1080p: decide (device) +
    native plan/emit (C) + device finalization, steady-state fps over
    the last frames of a 6-frame textured clip.  Every number printed
    by this benchmark is computed during the run."""
    import numpy as np
    os.environ["THOR_TURBO"] = "1"
    from thor_tpu.enc.params import EncParams
    from thor_tpu.enc import encoder as E

    rng = np.random.default_rng(12)
    base = np.clip(np.linspace(40, 210, W)[None, :] +
                   np.linspace(0, 40, H)[:, None] +
                   rng.integers(-12, 12, (H, W)), 0, 255).astype(np.uint8)
    frames = []
    for i in range(N):
        y = np.roll(base, 8 * i, axis=1)
        u = np.full((H // 2, W // 2), 124, np.uint8)
        v = np.full((H // 2, W // 2), 132, np.uint8)
        frames += [y.tobytes(), u.tobytes(), v.tobytes()]
    yuv = b"".join(frames)

    times = []

    def prog(fn, ft, stats):
        times.append(time.time())

    params = EncParams(width=W, height=H, num_frames=N, qp=32,
                       lambda_coeffI=0.8, lambda_coeffP=1.2,
                       early_skip_thr=1.0, max_num_ref=2, HQperiod=12,
                       mqpP=1.2, dqpI=-2, encoder_speed=2, cdef=0,
                       clpf=1, use_block_contexts=1)
    t0 = time.time()
    bs, rec = E.encode_sequence(params, yuv, progress=prog)
    times.insert(0, t0)
    deltas = [b - a for a, b in zip(times, times[1:])]
    steady = deltas[2:] if len(deltas) > 3 else deltas
    # compliance gate: the stream must decode back to the recon
    from thor_tpu.dec import decode_stream
    _, dec_frames = decode_stream(bs)
    exact = b"".join(dec_frames) == rec
    return len(steady) / sum(steady), exact


def main():
    fps, ok = real_decode_fps()
    extras = {"bit_exact_vs_reference": ok}
    try:
        # hermetic subprocess with a hard timeout: a pathological
        # first-compile must not take down the decode headline
        import subprocess
        import sys
        r = subprocess.run(
            [sys.executable, "-c",
             "import json, bench; f, ok = bench.turbo_encode_fps(); "
             "print('TURBO_JSON ' + json.dumps([f, ok]))"],
            capture_output=True, text=True, timeout=1500,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("TURBO_JSON ")]
        efps, eok = json.loads(line[0][11:])
        extras["turbo_encode_1080p_fps"] = round(efps, 3)
        extras["turbo_encode_roundtrip_exact"] = eok
        extras["turbo_vs_thorenc_lc"] = round(
            efps / THORENC_LC_1080P_FPS_X86, 4)
    except Exception as e:  # noqa: BLE001
        extras["turbo_encode_1080p_fps"] = f"error: {type(e).__name__}"
    try:
        extras["synthetic_pixel_pipeline_fps"] = round(
            synthetic_pipeline_fps(), 2)
    except Exception as e:  # noqa: BLE001
        extras["synthetic_pixel_pipeline_fps"] = f"error: {type(e).__name__}"
    print(json.dumps({
        "metric": "1080p REAL end-to-end decode fps (single chip, host "
                  "entropy + device pixel pipeline + device loop "
                  "filters, bit-exact vs reference)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / THORDEC_1080P_FPS_X86, 4),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
