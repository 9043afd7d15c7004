#!/usr/bin/env python3
"""Fuzz the native bitstream parser under ASan/UBSan.

The C block-layer parser (_native/blockparse.c) walks untrusted
bitstreams into fixed-capacity buffers - the classic codec CVE shape.
The reference's only robustness tool was valgrind (check.sh:8); this
harness is the TPU build's equivalent: bit-flipped and random streams
are decoded through the FULL production path (BitReader framing ->
native parse -> device pixel executor) with the native tier compiled
under -fsanitize=address,undefined.  Any OOB read/write or UB aborts
the process; Python-level exceptions (EOFError/ValueError/...) are the
expected failure mode for malformed input.

Usage:
  python tools/fuzz_parse.py build          # build the ASan .so
  python tools/fuzz_parse.py run N [seed]   # fuzz N mutations (in-proc)
  python tools/fuzz_parse.py drive N        # build + run in a subprocess
                                            # with the ASan runtime
                                            # preloaded; exits nonzero on
                                            # any sanitizer report
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
NATIVE = os.path.join(REPO, "thor_tpu", "_native")
ASAN_SO = "/tmp/libthorentropy_asan.so"
GOLD = os.path.join(REPO, "tests", "golden", "tiny64_ldblc.bit")


def build():
    srcs = [os.path.join(NATIVE, f)
            for f in ("entropy.c", "blockparse.c", "blockemit.c")]
    subprocess.run(
        ["cc", "-O1", "-g", "-shared", "-fPIC",
         "-fsanitize=address,undefined", "-fno-sanitize-recover=all"]
        + srcs + ["-o", ASAN_SO], check=True)
    print("built", ASAN_SO)


def run(n, seed=0):
    import numpy as np
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    # Host pixel path: the sanitizer target is the C parse tier, and
    # malformed streams produce content-dependent device plan shapes
    # that each trigger a fresh (minutes-long under ASan) XLA compile.
    # The host path exercises the identical parse + recon logic with
    # zero compiles (~1 s/stream); the device executors have their own
    # golden bit-exactness tests.
    os.environ.setdefault("THOR_DEVICE_FILTERS", "0")
    from thor_tpu.dec import decode_stream

    data = bytearray(open(GOLD, "rb").read())
    rng = np.random.default_rng(seed)
    ok = err = 0
    # keep the sequence header (first 8 bytes) intact so frame geometry
    # stays small; everything after it - frame-length framing, frame
    # headers, block syntax, coefficients - is fair game
    lo = 8
    for i in range(n):
        m = bytearray(data)
        kind = i % 4
        if kind == 0:          # single bit flip
            p = int(rng.integers(lo, len(m)))
            m[p] ^= 1 << int(rng.integers(0, 8))
        elif kind == 1:        # burst of bit flips
            for _ in range(int(rng.integers(2, 16))):
                p = int(rng.integers(lo, len(m)))
                m[p] ^= 1 << int(rng.integers(0, 8))
        elif kind == 2:        # random byte splice
            p = int(rng.integers(lo, len(m)))
            ln = int(rng.integers(1, 64))
            m[p:p + ln] = bytes(rng.integers(0, 256, ln, dtype=np.uint8))
        else:                  # truncation
            m = m[:int(rng.integers(lo + 1, len(m)))]
        try:
            decode_stream(bytes(m))
            ok += 1
        except Exception:
            err += 1
    # pure-random streams behind a valid sequence header
    for i in range(max(n // 10, 10)):
        m = bytes(data[:lo]) + bytes(
            rng.integers(0, 256, int(rng.integers(16, 4096)),
                         dtype=np.uint8))
        try:
            decode_stream(m)
            ok += 1
        except Exception:
            err += 1
    print(f"fuzz done: {ok} decoded, {err} rejected cleanly, 0 crashes")


def drive(n):
    build()
    asan_rt = subprocess.run(
        ["cc", "-print-file-name=libasan.so"],
        capture_output=True, text=True).stdout.strip()
    stdcxx = subprocess.run(
        ["cc", "-print-file-name=libstdc++.so.6"],
        capture_output=True, text=True).stdout.strip()
    env = dict(os.environ)
    env["THOR_NATIVE_SO"] = ASAN_SO
    # libstdc++ must be resident before ASan initializes its
    # __cxa_throw interceptor, or jaxlib's nanobind exceptions trip a
    # CHECK inside the sanitizer runtime
    env["LD_PRELOAD"] = asan_rt + (" " + stdcxx if stdcxx else "")
    # the JAX/CPython stack leaks by design at exit; only real bugs abort
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    env["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize force-selects the tunneled TPU backend when
    # this trigger is set, overriding JAX_PLATFORMS=cpu - without the
    # scrub every fuzz decode round-trips the network tunnel
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, __file__, "run", str(n)], env=env)
    if r.returncode != 0:
        print("FUZZ FAILED (sanitizer report above)", file=sys.stderr)
        sys.exit(1)
    print("fuzz clean under ASan/UBSan")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "drive"
    if cmd == "build":
        build()
    elif cmd == "run":
        run(int(sys.argv[2]), int(sys.argv[3]) if len(sys.argv) > 3 else 0)
    else:
        drive(int(sys.argv[2]) if len(sys.argv) > 2 else 500)
