import os

# Virtual 8-device CPU mesh for sharding tests (must be set before jax
# import).  Assignment, not setdefault: the driver environment presets
# JAX_PLATFORMS=axon (single tunneled TPU chip) which must not leak into
# the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compilation cache: repeat suite runs skip XLA compiles.
# The directory is keyed by a CPU-feature fingerprint (thor_tpu/_cache.py)
# so AOT blobs compiled on another machine can never be loaded here.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from thor_tpu._cache import setup_env as _cache_setup  # noqa: E402

_CACHE_DIR = _cache_setup()
# The axon sitecustomize (loaded at interpreter start, before this file)
# registers the tunneled TPU backend and force-selects it, so the env var
# alone is not enough - pin the platform through jax.config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    if _CACHE_DIR:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

# Cache READS only in the pytest main process.  jaxlib 0.9's XLA:CPU
# executable.serialize() intermittently SEGFAULTS when a large fused
# program is serialized after substantial prior jax activity in the
# same process (reproduced at 3 different call sites; the identical
# compile+write always succeeds in a fresh process).  Tests that spawn
# subprocesses (fuzz, HE-preset encodes) still write entries, as do
# bench.py / the multichip dryrun / tools - all fresh processes - so
# the persistent cache still warms up; the long-lived suite process
# just never calls the crashing serialize path.
try:
    from jax._src import compilation_cache as _cc

    _cc.put_executable_and_time = lambda *a, **k: None
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def make_tiny64(n=6):
    """Deterministic 64x64 test clip (matches tests/golden generation)."""
    W = H = 64
    rng = np.random.default_rng(42)
    frames = []
    yy, xx = np.mgrid[0:H, 0:W]
    for t in range(n):
        y = ((xx * 3 + t * 7) % 256).astype(np.uint8)
        y[(yy + xx + t) % 17 == 0] = 30
        y[20:40, 10 + 2 * t:30 + 2 * t] = rng.integers(
            0, 256, size=(20, 20)).astype(np.uint8)
        u = ((yy[:H // 2, :W // 2] * 2 + t * 3) % 256).astype(np.uint8)
        v = np.full((H // 2, W // 2), 100 + t, dtype=np.uint8)
        frames.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    return np.concatenate(frames).tobytes()


def make_noise_cif(n=4):
    rng = np.random.default_rng(1234)
    return rng.integers(0, 256, size=(n, 288 * 3 // 2, 352),
                        dtype=np.uint8).tobytes()


def make_smooth_cif(n=10):
    W, H = 352, 288
    frames = []
    yy, xx = np.mgrid[0:H, 0:W]
    for t in range(n):
        y = ((xx + 2 * t) % 256 * 0.5 + (yy + t) % 256 * 0.5).astype(np.uint8)
        bx, by = 40 + 6 * t, 60 + 3 * t
        y[by:by + 64, bx:bx + 64] = 200
        u = np.full((H // 2, W // 2), 128 - 10 + t, dtype=np.uint8)
        v = np.full((H // 2, W // 2), 128 + 5, dtype=np.uint8)
        frames.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    return np.concatenate(frames).tobytes()


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


def make_hdb9(n=9):
    """128x96 clip for HDB/RA/HBD encoder tests."""
    W, H = 128, 96
    rng = np.random.default_rng(55)
    yy, xx = np.mgrid[0:H, 0:W]
    fr = []
    for t in range(n):
        y = ((xx * 2 + yy + t * 3) % 256).astype(np.uint8)
        y[10:50, 10 + 3 * t:60 + 3 * t] = rng.integers(
            0, 256, (40, 50)).astype(np.uint8)
        u = ((xx[:H // 2, :W // 2] + 2 * t) % 256).astype(np.uint8)
        v = ((yy[:H // 2, :W // 2] * 3 - t) % 256).astype(np.uint8)
        fr.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    return np.concatenate(fr).tobytes()


def make_small256(n=17):
    W, H = 256, 192
    rng = np.random.default_rng(77)
    yy, xx = np.mgrid[0:H, 0:W]
    fr = []
    for t in range(n):
        y = ((xx * 2 + yy + t * 5) % 256).astype(np.uint8)
        y[10:80, 20 + 4 * t:120 + 4 * t] = rng.integers(
            0, 256, (70, 100)).astype(np.uint8)
        y[100:180, 30:200] = ((xx[:80, :170] * 3 + yy[:80, :170] + t * 9)
                              % 256).astype(np.uint8)
        u = ((xx[:H // 2, :W // 2] + 2 * t) % 256).astype(np.uint8)
        v = ((yy[:H // 2, :W // 2] * 3 - t) % 256).astype(np.uint8)
        fr.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    return np.concatenate(fr).tobytes()


def make_c444(n=4):
    W, H = 128, 96
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:H, 0:W]
    fr = []
    for t in range(n):
        y = ((xx * 2 + yy + t * 3) % 256).astype(np.uint8)
        u = ((xx + t) % 256).astype(np.uint8)
        v = ((yy * 2 - t) % 256).astype(np.uint8)
        fr.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    return np.concatenate(fr).tobytes()


def make_hbd12(n=6):
    """128x96 12-bit clip (matches tests/golden/hbd12_128 generation)."""
    W, H = 128, 96
    rng = np.random.default_rng(99)
    yy, xx = np.mgrid[0:H, 0:W]
    fr = []
    for t in range(n):
        y = ((xx * 23 + yy * 7 + t * 31) % 4096).astype(np.uint16)
        y[10:50, 10 + 3 * t:60 + 3 * t] = rng.integers(
            0, 4096, (40, 50)).astype(np.uint16)
        u = ((xx[:H // 2, :W // 2] * 11 + 2 * t) % 4096).astype(np.uint16)
        v = ((yy[:H // 2, :W // 2] * 13 - t) % 4096).astype(np.uint16)
        fr.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    return np.concatenate(fr).tobytes()
