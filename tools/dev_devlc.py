"""Dev harness: compare the device LC decision pass against the host
encoder on a small clip (bitstream must be byte-identical)."""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
from thor_tpu.enc.params import EncParams  # noqa: E402
from thor_tpu.enc import encoder as E  # noqa: E402


def make_clip(W, H, N, seed=3):
    rng = np.random.default_rng(seed)
    base = np.clip(np.linspace(30, 200, W)[None, :] +
                   np.linspace(0, 50, H)[:, None] +
                   rng.integers(-10, 10, (H, W)), 0, 255).astype(np.uint8)
    frames = []
    for i in range(N):
        f = np.roll(base, i * 2, axis=1)
        if i:
            f = np.clip(f.astype(np.int16) +
                        rng.integers(-2, 3, (H, W)), 0, 255).astype(np.uint8)
        u = np.clip(128 + rng.integers(-8, 8, (H // 2, W // 2)), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + rng.integers(-8, 8, (H // 2, W // 2)), 0,
                    255).astype(np.uint8)
        frames.append(f.tobytes() + u.tobytes() + v.tobytes())
    return b"".join(frames)


def run(W=192, H=128, N=2, qp=32, seed=3):
    yuv = make_clip(W, H, N, seed)
    kw = dict(width=W, height=H, num_frames=N, qp=qp,
              lambda_coeffI=0.8, lambda_coeffP=1.2, early_skip_thr=1.0,
              max_num_ref=2, HQperiod=12, mqpP=1.2, dqpI=-2,
              encoder_speed=2, cdef=0, clpf=1, use_block_contexts=1)
    t0 = time.time()
    bs_h, rec_h = E.encode_sequence(EncParams(**kw), yuv)
    t1 = time.time()

    enc_params = EncParams(**kw)
    # device path: patch Encoder to set the flag
    orig_init = E.Encoder.__init__

    def patched(self, params):
        orig_init(self, params)
        self.device_sb_loop = True
    E.Encoder.__init__ = patched
    try:
        t2 = time.time()
        bs_d, rec_d = E.encode_sequence(enc_params, yuv)
        t3 = time.time()
    finally:
        E.Encoder.__init__ = orig_init

    print(f"host  : {len(bs_h)} bytes in {t1-t0:.2f}s")
    print(f"device: {len(bs_d)} bytes in {t3-t2:.2f}s")
    print("bitstream match:", bs_h == bs_d)
    print("recon match    :", rec_h == rec_d)
    if bs_h != bs_d:
        n = min(len(bs_h), len(bs_d))
        diff = next((i for i in range(n) if bs_h[i] != bs_d[i]), n)
        print(f"first differing byte: {diff} / {n}")
    if rec_h != rec_d:
        fs = W * H * 3 // 2
        n = min(len(rec_h), len(rec_d))
        diff = next((i for i in range(n) if rec_h[i] != rec_d[i]), n)
        print(f"first recon diff at byte {diff} (frame {diff // fs}, "
              f"off {diff % fs})")
    return bs_h == bs_d and rec_h == rec_d


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=192)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--seed", type=int, default=3)
    a = ap.parse_args()
    ok = run(a.w, a.h, a.n, a.qp, a.seed)
    sys.exit(0 if ok else 1)
