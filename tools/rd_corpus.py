#!/usr/bin/env python3
"""RD quality tracking: turbo encoder vs reference Thorenc on a small
clip corpus (the reference's own RD contract is trial-encode RDO,
enc/encode_block.c:1835; this tool measures how close turbo's batched
decisions get, per preset, per content type).

Corpus: same geometry for every clip (one XLA kernel-family compile,
shared via the persistent cache), content chosen to span the decision
space: smooth gradient (skip/inter-friendly), moving noise block (the
round-4 regression case), texture pan (MV field coherence), cut +
still (intra pressure then skip pressure).

Usage:
  python tools/rd_corpus.py [--preset lc|he|both] [--frames N]

Prints a markdown table: clip, preset, thorenc bytes/psnr, turbo
bytes/psnr, delta-rate %, delta-psnr dB; exits nonzero if any turbo
stream fails its compliance gate (decode != recon).
"""
import argparse
import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ORACLE_ENC = "/tmp/oracle/build/Thorenc"
ORACLE_DEC = "/tmp/oracle/build/Thordec"
W, H = 256, 192
CFGS = {"lc": "config_LDB_low_complexity.txt",
        "he": "config_LDB_high_efficiency.txt",
        "ra": "config_RA_medium_complexity.txt"}


def make_clips(n):
    import numpy as np
    yy, xx = np.mgrid[0:H, 0:W]
    clips = {}

    # 1. smooth gradient with global motion (easy: skip/inter)
    fr = []
    base = (np.linspace(40, 210, W)[None, :] +
            np.linspace(0, 40, H)[:, None]).astype(np.uint8)
    for t in range(n):
        y = np.roll(base, 4 * t, axis=1)
        fr.append(_p420(y))
    clips["gradient_pan"] = b"".join(fr)

    # 2. moving noise block over gradient (the round-4 -4.6 dB case)
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    fr = []
    for t in range(n):
        y = np.roll(base, 2 * t, axis=1).copy()
        by, bx = 40, 20 + 10 * t
        y[by:by + 64, bx:bx + 64] = noise
        fr.append(_p420(y))
    clips["noise_block"] = b"".join(fr)

    # 3. texture pan (detailed but predictable)
    tex = ((xx * 7 + yy * 13) % 61 * 4 + 16).astype(np.uint8)
    fr = []
    for t in range(n):
        fr.append(_p420(np.roll(tex, (3 * t, 5 * t), (0, 1))))
    clips["texture_pan"] = b"".join(fr)

    # 4. scene cut into static noise (intra pressure, then pure skip)
    rng = np.random.default_rng(11)
    still = rng.integers(0, 256, (H, W)).astype(np.uint8)
    fr = []
    for t in range(n):
        fr.append(_p420(base if t < 2 else still))
    clips["cut_static"] = b"".join(fr)
    return clips


def _p420(y):
    import numpy as np
    u = np.full((H // 2, W // 2), 124, np.uint8)
    v = np.full((H // 2, W // 2), 132, np.uint8)
    return y.tobytes() + u.tobytes() + v.tobytes()


def psnr_y(rec, org, n):
    """Per-plane luma PSNR over the clip."""
    import numpy as np
    fsz = W * H * 3 // 2
    tot = 0.0
    for t in range(n):
        a = np.frombuffer(rec[t * fsz:t * fsz + W * H], np.uint8)
        b = np.frombuffer(org[t * fsz:t * fsz + W * H], np.uint8)
        mse = ((a.astype(np.int64) - b.astype(np.int64)) ** 2).mean()
        tot += 10 * math.log10(255 * 255 / max(mse, 1e-12))
    return tot / n


def run_ref(cfg, clip_path, n, tag):
    bit = f"/tmp/rd_{tag}_ref.bit"
    rec = f"/tmp/rd_{tag}_ref.yuv"
    t0 = time.time()
    subprocess.run([ORACLE_ENC, "-cf", os.path.join(REPO, "configs", cfg),
                    "-width", str(W), "-height", str(H), "-qp", "32",
                    "-f", str(n), "-if", clip_path, "-of", bit,
                    "-rf", rec], check=True, capture_output=True,
                   timeout=600)
    return (os.path.getsize(bit), open(rec, "rb").read(),
            time.time() - t0)


def run_turbo(cfg, yuv, n):
    os.environ["THOR_TURBO"] = "1"
    from thor_tpu.enc.params import parse_config_file
    from thor_tpu.enc import encoder as E
    params = parse_config_file(os.path.join(REPO, "configs", cfg),
                               width=W, height=H, num_frames=n, qp=32)
    t0 = time.time()
    bs, rec = E.encode_sequence(params, yuv)
    dt = time.time() - t0
    # compliance gate
    ok = None
    if os.path.exists(ORACLE_DEC):
        open("/tmp/rd_turbo.bit", "wb").write(bs)
        subprocess.run([ORACLE_DEC, "/tmp/rd_turbo.bit",
                        "/tmp/rd_turbo_dec.yuv"], check=True,
                       capture_output=True, timeout=300)
        ok = open("/tmp/rd_turbo_dec.yuv", "rb").read() == rec
    return len(bs), rec, dt, ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="both")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--clips", default="")
    args = ap.parse_args()
    n = args.frames
    presets = (["lc", "he"] if args.preset == "both"
               else args.preset.split(","))
    clips = make_clips(n)
    if args.clips:
        keep = args.clips.split(",")
        clips = {k: v for k, v in clips.items() if k in keep}
    have_ref = os.path.exists(ORACLE_ENC)

    rows = []
    bad = 0
    for cname, yuv in clips.items():
        cpath = f"/tmp/rd_{cname}.yuv"
        open(cpath, "wb").write(yuv)
        for pr in presets:
            r = {"clip": cname, "preset": pr}
            if have_ref:
                rb, rrec, rdt = run_ref(CFGS[pr], cpath, n,
                                        f"{cname}_{pr}")
                r["ref_bytes"] = rb
                r["ref_psnr_y"] = round(psnr_y(rrec, yuv, n), 3)
            tb, trec, tdt, ok = run_turbo(CFGS[pr], yuv, n)
            r["turbo_bytes"] = tb
            r["turbo_psnr_y"] = round(psnr_y(trec, yuv, n), 3)
            r["thordec_exact"] = ok
            if ok is False:
                bad += 1
            if have_ref:
                r["drate_pct"] = round(100 * (tb / rb - 1), 2)
                r["dpsnr_db"] = round(r["turbo_psnr_y"] - r["ref_psnr_y"],
                                      3)
            rows.append(r)
            print(json.dumps(r), flush=True)

    # markdown summary
    print("\n| clip | preset | ref bytes | ref Y-PSNR | turbo bytes | "
          "turbo Y-PSNR | drate% | dPSNR dB | exact |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['clip']} | {r['preset']} | {r.get('ref_bytes','-')} |"
              f" {r.get('ref_psnr_y','-')} | {r['turbo_bytes']} |"
              f" {r['turbo_psnr_y']} | {r.get('drate_pct','-')} |"
              f" {r.get('dpsnr_db','-')} | {r['thordec_exact']} |")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
