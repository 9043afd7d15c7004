#!/usr/bin/env python3
"""Encoder/decoder round-trip checker (reference check.sh equivalent).

Encodes each input (or generated random clips), decodes the stream, and
compares the decoder output against the encoder reconstruction; reports
the first mismatching frame like the reference script.

Usage:
  python3 tools/check.py CONFIG [FRAMES] [FILES_GLOB_OR_DIR]

Files must be named *_WxH_fps.yuv (e.g. foo_640x360_30.yuv), matching the
reference's filename convention.  Without FILES, random clips are
generated at the reference's sizes (1920x1080, 1280x720, 640x480,
640x360).  NOTE: the reference uses 3 random frames by default; random
content exercises the full mode space.
"""
import glob
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZES = [(1920, 1080), (1280, 720), (640, 480), (640, 360)]


def run(args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "thor_tpu.cli"] + args,
                          env=env, capture_output=True, text=True)


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    config = sys.argv[1]
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    files_arg = sys.argv[3] if len(sys.argv) > 3 else None

    tmpdir = tempfile.mkdtemp(prefix="thor_check_")
    files = []
    if files_arg:
        if files_arg.endswith(".yuv"):
            files = sorted(glob.glob(files_arg))
        else:
            files = sorted(glob.glob(os.path.join(files_arg, "*.yuv")))
    else:
        for w, h in SIZES:
            n = w * h * frames * 3 // 2
            f = os.path.join(tmpdir, "rnd_test_tmp_%dx%d_30.yuv" % (w, h))
            with open(f, "wb") as fh:
                fh.write(os.urandom(n))
            files.append(f)

    rc = 0
    for f in files:
        m = re.search(r"_(\d+)x(\d+)_(\d+)\.yuv$", f)
        if not m:
            print("skipping (name not *_WxH_fps.yuv):", f)
            continue
        w, h, fps = map(int, m.groups())
        print(w, h, fps, f, frames)
        stf = os.path.join(tmpdir, "str_tmp.bit")
        recf = os.path.join(tmpdir, "rec_tmp.yuv")
        outf = os.path.join(tmpdir, "out_tmp.yuv")
        r = run(["enc", "-cf", config, "-width", str(w), "-height", str(h),
                 "-if", f, "-of", stf, "-rf", recf, "-n", str(frames),
                 "-f", str(fps)])
        if r.returncode != 0:
            print("Encoder error detected")
            print(r.stderr[-2000:])
            return 1
        r = run(["dec", stf, outf])
        if r.returncode != 0:
            print("Decoder error detected")
            print(r.stderr[-2000:])
            return 1
        rec = open(recf, "rb").read()
        out = open(outf, "rb").read()
        if rec != out:
            fsize = w * h * 3 // 2
            at = next(i for i in range(min(len(rec), len(out)))
                      if rec[i] != out[i])
            print("Encoder/Decoder mismatch detected. Frame nr.:",
                  at // fsize + 1)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
