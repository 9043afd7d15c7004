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

If the reference binaries exist (tools/build_oracle.sh ->
/tmp/oracle/build/Thorenc|Thordec), each clip is additionally
cross-checked both ways (SURVEY.md section 4): our stream must decode
bit-exactly under Thordec, and Thorenc's stream under our decoder, with
byte-identical bitstreams from both encoders.
"""
import glob
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZES = [(1920, 1080), (1280, 720), (640, 480), (640, 360)]
ORACLE_ENC = "/tmp/oracle/build/Thorenc"
ORACLE_DEC = "/tmp/oracle/build/Thordec"


def run(args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "thor_tpu.cli"] + args,
                          env=env, capture_output=True, text=True)


def cross_check(tmpdir, config, f, w, h, fps, frames, stf, recf):
    """Cross-test against the reference binaries (if built)."""
    if not (os.path.exists(ORACLE_ENC) and os.path.exists(ORACLE_DEC)):
        return 0
    ref_st = os.path.join(tmpdir, "ref_str.bit")
    ref_rec = os.path.join(tmpdir, "ref_rec.yuv")
    r = subprocess.run(
        [ORACLE_ENC, "-cf", config, "-width", str(w), "-height", str(h),
         "-if", f, "-of", ref_st, "-rf", ref_rec, "-n", str(frames),
         "-f", str(fps)], capture_output=True, text=True)
    if r.returncode != 0:
        print("reference encoder failed (skipping cross-check)")
        return 0
    rc = 0
    if open(ref_st, "rb").read() != open(stf, "rb").read():
        print("CROSS: bitstream differs from Thorenc")
        rc = 1
    ref_out = os.path.join(tmpdir, "ref_out.yuv")
    subprocess.run([ORACLE_DEC, stf, ref_out], capture_output=True)
    if open(ref_out, "rb").read() != open(recf, "rb").read():
        print("CROSS: Thordec(our stream) != our recon")
        rc = 1
    our_out = os.path.join(tmpdir, "our_out.yuv")
    r = run(["dec", ref_st, our_out])
    if (r.returncode != 0 or
            open(our_out, "rb").read() != open(ref_rec, "rb").read()):
        print("CROSS: our decoder(Thorenc stream) != Thorenc recon")
        rc = 1
    if rc == 0:
        print("cross-check vs reference binaries OK")
    return rc


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
        rc |= cross_check(tmpdir, config, f, w, h, fps, frames, stf, recf)
    return rc


if __name__ == "__main__":
    sys.exit(main())
