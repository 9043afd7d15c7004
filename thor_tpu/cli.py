"""Command-line drivers compatible with the reference Thorenc/Thordec.

Usage:
  python -m thor_tpu.cli enc [Thorenc flags...]
  python -m thor_tpu.cli dec str.bit out.yuv

Flags follow enc/strings.c (same names/defaults); -cf config files are
supported.  y4m input is probed (geometry/rate/subsampling/bitdepth taken
from the stream header, enc/strings.c:376-450) and '.y4m' output/recon
filenames get YUV4MPEG2 headers like the reference.
"""
from __future__ import annotations

import math
import sys

import numpy as np

from .io_y4m import (FRAME_MARKER, extract_raw_frames, probe_y4m,
                     y4m_file_header)


def _psnr(a: np.ndarray, b: np.ndarray, maxval: int) -> float:
    d = a.astype(np.int64) - b.astype(np.int64)
    mse = float((d * d).sum()) / (maxval * maxval * a.size)
    return -10.0 * math.log10(mse) if mse > 0 else float("inf")


def main_enc(argv):
    from .enc.params import EncParams, apply_args
    from .enc.encoder import encode_sequence

    p = EncParams()
    infile = outfile = reconfile = None
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "-if":
            infile = argv[i + 1]
            i += 2
        elif argv[i] == "-of":
            outfile = argv[i + 1]
            i += 2
        elif argv[i] == "-rf":
            reconfile = argv[i + 1]
            i += 2
        elif argv[i] == "-stat":
            i += 2
        else:
            args.append(argv[i])
            i += 1
    apply_args(p, args)
    yuv = open(infile, "rb").read()
    y4m = probe_y4m(yuv)
    if y4m is not None:
        # stream header geometry overrides config (enc/strings.c:376-450)
        for a in ("width", "height", "frame_rate", "subsample",
                  "aspectnum", "aspectden"):
            v = getattr(y4m, a)
            if v is not None:
                setattr(p, a, v)
        if y4m.input_bitdepth is not None and y4m.input_bitdepth > 8:
            p.input_bitdepth = y4m.input_bitdepth
            p.frame_bitdepth = 16
    p.validate()
    bpp = 1 + (p.input_bitdepth > 8)
    ys = p.width * p.height
    cs = ((ys >> (2 * (p.subsample != 444))) << (p.subsample == 422)) \
        * (p.subsample != 400)
    fsize = (ys + 2 * cs) * bpp
    if y4m is not None:
        yuv = extract_raw_frames(yuv, y4m, fsize)

    stats = {"n": 0, "bits": 0}

    def progress(fnum, ftype):
        stats["n"] += 1

    bits, recon = encode_sequence(p, yuv, progress=progress)
    if outfile:
        open(outfile, "wb").write(bits)
    if reconfile:
        with open(reconfile, "wb") as f:
            if reconfile.endswith(".y4m"):
                f.write(y4m_file_header(p.width, p.height, p.frame_rate,
                                        p.aspectnum, p.aspectden,
                                        p.subsample, p.input_bitdepth))
                rs = len(recon) // max(1, stats["n"])
                for i in range(stats["n"]):
                    f.write(FRAME_MARKER)
                    f.write(recon[i * rs:(i + 1) * rs])
            else:
                f.write(recon)

    # sequence PSNR (against the input, like the reference's snrcalc)
    if p.snrcalc and recon:
        fs = len(recon) // stats["n"]
        ys = p.width * p.height
        maxval = (1 << p.input_bitdepth) - 1
        tot = [0.0, 0.0, 0.0]
        for f in range(stats["n"]):
            r = np.frombuffer(recon[f * fs:(f + 1) * fs], np.uint8)
            o = np.frombuffer(yuv[f * fs:(f + 1) * fs], np.uint8)
            tot[0] += _psnr(r[:ys], o[:ys], maxval)
            if p.subsample != 400:
                cs = (fs - ys) // 2
                tot[1] += _psnr(r[ys:ys + cs], o[ys:ys + cs], maxval)
                tot[2] += _psnr(r[ys + cs:], o[ys + cs:], maxval)
        n = stats["n"]
        kbps = 0.001 * p.frame_rate * len(bits) * 8 / n
        print("------------------- Average data for all frames "
              "------------------------------")
        print(f"kbps            : {kbps:12.3f}")
        print(f"PSNR Y          : {tot[0] / n:12.3f}")
        print(f"PSNR U          : {tot[1] / n:12.3f}")
        print(f"PSNR V          : {tot[2] / n:12.3f}")
    return 0


def main_dec(argv):
    from .dec import decode_stream

    data = open(argv[0], "rb").read()
    hdr, frames = decode_stream(data)
    with open(argv[1], "wb") as f:
        if argv[1].endswith(".y4m"):
            # dec/maindec.c:163-175: F is hardwired 30:1, A 1:1
            f.write(y4m_file_header(hdr.width, hdr.height, 30.0, 1, 1,
                                    hdr.subsample, hdr.input_bitdepth))
            for fr in frames:
                f.write(FRAME_MARKER)
                f.write(fr)
        else:
            for fr in frames:
                f.write(fr)
    print(f"decoded {len(frames)} frames {hdr.width}x{hdr.height}")
    return 0


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in ("enc", "dec"):
        print(__doc__)
        return 2
    if sys.argv[1] == "enc":
        return main_enc(sys.argv[2:])
    return main_dec(sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main())
