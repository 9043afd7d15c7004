"""CLI parity tests: stdout reports, stat files and y4m I/O.

Golden texts in tests/golden/stdout/ were captured from the reference
binaries (Thorenc/Thordec) running on the same inputs; these tests check
the CLI reproduces them byte-for-byte (per-frame lines, BIT STATISTICS,
PARAMETER STATISTICS, distributions - dec/maindec.c:176-346 and
enc/mainenc.c:547-651).
"""
import io
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import GOLDEN, make_tiny64

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd=REPO):
    env = dict(os.environ)
    # Prepend (not clobber) PYTHONPATH: the environment may carry platform
    # plugin paths (e.g. the axon site dir) that must stay importable.
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    env["JAX_PLATFORMS"] = "cpu"
    # scrub the axon sitecustomize trigger (it force-selects the tunneled
    # TPU backend regardless of JAX_PLATFORMS)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run([sys.executable, "-m", "thor_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=cwd)


@pytest.mark.parametrize("name", ["tiny64_ldblc",
                                  pytest.param("hdb9_128", marks=pytest.mark.slow),
                                  pytest.param("ra9_256", marks=pytest.mark.slow),
                                  pytest.param("ir2_128", marks=pytest.mark.slow),
                                  "c444_128"])
def test_dec_stdout_parity(name, tmp_path):
    golden = open(os.path.join(GOLDEN, "stdout", name + "_dec.txt")).read()
    r = run_cli(["dec", os.path.join(GOLDEN, name + ".bit"),
                 str(tmp_path / "out.yuv")])
    assert r.returncode == 0, r.stderr
    # stdout is byte-identical with Thordec (our summary goes to stderr)
    assert r.stdout == golden


def test_enc_stdout_parity(tmp_path):
    golden = open(os.path.join(GOLDEN, "stdout", "tiny64_enc.txt")).read()
    yuv = tmp_path / "in.yuv"
    yuv.write_bytes(make_tiny64(6))
    r = run_cli(["enc", "-if", str(yuv), "-width", "64", "-height", "64",
                 "-of", str(tmp_path / "o.bit"), "-n", "6", "-qp", "30",
                 "-f", "25", "-stat", str(tmp_path / "s.txt")])
    assert r.returncode == 0, r.stderr
    assert r.stdout == golden
    stat = (tmp_path / "s.txt").read_text()
    assert stat.startswith(" NFR     kbps     PSNRY  PSNRU  PSNRV\n")
    assert len(stat.splitlines()) == 2


@pytest.mark.slow
def test_y4m_roundtrip(tmp_path):
    """y4m probe overrides geometry; enc/dec y4m outputs carry correct
    YUV4MPEG2 headers and identical payloads to the raw-yuv path."""
    raw = make_tiny64(4)
    fsz = 64 * 64 * 3 // 2
    y4m = tmp_path / "in.y4m"
    with open(y4m, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H64 F25:1 Ip A1:1 C420\n")
        for i in range(4):
            f.write(b"FRAME\n")
            f.write(raw[i * fsz:(i + 1) * fsz])
    r = run_cli(["enc", "-if", str(y4m), "-of", str(tmp_path / "a.bit"),
                 "-rf", str(tmp_path / "r.y4m"), "-n", "4", "-qp", "30"])
    assert r.returncode == 0, r.stderr

    rawf = tmp_path / "in.yuv"
    rawf.write_bytes(raw)
    r2 = run_cli(["enc", "-if", str(rawf), "-width", "64", "-height", "64",
                  "-of", str(tmp_path / "b.bit"),
                  "-rf", str(tmp_path / "r.yuv"), "-n", "4", "-qp", "30",
                  "-f", "25"])
    assert r2.returncode == 0, r2.stderr
    assert (tmp_path / "a.bit").read_bytes() == (tmp_path / "b.bit").read_bytes()

    rec_y4m = (tmp_path / "r.y4m").read_bytes()
    assert rec_y4m.startswith(b"YUV4MPEG2 W64 H64 F25:1 Ip A1:1 C420\n")
    payload = b"".join(
        rec_y4m.split(b"FRAME\n")[1:])
    assert payload == (tmp_path / "r.yuv").read_bytes()

    # decoder: y4m output must wrap the same payload as raw output.
    # (recon vs decode is NOT compared here: at 64x64 with default CDEF
    # the reference encoder's own recon diverges from its bitstream - a
    # reference quirk we reproduce bit-exactly.)
    r3 = run_cli(["dec", str(tmp_path / "a.bit"), str(tmp_path / "d.y4m")])
    r4 = run_cli(["dec", str(tmp_path / "a.bit"), str(tmp_path / "d.yuv")])
    assert r3.returncode == 0 and r4.returncode == 0
    dec_y4m = (tmp_path / "d.y4m").read_bytes()
    # decoder hardwires F30:1 A1:1 (dec/maindec.c:163-175)
    assert dec_y4m.startswith(b"YUV4MPEG2 W64 H64 F30:1 Ip A1:1 C420\n")
    body = dec_y4m[dec_y4m.index(b"\n") + 1:]
    dec_payload = b"".join(body[i * (fsz + 6) + 6:(i + 1) * (fsz + 6)]
                           for i in range(4))
    assert dec_payload == (tmp_path / "d.yuv").read_bytes()


def test_probe_y4m_variants():
    from thor_tpu.io_y4m import probe_y4m
    hdr = b"YUV4MPEG2 W352 H288 F30000:1001 Ip A4:3 C420p10 XYSCSS=420p10\nFRAME\n"
    info = probe_y4m(hdr + b"\0" * 10)
    assert (info.width, info.height) == (352, 288)
    assert info.subsample == 420 and info.input_bitdepth == 10
    assert abs(info.frame_rate - 30000 / 1001) < 1e-9
    assert (info.aspectnum, info.aspectden) == (4, 3)
    assert info.file_headerlen == len(hdr) - 6

    mono = probe_y4m(b"YUV4MPEG2 W64 H64 F25:1 Ip A1:1 Cmono\nFRAME\n")
    assert mono.subsample == 400

    assert probe_y4m(b"not a y4m file") is None
    with pytest.raises(ValueError):
        probe_y4m(b"YUV4MPEG2 W64 H64 F25:1 It A1:1 C420\nFRAME\n")
    with pytest.raises(ValueError):
        probe_y4m(b"YUV4MPEG2 W64 H64 F25:1 Ip A1:1 C420\nJUNK!\n")
