"""Robustness fuzzing of the native bitstream parser.

The C parser (_native/blockparse.c) consumes untrusted bitstreams; the
reference's robustness net was valgrind over random input (check.sh:8).
Here: mutated golden streams driven through the full decode path with
the native tier compiled under -fsanitize=address,undefined in a
subprocess (tools/fuzz_parse.py).  The contract: malformed input may
raise Python exceptions, never corrupt memory or crash.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FUZZ = os.path.join(REPO, "tools", "fuzz_parse.py")


def _has_asan():
    r = subprocess.run(["cc", "-print-file-name=libasan.so"],
                       capture_output=True, text=True)
    path = r.stdout.strip()
    return r.returncode == 0 and os.path.isabs(path) and \
        os.path.exists(path)


@pytest.mark.skipif(not _has_asan(), reason="no ASan runtime")
def test_fuzz_native_parse_asan():
    """~200 mutated + random streams, ASan/UBSan-clean (default suite;
    the deeper sweep is the slow twin below)."""
    r = subprocess.run([sys.executable, FUZZ, "drive", "160"],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]


@pytest.mark.slow
@pytest.mark.skipif(not _has_asan(), reason="no ASan runtime")
def test_fuzz_native_parse_asan_deep():
    r = subprocess.run([sys.executable, FUZZ, "drive", "5000"],
                       capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
