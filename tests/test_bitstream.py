"""VLC + bit I/O round-trip property tests (vs reference semantics)."""
import random

import pytest

from thor_tpu.bitstream import BitWriter, BitReader, FrameUnitReader, cost_vlc


def roundtrip(writes):
    w = BitWriter()
    for n, cn in writes:
        w.put_vlc(n, cn)
    unit = w.flush_frame()
    r = FrameUnitReader(unit).next_frame()
    return [r.get_vlc(n) for n, _ in writes]


@pytest.mark.parametrize("table,maxval", [
    (0, 200), (1, 200), (2, 500), (3, 500), (4, 1000), (5, 1000),
    (6, 300), (7, 300), (8, 9), (10, 4000),
    (11, 1), (12, 2), (13, 3), (14, 4), (15, 5), (16, 6), (17, 7), (18, 8),
])
def test_vlc_roundtrip(table, maxval):
    rng = random.Random(table)
    vals = [rng.randint(0, maxval) for _ in range(200)]
    writes = [(table, v) for v in vals]
    assert roundtrip(writes) == vals


def test_flc_roundtrip():
    rng = random.Random(7)
    writes = [(-rng.randint(1, 24), 0) for _ in range(300)]
    writes = [(n, rng.randint(0, (1 << -n) - 1)) for n, _ in writes]
    assert roundtrip(writes) == [cn for _, cn in writes]


def test_cost_vlc_matches_emitted_length():
    rng = random.Random(3)
    for _ in range(2000):
        table = rng.choice([0, 1, 2, 3, 4, 5, 6, 7, 8, 10,
                            11, 12, 13, 14, 15, 16, 17, 18, -5, -16])
        if table == 8:
            cn = rng.randint(0, 9)
        elif 11 <= table <= 18:
            cn = rng.randint(0, table - 10)
        elif table < 0:
            cn = rng.randint(0, (1 << -table) - 1)
        else:
            cn = rng.randint(0, 3000)
        w = BitWriter()
        before = w.get_bit_pos()
        w.put_vlc(table, cn)
        assert w.get_bit_pos() - before == cost_vlc(table, cn)


def test_frame_unit_framing():
    w = BitWriter()
    w.putbits(13, 0x155a & 0x1fff)
    u1 = w.flush_frame()
    w.putbits(3, 5)
    u2 = w.flush_frame()
    fur = FrameUnitReader(u1 + u2)
    r1 = fur.next_frame()
    assert r1.getbits(13) == 0x155a & 0x1fff
    r2 = fur.next_frame()
    assert r2.getbits(3) == 5
    assert fur.next_frame() is None


def test_writer_rewind():
    w = BitWriter()
    w.putbits(11, 0x5a5 & 0x7ff)
    pos = w.save_pos()
    w.putbits(25, 0x1abcdef & 0x1ffffff)
    w.putbits(40 % 24, 3)
    w.restore_pos(pos)
    w.putbits(5, 9)
    unit = w.flush_frame()
    r = FrameUnitReader(unit).next_frame()
    assert r.getbits(11) == 0x5a5 & 0x7ff
    assert r.getbits(5) == 9
