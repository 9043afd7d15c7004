"""Frame-parallel GOP lanes for the turbo encoder.

The dyadic sub-GOP dependency DAG (enc/mainenc.c:50-64: same-b-level B
frames only reference lower levels) leaves whole decision passes
independent of each other.  This driver runs a schedule-only pass of
`encode_sequence` to learn every frame's coding parameters up front,
then encodes normally in coding order while PREFETCHING the turbo
decision pass of any upcoming frame whose reference frames are already
reconstructed - the device work stays in flight (`decide_frame(...,
pull=False)`) and is resolved when the frame's coding turn arrives.

On one chip the prefetched dispatches fill the device while the host
runs the current frame's plan/emit passes; with `devices=` each lane's
decision pass is placed on its own mesh device (`jax.default_device`),
which is how `__graft_entry__.dryrun_multichip` validates multi-chip
frame-parallel encode.  Output is byte-identical to the sequential
turbo encoder: decisions are deterministic functions of (original
frame, reference pixels), both of which are identical at prefetch time.
"""
from __future__ import annotations

import contextlib
import copy

from .encoder import (Encoder, EncParams, I_FRAME, SQUARED_LAMBDA_QP,
                      encode_sequence, frame_lambda_coeff)
from .turbo import decide_frame, turbo_supported
from ..frame import YuvFrame


class _LaneFI:
    """FrameInfo view for a scheduled-but-not-yet-coded frame."""

    def __init__(self, ent, p):
        self.frame_num = ent["frame_num"]
        self.frame_type = ent["frame_type"]
        self.b_level = ent["b_level"]
        self.phase = ent["phase"]
        self.qp = ent["qp"]
        self.num_ref = ent["num_ref"]
        self.ref_array = list(ent["ref_array"])
        self.interp_ref = ent["interp_ref"]
        self.num_intra_modes = ent["num_intra_modes"]
        self.lambda_coeff = frame_lambda_coeff(p, self)
        self.lambda_ = self.lambda_coeff * SQUARED_LAMBDA_QP[self.qp]


class _LaneView:
    """Encoder-shaped view over a future frame: original pixels read
    from the input, references resolved by FRAME NUMBER against the
    live window (their pixels are final once coded)."""

    def __init__(self, enc, ent, yuv, interp_scratch):
        p = enc.params
        self.params = p
        self.fi = _LaneFI(ent, p)
        self.orig = YuvFrame(p.width, p.height, p.subsample, 0,
                             p.bitdepth, p.input_bitdepth)
        self.orig.read_from(yuv, ent["orig_offset"])
        self._by_slot = {slot: fn for slot, fn in
                         zip(ent["ref_array"], ent["ref_frame_nums"])}
        self._enc = enc
        self._interp = None
        if ent["interp_spec"] is not None:
            r1i, r2i, d1, d2 = ent["interp_spec"]
            ref1 = self._by_frame_num(ent["ref_frame_nums"][1])
            ref2 = self._by_frame_num(ent["ref_frame_nums"][2])
            from ..ops.tempinterp import interpolate_frames_auto
            interpolate_frames_auto(interp_scratch, ref1, ref2, d1, d2)
            interp_scratch.pad_frame()
            interp_scratch.frame_num = ent["frame_num"]
            self._interp = interp_scratch

    def _by_frame_num(self, fn):
        for r in self._enc.ref:
            if r.frame_num == fn:
                return r
        raise KeyError(f"reference frame {fn} left the window")

    def _ref_frame(self, slot):
        if slot < 0:
            return self._interp
        return self._by_frame_num(self._by_slot[slot])

    def _dev_ref_planes(self, ref):
        return self._enc._dev_ref_planes(ref)


class _Prefetcher:
    def __init__(self, entries, yuv, devices, lookahead, params):
        self.entries = entries
        self.yuv = yuv
        self.devices = list(devices) if devices else [None]
        self.lookahead = lookahead or max(2, params.num_reorder_pics + 1)
        self.enc = None
        self.coded = set()
        self.cursor = 0
        self.launched = 0
        self.max_in_flight = 0
        self._scratch = []

    def attach(self, enc):
        self.enc = enc
        enc._lane_decisions = {}

    def _interp_scratch(self):
        # one reusable buffer: decide_frame uploads the interpolated
        # pixels to the device during its (synchronous) dispatch, so the
        # host copy is dead once decide_frame(pull=False) returns
        if not self._scratch:
            p = self.enc.params
            from ..frame import new_ref_frame
            self._scratch.append(new_ref_frame(
                p.width, p.height, p.subsample, p.bitdepth,
                p.input_bitdepth))
        return self._scratch[0]

    def on_frame_done(self, coded_frame_num):
        self.coded.add(coded_frame_num)
        enc = self.enc
        if enc is None or not getattr(enc, "turbo", False):
            return
        while (self.cursor < len(self.entries) and
               self.entries[self.cursor]["frame_num"] in self.coded):
            self.cursor += 1
        import jax
        end = min(len(self.entries), self.cursor + self.lookahead)
        for j in range(self.cursor, end):
            ent = self.entries[j]
            fn = ent["frame_num"]
            if fn in self.coded or fn in enc._lane_decisions:
                continue
            if ent["frame_type"] == I_FRAME:
                continue
            refs = [r for r in ent["ref_frame_nums"] if r is not None]
            if not all(r in self.coded for r in refs):
                continue
            view = _LaneView(enc, ent, self.yuv,
                             self._interp_scratch()
                             if ent["interp_spec"] is not None else None)
            if not turbo_supported(view):
                continue
            dev = self.devices[self.launched % len(self.devices)]
            ctx = (jax.default_device(dev) if dev is not None
                   else contextlib.nullcontext())
            with ctx:
                enc._lane_decisions[fn] = decide_frame(view, pull=False)
            self.launched += 1
            self.max_in_flight = max(self.max_in_flight,
                                     len(enc._lane_decisions))


def encode_sequence_lanes(params: EncParams, yuv: bytes, progress=None,
                          devices=None, lookahead=None):
    """encode_sequence with GOP-lane decision prefetch (turbo only).

    Returns (bitstream, recon, stats) where stats reports how many
    decision passes ran ahead of their coding turn and the peak number
    in flight.  Byte-identical to the sequential turbo encoder."""
    sched = encode_sequence(copy.deepcopy(params), yuv,
                            schedule_only=True)
    entries = [e for e in sched if "transition" not in e]
    pf = _Prefetcher(entries, yuv, devices, lookahead, params)

    def prog(frame_num, frame_type, stats):
        pf.on_frame_done(frame_num - params.skip)
        if progress:
            progress(frame_num, frame_type, stats)

    bs, rec = encode_sequence(params, yuv, progress=prog,
                              encoder_hook=pf.attach)
    return bs, rec, {"prefetched": pf.launched,
                     "max_in_flight": pf.max_in_flight}
