"""Multi-stream encode sharded over a device mesh.

The encode twin of dec/multistream.py (BASELINE config 4: batched
transcode): N independent turbo encoders run concurrently, each pinned
to its own mesh device via the thread-local `jax.default_device`
context, so every stream's decision/finalization dispatches execute on
its own chip while the host-side C plan/emit passes interleave across
streams.  Optionally each stream also runs GOP-lane decision prefetch
(enc/gop_lanes.py) on its device.

Outputs are byte-identical to running each encode alone: device
placement does not change the arithmetic, and every stream owns its
encoder state.
"""
from __future__ import annotations

import threading

from .encoder import EncParams, encode_sequence
from .gop_lanes import encode_sequence_lanes


def encode_streams_sharded(jobs, devices, lanes=True, progress=None):
    """Encode each (params, yuv) job on its own device, concurrently.

    jobs: list of (EncParams, yuv bytes); devices: list of jax devices
    (streams round-robin over them).  Returns [(bitstream, recon), ...]
    in job order.  lanes=True adds GOP-lane decision prefetch per
    stream (turbo only)."""
    import jax

    results = [None] * len(jobs)
    errors = []

    def run(i, params, yuv, dev):
        try:
            with jax.default_device(dev):
                if lanes:
                    bs, rec, _stats = encode_sequence_lanes(
                        params, yuv, progress=progress, devices=[dev])
                else:
                    bs, rec = encode_sequence(params, yuv,
                                              progress=progress)
            results[i] = (bs, rec)
        except Exception as e:  # noqa: BLE001 - surfaced below
            errors.append((i, e))

    threads = [threading.Thread(
        target=run, args=(i, p, y, devices[i % len(devices)]))
        for i, (p, y) in enumerate(jobs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0][1]
    return results
