"""Exact bit-counting of the coefficient syntax, batched on device.

`coeff_bits_batch` returns, for a batch of quantized blocks, exactly the
number of bits `enc.writer.write_coeff` (reference enc/write_bits.c:145-242)
would emit - without touching a bitstream.  This is what lets the encoder's
RDO cost (SSD + lambda*bits) be evaluated entirely on the TPU.

The reference's scan is a sequential two-mode walk (level mode / run mode
with an adaptive VLC table).  Per zigzag position the walk is a small
automaton; the realized state chain is resolved with a log-depth
associative scan over per-position state-transition maps, with the emitted
bit counts accumulated per hypothetical entry state:

  state s in [0,8): mode = s&1 (0=level mode, 1=run mode),
                    va   = (s>>1)&1 (adaptive VLC table),
                    fb   = (s>>2)&1 (the current zero-run began with a
                           level-mode zero, which consumed one zero symbol)

Run lengths at run-mode nonzeros are `zeros-before - fb`, with the
zeros-before distance computed independently of the state chain.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAX_QUANT_SIZE = 16


def _log2i(v):
    """floor(log2(v)) for v >= 1 (int32)."""
    return 31 - jax.lax.clz(v.astype(jnp.int32))


def len_vlc01(va, cn):
    """Length put_vlc(va, cn) for tables 0/1 (va in {0,1} per element)."""
    # table 0: cn<5 -> 1+cn ; else 6 + 2*log2i(cn-4)
    l0 = jnp.where(cn < 5, 1 + cn, 6 + 2 * _log2i(jnp.maximum(cn - 4, 1)))
    # table 1: cn<10 -> 2+(cn>>1) ; else 5 + 2*log2i(cn-8)
    l1 = jnp.where(cn < 10, 2 + (cn >> 1),
                   5 + 2 * _log2i(jnp.maximum(cn - 8, 1)))
    return jnp.where(va == 0, l0, l1)


def len_vlc6(cn):
    """Length put_vlc(6, cn)."""
    cn1 = cn + 1  # the table-6 remap (bitstream.py:106-108)
    return jnp.where(cn == 0, 2,
                     jnp.where(cn1 < 20, 3 + (cn1 >> 2),
                               4 + 2 * _log2i(jnp.maximum(cn1 - 16, 1))))


def len_vlc10(cn):
    """Length put_vlc(10, cn)."""
    return 1 + 2 * _log2i(cn + 1)


def len_vlc0_signed(level, sign_neg):
    """Length of the level suffix for run-mode levels > 1:
    put_vlc(0, (level-2)*2 + sign)."""
    cn = (level - 2) * 2 + sign_neg
    return len_vlc01(jnp.zeros_like(cn), cn)


def _gather8(tbl, sel):
    """tbl[..., sel] for an 8-entry last axis, as a select chain.

    take_along_axis lowers to a lane-crossing dynamic gather, which the
    TPU executes (de)vectorized - it dominated the whole decide pass
    (~540 ms/frame at 1080p just for this op).  Eight broadcast selects
    are pure VPU elementwise work and fuse into the scan.
    """
    r = tbl[..., 0:1]
    for k in range(1, 8):
        r = jnp.where(sel == k, tbl[..., k:k + 1], r)
    return r


def _compose8(a, b):
    """(next[...,8], bits[...,8]) map composition: a acts first."""
    an, ab = a
    bn, bb = b
    rn = _gather8(bn, an)
    rb = ab + _gather8(bb, an)
    return rn, rb


@partial(jax.jit, static_argnames=("size", "chroma", "intra"))
def coeff_bits_batch(sc: jax.Array, size: int, chroma: int, intra: int):
    """Exact write_coeff bit count for a batch of blocks.

    sc: [N, n2] SIGNED quantized levels in zigzag scan order
        (n2 = qsize*qsize, qsize = min(16, size)).
    Returns bits [N] int32.  Only meaningful for blocks with cbp != 0
    (the writer is never invoked otherwise); all-zero rows return the
    epilogue-only count, callers mask by cbp.
    """
    qsize = min(MAX_QUANT_SIZE, size)
    n2 = qsize * qsize
    assert sc.shape[-1] == n2
    N = sc.shape[0]
    vlc_adaptive0 = 1 if (intra and not chroma) else 0
    eob_pos = 0 if chroma else 2
    use_vlc10 = bool(chroma and size <= 8)

    lev = jnp.abs(sc).astype(jnp.int32)
    sgn = (sc < 0).astype(jnp.int32)
    idx = jnp.arange(n2, dtype=jnp.int32)
    nz = lev > 0
    last_pos = jnp.max(jnp.where(nz, idx, -1), axis=1)          # [N]

    # zeros-before: distance to the previous nonzero minus one
    prev_nz = jax.lax.associative_scan(
        jnp.maximum, jnp.where(nz, idx, -1), axis=1)            # inclusive
    prev_nz = jnp.concatenate(
        [jnp.full((N, 1), -1, prev_nz.dtype), prev_nz[:, :-1]], axis=1)
    zbefore = idx[None, :] - prev_nz - 1                        # [N, n2]

    def run_len(code):
        return len_vlc10(code) if use_vlc10 else len_vlc6(code)

    # ---- per-position transition maps over the 8 states ----
    states = jnp.arange(8, dtype=jnp.int32)
    mode = states & 1          # 0 = level mode, 1 = run mode
    va = (states >> 1) & 1
    fb = (states >> 2) & 1

    levB = lev[:, :, None]     # [N, n2, 1]
    sgnB = sgn[:, :, None]
    zB = zbefore[:, :, None]
    is_nz = levB > 0

    # level mode emission/transition (applies where mode==0)
    l_bits = len_vlc01(va[None, None, :], levB) + is_nz.astype(jnp.int32)
    va_next_l = (levB > 3).astype(jnp.int32) if not chroma \
        else jnp.broadcast_to(va[None, None, :], l_bits.shape)
    # next state: nonzero -> stay level mode; zero -> run mode with fb=1
    l_next = jnp.where(is_nz, va_next_l << 1,
                       (va_next_l << 1) | 1 | (1 << 2))

    # run mode: zeros are free; nonzeros emit run+level codes
    run = zB - fb[None, None, :]
    interval = 5
    cn = jnp.where(levB == 1, (run * interval) // (interval - 1),
                   run * interval + interval - 1)
    r_bits = run_len(cn + (cn >= eob_pos).astype(jnp.int32)) + \
        jnp.where(levB > 1, len_vlc0_signed(levB, sgnB), 1)
    r_bits = jnp.where(is_nz, r_bits, 0)
    # next: lev>1 -> level mode; lev==1 -> run mode, fb=0; zero -> unchanged
    r_next = jnp.where(
        levB > 1, va[None, None, :] << 1,
        jnp.where(is_nz, (va[None, None, :] << 1) | 1,
                  states[None, None, :]))

    t_next = jnp.where((mode == 0)[None, None, :], l_next, r_next)
    t_bits = jnp.where((mode == 0)[None, None, :], l_bits, r_bits)
    # positions past last_pos: identity, no bits
    act = (idx[None, :] <= last_pos[:, None])[:, :, None]
    t_next = jnp.where(act, t_next, states[None, None, :])
    t_bits = jnp.where(act, t_bits, 0)

    cn_, cb_ = jax.lax.associative_scan(_compose8, (t_next, t_bits), axis=1)
    final_next, final_bits = cn_[:, -1, :], cb_[:, -1, :]

    # entry state: level mode, va = vlc_adaptive0, fb irrelevant
    entry = vlc_adaptive0 << 1
    fstate = final_next[:, entry]
    bits = final_bits[:, entry]

    # ---- epilogue (write_bits.c:234-241) ----
    pos_end = last_pos + 1
    in_level = (fstate & 1) == 0
    fva = (fstate >> 1) & 1
    extra = jnp.where((pos_end < n2) & in_level,
                      len_vlc01(fva, jnp.zeros_like(fva)), 0)
    pos_end = pos_end + ((pos_end < n2) & in_level).astype(jnp.int32)
    eobl = run_len(jnp.full((N,), eob_pos, jnp.int32))
    extra = extra + jnp.where(pos_end < n2, eobl, 0)
    bits = bits + extra

    # ---- chroma prologue (write_bits.c:161-169) ----
    if chroma:
        special = (last_pos == 0) & (lev[:, 0] == 1)
        bits = jnp.where(special, 2, bits + 1)
    return bits
