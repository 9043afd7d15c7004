"""Batched device quantizer (encoder adaptive-deadzone scalar quantizer).

Mirrors the reference `quantize` (enc/encode_block.c:84-160) exactly, for a
batch of coefficient blocks at once.  The sequential part of the reference -
the level-mode state threaded along the zigzag scan - is a two-state
automaton; we evaluate both candidate levels per position and resolve the
realized state with a log-depth associative scan over the per-position
state-transition maps, so the whole quantizer is data-parallel on the VPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import ZIGZAG, GQUANT, MAX_QUANT_SIZE, WEIGHT_SHIFT, log2i

def _zz_perms(qsize: int):
    zz = ZIGZAG[qsize]
    inv = np.argsort(zz)            # sc[pos] = flat[inv[pos]]
    return np.asarray(zz, np.int32), np.asarray(inv, np.int32)


def _compose(a, b):
    """Compose 2-state maps: result = b after a (a acts first).

    Maps are (m0, m1) int arrays: image of state 0 / state 1.
    """
    a0, a1 = a
    b0, b1 = b
    r0 = jnp.where(a0 == 0, b0, b1)
    r1 = jnp.where(a1 == 0, b0, b1)
    return r0, r1


@partial(jax.jit, static_argnames=("size", "intra_block", "weighted"))
def quantize_batch(coeff: jax.Array, qp, size: int, intra_block: int,
                   wmatrix: jax.Array | None = None,
                   weighted: bool = False):
    """Quantize a batch of transform blocks (enc/encode_block.c:84-160).

    coeff: [N, qsize, qsize] int16 transform output (qsize = min(16,size)).
    qp may be a traced scalar (the QP ladder varies per frame; tracing
    it keeps ONE compiled kernel per size instead of one per QP level).
    Returns (coeffq [N,qsize,qsize] int16, cbp [N] int32 0/1).
    """
    tr_log2size = log2i(size)
    qsize = min(MAX_QUANT_SIZE, size)
    n2 = qsize * qsize
    qp = jnp.asarray(qp, jnp.int32)
    scale = jnp.asarray(np.asarray(GQUANT, np.int32))[qp % 6]
    shift2 = 21 - tr_log2size + qp // 6 + (WEIGHT_SHIFT if weighted else 0)
    zz, inv = _zz_perms(qsize)
    inv_j = jnp.asarray(inv)

    c = coeff.reshape(coeff.shape[0], n2).astype(
        jnp.int64 if weighted else jnp.int32)
    if weighted:
        c = c * wmatrix.reshape(1, n2).astype(jnp.int64)
    sc = jnp.take(c, inv_j, axis=1)              # zigzag order [N, n2]
    absc = jnp.abs(sc)
    sign = jnp.where(sc < 0, -1, 1).astype(jnp.int32)
    a = absc * scale                             # scale*|c| per position

    # ---- last_pos (reverse deadzone scan, :117-124) ----
    off_r = (38 if intra_block else -26) << (shift2 - 8)
    lev_r = jnp.abs(a + off_r) >> shift2
    nz = lev_r != 0
    idx = jnp.arange(n2, dtype=jnp.int32)
    last_pos = jnp.max(jnp.where(nz, idx, -1), axis=1)   # [N]

    # ---- forward adaptive-deadzone scan (:129-155) as a 2-state
    # automaton: state = level_mode in {0,1} ----
    offset0 = 102 if intra_block else 51
    offset1 = 115 if intra_block else 90
    level0 = a >> shift2                          # no-offset probe
    # candidate levels for each assumed state
    off_s0 = jnp.where(level0 > 1, offset1, offset0) << (shift2 - 8)
    off_s1 = jnp.where(level0 > 0, offset1, offset0) << (shift2 - 8)
    lv0 = (a + off_s0) >> shift2                  # level if mode==0
    lv1 = (a + off_s1) >> shift2                  # level if mode==1
    # transition maps per position (positions past last_pos are identity)
    active = idx[None, :] <= last_pos[:, None]
    m0 = jnp.where(active, (lv0 > 1).astype(jnp.int32), 0)
    m1 = jnp.where(active, (lv1 != 0).astype(jnp.int32), 1)

    # state BEFORE position p = (t_{p-1} o ... o t_0)(1): exclusive scan.
    # associative_scan is inclusive; shift by one with identity at p=0.
    cm0, cm1 = jax.lax.associative_scan(_compose, (m0, m1), axis=1)
    state = jnp.concatenate(
        [jnp.ones((sc.shape[0], 1), jnp.int32), cm1[:, :-1]], axis=1)

    level = jnp.where(state == 1, lv1, lv0)
    level = jnp.where(active, level, 0)
    scq = sign * level
    cbp = jnp.any(scq != 0, axis=1).astype(jnp.int32)
    coeffq = jnp.take(scq, jnp.asarray(zz), axis=1).reshape(
        coeff.shape[0], qsize, qsize).astype(jnp.int16)
    return coeffq, cbp
