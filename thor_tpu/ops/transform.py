"""Batched integer transforms on device (MXU-friendly).

Bit-exact with spec.transform_quant; validated by tests/test_ops_vs_spec.py.

The integer DCT stages are int32 matmuls.  To keep the MXU in play with
exact arithmetic, `_exact_dot` optionally splits int operands into 8-bit
limbs and uses float32 matmuls whose partial sums stay below 2^24
(exact-in-f32); the default path uses lax.dot_general on int32, which XLA
lowers natively.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import TRANSFORM_TABLES, GDEQUANT, MAX_QUANT_SIZE, log2i

_T = {s: jnp.asarray(np.array(t, np.int32))
      for s, t in TRANSFORM_TABLES.items()}


def _dot_int(a, b):
    """Plain int32 matmul (XLA lowers off the MXU; kept for reference)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _dot(a, b):
    """Exact int matmul via split-limb bf16 MXU matmuls.

    a: int32 values in int16 range; b: int32 transform matrix (|b|<=90,
    exact in bf16).  Split a into signed-high/unsigned-low 8-bit limbs;
    each bf16 product is exact and the f32 accumulation of <=32 terms
    stays below 2^24, so both partial matmuls are integer-exact.  The
    limb recombination runs in int32 on the VPU.
    """
    dn = (((a.ndim - 1,), (0,)), ((), ()))
    hi = (a >> 8).astype(jnp.bfloat16)          # [-128, 127]
    lo = (a & 0xFF).astype(jnp.bfloat16)        # [0, 255]
    bb = b.astype(jnp.bfloat16)
    phi = jax.lax.dot_general(hi, bb, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    plo = jax.lax.dot_general(lo, bb, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    return (phi.astype(jnp.int32) << 8) + plo.astype(jnp.int32)


def _i16(x):
    """Wrap to int16 like a C (int16_t) cast, staying in int32."""
    return ((x + 32768) & 0xFFFF) - 32768


@partial(jax.jit, static_argnames=("size", "bitdepth"))
def inv_transform_batch(coeff: jax.Array, size: int, bitdepth: int = 8):
    """Inverse transform a batch of blocks.

    coeff: [B, size, size] int32 (int16-range values; only the top-left
    min(16,size)^2 nonzero).  Returns [B, size, size] int32 residuals.
    Mirrors spec.transform_quant.transform_inv.
    """
    if size >= 64:
        scale = size // 32
        blk = inv_transform_batch(coeff[:, :32, :32], 32, bitdepth)
        return jnp.repeat(jnp.repeat(blk, scale, axis=1), scale, axis=2)
    qsize = min(size, MAX_QUANT_SIZE)
    T = _T[size][:qsize]                      # [qsize, size]
    c = coeff[:, :qsize, :qsize]              # [B, qsize, qsize]
    shift_2 = 20 - bitdepth
    add_2 = 1 << (shift_2 - 1)
    # stage 1: tmp[b,i,j] = clip((sum_k T[k,j] * c[b,k,i] + 64) >> 7)
    tmp = jnp.clip((_dot(c.transpose(0, 2, 1), T) + 64) >> 7, -32768, 32767)
    # stage 2: out[b,i,j] = clip((sum_k T[k,j] * tmp[b,k,i] + a2) >> s2)
    out = jnp.clip((_dot(tmp.transpose(0, 2, 1), T) + add_2) >> shift_2,
                   -32768, 32767)
    return out


@partial(jax.jit, static_argnames=("size", "fast", "bitdepth"))
def fwd_transform_batch(block: jax.Array, size: int, fast: bool = False,
                        bitdepth: int = 8):
    """Forward transform a batch of residual blocks.

    block: [B, size, size] int32.  Returns [B, qsize, qsize] int32 coeffs.
    Mirrors spec.transform_quant.transform_fwd (C-path arithmetic).
    """
    qsize = min(size, MAX_QUANT_SIZE)
    size1 = size
    scale = 1
    inb = block
    lim = 32 >> int(fast)
    if size > lim:
        size1 = lim
        scale = size // size1
        s = inb.reshape(-1, size1, scale, size1, scale)
        acc = jnp.zeros((inb.shape[0], size1, size1), jnp.int32)
        for m in range(scale):
            for n in range(scale):
                acc = jnp.clip(acc + s[:, :, m, :, n], -16384, 16383)
        inb = acc
    T = _T[size1]
    shift_1 = log2i(size) + log2i(scale) + bitdepth - 8
    add_1 = 1 << (shift_1 - 1)
    shift_2 = log2i(size1) + 5
    add_2 = 1 << (shift_2 - 1)
    # Stage stores saturate to int16 (normative SIMD pack, see spec).
    # stage 1: tmp[b,i,j] = sum_k T[i,k]*in[b,j,k]; computed as [b,j,i]
    tmpT = jnp.clip((_dot(inb, T[:qsize].T) + add_1) >> shift_1,
                    -32768, 32767)                              # [b,j,i]
    tmp = tmpT.transpose(0, 2, 1)                               # [b,i,j]
    # stage 2: coeff[b,i,j] = sum_k T[i,k]*tmp[b,j,k]; via [b,j,i] + T
    coeffT = jnp.clip((_dot(tmp, T[:qsize].T) + add_2) >> shift_2,
                      -32768, 32767)                            # [b,j,i]
    return coeffT.transpose(0, 2, 1)


@partial(jax.jit, static_argnames=("size", "qp", "weighted"))
def dequantize_batch(coeff: jax.Array, qp: int, size: int,
                     iwmatrix: jax.Array | None = None,
                     weighted: bool = False):
    """Dequantize a batch: [B,qsize,qsize] int32 -> [B,size,size] int32.
    Mirrors spec.transform_quant.dequantize."""
    tr_log2size = log2i(size)
    lshift = qp // 6
    qsize = min(size, MAX_QUANT_SIZE)
    rshift = tr_log2size - 1 + (6 if weighted else 0)
    scale = int(GDEQUANT[qp % 6])
    c = coeff[:, :qsize, :qsize].astype(jnp.int64)
    if weighted:
        c = c * iwmatrix[None, :qsize, :qsize].astype(jnp.int64)
    if lshift >= rshift:
        r = (c * scale) << (lshift - rshift)
    else:
        add = 1 << (rshift - lshift - 1)
        r = (c * scale + add) >> (rshift - lshift)
    r = _i16(r.astype(jnp.int32))
    out = jnp.zeros((coeff.shape[0], size, size), jnp.int32)
    return out.at[:, :qsize, :qsize].set(r)


@jax.jit
def reconstruct_batch(res: jax.Array, pred: jax.Array, bitdepth: int = 8):
    """saturate(res + (int16)pred) over any matching shapes."""
    return jnp.clip(res + _i16(pred), 0, (1 << bitdepth) - 1)
