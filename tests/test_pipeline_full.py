"""Full decode pipeline (MC + transform + recon + deblock/CDEF/CLPF on
device) cross-checked bit-exactly against the spec-layer chain."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("bd,qp", [(8, 32), pytest.param(10, 35, marks=pytest.mark.slow)])
def test_decode_p_frame_420_vs_spec_chain(bd, qp):
    from thor_tpu.models.pipeline import decode_p_frame_420, make_example_full
    from thor_tpu.spec import filters as SF
    from thor_tpu.ops.mc import mc_luma_tiles, mc_chroma_tiles
    from thor_tpu.ops.transform import (inv_transform_batch,
                                        dequantize_batch, reconstruct_batch)
    from thor_tpu.tables import CHROMA_QP

    H, W = 96, 128
    args, dd, presets = make_example_full(H, W, qp, bitdepth=bd)
    y, u, v = decode_p_frame_420(*args, height=H, width=W, qp=qp,
                                 bitdepth=bd,
                                 platform=jax.default_backend(),
                                 clpf_strengths=(2, 1, 4),
                                 cdef_damping=(6, 5))
    y, u, v = np.asarray(y), np.asarray(u), np.asarray(v)

    (refy, refu, refv, oy, ox, fv, fh, coy, cox, cfv, cfh,
     cy_, cu_, cv_, *_rest) = args

    def t2f(t, h, w, ts):
        return (t.reshape(h // ts, w // ts, ts, ts)
                .transpose(0, 2, 1, 3).reshape(h, w))

    qpc = int(CHROMA_QP[qp])
    py = mc_luma_tiles(refy, oy, ox, fv, fh, tile=16, bitdepth=bd)
    pu = mc_chroma_tiles(refu, coy, cox, cfv, cfh, tile=8, bitdepth=bd)
    pv = mc_chroma_tiles(refv, coy, cox, cfv, cfh, tile=8, bitdepth=bd)
    ry = inv_transform_batch(dequantize_batch(cy_, qp, 16), 16, bd)
    ru = inv_transform_batch(dequantize_batch(cu_, qpc, 8), 8, bd)
    rv = inv_transform_batch(dequantize_batch(cv_, qpc, 8), 8, bd)
    ey = t2f(np.asarray(reconstruct_batch(ry, py, bd)), H, W, 16)
    eu = t2f(np.asarray(reconstruct_batch(ru, pu, bd)), H // 2, W // 2, 8)
    ev = t2f(np.asarray(reconstruct_batch(rv, pv, bd)), H // 2, W // 2, 8)
    ey, eu, ev = (a.astype(np.int32) for a in (ey, eu, ev))
    SF.deblock_frame_y(ey, dd, W, H, qp, bd)
    SF.deblock_frame_uv(eu, ev, dd, W, H, qpc, 1, bd)
    for pr in presets:
        pr.setdefault("skip_condition", 0)
    dirs_out = {}
    SF.cdef_frame(ey, dd, W, H, 0, 1, bd, presets, [6, 5], dirs_out)
    SF.cdef_frame(eu, dd, W, H, 1, 1, bd, presets, [6, 5], dirs_out)
    SF.cdef_frame(ev, dd, W, H, 2, 1, bd, presets, [6, 5], dirs_out)
    SF.clpf_frame(ey, dd, W, 0, 2, 7, bd, qp, 1, decision_bits=None)
    SF.clpf_frame(eu, dd, W, 1, 1, 4, bd, qp, 1, decision_bits=None)
    SF.clpf_frame(ev, dd, W, 2, 4, 4, bd, qp, 1, decision_bits=None)
    assert (y == ey).all()
    assert (u == eu).all()
    assert (v == ev).all()
