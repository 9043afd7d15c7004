"""TPU compute path: JAX/XLA (+Pallas) kernels, bit-exact with thor_tpu.spec.

Design (TPU-first, not a C translation):
- transforms are batched matmuls over blocks -> MXU
- MC is separable filtering over gathered windows, batched over blocks
- loop filters are vectorized whole-frame ops (they are non-recursive
  per pass, see spec.filters)
- all arithmetic is integer (int32); exactness is enforced by tests
  against the spec layer
"""
