"""thor_tpu: TPU-native Thor video codec framework.

Package layout:
- bitstream/config/frame/headers: host-side I/O and syntax
- spec/: exact integer reference kernels (numpy)
- ops/: JAX/XLA/Pallas device kernels, bit-exact with spec/
- dec/, enc/: decoder and encoder drivers
- parallel/: mesh sharding helpers (multi-stream / frame-parallel)
"""
import jax as _jax

# Integer-exact codec arithmetic requires real 64-bit lanes in a few
# places (dequant with weight matrices, CFL regressions).  All device
# kernels are written for int32/int16 hot paths; x64 only widens the
# few explicitly-int64 ops.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
