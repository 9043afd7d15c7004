"""thor_tpu: TPU-native Thor video codec framework.

Package layout:
- bitstream/config/frame/headers: host-side I/O and syntax
- spec/: exact integer reference kernels (numpy)
- ops/: JAX/XLA/Pallas device kernels, bit-exact with spec/
- dec/, enc/: decoder and encoder drivers
- parallel/: mesh sharding helpers (multi-stream / frame-parallel)
"""
import os as _os

import jax as _jax

# Integer-exact codec arithmetic requires real 64-bit lanes in a few
# places (dequant with weight matrices, CFL regressions).  All device
# kernels are written for int32/int16 hot paths; x64 only widens the
# few explicitly-int64 ops.
_jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache.  Env vars are not enough here: under the
# tunneled-TPU environment a sitecustomize imports jax at interpreter
# start, before any of our entry points can set JAX_COMPILATION_CACHE_DIR,
# so the config snapshot taken at import never sees it.  Setting the
# config directly works regardless of import order, and turns the
# multi-minute per-process TPU compiles of the big fused kernels into
# one-time costs.
try:
    from ._cache import cache_dir as _cache_dir

    # Default to a per-machine keyed directory (thor_tpu/_cache.py): a
    # cache populated on a different CPU makes the XLA AOT loader abort
    # the process, so a foreign cache must be invisible, not fatal.
    _dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _cache_dir()
    if _dir:
        _jax.config.update("jax_compilation_cache_dir", _dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           2.0)
except Exception:  # noqa: BLE001 - cache is an optimization only
    pass

__version__ = "0.1.0"
