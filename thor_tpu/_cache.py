"""Per-machine JAX persistent compile-cache location.

XLA:CPU AOT blobs are compiled for the host's exact CPU features; a
cache directory populated on one machine and read on another makes the
loader abort ("Machine type ... doesn't match ... could lead to
SIGILL").  Keying the directory by a CPU-feature fingerprint makes a
foreign cache simply invisible instead of fatal.

Used by tests/conftest.py, bench.py and __graft_entry__.py.  The
THOR_JAX_CACHE_DIR env var overrides the location entirely (set it to
an empty string to disable persistent caching).
"""
import hashlib
import os
import platform


def machine_key(env=None) -> str:
    """Stable fingerprint of this host's CPU.

    Hashes the ENTIRE first-processor block of /proc/cpuinfo (model,
    stepping, microcode, feature flags, ...), not just the model name:
    cloud VMs all report a generic "Intel(R) Xeon(R) Processor" model
    while differing in enabled features, and a collision means XLA's
    AOT loader pulls in blobs compiled for a different CPU ("Machine
    type ... doesn't match ... could lead to SIGILL").  A key that is
    too fine only costs a cold cache; one that is too coarse crashes.
    """
    if env is None:
        env = os.environ
    parts = [platform.machine()]
    try:  # AOT blob format also depends on the compiler version
        from importlib.metadata import version
        parts.append("jaxlib=" + version("jaxlib"))
    except Exception:  # noqa: BLE001
        pass
    # Tunneled-device environments may compile REMOTELY (the device
    # host's CPU differs from this one), so processes with the tunnel
    # active must not share CPU AOT blobs with local-only processes.
    if env.get("PALLAS_AXON_POOL_IPS") and env.get(
            "PALLAS_AXON_REMOTE_COMPILE"):
        parts.append("axon-remote-compile")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # end of the first processor block
                if line.startswith(("processor", "apicid",
                                    "initial apicid", "core id",
                                    "cpu MHz", "bogomips")):
                    continue  # per-core or per-boot-volatile
                parts.append(line.strip())
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def cache_dir(env=None) -> str:
    if env is None:
        env = os.environ
    override = env.get("THOR_JAX_CACHE_DIR")
    if override is not None:
        return override
    return "/tmp/jaxcache-" + machine_key(env)


def setup_env(env=None) -> str:
    """Point JAX's persistent compile cache at the per-machine dir.

    Mutates `env` (default os.environ) and returns the directory, or ""
    if caching is disabled via THOR_JAX_CACHE_DIR="".
    """
    if env is None:
        env = os.environ
    d = cache_dir(env)
    if d:
        env["JAX_COMPILATION_CACHE_DIR"] = d
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    else:
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
    return d
