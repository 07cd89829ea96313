"""Device compute kernels (JAX/XLA/Pallas).

Everything in this package is written TPU-first: batched over columns /
pairs / states so the MXU and VPU see large regular operations, static
shapes under jit, log-space float32 with explicit rescaling on the hot
paths and float64 available on CPU for golden-parity testing.
"""

import os

import jax

# Allow explicit float64/complex128 on host paths (parity tests, model math).
# Hot-path kernels request float32 explicitly, so TPU never sees f64 tensors.
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: kernel shapes recur across CLI runs
# (fills are bucketed for exactly this reason), so cold-start compiles are
# pure waste after the first run. HISTORIAN_JAX_CACHE=0 disables; any other
# value overrides the cache directory.
def _machine_key() -> str:
    """Cache-key the host CPU: XLA:CPU persists AOT executables whose key
    does not include machine features, so a cache written on one
    microarchitecture can SIGILL on another. Isolate per feature set."""
    import hashlib
    import platform

    tag = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag += line
                    break
    except OSError:
        pass
    return hashlib.sha1(tag.encode()).hexdigest()[:12]


_cache_dir = os.environ.get(
    "HISTORIAN_JAX_CACHE",
    os.path.join(
        os.path.expanduser("~"), ".cache", "historian_tpu", "xla-" + _machine_key()
    ),
)
if _cache_dir != "0":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # On CPU the 10s min-compile-time threshold keeps XLA:CPU kernels
    # (~0.1-3s compiles) out of the cache -- their AOT entries spam
    # feature-mismatch warnings on every load.  On accelerators EVERY
    # compile goes through a slow remote tunnel (measured 3-23s per DP
    # kernel shape, erratic), so cache all of them.  The default backend
    # is not resolvable this early (resolving it would boot the TPU
    # runtime); cli.py lowers the threshold once the platform is chosen,
    # and HISTORIAN_PLATFORM=tpu covers library users.
    _accel = os.environ.get("HISTORIAN_PLATFORM", "").lower() in ("tpu", "gpu")
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 0.3 if _accel else 10.0
    )
