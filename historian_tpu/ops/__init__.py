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
_cache_dir = os.environ.get(
    "HISTORIAN_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "historian_tpu", "xla"),
)
if _cache_dir != "0":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # default threshold (1s) would skip the many ~100ms CPU kernels
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
