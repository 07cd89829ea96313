"""Device compute kernels (JAX/XLA/Pallas).

Everything in this package is written TPU-first: batched over columns /
pairs / states so the MXU and VPU see large regular operations, static
shapes under jit, log-space float32 with explicit rescaling on the hot
paths and float64 available on CPU for golden-parity testing.
"""

import jax

# Allow explicit float64/complex128 on host paths (parity tests, model math).
# Hot-path kernels request float32 explicitly, so TPU never sees f64 tensors.
jax.config.update("jax_enable_x64", True)
