"""Device execution of the production composition DP.

Bridges engine/forward.py (the host data model: profiles, PairHMM,
envelope) onto the banded scan kernel (ops/pairforward.py) so that the
flagship Forward fill -- the reference's hottest loop
(/root/reference/src/forward.cpp:78-203) -- runs on the accelerator for
chain-profile merges: every leaf x leaf merge, and EVERY merge in -fast
mode (COLLAPSE_CHAINS best-trace profiles are pure emit chains).

Shape discipline: profile sizes vary per merge and TPU compiles are
expensive through the remote tunnel, so grids are bucket-padded to
64-multiples (NEG emissions, False mask) -- a handful of compiled shapes
covers a whole reconstruction, and the padding rows/columns stay at NEG.

Enablement: HISTORIAN_DEVICE_DP=1 forces on, =0 forces off; default
"auto" uses the device exactly when JAX's default backend is an
accelerator (i.e. under `-platform tpu`).  dtype is float64 on CPU
(bit-for-bit comparable with the host fill's values) and float32 on
accelerators (TPU has no native f64).
"""

from __future__ import annotations

import os

import numpy as np

NEG = -1e30
#: readback threshold: kernel NEG-arithmetic leaves "impossible" cells far
#: below any reachable log-prob; restore them to -inf for the host walkers
NEG_CUTOFF = -1e25
BUCKET = 64


def enabled() -> bool:
    env = os.environ.get("HISTORIAN_DEVICE_DP", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    import jax

    return jax.default_backend() in ("tpu", "gpu")


def _bucket(n: int) -> int:
    return max(BUCKET, -(-n // BUCKET) * BUCKET)


def _clamp(a: np.ndarray, dtype) -> np.ndarray:
    """Finite NEG in place of -inf (the kernel's semiring zero)."""
    return np.where(np.isfinite(a), a, NEG).astype(dtype, copy=False)


def chain_forward_cells(dp) -> np.ndarray | None:
    """Run the Forward fill for a chain x chain DPMatrix on device.

    Returns the [x_size-1, y_size-1, 5] float64 cell tensor (host layout:
    value -inf at pruned/unreachable cells), or None when the profile
    pair is not a pure chain pair (the caller falls back to the host
    fill).  Emission tensors (absorb/rootsub/ins) and the envelope mask
    are reused from the DPMatrix precomputation; each chain's transition
    log-prob into a state is folded into every score of that state's row
    or column, which is exactly the reference recurrence restricted to
    single-in-edge states."""
    if dp.x_empty or dp.y_empty:
        return None
    ex = dp.x.as_chain()
    ey = dp.y.as_chain()
    if ex is None or ey is None:
        return None
    import jax
    import jax.numpy as jnp

    from historian_tpu.ops.pairforward import chain_pair_forward_cells, pack_transitions

    nx = dp.x_size - 1  # kernel rows: states 0..n (START + emits; END excluded)
    ny = dp.y_size - 1
    X1, Y1 = _bucket(nx), _bucket(ny)
    dtype = np.float64 if jax.default_backend() == "cpu" else np.float32

    tx = ex[:nx]  # transition lp into x state i (tx[0] = 0 for START)
    ty = ey[:ny]

    absorb = np.full((X1, Y1), NEG, dtype)
    absorb[:nx, :ny] = _clamp(dp.absorb[:nx, :ny] + tx[:, None] + ty[None, :], dtype)

    def pad1(vals, n, size):
        out = np.full(size, NEG, dtype)
        out[:n] = _clamp(vals, dtype)
        return out

    rsx = pad1(dp.rootsubx[:nx] + tx, nx, X1)
    isx = pad1(dp.insx[:nx] + tx, nx, X1)
    rsy = pad1(dp.rootsuby[:ny] + ty, ny, Y1)
    isy = pad1(dp.insy[:ny] + ty, ny, Y1)

    mask = np.zeros((X1, Y1), dtype=bool)
    mask[:nx, :ny] = dp.env_mask[:nx, :ny]
    x_ready = np.zeros(X1, dtype=bool)
    x_ready[:nx] = dp.x_ready[:nx]
    y_ready = np.zeros(Y1, dtype=bool)
    y_ready[:ny] = dp.y_ready[:ny]

    trans = _clamp(pack_transitions(dp.hmm), dtype)

    # materialize the full padded tensor, slice on host: an eager device
    # slice would compile a fresh XLA program per (padded, true) shape pair
    cells_full = np.asarray(
        chain_pair_forward_cells(
            jnp.asarray(absorb), jnp.asarray(rsx), jnp.asarray(rsy),
            jnp.asarray(isx), jnp.asarray(isy), jnp.asarray(mask),
            jnp.asarray(trans), jnp.asarray(x_ready), jnp.asarray(y_ready),
        )
    )
    cells = cells_full[:nx, :ny].astype(np.float64)
    return np.where(cells < NEG_CUTOFF, -np.inf, cells)
