#!/usr/bin/env python
"""Benchmark: pair-transducer Forward DP throughput on the accelerator.

Measures the flagship device kernel (historian_tpu.ops.pairforward:
5-state composed-transducer Forward fill, the hot loop of progressive
reconstruction -- reference forward.cpp:68-223) in f32, batched over a
fleet of protein-length pairs under the LG model, and compares against an
optimized single-core C++ re-creation of the reference's inner loop
(tools/bench_baseline.cpp, lookup-table LSE, -O3 -march=native) measured
on this same machine.

Prints ONE JSON line:
  {"metric": ..., "value": cells/s on accelerator, "unit": "cells/s",
   "vs_baseline": accelerator / single-core-C++}
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BATCH = 128  # sharp throughput peak on one chip: 64 -> 1.17e10, 128 -> 1.8e10, 160+ collapses (VMEM spill)
X_LEN = 384
Y_LEN = 384
REPS = 24
SEED_PAIRS = 8  # distinct real pairs; tiled to BATCH


def build_baseline() -> float:
    """Compile + run the C++ single-core baseline; returns cells/s."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "tools", "bench_baseline.cpp")
    exe = os.path.join(here, "tools", "bench_baseline")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", exe, src], check=True, capture_output=True
        )
    # 20-letter alphabet, 1 component, matching the device workload;
    # best of 3 runs (this host's scheduling noise easily halves one run)
    best = 0.0
    for _ in range(3):
        out = subprocess.run(
            [exe, str(X_LEN), str(Y_LEN), "20", "1", "3"],
            check=True, capture_output=True, text=True, timeout=600,
        )
        best = max(best, float(out.stdout.strip()))
    return best


def bench_device() -> float:
    """Measure the fastest device pair-forward kernel.

    Timing protocol (the accelerator sits behind an async dispatch layer,
    so naive block_until_ready loops can under- or over-state wildly):
    every iteration gets DISTINCT inputs (a per-iteration emission shift,
    defeating any result caching along the dispatch path), all REPS
    results are reduced into one scalar on device (a data dependency on
    every iteration), and the clock stops only after that scalar reaches
    the host.  The single device->host round trip is amortised over REPS.
    """
    import jax
    import jax.numpy as jnp

    from historian_tpu.models.presets import named_model
    from historian_tpu.ops.pairforward import chain_pair_forward_arrays, pair_forward

    model = named_model("lg")
    rng = np.random.RandomState(42)
    alpha = model.alphabet.symbols

    def random_seq(n):
        return "".join(alpha[i] for i in rng.randint(0, 20, size=n))

    pairs = []
    for _ in range(SEED_PAIRS):
        a, _ = chain_pair_forward_arrays(
            model, random_seq(X_LEN), random_seq(Y_LEN), 0.5, 0.5, dtype=np.float32
        )
        pairs.append(a)
    tile = BATCH // SEED_PAIRS
    absorb = jnp.tile(jnp.stack([a[0] for a in pairs]), (tile, 1, 1))
    rsx = jnp.tile(jnp.stack([a[1] for a in pairs]), (tile, 1))
    rsy = jnp.tile(jnp.stack([a[2] for a in pairs]), (tile, 1))
    ix = jnp.tile(jnp.stack([a[3] for a in pairs]), (tile, 1))
    iy = jnp.tile(jnp.stack([a[4] for a in pairs]), (tile, 1))
    mask = pairs[0][5]
    trans = pairs[0][6]

    def scan_kernel(a, rx, ry, jx, jy):
        def one(ab, r1, r2, j1, j2):
            _, lp = pair_forward(ab, r1, r2, j1, j2, mask, trans)
            return lp

        return jax.vmap(one)(a, rx, ry, jx, jy)

    def pallas_kernel(a, rx, ry, jx, jy):
        from historian_tpu.ops.pallas_pairforward import pallas_pair_forward_lp

        return pallas_pair_forward_lp(a, rx, ry, jx, jy, trans)

    def measure(kernel, reps=REPS) -> float:
        @jax.jit
        def step(eps):
            # eps shifts every emission: distinct inputs per iteration
            return jnp.sum(kernel(absorb + eps, rsx, rsy, ix, iy))

        warm = float(step(jnp.float32(0.0)))  # compile + sanity
        assert np.isfinite(warm), "non-finite forward likelihoods"
        t0 = time.perf_counter()
        accs = [step(jnp.float32(1e-4 * (k + 1))) for k in range(reps)]
        total = float(jnp.sum(jnp.stack(accs)))  # blocks on every iteration
        t1 = time.perf_counter()
        assert np.isfinite(total)
        cells = BATCH * (X_LEN + 1) * (Y_LEN + 1) * 5 * reps
        return cells / (t1 - t0)

    try:
        import historian_tpu.ops.pallas_pairforward as pp

        # throwaway pass: the first measurement in a process understates
        # by ~40% (dispatch-path warm-up), which would otherwise bias the
        # group sweep toward whatever ran later
        try:
            pp.GROUP = 32
            pp.pallas_pair_forward_lp.clear_cache()
            measure(pallas_kernel)
        except Exception:
            pass
        best, best_group = 0.0, None
        for group in (32, 16, 8):
            try:
                pp.GROUP = group
                pp.pallas_pair_forward_lp.clear_cache()
                rate = measure(pallas_kernel)
            except Exception:
                continue
            if rate > best:
                best, best_group = rate, group
        if best_group is not None:
            pp.GROUP = best_group
            pp.pallas_pair_forward_lp.clear_cache()
            best = max(
                best,
                measure(pallas_kernel, reps=4 * REPS),
                measure(pallas_kernel, reps=4 * REPS),
            )
            return best
    except Exception:
        pass
    measure(scan_kernel)  # throwaway warm pass
    return max(measure(scan_kernel, reps=4 * REPS) for _ in range(3))


def main() -> None:
    device_rate = bench_device()
    try:
        baseline_rate = build_baseline()
    except Exception:
        baseline_rate = float("nan")
    vs = device_rate / baseline_rate if baseline_rate == baseline_rate else None
    print(
        json.dumps(
            {
                "metric": "pair_forward_dp_cells_per_sec_per_chip",
                "value": round(device_rate),
                "unit": "cells/s",
                "vs_baseline": round(vs, 3) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
