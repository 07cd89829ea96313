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

BATCH = 32
X_LEN = 384
Y_LEN = 384
REPS = 5


def build_baseline() -> float:
    """Compile + run the C++ single-core baseline; returns cells/s."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "tools", "bench_baseline.cpp")
    exe = os.path.join(here, "tools", "bench_baseline")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-o", exe, src], check=True, capture_output=True
        )
    # 20-letter alphabet, 1 component, matching the device workload
    out = subprocess.run(
        [exe, str(X_LEN), str(Y_LEN), "20", "1", "3"],
        check=True, capture_output=True, text=True, timeout=600,
    )
    return float(out.stdout.strip())


def bench_device() -> float:
    import jax
    import jax.numpy as jnp

    from historian_tpu.models.presets import named_model
    from historian_tpu.ops.pairforward import chain_pair_forward_arrays, pair_forward

    model = named_model("lg")
    rng = np.random.RandomState(42)
    alpha = model.alphabet.symbols

    def random_seq(n):
        return "".join(alpha[i] for i in rng.randint(0, 20, size=n))

    # one representative arg set; batch by stacking emission tensors
    args0, _ = chain_pair_forward_arrays(model, random_seq(X_LEN), random_seq(Y_LEN), 0.5, 0.5, dtype=np.float32)

    def stack(template, batch):
        return [jnp.stack([a] * batch) for a in template[:5]]

    batched = []
    for b in range(BATCH):
        a, _ = chain_pair_forward_arrays(
            model, random_seq(X_LEN), random_seq(Y_LEN), 0.5, 0.5, dtype=np.float32
        )
        batched.append(a)
    absorb = jnp.stack([a[0] for a in batched])
    rsx = jnp.stack([a[1] for a in batched])
    rsy = jnp.stack([a[2] for a in batched])
    ix = jnp.stack([a[3] for a in batched])
    iy = jnp.stack([a[4] for a in batched])
    mask = args0[5]
    trans = args0[6]

    @jax.jit
    def run(absorb, rsx, rsy, ix, iy):
        def one(a, rx, ry, jx, jy):
            _, lp = pair_forward(a, rx, ry, jx, jy, mask, trans)
            return lp

        return jax.vmap(one)(absorb, rsx, rsy, ix, iy)

    # warmup / compile
    run(absorb, rsx, rsy, ix, iy).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        lps = run(absorb, rsx, rsy, ix, iy)
    lps.block_until_ready()
    t1 = time.perf_counter()
    assert np.all(np.isfinite(np.asarray(lps))), "non-finite forward likelihoods"
    cells = BATCH * (X_LEN + 1) * (Y_LEN + 1) * 5 * REPS
    return cells / (t1 - t0)


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
