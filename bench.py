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

#: flops per 5-state DP cell (see ops/pairforward.py recurrences): 23
#: transition adds + ~18 logaddexp at ~5 flops each.  The emission
#: einsum is NOT in the timed region (absorb is precomputed), so MFU
#: here describes the DP recurrence alone -- which is VPU work; the MXU
#: sits idle by design, and the bf16-peak MFU is honest about that.
DP_FLOPS_PER_CELL = 113
#: chip peak (dense bf16) for the MFU denominator, by device_kind
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops() -> float:
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return 197e12  # conservative default


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


def bench_production_col_kernel() -> float:
    """The SHIPPED column-major Forward kernel (ops/colforward.py, what
    `recon -platform tpu` runs for chain x DAG merges) at gp120 scale:
    SX=512 x SY=768, KY=8 in-edges, ~30% junction-ish structure.
    Returns state-cells/s steady-state (distinct inputs per rep,
    on-device reduction)."""
    import jax
    import jax.numpy as jnp

    from historian_tpu.ops.colforward import col_pair_forward_cells

    SX, SY, KY = 512, 768, 8
    dt = np.float32
    rng = np.random.default_rng(7)
    absorb_t = rng.normal(-5, 1, (SY, SX)).astype(dt)
    rsx = rng.normal(-2, 1, SX).astype(dt)
    isx = rng.normal(-2, 1, SX).astype(dt)
    rsy = rng.normal(-2, 1, SY).astype(dt)
    isy = rng.normal(-2, 1, SY).astype(dt)
    mask = np.ones((SY, SX), bool)
    trans = rng.normal(-1, 0.5, 23).astype(dt)
    x_ready = np.ones(SX, bool)
    x_eos = np.ones(SX, bool)
    # DAG y: mostly chain edges plus short-range skips and forks
    y_src = np.clip(
        np.arange(SY)[:, None] - 1 - rng.integers(0, 8, (SY, KY)), 0, None
    ).astype(np.int32)
    y_src[:, 0] = np.maximum(np.arange(SY) - 1, 0)
    y_lp = rng.normal(-1, 0.5, (SY, KY)).astype(dt)
    y_lp[:, 2:] = -1e30  # in-degree ~2 on average
    y_null = np.zeros(SY, bool)
    y_null[rng.choice(SY, SY // 20, replace=False)] = True
    y_ready = np.ones(SY, bool)

    args = [jnp.asarray(a) for a in (
        absorb_t, rsx, isx, rsy, isy, mask, trans, x_ready, x_eos,
        y_src, y_lp, y_null, y_ready)]
    red = jax.jit(lambda *a: col_pair_forward_cells(*a).sum())
    float(red(*args))  # compile + warm
    reps = 16
    t0 = time.perf_counter()
    accs = []
    for k in range(reps):
        args[0] = jnp.asarray(absorb_t + np.float32(1e-4 * (k + 1)))
        accs.append(red(*args))
    total = float(jnp.sum(jnp.stack(accs)))
    t1 = time.perf_counter()
    assert np.isfinite(total)
    return SX * SY * 5 * reps / (t1 - t0)


def bench_codon() -> float:
    """Headline kernel at codon scale (C*A = 61; the emission einsum --
    not timed here -- is where the MXU share grows).  Returns cells/s."""
    import jax
    import jax.numpy as jnp

    from historian_tpu.models.presets import named_model
    from historian_tpu.ops.pairforward import chain_pair_forward_arrays

    from historian_tpu.ops.pallas_pairforward import pallas_pair_forward_lp

    model = named_model("ECMrest")
    rng = np.random.RandomState(11)
    n_tok = model.alphabet.size
    xl = yl = 192
    batch = 32
    syms = [model.alphabet.symbol(i) for i in range(n_tok)]

    def random_codon_seq(n):
        return "".join(syms[i] for i in rng.randint(0, n_tok, size=n))

    arrs = [
        chain_pair_forward_arrays(
            model, random_codon_seq(xl), random_codon_seq(yl), 0.5, 0.5,
            dtype=np.float32,
        )[0]
        for _ in range(4)
    ]
    tile = batch // 4
    absorb = jnp.tile(jnp.stack([a[0] for a in arrs]), (tile, 1, 1))
    rsx = jnp.tile(jnp.stack([a[1] for a in arrs]), (tile, 1))
    rsy = jnp.tile(jnp.stack([a[2] for a in arrs]), (tile, 1))
    ix = jnp.tile(jnp.stack([a[3] for a in arrs]), (tile, 1))
    iy = jnp.tile(jnp.stack([a[4] for a in arrs]), (tile, 1))
    trans = arrs[0][6]

    @jax.jit
    def step(eps):
        return jnp.sum(pallas_pair_forward_lp(absorb + eps, rsx, rsy, ix, iy, trans))

    float(step(jnp.float32(0.0)))
    reps = 16
    t0 = time.perf_counter()
    accs = [step(jnp.float32(1e-4 * (k + 1))) for k in range(reps)]
    total = float(jnp.sum(jnp.stack(accs)))
    t1 = time.perf_counter()
    assert np.isfinite(total)
    return batch * (xl + 1) * (yl + 1) * 5 * reps / (t1 - t0)


def bench_fit_estep() -> float:
    """The fit/count hot loop (reference forward.cpp:1183-1214 analogue):
    Felsenstein up/down fill + eigencount contraction over alignment
    columns on device (parallel/pcounts, the -mesh production path).
    Returns column-cells/s = columns x branches x A^2 per second."""
    import jax
    from jax.sharding import Mesh

    from historian_tpu.models.presets import named_model
    from historian_tpu.core.tree import Tree
    from historian_tpu.parallel import pcounts

    model = named_model("lg")
    # a 31-node balanced tree with unit branches
    def nwk(depth):
        if depth == 0:
            nwk.i += 1
            return f"L{nwk.i}:0.3"
        return f"({nwk(depth - 1)},{nwk(depth - 1)}):0.3"
    nwk.i = 0
    tree = Tree(nwk(4) + ";")
    n_leaves = 16
    L = 1024
    rng = np.random.RandomState(5)
    alpha = model.alphabet.symbols
    row_sets = []
    for s in range(3):
        leaf_rows = ["".join(alpha[i] for i in rng.randint(0, 20, size=L))
                     for _ in range(n_leaves)]
        rows = []
        li = 0
        for n in range(tree.n_nodes()):
            if tree.is_leaf(n):
                rows.append(leaf_rows[li]); li += 1
            else:
                rows.append("*" * L)
        row_sets.append(rows)
    mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
    pcounts.sharded_alignment_eigen_counts(model, tree, row_sets[0], mesh)  # warm
    reps = 6
    t0 = time.perf_counter()
    for k in range(reps):
        c = pcounts.sharded_alignment_eigen_counts(model, tree, row_sets[k % 3], mesh)
    t1 = time.perf_counter()
    a = model.alphabet.size
    return L * (tree.n_nodes() - 1) * a * a * reps / (t1 - t0)


def main() -> None:
    device_rate = bench_device()
    try:
        baseline_rate = build_baseline()
    except Exception:
        baseline_rate = float("nan")
    vs = device_rate / baseline_rate if baseline_rate == baseline_rate else None
    flops = device_rate * DP_FLOPS_PER_CELL
    extras = {}
    for name, fn in (
        ("production_col_forward_cells_per_sec", bench_production_col_kernel),
        ("codon_pair_forward_cells_per_sec", bench_codon),
        ("fit_estep_cellsq_per_sec", bench_fit_estep),
    ):
        try:
            extras[name] = round(fn())
        except Exception as e:  # report, never break the headline line
            extras[name] = f"error: {type(e).__name__}: {e}"[:200]
    print(
        json.dumps(
            {
                "metric": "pair_forward_dp_cells_per_sec_per_chip",
                "value": round(device_rate),
                "unit": "cells/s",
                "vs_baseline": round(vs, 3) if vs is not None else None,
                "flops_per_sec": round(flops),
                "dp_flops_per_cell": DP_FLOPS_PER_CELL,
                "mfu_vs_bf16_peak": round(flops / _peak_flops(), 5),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
