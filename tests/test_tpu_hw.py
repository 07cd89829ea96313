"""Real-TPU hardware tier: compiled Mosaic/XLA kernels, not interpret
mode (tests/test_pallas.py covers semantics on CPU; CLAUDE.md's Mosaic
quirk list is proof that interpret mode misses real-TPU failures).

Run with `python -m pytest -m tpu tests/` on a TPU host.  Every test
drives a fresh subprocess WITHOUT the suite's forced-CPU config (the
conftest pins jax to CPU process-globally, so in-process TPU use is
impossible here) and skips when no TPU is reachable.

These tests trade coverage breadth for wall-clock: each subprocess pays
the ~10s remote-backend boot plus compiles, so they assert the
load-bearing device paths only -- the production Forward kernels
(chain / column-major / DAG) against the host f64 oracle, the pallas
batched kernel against the XLA scan kernel, and the band-compacted
scatter/gather IO.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

_PROBE_RESULT = {}


def _tpu_available() -> bool:
    if "ok" not in _PROBE_RESULT:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "assert any(x.platform == 'tpu' for x in d), d; print('TPU-OK')"],
            capture_output=True, text=True, timeout=180,
            env={k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"},
        )
        _PROBE_RESULT["ok"] = probe.returncode == 0 and "TPU-OK" in probe.stdout
    return _PROBE_RESULT["ok"]


def _run_on_tpu(body: str, timeout: int = 600) -> str:
    """Run a python snippet in a TPU-enabled subprocess; returns stdout."""
    if not _tpu_available():
        pytest.skip("no TPU device reachable")
    script = (
        "import sys, os\n"
        "sys.path.insert(0, '/root/repo')\n"
        "os.environ.pop('JAX_PLATFORMS', None)\n"
        "import historian_tpu.ops  # x64 + compile-cache config\n"
        "import jax\n"
        "assert jax.default_backend() == 'tpu', jax.default_backend()\n"
        + body
    )
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=timeout, env=env, cwd="/root/repo",
    )
    assert proc.returncode == 0, (proc.stdout[-1000:] + "\n" + proc.stderr[-3000:])
    return proc.stdout


def test_pallas_pair_forward_compiles_and_matches_scan():
    """The benched pallas kernel, COMPILED on real TPU, agrees with the
    XLA scan kernel (f32, both on device)."""
    out = _run_on_tpu(
        """
import numpy as np, jax.numpy as jnp
from historian_tpu.models.presets import named_model
from historian_tpu.ops.pairforward import chain_pair_forward_arrays, pair_forward
from historian_tpu.ops.pallas_pairforward import pallas_pair_forward_lp
model = named_model('lg')
rng = np.random.RandomState(0)
alpha = model.alphabet.symbols
mk = lambda n: ''.join(alpha[i] for i in rng.randint(0, 20, size=n))
arrs = [chain_pair_forward_arrays(model, mk(160), mk(160), .5, .5, dtype=np.float32)[0]
        for _ in range(8)]
absorb = jnp.stack([a[0] for a in arrs]); rsx = jnp.stack([a[1] for a in arrs])
rsy = jnp.stack([a[2] for a in arrs]); ix = jnp.stack([a[3] for a in arrs])
iy = jnp.stack([a[4] for a in arrs]); mask, trans = arrs[0][5], arrs[0][6]
lp_pallas = np.asarray(pallas_pair_forward_lp(absorb, rsx, rsy, ix, iy, trans))
import jax
lp_scan = np.asarray(jax.vmap(
    lambda a, r1, r2, j1, j2: pair_forward(a, r1, r2, j1, j2, mask, trans)[1]
)(absorb, rsx, rsy, ix, iy))
assert np.all(np.isfinite(lp_pallas)), lp_pallas
np.testing.assert_allclose(lp_pallas, lp_scan, rtol=2e-4, atol=2e-3)
print('PALLAS-MATCH', lp_pallas[:2])
"""
    )
    assert "PALLAS-MATCH" in out


def test_production_forward_kernels_on_tpu():
    """chain / column-major / DAG device fills on real TPU (f32) vs the
    host f64 oracle: lp_end within f32 tolerance, banded cells close."""
    out = _run_on_tpu(
        """
import numpy as np, os
from historian_tpu.core.seqs import read_fasta
from historian_tpu.engine.forward import ForwardMatrix
from historian_tpu.engine.pairhmm import PairHMM
from historian_tpu.engine.profile import Profile
from historian_tpu.models.ratemodel import ProbModel, RateModel
from historian_tpu.utils.rng import MT19937
from historian_tpu.ops import devicedp
model = RateModel.from_file('/root/reference/data/testamino.json')
seqs = read_fasta('/root/reference/data/gp120.fa')[:3]
for s in seqs: s.seq = s.seq[:120]
profs = [Profile.from_sequence(model.components, model.alphabet, s, i)
         for i, s in enumerate(seqs)]
hmm = PairHMM(ProbModel(model, .6), ProbModel(model, .4), model.ins_prob)
os.environ['HISTORIAN_DEVICE_DP'] = '0'
host01 = ForwardMatrix(profs[0], profs[1], hmm, 3)
p01 = host01.sample_profile(MT19937(5489), 10, 0)
hmm2 = PairHMM(ProbModel(model, .3), ProbModel(model, .7), model.ins_prob)
for name, x, y, fn in [
    ('chain', profs[0], profs[1], devicedp.chain_forward_cells),
    ('col', profs[2], p01, devicedp.col_forward_cells),
    ('dag', p01, profs[2], devicedp.dag_forward_cells),
]:
    os.environ['HISTORIAN_DEVICE_DP'] = '0'
    host = ForwardMatrix(x, y, hmm2, 4)
    os.environ['HISTORIAN_DEVICE_DP'] = '1'
    cells = fn(host)
    assert cells is not None, name
    hc = host.cells[: host.x_size - 1, : host.y_size - 1]
    both = np.isfinite(hc) & np.isfinite(cells)
    # f32 device vs f64 host: relative tolerance on in-band log-probs
    diff = np.abs(cells[both] - hc[both]) / np.maximum(1.0, np.abs(hc[both]))
    assert diff.max() < 1e-4, (name, diff.max())
    # no spurious finites where the host has none reachable
    assert np.isfinite(cells).sum() <= np.isfinite(hc).sum() + 0, name
    print('KERNEL-OK', name, float(diff.max()))
"""
    )
    assert out.count("KERNEL-OK") == 3


def test_band_io_roundtrip_on_tpu():
    """Band-compacted scatter/gather device IO: values survive the
    round trip exactly (f32 identity, no Mosaic lowering surprises)."""
    out = _run_on_tpu(
        """
import numpy as np, jax.numpy as jnp
from historian_tpu.ops.devicedp import _device_io, _mask_idx
rng = np.random.default_rng(3)
SX = SY = 256
mask = rng.random((SX, SY)) < 0.2
idx, n = _mask_idx(mask, SY, SX * SY)
vals = rng.normal(-10, 3, len(idx)).astype(np.float32)
scatter, gather = _device_io()
grid, m = scatter(jnp.asarray(vals), jnp.asarray(idx), SX, SY)
assert np.array_equal(np.asarray(m), mask)
cells = jnp.stack([grid] * 5, axis=-1)
back = np.asarray(gather(cells, jnp.asarray(idx)))
np.testing.assert_array_equal(back[:n, 0], vals[:n])
print('BAND-IO-OK')
"""
    )
    assert "BAND-IO-OK" in out


def test_pallas_col_ring_boundary_on_tpu():
    """The default-on pallas column kernel COMPILED on real TPU, at the
    VMEM-ring look-back boundary: in-edge distances of exactly RING-1
    (the longest the route admits) on a grid taller than the ring, so
    every gather wraps the scratch ring.  Compared against the compiled
    XLA column kernel on identical inputs (the routing gate in
    ops/devicedp.py admits maxdist <= RING-1 only)."""
    out = _run_on_tpu(
        """
import numpy as np, jax.numpy as jnp
from historian_tpu.ops.colforward import col_pair_forward_cells
from historian_tpu.ops.pallas_colforward import (
    RING, pallas_col_forward_cells)
NEG = np.float32(-1e30)
SX, SY, KY = 256, 512, 4
assert SY > RING  # ring must wrap
rng = np.random.default_rng(23)
for maxdist in (RING - 1, 63):
    absorb_t = rng.normal(-5, 1, (SY, SX)).astype(np.float32)
    rsx = rng.normal(-2, 1, SX).astype(np.float32)
    isx = rng.normal(-2, 1, SX).astype(np.float32)
    rsy = rng.normal(-2, 1, SY).astype(np.float32)
    isy = rng.normal(-2, 1, SY).astype(np.float32)
    mask = np.ones((SY, SX), bool)
    trans = rng.normal(-1, 0.5, 23).astype(np.float32)
    x_ready = np.ones(SX, bool)
    x_eos = np.ones(SX, bool)
    # chain edge + one edge at EXACTLY maxdist for every eligible row
    y_src = np.zeros((SY, KY), np.int32)
    y_lp = np.full((SY, KY), NEG, np.float32)
    y_src[:, 0] = np.maximum(np.arange(SY) - 1, 0)
    y_lp[:, 0] = rng.normal(-1, 0.5, SY)
    far = np.arange(SY) >= maxdist
    y_src[far, 1] = np.arange(SY)[far] - maxdist
    y_lp[far, 1] = rng.normal(-2, 0.5, far.sum())
    y_null = np.zeros(SY, bool)
    y_null[rng.choice(np.arange(1, SY), 20, replace=False)] = True
    y_ready = np.ones(SY, bool); y_ready[0] = False
    ref = np.asarray(col_pair_forward_cells(
        jnp.asarray(absorb_t), jnp.asarray(rsx), jnp.asarray(isx),
        jnp.asarray(rsy), jnp.asarray(isy), jnp.asarray(mask),
        jnp.asarray(trans), jnp.asarray(x_ready), jnp.asarray(x_eos),
        jnp.asarray(y_src), jnp.asarray(y_lp),
        jnp.asarray(y_null), jnp.asarray(y_ready)))
    y_flags = np.zeros((SY, 4), np.float32)
    y_flags[:, 0] = y_null; y_flags[:, 1] = y_ready
    y_flags[:, 2] = rsy; y_flags[:, 3] = isy
    xvec = np.stack([rsx, isx,
                     np.where(x_ready, 0.0, NEG).astype(np.float32),
                     np.where(x_eos, 0.0, NEG).astype(np.float32)])
    maskg = np.where(mask, 0.0, NEG).astype(np.float32)
    planes = np.asarray(pallas_col_forward_cells(
        jnp.asarray(y_src), jnp.asarray(y_lp), jnp.asarray(y_flags),
        jnp.asarray(absorb_t), jnp.asarray(maskg), jnp.asarray(xvec),
        jnp.asarray(trans)))
    got = np.moveaxis(planes, 0, -1)
    live = ref > -1e25
    assert np.all((got > -1e25) == live), maxdist
    np.testing.assert_allclose(got[live], ref[live], rtol=2e-5, atol=2e-3)
    print('RING-OK', maxdist, float(np.abs(got[live] - ref[live]).max()))
"""
    )
    assert out.count("RING-OK") == 2


def test_device_trace_fill_on_tpu():
    """The device-resident merge path (`-platform tpu` recon default):
    col-route fill kept on device + tracebacks walked on device
    (ops/tracedp).  lp_end and the BEST trace must match the host f64
    walk; sampled traces must be structurally valid paths whose cell
    values match the host fill."""
    out = _run_on_tpu(
        """
import numpy as np, os
from historian_tpu.core.seqs import read_fasta
from historian_tpu.engine.forward import ForwardMatrix
from historian_tpu.engine.pairhmm import PairHMM
from historian_tpu.engine.profile import Profile
from historian_tpu.models.ratemodel import ProbModel, RateModel
from historian_tpu.utils.rng import MT19937
model = RateModel.from_file('/root/reference/data/testamino.json')
seqs = read_fasta('/root/reference/data/gp120.fa')[:3]
for s in seqs: s.seq = s.seq[:150]
profs = [Profile.from_sequence(model.components, model.alphabet, s, i)
         for i, s in enumerate(seqs)]
hmm = PairHMM(ProbModel(model, .6), ProbModel(model, .4), model.ins_prob)
os.environ['HISTORIAN_DEVICE_DP'] = '0'
os.environ['HISTORIAN_DEVICE_TRACE'] = '0'
host01 = ForwardMatrix(profs[0], profs[1], hmm, 3)
p01 = host01.sample_profile(MT19937(5489), 10, 0)
hmm2 = PairHMM(ProbModel(model, .3), ProbModel(model, .7), model.ins_prob)
host = ForwardMatrix(profs[2], p01, hmm2, 4)
os.environ['HISTORIAN_DEVICE_DP'] = '1'
os.environ['HISTORIAN_DEVICE_TRACE'] = '1'
dev = ForwardMatrix(profs[2], p01, hmm2, 4, defer_cells=True)
assert dev._trace_handle is not None, 'col route did not stay resident'
assert abs(dev.lp_end - host.lp_end) < 1e-3 * max(1, abs(host.lp_end)), (
    dev.lp_end, host.lp_end)
paths = [dev._device_best_path()] + dev._device_traces(4, False, MT19937(11))
hc = host.cells
for path in paths:
    assert path[0][:2] == (0, 0) and path[-1] == dev.end_cell, path[:2]
    # every step a legal traceback candidate of the host DP, every
    # visited cell reachable in the host f64 fill, recorded values
    # within f32 tolerance of the host cells (an f32 device fill may
    # legitimately pick a different BEST path at near-ties, so the
    # assertion is validity + value agreement, not path identity)
    for a, b in zip(path[:-1], path[1:]):
        assert a in host.source_transitions_without_emit_or_absorb(b), (a, b)
    for c in path[:-1]:
        assert np.isfinite(hc[c[0], c[1], c[2]]), c
        assert abs(dev._trace_values[c] - hc[c[0], c[1], c[2]]) < 1e-3 * max(
            1, abs(hc[c[0], c[1], c[2]])), c
print('TRACE-OK', float(dev.lp_end), len(paths))
"""
    )
    assert "TRACE-OK" in out


def test_long_merge_vecmask_smallring_on_tpu():
    """The round-3 long-merge transports compiled on hardware: chain-y
    pallas ring=8, on-device envelope mask (vector form, no band-index
    upload), factored absorb matmul.  A 2000x2000 banded chain merge
    runs device-resident and its lp_end must match the host f64 fill."""
    out = _run_on_tpu(
        """
import numpy as np, os, time
from historian_tpu.core.alignpath import GuideAlignmentEnvelope
from historian_tpu.core.seqs import FastSeq
from historian_tpu.engine.forward import ForwardMatrix
from historian_tpu.engine.pairhmm import PairHMM
from historian_tpu.engine.profile import Profile
from historian_tpu.models.presets import named_model
from historian_tpu.models.ratemodel import ProbModel
from historian_tpu.ops import devicedp
model = named_model('lg')
rng = np.random.RandomState(3)
alpha = model.alphabet.symbols
L, W = 2000, 256
fx = FastSeq(name='x', seq=''.join(alpha[i] for i in rng.randint(0, 20, size=L)))
fy = FastSeq(name='y', seq=''.join(alpha[i] for i in rng.randint(0, 20, size=L)))
x = Profile.from_sequence(model.components, model.alphabet, fx, 0)
y = Profile.from_sequence(model.components, model.alphabet, fy, 1)
hmm = PairHMM(ProbModel(model, .5), ProbModel(model, .5), model.ins_prob)
ones = np.ones(L, dtype=bool)
env = GuideAlignmentEnvelope({0: ones, 1: ones}, 0, 1, W)
os.environ['HISTORIAN_DEVICE_DP'] = '0'
host = ForwardMatrix(x, y, hmm, 2, env)
os.environ['HISTORIAN_DEVICE_DP'] = '1'

def resident_fill():
    h = devicedp.col_forward_device(host)
    assert h is not None, 'resident route not taken'
    return h

# default route: ONE-SHOT (emission + mask + kernel in one dispatch)
h = resident_fill()
lp, traces = h.lp_end_and_traces(3, True, 7)
assert abs(lp - host.lp_end) < 1e-3 * max(1, abs(host.lp_end)), (lp, host.lp_end)
assert len(traces) == 4
t0 = time.time(); lpf = resident_fill().lp_end; oneshot_s = time.time() - t0
# multi-dispatch route (separate emission + maskgate + kernel jits)
os.environ['HISTORIAN_PALLAS_ONESHOT'] = '0'
h2 = resident_fill()
lp2 = h2.lp_end
assert abs(lp2 - host.lp_end) < 1e-3 * max(1, abs(host.lp_end)), (lp2, host.lp_end)
t0 = time.time(); lpu = resident_fill().lp_end; multi_s = time.time() - t0
print('LONGMERGE-OK', lp, host.lp_end, 'oneshot_s=%.3f multi_s=%.3f' % (oneshot_s, multi_s))
""",
        timeout=1800,
    )
    assert "LONGMERGE-OK" in out
    print(out.strip().splitlines()[-1])
