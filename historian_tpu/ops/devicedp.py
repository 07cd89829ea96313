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
#: HISTORIAN_DEVICE_DP_TIME=1 prints per-merge device fill timings to stderr
TIMING = os.environ.get("HISTORIAN_DEVICE_DP_TIME", "0") == "1"

#: last col-route fill's wall split, (prep_s, dispatch_s, readback_s),
#: recorded unconditionally (bench.py reports it per merge)
LAST_SPLIT: tuple = (0.0, 0.0, 0.0)


def enabled() -> bool:
    env = os.environ.get("HISTORIAN_DEVICE_DP", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    import jax

    accel = backend_kind() in ("tpu", "gpu")
    if accel:
        # library users reach device kernels without going through
        # cli.py's platform handling: make sure every tunnel compile is
        # persisted (see ops/__init__.py for the threshold rationale)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        # overlap the (possibly congested) dispatch probe with the host
        # stages that precede the first routing decision -- but never
        # UPGRADE an armed-passive attach: under arming, the probe (and
        # the tunnel handshake it implies) starts only from a signal
        # that work could actually route to the device (big-input
        # prefetch, a clearly-winning merge)
        if _ATTACH_STATE != "armed":
            start_dispatch_probe_async()
    return accel


_DISPATCH_OVERHEAD: float | None = None

#: host OpenMP fill throughput, state-cells/s (measured: BENCH_r02
#: production baseline 3.65e7; wavefront fills since measure up to 8e7 --
#: the conservative end keeps borderline merges on the device only when
#: they clearly win)
HOST_FILL_RATE = 4e7
#: effective round trips a device merge pays beyond the raw dispatch:
#: factored-emission upload, fill dispatch, lp_end gather, trace
#: dispatch, visited-cell readback (measured fixed part ~0.18s per
#: resident merge against a ~28ms raw RPC, after the vector-mask +
#: factored-absorb transport removed all O(band) uploads)
MERGE_ROUND_TRIPS = 7
#: conservative device col-kernel bulk throughput, state-cells/s
DEV_FILL_RATE = 2e9
#: sequential per-step cost of the device route, s/step: the pallas
#: column scan (~26 us/column at SX=6144) plus the trace walk's
#: per-step gathers.  Scales with PATH LENGTH, not band area.  Fit to
#: two measured resident merges (gp120 0.26s at path ~1300; 6144x6144
#: 0.89s at path ~12300).
STEP_S = 6e-5


# ---------------------------------------------------- router calibration
# The cost-model constants above are priors fit on one host/day; both
# sides drift (CLAUDE.md records the host fill rate moving ~2.3x between
# phases), so the router RE-CALIBRATES from what it actually measures:
# every native host fill reports its rate (engine/forward._fill_native),
# resident-merge walls re-fit the per-step latency (bench probes), and a
# one-shot ~50 ms micro-fill seeds the host rate before the first real
# fill of a process.  VERDICT r3 #3: round 3's static constants
# mispredicted the device win at 4.3e7 cells on a slow-host day.
_HOST_OBS: list[float] = []
_STEP_OBS: list[float] = []
_PROBED_HOST: float | None = None


def observe_host_fill(state_cells: int, seconds: float) -> None:
    """Feed one measured native host fill into the router's host-rate
    estimate (median of the recent window rides out scheduler noise)."""
    if seconds > 1e-4 and state_cells > 100_000:
        _HOST_OBS.append(state_cells / seconds)
        del _HOST_OBS[:-16]


def observe_resident_merge(band_cells: int, path_len: int, wall_s: float) -> None:
    """Re-fit the device route's per-step latency from one measured
    resident merge wall (fill + end gather + trace walk)."""
    est = (
        wall_s
        - MERGE_ROUND_TRIPS * dispatch_overhead_s()
        - band_cells / DEV_FILL_RATE
    ) / max(path_len, 1)
    if est > 0:
        _STEP_OBS.append(est)
        del _STEP_OBS[:-16]


def _probe_host_rate() -> float:
    """One-shot micro-fill of a dense 256x256 chain merge through the
    native host runtime (~30 ms), run lazily the first time the router
    needs a host rate before any production fill has been observed."""
    global _PROBED_HOST
    if _PROBED_HOST is not None:
        return _PROBED_HOST
    _PROBED_HOST = 0.0  # sentinel: no recursion while probing
    try:
        import time

        from historian_tpu.core.seqs import FastSeq
        from historian_tpu.engine.forward import ForwardMatrix
        from historian_tpu.engine.pairhmm import PairHMM
        from historian_tpu.engine.profile import Profile
        from historian_tpu.models.presets import named_model
        from historian_tpu.models.ratemodel import ProbModel

        model = named_model("jc")
        rng = np.random.RandomState(1)
        n = 255
        mk = lambda name: FastSeq(
            name=name, seq="".join("acgt"[i] for i in rng.randint(0, 4, size=n))
        )
        x = Profile.from_sequence(model.components, model.alphabet, mk("x"), 0)
        y = Profile.from_sequence(model.components, model.alphabet, mk("y"), 1)
        hmm = PairHMM(ProbModel(model, 0.5), ProbModel(model, 0.5), model.ins_prob)
        prev = os.environ.get("HISTORIAN_DEVICE_DP")
        os.environ["HISTORIAN_DEVICE_DP"] = "0"
        try:
            dp = ForwardMatrix(x, y, hmm, 2)  # first fill warms arena/pages
            if dp.cells is None:
                return 0.0
            cells = int(np.count_nonzero(dp.env_mask)) * 5
            t0 = time.perf_counter()
            reps = 2
            for _ in range(reps):
                if not dp._fill_native():
                    return 0.0
            _PROBED_HOST = cells * reps / (time.perf_counter() - t0)
        finally:
            if prev is None:
                os.environ.pop("HISTORIAN_DEVICE_DP", None)
            else:
                os.environ["HISTORIAN_DEVICE_DP"] = prev
    except Exception:
        _PROBED_HOST = 0.0
    return _PROBED_HOST


def host_fill_rate() -> float:
    """Current best estimate of the host fill throughput, state-cells/s:
    median of observed production fills, else the startup micro-probe,
    else the static prior."""
    if _HOST_OBS:
        return float(np.median(_HOST_OBS[-8:]))
    probed = _probe_host_rate()
    return probed if probed > 0 else HOST_FILL_RATE


def step_s() -> float:
    """Current best estimate of the device route's sequential per-step
    cost (column scan + trace walk), s/step."""
    if _STEP_OBS:
        return float(np.median(_STEP_OBS[-8:]))
    return STEP_S


def device_merge_cost_s(band_cells: int, path_len: int,
                        overhead_s: float | None = None) -> float:
    """Estimated wall of the device-resident merge route: fixed dispatch
    overhead + sequential column-scan/trace-walk latency + bulk fill."""
    if overhead_s is None:
        overhead_s = dispatch_overhead_now()
    return (
        MERGE_ROUND_TRIPS * overhead_s
        + step_s() * path_len
        + band_cells / DEV_FILL_RATE
    )


#: managed async backend attach (CLI cold start): None = not managed
#: (backend_kind falls through to jax.default_backend, which may
#: lazily initialize); "armed" = intent registered but no thread yet
#: (first routing query starts it -- commands like `count` whose work
#: rarely routes to the device then never pay the attach thread's
#: import/handshake CPU unless routing actually asks); "pending" |
#: "ok" | "failed" once the attach thread runs
_ATTACH_STATE = None
_INTENDED_PLATFORM = "cpu"


def backend_kind() -> str:
    """Default-backend platform for ROUTING decisions, nonblocking while
    a managed async attach is in flight: a remote backend attach is a
    blocking native call measured 0.5-66s on this tunnel, and paying it
    up front penalizes every run whose merges all route host (flagship
    gp120 lost 0.9x to the CPU path on exactly this, VERDICT r4 #3).
    While the attach thread runs, report the INTENDED platform --
    routing then treats the chip as an accelerator with the pessimistic
    pending-probe overhead, keeps small work on host, and only a merge
    big enough to clearly win blocks on the attach."""
    if _ATTACH_STATE in ("armed", "pending"):
        return _INTENDED_PLATFORM
    if _ATTACH_STATE == "failed":
        return "cpu"
    import jax

    return jax.default_backend()


def accel_backend() -> bool:
    return backend_kind() in ("tpu", "gpu")


def fill_dtype():
    """Merge-fill device dtype: f64 on the CPU backend (golden parity),
    f32 on accelerators.  HISTORIAN_DEVICE_DTYPE=f32|f64 overrides --
    f32-on-CPU reproduces the accelerator numeric path for drift
    studies without a chip (tests/test_f32_drift.py); f64-on-TPU costs
    ~8x VPU throughput but removes the long-input f32 best-trace
    caveat for merges that need it."""
    import jax
    import numpy as np

    env = os.environ.get("HISTORIAN_DEVICE_DTYPE", "")
    if env == "f32":
        return np.float32
    if env == "f64":
        return np.float64
    return np.float64 if jax.default_backend() == "cpu" else np.float32


def attach_pending() -> bool:
    """True while the managed async backend attach is still in flight
    (or armed but not yet started).  Host-pinned work that would
    otherwise issue its FIRST jnp op now -- and block on jax's global
    backend-init lock behind a possibly-cold tunnel attach -- can
    consult this and take a numpy formulation instead."""
    return _ATTACH_STATE in ("armed", "pending")


def set_intended_platform(platform: str = "tpu") -> None:
    """Arm the managed attach WITHOUT starting the thread: routing
    treats the backend as the intended accelerator immediately, and the
    first routing query that could plausibly route work to the device
    (dispatch_overhead_now / min_device_cells / merge_on_device) starts
    the actual attach.  Commands whose work never reaches device-viable
    sizes then skip the attach's import + handshake CPU entirely."""
    global _ATTACH_STATE, _INTENDED_PLATFORM
    if _ATTACH_STATE is not None or _PROBE_THREAD is not None or \
            _DISPATCH_OVERHEAD is not None:
        return
    with _probe_lock():
        if _ATTACH_STATE is None and _PROBE_THREAD is None and \
                _DISPATCH_OVERHEAD is None:
            _INTENDED_PLATFORM = platform
            _ATTACH_STATE = "armed"


def start_backend_attach_async(platform: str = "tpu") -> None:
    """Initialize the (possibly remote) default backend on a daemon
    thread so host work never waits on the tunnel attach.  The thread
    resolves the device list (warning + CPU failover if the intended
    platform never appears), stamps boot success for the CLI's probe
    short-circuit, and rolls straight into the dispatch-RTT probe --
    so it doubles as _PROBE_THREAD and merge_on_device's deliberate
    join covers attach + probe.  Idempotent; an "armed" registration
    (set_intended_platform) is upgraded to a running attach."""
    global _ATTACH_STATE, _INTENDED_PLATFORM, _PROBE_THREAD
    if _ATTACH_STATE not in (None, "armed") or _PROBE_THREAD is not None:
        return
    import threading

    with _probe_lock():
        if _ATTACH_STATE not in (None, "armed") or _PROBE_THREAD is not None:
            return
        if _ATTACH_STATE is None:
            _INTENDED_PLATFORM = platform
        _ATTACH_STATE = "pending"
        t = threading.Thread(target=_attach_body, daemon=True)
        _PROBE_THREAD = t
        t.start()


def _attach_body() -> None:
    global _ATTACH_STATE
    import sys

    import jax

    try:
        # stall watchdog: warn (and invalidate the CLI's boot stamp) if
        # the native attach blocks past the boot budget, same loud-stall
        # contract as the old eager path
        from historian_tpu.cli import _watched_init

        watch_s = float(os.environ.get("HISTORIAN_TPU_BOOT_TIMEOUT", "45")) or 60.0
        devs = _watched_init(jax.devices, watch_s)
        ok = any(d.platform == _INTENDED_PLATFORM for d in devs) or (
            _INTENDED_PLATFORM == "tpu" and jax.default_backend() in ("tpu", "gpu")
        )
    except Exception as e:
        sys.stderr.write(
            f"historian-tpu: warning: accelerator backend failed to "
            f"initialize ({type(e).__name__}: {e}); continuing on the CPU "
            "backend\n"
        )
        _ATTACH_STATE = "failed"
        return
    if not ok:
        sys.stderr.write(
            f"historian-tpu: warning: no {_INTENDED_PLATFORM} devices "
            "appeared after backend init; continuing on the CPU backend\n"
        )
        _ATTACH_STATE = "failed"
        return
    # state flips BEFORE the RTT probe: backend_kind() readers see the
    # real backend as soon as devices exist, while dispatch_overhead_now
    # stays pessimistic until the probe resolves
    _ATTACH_STATE = "ok"
    try:
        from historian_tpu.cli import mark_tpu_boot_ok

        mark_tpu_boot_ok()
    except Exception:
        pass
    try:
        _measure_dispatch_overhead()
    except Exception:
        pass


def merge_on_device(band_cells: int, path_len: int) -> bool:
    """Auto-mode routing decision for one merge fill on an accelerator
    backend: HISTORIAN_DEVICE_MIN_CELLS pins a plain cell threshold;
    otherwise the measured cost model decides (the trace walk's
    per-step latency means small merges lose on ANY accelerator, not
    just remote ones -- the host OpenMP wavefront clears them in
    milliseconds)."""
    env = os.environ.get("HISTORIAN_DEVICE_MIN_CELLS")
    if env is not None:
        return band_cells >= int(float(env))
    host_s = band_cells / host_fill_rate()
    if _DISPATCH_OVERHEAD is None:
        # probe still pending (its first read can block behind a slow
        # backend attach).  Small merges go host immediately -- they
        # lose on any remote topology, and rejecting BEFORE touching the
        # probe keeps an armed-passive attach entirely un-started on
        # small-input runs (the attach thread's imports cost ~0.2-0.4s
        # of GIL even when no work ever routes to the device).  A merge
        # a HEALTHY tunnel (~30ms RTT) would clearly win is worth
        # blocking on the attach+probe: the wait is paid once, and every
        # later merge then routes on the measured number.
        if host_s < 2.0 * device_merge_cost_s(band_cells, path_len,
                                              overhead_s=0.03):
            return False
        start_dispatch_probe_async()
        _PROBE_THREAD.join()
    return host_s >= device_merge_cost_s(band_cells, path_len)


#: routing assumption while the async dispatch probe is still pending:
#: on a remote/tunneled backend, pessimistic enough that every merge
#: stays on the host (only a ~7e9-state-cell merge would out-compute
#: 7 x 10 s of round trips), so an unresolved probe can never strand
#: work behind a congested tunnel; on a locally attached accelerator a
#: sub-ms placeholder keeps borderline device-winning merges from
#: transiently routing host (ADVICE r4)
_PENDING_OVERHEAD_S = 10.0
_PENDING_OVERHEAD_LOCAL_S = 5e-4
_PROBE_THREAD = None
_PROBE_LOCK = None
_REMOTE_HINT = None


def _probe_lock():
    global _PROBE_LOCK
    if _PROBE_LOCK is None:
        import threading

        _PROBE_LOCK = threading.Lock()
    return _PROBE_LOCK


def _remote_backend_hint() -> bool:
    """Cheap topology hint, no device round trip: the axon remote-tunnel
    backend self-identifies in client.platform_version ("axon x.y; ...").
    Unknown backends default to remote (the pessimistic placeholder is
    the safe transient on a congested tunnel; a local chip merely waits
    the few ms until the probe resolves)."""
    global _REMOTE_HINT
    if _REMOTE_HINT is None:
        try:
            import jax

            ver = jax.devices()[0].client.platform_version
            _REMOTE_HINT = "axon" in ver.lower()
        except Exception:
            _REMOTE_HINT = True
    return _REMOTE_HINT


def _pending_overhead_s() -> float:
    return _PENDING_OVERHEAD_S if _remote_backend_hint() else _PENDING_OVERHEAD_LOCAL_S


def _measure_dispatch_overhead() -> float:
    """The actual probe body: pure device_put/readback round trips.
    Deliberately COMPILE-FREE -- a jitted probe would itself sit in the
    remote compile queue (measured minutes in bad weather), the very
    cost the probe exists to detect.  Adaptive reps: under tunnel
    congestion a single round trip costs SECONDS (measured 66s in one
    spike), so insisting on 3 timed reps makes the probe itself the
    dominant cost; a decisively slow read is already the answer."""
    global _DISPATCH_OVERHEAD
    import time

    import jax

    buf = np.zeros(64, np.float32)
    t0 = time.perf_counter()
    np.asarray(jax.device_put(buf))  # connect + warm-up
    warm = time.perf_counter() - t0
    # The warm-up read is NOT the answer: a congested backend ATTACH can
    # take 10-66s while the steady per-dispatch RTT is a healthy ~35ms
    # (measured both on the same day) -- so always take at least one
    # post-connect read, and accept it alone only when it is itself
    # decisively slow (true steady-state congestion).
    t0 = time.perf_counter()
    np.asarray(jax.device_put(buf))
    first = time.perf_counter() - t0
    if first > 0.25:
        _DISPATCH_OVERHEAD = first
    else:
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(jax.device_put(buf))
        _DISPATCH_OVERHEAD = (time.perf_counter() - t0) / 3
    if TIMING:
        import sys

        print(
            f"[devdp] dispatch probe: warm={warm:.3f}s "
            f"overhead={_DISPATCH_OVERHEAD:.4f}s",
            file=sys.stderr, flush=True,
        )
    return _DISPATCH_OVERHEAD


def start_dispatch_probe_async() -> None:
    """Kick the dispatch probe on a daemon thread so its first device
    read -- which under tunnel congestion blocks for tens of seconds --
    overlaps host work (leaf profiles, guide, host fills) instead of
    serializing in front of the first routing decision.  Idempotent;
    the lock closes the check-then-set race (two concurrent callers
    could otherwise spawn two probes whose overlapping round trips
    inflate each other's RTT, ADVICE r4).  Under a managed attach the
    attach thread IS the probe thread (it rolls into the RTT measure),
    so an armed registration upgrades to the full attach instead."""
    global _PROBE_THREAD
    if _DISPATCH_OVERHEAD is not None or _PROBE_THREAD is not None:
        return
    if _ATTACH_STATE == "armed":
        start_backend_attach_async(_INTENDED_PLATFORM)
        return
    import threading

    with _probe_lock():
        if _DISPATCH_OVERHEAD is not None or _PROBE_THREAD is not None:
            return
        t = threading.Thread(target=_measure_dispatch_overhead, daemon=True)
        _PROBE_THREAD = t
        t.start()


def dispatch_overhead_now() -> float:
    """Non-blocking view of the dispatch overhead for per-merge routing:
    the measured value once the probe has resolved, else a pessimistic
    placeholder that keeps merges on the host (the safe choice both on a
    congested tunnel and in the first second on an attached chip)."""
    if _DISPATCH_OVERHEAD is not None:
        return _DISPATCH_OVERHEAD
    if _ATTACH_STATE != "armed":
        # "armed" stays passive: a routing query merely ASKING for the
        # overhead (e.g. the small-work pin check) must not spawn the
        # tunnel attach -- only a caller that might actually place work
        # on the device (merge_on_device, an explicit probe start) does
        start_dispatch_probe_async()
    return _pending_overhead_s()


def dispatch_overhead_s() -> float:
    """Measured host->device->host transfer round trip on the default
    backend (run once per process, cached; blocks until resolved).
    Distinguishes a locally attached accelerator (~100us) from a
    remote-tunnel one (tens of ms), so routing thresholds adapt to the
    actual topology instead of assuming one."""
    if _DISPATCH_OVERHEAD is None:
        start_dispatch_probe_async()
        _PROBE_THREAD.join()
    return _DISPATCH_OVERHEAD


def min_device_cells() -> int:
    """Band state-cell count below which a merge fill stays on the host.

    The device route pays a fixed per-merge overhead (RPC latency,
    band transfer, executable load -- ~1s steady-state through the
    remote tunnel, ~sub-ms on a locally attached chip), while the host
    OpenMP wavefront fill streams at HOST_FILL_RATE.  Auto mode routes a
    merge to the accelerator only when its band out-computes that
    overhead; HISTORIAN_DEVICE_MIN_CELLS overrides, HISTORIAN_DEVICE_DP=1
    forces every merge onto the device (tests, benches)."""
    env = os.environ.get("HISTORIAN_DEVICE_MIN_CELLS")
    if env is not None:
        return int(float(env))
    if os.environ.get("HISTORIAN_DEVICE_DP") == "1":
        return 0
    if backend_kind() not in ("tpu", "gpu"):
        return 0  # CPU-device kernels: dispatch is in-process
    ov = dispatch_overhead_now()
    if ov < 2e-3:
        return 0  # locally attached accelerator
    return int(MERGE_ROUND_TRIPS * ov * host_fill_rate())


def small_work_device():
    """Context manager that pins below-threshold batched work to the
    in-process CPU backend when the default accelerator is remote
    (min_device_cells() > 0); a no-op otherwise.  The same vectorized
    XLA code runs either way -- only the placement changes, so a remote
    tunnel's per-dispatch latency is never paid for work too small to
    amortize it."""
    import contextlib

    import jax

    if backend_kind() in ("tpu", "gpu") and min_device_cells():
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except Exception:
            return contextlib.nullcontext()
        return jax.default_device(cpu)
    return contextlib.nullcontext()


def dag_on_device() -> bool:
    """Whether DAG x DAG merges run the device row kernel.  Forced on
    with HISTORIAN_DEVICE_DP=1 (tests, benches, kernels-first runs);
    in auto mode the engine keeps them on the host fill, which beats
    the row kernel's SX x 2J sequential junction scans at every
    measured size (see engine/forward.py::_fill_device)."""
    return os.environ.get("HISTORIAN_DEVICE_DP", "auto") == "1"


def _bucket(n: int) -> int:
    """Grid dims round up to a bucket so compiled programs are reused.

    On accelerators each new shape pays an erratic 3-90s compile through
    the remote tunnel (plus a ~0.5s per-process executable load for
    every distinct cached program) while execution scales only linearly
    with padding, so buckets are 4x coarser there (256 vs 64) and 1024
    above 4096 -- a progressive-merge run's per-level shape growth then
    shares one program per ~1k band instead of one per level, at <=14%
    padded compute on fills that cost ~0.3s."""
    accel = backend_kind() in ("tpu", "gpu")
    b = 256 if accel else BUCKET
    if accel and n > 4096:
        b = 1024
    return max(b, -(-n // b) * b)


IDX_BUCKET = 8192


def _mask_idx(mask2d: np.ndarray, SY: int, total: int) -> tuple[np.ndarray, int]:
    """Flat row-major indices of the in-envelope cells, bucket-padded with
    an out-of-range sentinel (scatter mode='drop' ignores it; gather clamps
    and the host discards the tail).

    The tunnel to the remote accelerator moves ~5-13 MB/s with ~40 ms
    per-call latency, so shipping full [SX, SY(,5)] tensors costs seconds
    per merge while the envelope band is a small fraction of the grid --
    both the absorb upload and the cell readback ride these indices."""
    ii, jj = np.nonzero(mask2d)
    flat = (ii.astype(np.int64) * SY + jj).astype(np.int32)
    n = len(flat)
    P = max(IDX_BUCKET, -(-n // IDX_BUCKET) * IDX_BUCKET)
    idx = np.full(P, total, dtype=np.int32)
    idx[:n] = flat
    return idx, n


def _device_io():
    """Jitted scatter/gather helpers (built once; shapes bucket so the
    compile count stays tiny)."""
    import jax
    import jax.numpy as jnp

    global _SCATTER_ABSORB, _GATHER_CELLS
    if "_SCATTER_ABSORB" in globals():
        return _SCATTER_ABSORB, _GATHER_CELLS

    from functools import partial

    @partial(jax.jit, static_argnames=("sx", "sy"))
    def scatter_absorb(vals, idx, sx, sy):
        flat = jnp.full((sx * sy,), jnp.asarray(NEG, vals.dtype))
        flat = flat.at[idx].set(vals, mode="drop")
        mask = jnp.zeros((sx * sy,), bool).at[idx].set(True, mode="drop")
        return flat.reshape(sx, sy), mask.reshape(sx, sy)

    @jax.jit
    def gather_cells(cells, idx):
        return cells.reshape(-1, cells.shape[-1])[idx]

    _SCATTER_ABSORB, _GATHER_CELLS = scatter_absorb, gather_cells
    return _SCATTER_ABSORB, _GATHER_CELLS


def _maskgate():
    """jitted bool mask -> additive gate (0 in-band, NEG outside)."""
    import jax
    import jax.numpy as jnp

    global _MASKGATE
    if "_MASKGATE" not in globals():
        _MASKGATE = jax.jit(
            lambda m: jnp.where(m, jnp.float32(0), jnp.float32(NEG))
        )
    return _MASKGATE


def _gather_planes():
    """jitted in-band gather from [5, SY, SX] planes -> [P, 5]."""
    import jax

    global _GATHER_PLANES
    if "_GATHER_PLANES" not in globals():
        _GATHER_PLANES = jax.jit(lambda p, idx: p.reshape(5, -1).T[idx])
    return _GATHER_PLANES


def _expand_cells(vals: np.ndarray, mask2d: np.ndarray, n: int, nx: int, ny: int) -> np.ndarray:
    """Scatter gathered in-band cell values back into a dense [-inf] grid
    (exactly what a full readback would have produced: out-of-envelope and
    NEG-contaminated cells read as -inf to the host walkers)."""
    out = np.full((nx, ny, 5), -np.inf)
    v = vals[:n].astype(np.float64)
    v[v < NEG_CUTOFF] = -np.inf
    out[mask2d[:nx, :ny]] = v
    return out


def _clamp(a: np.ndarray, dtype) -> np.ndarray:
    """Finite NEG in place of -inf (the kernel's semiring zero)."""
    return np.where(np.isfinite(a), a, NEG).astype(dtype, copy=False)


def _bucket_pow2(n: int, lo: int = 1) -> int:
    k = lo
    while k < n:
        k <<= 1
    return k


def _profile_dag_arrays(profile, n: int):
    """Per-profile structure tables for the DAG kernel, memoized: in-edge
    matrices, chain/junction decomposition, null list + chain depth.
    `n` = number of grid states (profile.size - 1: END excluded)."""
    cached = profile.__dict__.get("_dag_arrays")
    if cached is not None:
        return cached
    trans = profile.trans
    k_max = max((len(profile.states[s].in_trans) for s in range(n)), default=1)
    K = _bucket_pow2(max(1, k_max))
    src = np.zeros((n, K), dtype=np.int32)
    lp = np.full((n, K), NEG)
    chain = np.zeros(n, dtype=bool)
    null_depth = np.zeros(n, dtype=np.int32)
    is_null = np.array([profile.states[s].is_null for s in range(n)])
    for s in range(n):
        st = profile.states[s]
        for k, t in enumerate(st.in_trans):
            src[s, k] = trans[t].src
            v = trans[t].lp
            lp[s, k] = v if np.isfinite(v) else NEG
        if (
            not is_null[s]
            and len(st.in_trans) == 1
            and trans[st.in_trans[0]].src == s - 1
        ):
            chain[s] = True
        if is_null[s]:
            d = 0
            for t in st.in_trans:
                sp = trans[t].src
                if sp < n and is_null[sp]:
                    d = max(d, null_depth[sp])
            null_depth[s] = d + 1
    jidx = np.nonzero(~chain)[0].astype(np.int32)
    govq = np.zeros(n, dtype=np.int32)
    q = 0
    for s in range(n):
        if not chain[s]:
            q += 1
        govq[s] = q
    nidx = np.nonzero(is_null)[0].astype(np.int32)
    real = lp > NEG / 2
    dist = np.arange(n)[:, None] - src
    out = {
        "K": K, "src": src, "lp": lp, "chain": chain, "jidx": jidx,
        "govq": govq, "nidx": nidx,
        "n_null_iters": int(null_depth.max(initial=0)),
        # longest in-edge reach; the pallas column kernel's VMEM ring
        # holds RING columns of look-back, so this gates that route
        "maxdist": int(dist[real].max(initial=0)),
    }
    profile.__dict__["_dag_arrays"] = out
    return out


def dag_forward_cells(dp) -> np.ndarray | None:
    """Run the Forward fill for a general profile pair on device via the
    DAG kernel (ops/dagforward.py).  Same contract as chain_forward_cells
    but with explicit edge structure instead of folded transitions."""
    if dp.x_empty or dp.y_empty:
        return None
    import jax
    import jax.numpy as jnp

    from historian_tpu.ops.dagforward import dag_pair_forward_cells
    from historian_tpu.ops.pairforward import pack_transitions

    import time as _time

    t0 = _time.perf_counter()
    nx = dp.x_size - 1
    ny = dp.y_size - 1
    SX, SY = _bucket(nx), _bucket(ny)
    dtype = fill_dtype()

    ax = _profile_dag_arrays(dp.x, nx)
    ay = _profile_dag_arrays(dp.y, ny)

    def pad_edges(a, n, S):
        K = a["K"]
        src = np.zeros((S, K), dtype=np.int32)
        lp = np.full((S, K), NEG, dtype)
        src[:n] = a["src"]
        lp[:n] = a["lp"]
        # padded states: pretend chain with NEG edge so they add no junctions
        src[n:, 0] = np.maximum(np.arange(n, S) - 1, 0)
        return src, lp

    x_src, x_lp = pad_edges(ax, nx, SX)
    y_src, y_lp = pad_edges(ay, ny, SY)

    def padb(vals, n, S, pad_val=False):
        out = np.full(S, pad_val, dtype=bool)
        out[:n] = vals[:n]
        return out

    x_null = padb(dp.x_null, nx, SX)
    x_eos = padb(dp.x_emit_or_start, nx, SX)
    x_ready = padb(dp.x_ready | dp.x_empty, nx, SX)
    y_null = padb(dp.y_null, ny, SY)
    y_ready = padb(dp.y_ready | dp.y_empty, ny, SY)
    y_chain = np.ones(SY, dtype=bool)  # padded states chain (no junction cost)
    y_chain[:ny] = ay["chain"]
    govq = np.zeros(SY, dtype=np.int32)
    govq[:ny] = ay["govq"]
    govq[ny:] = ay["govq"][-1] if ny else 0

    # pad index lists with the out-of-range sentinel SY: the kernel's
    # null-propagation scatter drops it, and junction writes land in
    # uvec slots no y state governs.  (SY-1 is NOT safe -- when ny is an
    # exact bucket multiple that column is a real state.)
    J = _bucket_pow2(len(ay["jidx"]), lo=32)
    jidx = np.full(J, SY, dtype=np.int32)
    jidx[: len(ay["jidx"])] = ay["jidx"]
    JN = _bucket_pow2(len(ay["nidx"]), lo=32)
    nidx = np.full(JN, SY, dtype=np.int32)
    nidx[: len(ay["nidx"])] = ay["nidx"]

    rsx = np.full(SX, NEG, dtype); rsx[:nx] = _clamp(dp.rootsubx[:nx], dtype)
    isx = np.full(SX, NEG, dtype); isx[:nx] = _clamp(dp.insx[:nx], dtype)
    rsy = np.full(SY, NEG, dtype); rsy[:ny] = _clamp(dp.rootsuby[:ny], dtype)
    isy = np.full(SY, NEG, dtype); isy[:ny] = _clamp(dp.insy[:ny], dtype)
    trans = _clamp(pack_transitions(dp.hmm), dtype)

    # band-compacted IO: ship absorb values + indices, derive mask on
    # device, read back only the in-envelope cells
    env = np.asarray(dp.env_mask[:nx, :ny], dtype=bool)
    mask_p = np.zeros((SX, SY), dtype=bool)
    mask_p[:nx, :ny] = env
    idx, n_in = _mask_idx(mask_p, SY, SX * SY)
    vals = np.full(len(idx), NEG, dtype)
    vals[:n_in] = _clamp(np.asarray(dp.absorb[:nx, :ny])[env], dtype)
    scatter_absorb, gather_cells = _device_io()
    t1 = _time.perf_counter()
    idx_d = jnp.asarray(idx)
    absorb_d, mask_d = scatter_absorb(jnp.asarray(vals), idx_d, SX, SY)

    cells_dev = dag_pair_forward_cells(
        absorb_d, jnp.asarray(rsx), jnp.asarray(isx),
        jnp.asarray(rsy), jnp.asarray(isy),
        mask_d, jnp.asarray(trans),
        jnp.asarray(x_src), jnp.asarray(x_lp),
        jnp.asarray(x_null), jnp.asarray(x_eos), jnp.asarray(x_ready),
        jnp.asarray(y_src), jnp.asarray(y_lp),
        jnp.asarray(y_null), jnp.asarray(y_ready),
        jnp.asarray(y_chain), jnp.asarray(govq),
        jnp.asarray(jidx), jnp.asarray(nidx),
        jnp.int32(ay["n_null_iters"]),
    )
    t2 = _time.perf_counter()
    out = np.asarray(gather_cells(cells_dev, idx_d))
    t3 = _time.perf_counter()
    if TIMING:
        import sys as _sys

        print(
            f"[devdp.dag] SX={SX} SY={SY} KX={x_src.shape[1]} KY={y_src.shape[1]} "
            f"J={len(jidx)} JN={len(nidx)} prep={t1 - t0:.3f} "
            f"dispatch={t2 - t1:.3f} wait+read={t3 - t2:.3f}",
            file=_sys.stderr, flush=True,
        )
    return _expand_cells(out, mask_p, n_in, nx, ny)


def col_kernel_inputs(dp, dtype=np.float64, bucket=None):
    """Dense input bundle for the column-major kernel, exactly as the
    production route's in-band scatter materializes it on device (NEG
    outside the envelope and the true sizes).  Used by the SP
    (mesh-sharded) fill and the multichip dryrun, which need the dense
    arrays host-side to shard them."""
    from historian_tpu.ops.pairforward import pack_transitions

    ex = dp.x.as_chain()
    assert ex is not None, "col kernel needs a chain x"
    nx = dp.x_size - 1
    ny = dp.y_size - 1
    SX = bucket(nx) if bucket else _bucket(nx)
    SY = bucket(ny) if bucket else _bucket(ny)

    tx = ex[:nx]
    rsx = np.full(SX, NEG, dtype); rsx[:nx] = _clamp(dp.rootsubx[:nx] + tx, dtype)
    isx = np.full(SX, NEG, dtype); isx[:nx] = _clamp(dp.insx[:nx] + tx, dtype)
    rsy = np.full(SY, NEG, dtype); rsy[:ny] = _clamp(dp.rootsuby[:ny], dtype)
    isy = np.full(SY, NEG, dtype); isy[:ny] = _clamp(dp.insy[:ny], dtype)
    trans = _clamp(pack_transitions(dp.hmm), dtype)

    ay = _profile_dag_arrays(dp.y, ny)
    KY = ay["src"].shape[1]
    y_src = np.zeros((SY, KY), dtype=np.int32)
    y_lp = np.full((SY, KY), NEG, dtype)
    y_src[:ny] = ay["src"]
    y_lp[:ny] = _clamp(ay["lp"], dtype)

    def padb(vals, n, S):
        out = np.zeros(S, dtype=bool)
        out[:n] = vals[:n]
        return out

    x_ready = padb(dp.x_ready | dp.x_empty, nx, SX)
    x_eos = padb(dp.x_emit_or_start, nx, SX)
    y_null = padb(dp.y_null, ny, SY)
    y_ready = padb(dp.y_ready | dp.y_empty, ny, SY)

    env_t = np.asarray(dp.env_mask[:nx, :ny], dtype=bool).T
    mask_t = np.zeros((SY, SX), dtype=bool)
    mask_t[:ny, :nx] = env_t
    absorb_t = np.full((SY, SX), NEG, dtype)
    dense = np.asarray(dp.absorb[:nx, :ny]).T + tx[None, :]
    absorb_t[:ny, :nx][env_t] = _clamp(dense[env_t], dtype)
    return dict(
        absorb_t=absorb_t, rootsub_x=rsx, ins_x=isx, rootsub_y=rsy,
        ins_y=isy, mask_t=mask_t, trans=trans, x_ready=x_ready,
        x_eos=x_eos, y_src=y_src, y_lp=y_lp, y_null=y_null,
        y_ready=y_ready, nx=nx, ny=ny,
    )


def _factored_wins(n_in: int, n_states: int, ca: int) -> bool:
    """Whether the emission tensor ships as O(S x CA) factors (device
    matmul) instead of O(band) precomputed values.  Factors win once the
    band holds more numbers than the factors.  HISTORIAN_FACTORED_ABSORB
    forces 1/0 (tests, debugging)."""
    env = os.environ.get("HISTORIAN_FACTORED_ABSORB")
    if env is not None:
        return env == "1"
    return n_in > n_states * ca


def _factored_absorb():
    """Jitted device-side emission build for the column-major route:
    absorb_t[j, i] = log(ey_exp[j] . ex_exp[i]) + shift_y[j] + shift_x[i],
    gated to NEG outside the band (idx = flat in-band indices, as in
    _mask_idx).  Ships O(S x C*A) factors up the link instead of O(band)
    precomputed values -- the emission inner product is MXU work that
    belongs on the device (SURVEY section 7: fuse emission einsums)."""
    import jax
    import jax.numpy as jnp

    global _FACTORED_ABSORB
    if "_FACTORED_ABSORB" in globals():
        return _FACTORED_ABSORB

    from functools import partial

    @partial(jax.jit, static_argnames=("sy", "sx"))
    def factored(ey_e, ex_e, shift_y, shift_x, idx, sy, sx):
        dense = jnp.log(ey_e @ ex_e.T) + shift_y[:, None] + shift_x[None, :]
        mask = (
            jnp.zeros((sy * sx,), bool).at[idx].set(True, mode="drop")
        ).reshape(sy, sx)
        neg = jnp.asarray(NEG, dense.dtype)
        out = jnp.where(mask, jnp.maximum(dense, neg), neg)
        return out, mask

    _FACTORED_ABSORB = factored
    return _FACTORED_ABSORB


def _factored_absorb_vecmask():
    """Like _factored_absorb, but the band mask is REBUILT ON DEVICE from
    the envelope's O(L) vectors (engine/forward.py env_vectors:
    mask[i, j] = near_start[i] | near_end[j] | |m1[i] - m2[j]| <= D)
    instead of shipping O(band) flat indices -- at long-merge sizes the
    index upload alone is tens of MB through the link.  Padded rows use
    sentinel m values of opposite sign so they always fail the distance
    test."""
    import jax
    import jax.numpy as jnp

    global _FACTORED_ABSORB_VECMASK
    if "_FACTORED_ABSORB_VECMASK" in globals():
        return _FACTORED_ABSORB_VECMASK

    @jax.jit
    def factored(ey_e, ex_e, shift_y, shift_x, m2, m1, dist, yne, xns, ny, nx):
        dense = jnp.log(ey_e @ ex_e.T) + shift_y[:, None] + shift_x[None, :]
        # AND with the real-region bounds so pad rows/cols are ALWAYS
        # out-of-band, exactly like the host-built index mask (a real row
        # with y_near_end would otherwise mark every pad column in-band)
        in_range = (
            (jnp.arange(ey_e.shape[0]) < ny)[:, None]
            & (jnp.arange(ex_e.shape[0]) < nx)[None, :]
        )
        mask = in_range & (
            yne[:, None]
            | xns[None, :]
            | (jnp.abs(m2[:, None] - m1[None, :]) <= dist)
        )
        neg = jnp.asarray(NEG, dense.dtype)
        out = jnp.where(mask, jnp.maximum(dense, neg), neg)
        return out, mask

    _FACTORED_ABSORB_VECMASK = factored
    return _FACTORED_ABSORB_VECMASK


def _oneshot_vecmask_pallas():
    """Single-dispatch RESIDENT fill: factored emission matmul (MXU),
    on-device vector band mask, mask gate, and the pallas column kernel
    in ONE jit -- one dispatch round trip per merge instead of three.
    The emission stays an XLA op OUTSIDE the sequential scan, where its
    DMA overlaps compute (in-kernel fusion measured 12x slower)."""
    global _ONESHOT_VECMASK
    if "_ONESHOT_VECMASK" in globals():
        return _ONESHOT_VECMASK
    from functools import partial

    import jax
    import jax.numpy as jnp

    from historian_tpu.ops.pallas_colforward import pallas_col_forward_cells

    @partial(jax.jit, static_argnames=("ring",))
    def run(y_src, y_lp, y_flags, ey_e, ex_e, shift_y, shift_x,
            m2, m1, dist, yne, xns, ny, nx, xvec, trans, *, ring):
        dense = jnp.log(ey_e @ ex_e.T) + shift_y[:, None] + shift_x[None, :]
        in_range = (
            (jnp.arange(ey_e.shape[0]) < ny)[:, None]
            & (jnp.arange(ex_e.shape[0]) < nx)[None, :]
        )
        mask = in_range & (
            yne[:, None]
            | xns[None, :]
            | (jnp.abs(m2[:, None] - m1[None, :]) <= dist)
        )
        neg = jnp.asarray(NEG, dense.dtype)
        absorb = jnp.where(mask, jnp.maximum(dense, neg), neg)
        maskg = jnp.where(mask, jnp.float32(0), jnp.float32(NEG))
        return pallas_col_forward_cells(
            y_src, y_lp, y_flags, absorb, maskg, xvec, trans, ring=ring
        )

    _ONESHOT_VECMASK = run
    return run


def _oneshot_idx_pallas():
    """Single-dispatch FULL-READBACK fill: factored emission, index-built
    mask, pallas column kernel, and the in-band gather in one jit; the
    one readback ships only the banded cells."""
    global _ONESHOT_IDX
    if "_ONESHOT_IDX" in globals():
        return _ONESHOT_IDX
    from functools import partial

    import jax
    import jax.numpy as jnp

    from historian_tpu.ops.pallas_colforward import pallas_col_forward_cells

    @partial(jax.jit, static_argnames=("ring",))
    def run(y_src, y_lp, y_flags, ey_e, ex_e, shift_y, shift_x,
            idx, xvec, trans, *, ring):
        SY, SX = ey_e.shape[0], ex_e.shape[0]
        dense = jnp.log(ey_e @ ex_e.T) + shift_y[:, None] + shift_x[None, :]
        mask = (
            jnp.zeros((SY * SX,), bool).at[idx].set(True, mode="drop")
        ).reshape(SY, SX)
        neg = jnp.asarray(NEG, dense.dtype)
        absorb = jnp.where(mask, jnp.maximum(dense, neg), neg)
        maskg = jnp.where(mask, jnp.float32(0), jnp.float32(NEG))
        planes = pallas_col_forward_cells(
            y_src, y_lp, y_flags, absorb, maskg, xvec, trans, ring=ring
        )
        return planes.reshape(5, -1).T[idx]

    _ONESHOT_IDX = run
    return run


def _to_planes_col():
    """jitted [SY, SX, 5] -> [5, SY, SX] canonicalizer (device-side)."""
    import jax
    import jax.numpy as jnp

    global _TO_PLANES_COL
    if "_TO_PLANES_COL" not in globals():
        _TO_PLANES_COL = jax.jit(lambda c: jnp.moveaxis(c, -1, 0))
    return _TO_PLANES_COL


#: HBM budget for the device-resident [5, SY, SX] planes, MB.  The trace
#: walk gathers from per-state [SY, SX] planes (ops/tracedp layout note:
#: a 5-minor relayout would tile-pad 5 -> 128 lanes, 25x memory); with
#: that layout a 6144x6144 merge (755 MB planes) compiles and runs in
#: ~2.3 GB total, so the budget caps plane bytes well under HBM.  Above
#: it the resident route declines and the caller falls back (remote
#: backends: host fill).
#: resident-plane HBM budget per merge.  3072 MB admits 12288-bucket
#: merges (5 x 12288^2 f32 = 3.02 GB): a 16 GB v5e holds one resident
#: merge plus the next fill's absorb/mask transients with headroom, and
#: the recon window's aggregate cap (2x this) keeps at most two such
#: merges in flight.  Raise/lower via HISTORIAN_TRACE_PLANES_MB.
TRACE_PLANES_MB = float(os.environ.get("HISTORIAN_TRACE_PLANES_MB", "3072"))


def col_forward_device(dp) -> "DeviceTraceFill | None":
    """Device-resident variant of col_forward_cells: the fill stays on
    device as [5, SY, SX] planes wrapped in a DeviceTraceFill whose
    tracebacks run on device too (ops/tracedp.py).  Routing conditions
    are col_forward_cells' plus a single chain-x END in-edge and the
    TRACE_PLANES_MB HBM budget."""
    if dp.x_empty or dp.y_empty:
        return None
    if dp.x.as_chain() is None or len(dp.x.end.in_trans) != 1:
        return None
    if 5 * _bucket(dp.x_size - 1) * _bucket(dp.y_size - 1) * 4 > TRACE_PLANES_MB * 1e6:
        return None
    return col_forward_cells(dp, keep=True)


def col_forward_cells(dp, keep: bool = False):
    """Run the Forward fill on device via the column-major kernel
    (ops/colforward.py): x must be a pure emit chain, y may be any
    profile DAG.  This is the dominant production merge shape (leaf x
    sampled-profile); the y DAG's null/junction structure costs nothing
    here, unlike the row-major DAG kernel.  Returns None when x is not
    a chain (caller falls back to the DAG kernel / host fill).

    With keep=True, returns a DeviceTraceFill (planes stay on device, no
    cell readback) instead of the [nx, ny, 5] host tensor."""
    if dp.x_empty or dp.y_empty:
        return None
    ex = dp.x.as_chain()
    if ex is None:
        return None
    import time as _time

    import jax
    import jax.numpy as jnp

    from historian_tpu.ops.colforward import col_pair_forward_cells
    from historian_tpu.ops.pairforward import pack_transitions

    t0 = _time.perf_counter()
    nx = dp.x_size - 1
    ny = dp.y_size - 1
    SX, SY = _bucket(nx), _bucket(ny)
    dtype = fill_dtype()

    tx = ex[:nx]  # transition lp into x state i (tx[0] = 0 for START)
    rsx = np.full(SX, NEG, dtype); rsx[:nx] = _clamp(dp.rootsubx[:nx] + tx, dtype)
    isx = np.full(SX, NEG, dtype); isx[:nx] = _clamp(dp.insx[:nx] + tx, dtype)
    rsy = np.full(SY, NEG, dtype); rsy[:ny] = _clamp(dp.rootsuby[:ny], dtype)
    isy = np.full(SY, NEG, dtype); isy[:ny] = _clamp(dp.insy[:ny], dtype)
    trans = _clamp(pack_transitions(dp.hmm), dtype)

    ay = _profile_dag_arrays(dp.y, ny)
    KY = ay["src"].shape[1]
    y_src = np.zeros((SY, KY), dtype=np.int32)
    y_lp = np.full((SY, KY), NEG, dtype)
    y_src[:ny] = ay["src"]
    y_lp[:ny] = _clamp(ay["lp"], dtype)

    def padb(vals, n, S):
        out = np.zeros(S, dtype=bool)
        out[:n] = vals[:n]
        return out

    x_ready = padb(dp.x_ready | dp.x_empty, nx, SX)
    x_eos = padb(dp.x_emit_or_start, nx, SX)
    y_null = padb(dp.y_null, ny, SY)
    y_ready = padb(dp.y_ready | dp.y_empty, ny, SY)

    # band-compacted IO over the TRANSPOSED grid (cells are column-major
    # on device so y in-edge gathers index the leading axis)
    env_t = np.asarray(dp.env_mask[:nx, :ny], dtype=bool).T  # [ny, nx]
    mask_t = np.zeros((SY, SX), dtype=bool)
    mask_t[:ny, :nx] = env_t
    n_in = int(np.count_nonzero(mask_t))
    scatter_absorb, gather_cells = _device_io()
    fx, sxs, fy, sys_ = dp.absorb_factors  # [x_size, CA], [x_size], ...
    CA = fx.shape[1]
    # factored upload wins when the band holds more values than the
    # factors (long merges: O(band) -> O(L x CA) link bytes); the small-
    # band case keeps the host-precomputed scatter (bit-compatible with
    # the host absorb)
    use_factored = _factored_wins(n_in, SX + SY, CA)
    # resident factored fills also rebuild the band mask on device from
    # the envelope's O(L) vectors, skipping the O(band) index upload
    # (readback builds indices lazily if a consumer ever needs cells)
    vec_mask = use_factored and keep
    if vec_mask:
        idx = None
        idx_d = None
    else:
        idx, _ = _mask_idx(mask_t, SX, SY * SX)
    if not use_factored:
        absorb_t = np.asarray(dp.absorb[:nx, :ny]).T + tx[None, :]
        vals = np.full(len(idx), NEG, dtype)
        vals[:n_in] = _clamp(absorb_t[env_t], dtype)

    # pallas route: single-kernel column scan with a VMEM ring of the
    # last `ring` columns.  The ring is sized per merge (pow2 >= max
    # in-edge distance + 1, floor 8): chain-y merges (maxdist 1) take an
    # 8-slot ring, which stretches the VMEM budget to SX ~ 49k lanes --
    # the long-sequence path; sampled-profile DAGs (p99 dist ~27) use
    # 32-64 and gp120's max (109) uses the full 128.
    from historian_tpu.ops.pallas_colforward import (
        FUSED_MAX_CA,
        FUSED_MAX_SMEM,
        MAX_SX,
        RING,
    )

    ring = 8
    while ring <= ay["maxdist"]:
        ring *= 2
    use_pallas = (
        dtype == np.float32
        and jax.default_backend() in ("tpu", "gpu")
        and ring <= RING  # look-back beyond 128 falls back to XLA
        and ring * SX <= RING * MAX_SX  # VMEM ring budget (~12.6 MB)
        and os.environ.get("HISTORIAN_PALLAS_COL", "1") == "1"
    )
    # fully fused route: emission matmul AND band mask built inside the
    # pallas kernel from O(L) factors -- no [SY, SX] absorb/mask planes
    # ever touch HBM and the separate XLA emission dispatch disappears.
    # Gated by the SMEM budget (ey factors ride scalar prefetch).
    ca_pad = -(-CA // 8) * 8
    # in-kernel emission fusion is OPT-IN: measured 12x SLOWER than the
    # streamed design on v5e (the per-grid-step MXU matmul serializes
    # into the sequential column chain, ~2.8 ms/step stall, where the
    # streamed absorb DMA overlaps compute for free).  The dispatch-count
    # win it chased is delivered by the ONE-SHOT route below instead.
    use_fused = (
        use_pallas
        and use_factored
        and CA <= FUSED_MAX_CA
        and (KY * 8 + 32) * SY <= FUSED_MAX_SMEM
        # VMEM: ring scratch (ring*8*SX*4 B) + resident ex_t (ca_pad*SX*4)
        and (ring * 8 + ca_pad) * SX * 4 <= RING * MAX_SX * 32
        and os.environ.get("HISTORIAN_PALLAS_FUSED", "0") == "1"
    )
    # one-shot route: emission matmul (MXU), band mask, mask gate, the
    # pallas column kernel, and (full-readback path) the band gather all
    # inside ONE jit -- one dispatch round trip per merge instead of 3-4,
    # with the emission still an overlapped XLA op outside the scan
    use_oneshot = (
        use_pallas
        and use_factored
        and not use_fused
        and os.environ.get("HISTORIAN_PALLAS_ONESHOT", "1") == "1"
    )
    t1 = _time.perf_counter()
    if idx is not None:
        idx_d = jnp.asarray(idx)
    absorb_d = mask_d = None
    if use_factored:
        ex_f = np.zeros((SX, CA), dtype)
        ex_f[:nx] = fx[:nx]
        ey_f = np.zeros((SY, CA), dtype)
        ey_f[:ny] = fy[:ny]
        shift_x = np.full(SX, NEG, dtype)
        shift_x[:nx] = sxs[:nx] + tx
        shift_y = np.zeros(SY, dtype)
        shift_y[:ny] = sys_[:ny]
        if vec_mask or use_fused:
            ev = getattr(dp, "env_vectors", None)
            if ev is None:  # uninitialized envelope: all-True inside
                m1 = np.zeros(SX, np.int32)
                m2 = np.zeros(SY, np.int32)
                dist = 0
            else:
                vm1, vm2, dist = ev
                m1 = np.full(SX, 1 << 29, np.int32)
                m1[:nx] = vm1[:nx]
                m2 = np.full(SY, -(1 << 29), np.int32)
                m2[:ny] = vm2[:ny]
            # pad sentinels differ by 2^30 > any real distance bound
            xns = np.zeros(SX, bool)
            xns[:nx] = dp.x_near_start[:nx]
            yne = np.zeros(SY, bool)
            yne[:ny] = dp.y_near_end[:ny]
            if ev is None:
                # real rows pass via distance 0; pads must still fail
                m1[nx:] = 1 << 29
                m2[ny:] = -(1 << 29)
        if use_fused or use_oneshot:
            pass  # factors go straight into the (one-shot) kernel below
        elif vec_mask:
            absorb_d, mask_d = _factored_absorb_vecmask()(
                jnp.asarray(ey_f), jnp.asarray(ex_f),
                jnp.asarray(shift_y), jnp.asarray(shift_x),
                jnp.asarray(m2), jnp.asarray(m1), jnp.int32(dist),
                jnp.asarray(yne), jnp.asarray(xns),
                jnp.int32(ny), jnp.int32(nx),
            )
        else:
            absorb_d, mask_d = _factored_absorb()(
                jnp.asarray(ey_f), jnp.asarray(ex_f),
                jnp.asarray(shift_y), jnp.asarray(shift_x), idx_d, SY, SX,
            )
    else:
        absorb_d, mask_d = scatter_absorb(jnp.asarray(vals), idx_d, SY, SX)

    if use_fused:
        from historian_tpu.ops.pallas_colforward import (
            pallas_col_forward_cells_fused,
        )

        y_flags = np.zeros((SY, 8), np.float32)
        y_flags[:, 0] = y_null
        y_flags[:, 1] = y_ready
        y_flags[:, 2] = rsy
        y_flags[:, 3] = isy
        y_flags[:, 4] = m2
        y_flags[:, 5] = yne
        y_flags[:, 6] = shift_y
        xvec = np.zeros((8, SX), np.float32)
        xvec[0] = rsx
        xvec[1] = isx
        xvec[2] = np.where(x_ready, 0.0, NEG)
        xvec[3] = np.where(x_eos, 0.0, NEG)
        xvec[4] = shift_x
        xvec[5] = m1
        xvec[6] = xns
        xvec[7, :nx] = 1.0
        ex_t = np.zeros((ca_pad, SX), np.float32)
        ex_t[:CA] = ex_f.T
        ey_p = np.zeros((SY, ca_pad), np.float32)
        ey_p[:, :CA] = ey_f
        params = np.zeros(32, np.float32)
        params[:23] = trans
        params[23] = dist
        params[24] = ny
        planes = pallas_col_forward_cells_fused(
            jnp.asarray(y_src), jnp.asarray(y_lp), jnp.asarray(y_flags),
            jnp.asarray(ey_p), jnp.asarray(ex_t),
            jnp.asarray(xvec), jnp.asarray(params),
            ring=ring,
        )
        t2 = _time.perf_counter()
        if keep:
            return DeviceTraceFill(dp, planes, nx, ny, idx_d, mask_t, n_in)
        out = np.asarray(_gather_planes()(planes, idx_d))
    elif use_pallas:
        from historian_tpu.ops.pallas_colforward import pallas_col_forward_cells

        y_flags = np.zeros((SY, 4), np.float32)
        y_flags[:, 0] = y_null
        y_flags[:, 1] = y_ready
        y_flags[:, 2] = rsy
        y_flags[:, 3] = isy
        xvec = np.stack([
            rsx, isx,
            np.where(x_ready, 0.0, NEG).astype(dtype),
            np.where(x_eos, 0.0, NEG).astype(dtype),
        ])
        if use_oneshot and vec_mask:
            planes = _oneshot_vecmask_pallas()(
                jnp.asarray(y_src), jnp.asarray(y_lp), jnp.asarray(y_flags),
                jnp.asarray(ey_f), jnp.asarray(ex_f),
                jnp.asarray(shift_y), jnp.asarray(shift_x),
                jnp.asarray(m2), jnp.asarray(m1), jnp.int32(dist),
                jnp.asarray(yne), jnp.asarray(xns),
                jnp.int32(ny), jnp.int32(nx),
                jnp.asarray(xvec), jnp.asarray(trans), ring=ring,
            )
            t2 = _time.perf_counter()
            if keep:
                return DeviceTraceFill(dp, planes, nx, ny, idx_d, mask_t, n_in)
            out = np.asarray(_gather_planes()(planes, idx_d))
        elif use_oneshot:
            out_d = _oneshot_idx_pallas()(
                jnp.asarray(y_src), jnp.asarray(y_lp), jnp.asarray(y_flags),
                jnp.asarray(ey_f), jnp.asarray(ex_f),
                jnp.asarray(shift_y), jnp.asarray(shift_x),
                idx_d, jnp.asarray(xvec), jnp.asarray(trans), ring=ring,
            )
            t2 = _time.perf_counter()
            out = np.asarray(out_d)
        else:
            maskg_d = _maskgate()(mask_d)
            planes = pallas_col_forward_cells(
                jnp.asarray(y_src), jnp.asarray(y_lp), jnp.asarray(y_flags),
                absorb_d, maskg_d, jnp.asarray(xvec), jnp.asarray(trans),
                ring=ring,
            )
            t2 = _time.perf_counter()
            if keep:
                return DeviceTraceFill(dp, planes, nx, ny, idx_d, mask_t, n_in)
            out = np.asarray(_gather_planes()(planes, idx_d))
    else:
        planes = None
        cells_dev = col_pair_forward_cells(
            absorb_d, jnp.asarray(rsx), jnp.asarray(isx),
            jnp.asarray(rsy), jnp.asarray(isy),
            mask_d, jnp.asarray(trans),
            jnp.asarray(x_ready), jnp.asarray(x_eos),
            jnp.asarray(y_src), jnp.asarray(y_lp),
            jnp.asarray(y_null), jnp.asarray(y_ready),
        )
        t2 = _time.perf_counter()
        if keep:
            return DeviceTraceFill(
                dp, _to_planes_col()(cells_dev), nx, ny, idx_d, mask_t, n_in
            )
        out = np.asarray(gather_cells(cells_dev, idx_d))
    t3 = _time.perf_counter()
    global LAST_SPLIT
    LAST_SPLIT = (t1 - t0, t2 - t1, t3 - t2)
    if TIMING:
        import sys as _sys

        print(
            f"[devdp.col{'.fz' if use_fused else '.pl' if use_pallas else ''}] SX={SX} SY={SY} "
            f"KY={KY} prep={t1 - t0:.3f} "
            f"dispatch={t2 - t1:.3f} wait+read={t3 - t2:.3f}",
            file=_sys.stderr, flush=True,
        )
    # expand over the transposed mask, then restore row-major [nx, ny, 5]
    tmp = np.full((ny, nx, 5), -np.inf)
    v = out[:n_in].astype(np.float64)
    v[v < NEG_CUTOFF] = -np.inf
    tmp[env_t] = v
    return tmp.transpose(1, 0, 2)


def trace_enabled() -> bool:
    """Whether merge fills stay device-resident with tracebacks walked on
    device (ops/tracedp.py).  HISTORIAN_DEVICE_TRACE=1/0 forces; default
    'auto' = on exactly when the backend is an accelerator, where the
    banded-cell readback dominates per-merge cost."""
    env = os.environ.get("HISTORIAN_DEVICE_TRACE", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return backend_kind() in ("tpu", "gpu")


def _sorted_walk_edges(src: np.ndarray, lp: np.ndarray):
    """Per-row copies of the in-edge tables sorted by source index with
    padding slots last -- the device walker's candidate order must match
    the host's sorted-by-cell order (engine/forward.py::_trace_entry)."""
    pad = lp <= NEG / 2
    order = np.argsort(np.where(pad, np.iinfo(np.int32).max, src), axis=1, kind="stable")
    rows = np.arange(src.shape[0])[:, None]
    return src[rows, order], lp[rows, order]


class DeviceTraceFill:
    """Device-resident fill handle: the [5, SY, SX] cell planes plus the
    walk structure, with tracebacks run by ops/tracedp.py.  Created by
    col/chain_forward_device; consumed by engine/forward.py when
    trace_enabled().  `readback()` materializes host cells on demand
    (BackwardMatrix and other full-band consumers)."""

    def __init__(self, dp, planes, nx: int, ny: int, idx, mask_t, n_in):
        import jax.numpy as jnp

        self.dp = dp
        self.planes = planes  # [5, SY, SX] device
        self.nx, self.ny = nx, ny
        self._idx, self._mask_t, self._n_in = idx, mask_t, n_in
        self._cells_np = None

        ay = _profile_dag_arrays(dp.y, ny)
        SY = planes.shape[1]
        dtype = np.float32 if planes.dtype == jnp.float32 else np.float64
        KY = ay["src"].shape[1]
        y_src = np.zeros((SY, KY), np.int32)
        y_lp = np.full((SY, KY), NEG, dtype)
        y_src[:ny], y_lp[:ny] = _sorted_walk_edges(
            ay["src"], _clamp(ay["lp"], dtype)
        )
        y_null = np.zeros(SY, bool)
        y_null[:ny] = dp.y_null[:ny]
        ex = dp.x.as_chain()
        tx = np.zeros(planes.shape[2], dtype)
        tx[:nx] = _clamp(ex[:nx], dtype)

        # end in-edges: chain x has exactly one (callers verified by
        # routing), y's are sorted by source like the walk edges
        x_end = dp.x.end
        assert len(x_end.in_trans) == 1, "chain x END must have one in-edge"
        xt = dp.x.trans[x_end.in_trans[0]]
        ye = sorted(
            (dp.y.trans[t].src, dp.y.trans[t].lp) for t in dp.y.end.in_trans
        )
        KE = _bucket_pow2(len(ye), lo=8)
        ye_src = np.zeros(KE, np.int32)
        ye_lp = np.full(KE, NEG, dtype)
        for k, (s, v) in enumerate(ye):
            ye_src[k] = s
            ye_lp[k] = v if np.isfinite(v) else NEG

        t6 = np.array(dp.hmm.trans_table, dtype=dtype, copy=True)
        t6[~np.isfinite(t6)] = NEG

        self._walk_args = (
            jnp.asarray(y_src), jnp.asarray(y_lp), jnp.asarray(y_null),
            jnp.asarray(tx), jnp.asarray(t6),
            jnp.int32(xt.src), jnp.asarray(dtype(xt.lp if np.isfinite(xt.lp) else NEG)),
            jnp.asarray(ye_src), jnp.asarray(ye_lp),
        )
        self.n_steps_max = int(planes.shape[1] + planes.shape[2])
        self._lp_end = None
        self._lp_end_dev = None

    def dispatch_lp_end(self) -> None:
        """Enqueue the end gather on device without blocking; lp_end
        reads the resulting scalar back later (level pipelining)."""
        if self._lp_end is None and self._lp_end_dev is None:
            from historian_tpu.ops.tracedp import end_lp_device

            _, _, _, _, t6, xe_src, xe_lp, ye_src, ye_lp = self._walk_args
            self._lp_end_dev = end_lp_device(
                self.planes, t6, xe_src, xe_lp, ye_src, ye_lp
            )

    @property
    def lp_end(self) -> float:
        """Host _finish_fill's end gather, computed on device (the engine
        needs it right after the fill for the band-doubling retry)."""
        if self._lp_end is None:
            self.dispatch_lp_end()
            v = float(self._lp_end_dev)
            self._lp_end_dev = None
            self._lp_end = -np.inf if v < NEG_CUTOFF else v
        return self._lp_end

    def dispatch_traces(self, n_samples: int, include_best: bool, seed: int):
        """Enqueue include_best + n_samples walks in one device dispatch;
        returns the raw device tuple without blocking.  collect_traces
        reads it back."""
        import jax
        import jax.numpy as jnp

        from historian_tpu.ops.tracedp import pair_trace_device

        T = n_samples + (1 if include_best else 0)
        key = jax.random.PRNGKey(np.uint32(seed))
        u = jax.random.uniform(key, (max(T, 1), self.n_steps_max), jnp.float32)
        best = np.zeros(max(T, 1), bool)
        if include_best:
            best[0] = True
        return pair_trace_device(
            self.planes, *self._walk_args,
            u.astype(self.planes.dtype), jnp.asarray(best), self.n_steps_max,
        )

    def collect_traces(self, raw, n_samples: int, include_best: bool):
        """Read a dispatch_traces result back; returns the traces list
        (see lp_end_and_traces) and caches lp_end as a side effect."""
        T = n_samples + (1 if include_best else 0)
        pi, pj, ps, vals, n_steps, lp_end = raw
        pi, pj, ps = np.asarray(pi), np.asarray(pj), np.asarray(ps)
        vals = np.array(vals, dtype=np.float64)
        vals[vals < NEG_CUTOFF] = -np.inf
        n_steps = np.asarray(n_steps)
        lp_end = float(lp_end)
        if lp_end < NEG_CUTOFF:
            lp_end = -np.inf
        if self._lp_end is None:
            self._lp_end = lp_end
        traces = []
        for t in range(T):
            n = int(n_steps[t])
            cells = [(int(pi[t, k]), int(pj[t, k]), int(ps[t, k])) for k in range(n)]
            cells.reverse()  # walker emits end->start
            traces.append((cells, vals[t, :n][::-1]))
        return traces

    def lp_end_and_traces(self, n_samples: int, include_best: bool, seed: int):
        """Run include_best + n_samples walks in one dispatch.  Returns
        (lp_end, traces) where traces is a list of (path, vals): path a
        list of (i, j, s) cells START->END-SOURCE order (the END cell
        itself is appended by the engine), vals the matching cell values.
        The first trace is the best trace when include_best."""
        raw = self.dispatch_traces(n_samples, include_best, seed)
        traces = self.collect_traces(raw, n_samples, include_best)
        return self.lp_end, traces

    def readback(self) -> np.ndarray:
        """Full banded cell tensor [nx, ny, 5] (host layout), for
        consumers that need the whole band (BackwardMatrix)."""
        if self._cells_np is None:
            _, gather_cells = _device_io()
            import jax.numpy as jnp

            if self._idx is None:
                # vector-mask fills skip the index upload; build it only
                # when a full-band consumer actually asks for cells
                SY, SX = self.planes.shape[1], self.planes.shape[2]
                idx, self._n_in = _mask_idx(self._mask_t, SX, SY * SX)
                self._idx = jnp.asarray(idx)
            cells_t = jnp.moveaxis(self.planes, 0, -1)  # [SY, SX, 5]
            out = np.asarray(gather_cells(cells_t, self._idx))
            tmp = np.full((self.ny, self.nx, 5), -np.inf)
            v = out[: self._n_in].astype(np.float64)
            v[v < NEG_CUTOFF] = -np.inf
            tmp[self._mask_t[: self.ny, : self.nx]] = v
            self._cells_np = tmp.transpose(1, 0, 2)
        return self._cells_np


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
    import time as _time

    import jax
    import jax.numpy as jnp

    from historian_tpu.ops.pairforward import chain_pair_forward_cells, pack_transitions

    t0 = _time.perf_counter()
    nx = dp.x_size - 1  # kernel rows: states 0..n (START + emits; END excluded)
    ny = dp.y_size - 1
    X1, Y1 = _bucket(nx), _bucket(ny)
    dtype = fill_dtype()

    tx = ex[:nx]  # transition lp into x state i (tx[0] = 0 for START)
    ty = ey[:ny]

    def pad1(vals, n, size):
        out = np.full(size, NEG, dtype)
        out[:n] = _clamp(vals, dtype)
        return out

    rsx = pad1(dp.rootsubx[:nx] + tx, nx, X1)
    isx = pad1(dp.insx[:nx] + tx, nx, X1)
    rsy = pad1(dp.rootsuby[:ny] + ty, ny, Y1)
    isy = pad1(dp.insy[:ny] + ty, ny, Y1)

    x_ready = np.zeros(X1, dtype=bool)
    x_ready[:nx] = dp.x_ready[:nx]
    y_ready = np.zeros(Y1, dtype=bool)
    y_ready[:ny] = dp.y_ready[:ny]

    trans = _clamp(pack_transitions(dp.hmm), dtype)

    # band-compacted IO (see _mask_idx): absorb ships as in-band values,
    # the mask is derived on device, and only in-band cells come back;
    # long merges ship the O(S x CA) emission factors instead and run the
    # exp-space matmul on device (_factored_absorb)
    env = np.asarray(dp.env_mask[:nx, :ny], dtype=bool)
    mask_p = np.zeros((X1, Y1), dtype=bool)
    mask_p[:nx, :ny] = env
    idx, n_in = _mask_idx(mask_p, Y1, X1 * Y1)
    scatter_absorb, gather_cells = _device_io()
    fx, sxs, fy, sys_ = dp.absorb_factors
    CA = fx.shape[1]
    use_factored = _factored_wins(n_in, X1 + Y1, CA)
    if use_factored:
        ex_f = np.zeros((X1, CA), dtype)
        ex_f[:nx] = fx[:nx]
        ey_f = np.zeros((Y1, CA), dtype)
        ey_f[:ny] = fy[:ny]
        shift_x = np.full(X1, NEG, dtype)
        shift_x[:nx] = sxs[:nx] + tx
        shift_y = np.zeros(Y1, dtype)
        shift_y[:ny] = sys_[:ny] + ty
    else:
        absorb_full = dp.absorb[:nx, :ny] + tx[:, None] + ty[None, :]
        vals = np.full(len(idx), NEG, dtype)
        vals[:n_in] = _clamp(absorb_full[env], dtype)
    t1 = _time.perf_counter()
    idx_d = jnp.asarray(idx)
    if use_factored:
        absorb_d, mask_d = _factored_absorb()(
            jnp.asarray(ex_f), jnp.asarray(ey_f),
            jnp.asarray(shift_x), jnp.asarray(shift_y), idx_d, X1, Y1,
        )
    else:
        absorb_d, mask_d = scatter_absorb(jnp.asarray(vals), idx_d, X1, Y1)
    t2 = _time.perf_counter()

    cells_dev = chain_pair_forward_cells(
        absorb_d, jnp.asarray(rsx), jnp.asarray(rsy),
        jnp.asarray(isx), jnp.asarray(isy), mask_d,
        jnp.asarray(trans), jnp.asarray(x_ready), jnp.asarray(y_ready),
    )
    t3 = _time.perf_counter()
    out = np.asarray(gather_cells(cells_dev, idx_d))
    t4 = _time.perf_counter()
    if TIMING:
        import sys as _sys

        print(
            f"[devdp.chain] X1={X1} Y1={Y1} prep={t1 - t0:.3f} "
            f"scatter={t2 - t1:.3f} dispatch={t3 - t2:.3f} "
            f"wait+read={t4 - t3:.3f}",
            file=_sys.stderr, flush=True,
        )
    return _expand_cells(out, mask_p, n_in, nx, ny)
