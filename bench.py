"""Benchmark: the north-star metric — joint-fit min-ESS/sec vs host CPU.

Prints ONE JSON line to stdout:
  {"metric": "joint_fit_min_ess_per_sec", "value": N, "unit": "ESS/s",
   "vs_baseline": N, "vs_baseline_per_core": N, "cpu_cores": N,
   "scaling": [{"chains": 4|16|64, "ess_per_sec": N}, ...]}
(diagnostic detail goes to stderr).  ``vs_baseline`` is against the measured
host-CPU run at the reference's own 4-chain config on THIS host's core count
(stated in ``cpu_cores``/``cpu_config``); ``vs_baseline_per_core`` normalizes
to per-CPU-core throughput so the ratio is portable to multi-core hosts.  The
``scaling`` ladder measures the vectorized-chain axis (the TPU-native scale-out
dimension) at 4/16/64 chains on the same adapted kernels.

Workload: the flagship joint population+cosmology fit (reference
``run_cosmo_fit.py``) on the committed flagship catalog
(``benchmarks/flagship_catalog.npz`` — 56 events x 256 PE samples, 24,576
unique injections; the MC-axis sizing that keeps selection-integral noise
below the 1.0-nat posterior-corruption bar, see ``docs/DESIGN.md`` §5a) at
the reference NUTS configuration (4 chains, dense mass matrix,
``run_cosmo_fit.py:17-19,45-49``).

Method — both backends sample from the SAME adapted state
(``benchmarks/flagship_warmup.npz``: positions, step sizes, dense mass matrix
from a converged 1000-step warmup at the reference config), so the Markov
kernel — and therefore ESS *per draw* — is identical by construction; only
wall-clock differs:

* accelerator: a real sampling phase at the TPU-native configuration — 16
  vectorized chains (``benchmarks/flagship_warmup16.npz``: the 4 adapted
  kernels each replicated onto 4 stationary start positions), 400
  draws/chain; min-ESS measured directly across all 15 scalar sites (Geyer
  initial-positive-sequence ESS, split chains) → ``value`` = min-ESS /
  sampling wall.  Vectorized chains are the point of the TPU design: the
  per-step launch latency amortizes over the chain batch, and every chain
  runs the same adapted kernels as the reference configuration.
* host CPU (the reference's hardware basis, ``run_fit.py:17``) at the
  reference's own 4-chain configuration: identical kernels, draws timed over
  a bounded window, ESS/s = (measured ESS-per-draw of those kernels) x (CPU
  draws/s) — the kernel-identical conversion, since a CPU window long enough
  to estimate ESS directly to useful precision would take ~an hour per bench
  run.  A direct-ESS sanity check on the CPU window goes to stderr.

``vs_baseline`` = accelerator ESS/s over CPU ESS/s, traceable to
``BASELINE.json``'s ≥50x north-star target.

The accelerator additionally measures the ``nuts+chees`` hybrid (NUTS-adapted
kernels, fixed-length jittered-HMC sampling — no ragged-tree tax) at 64
chains; the headline ``value`` is the best measured configuration and the
``sampler`` field names it.  Hybrid ESS is measured directly from its own
timed draws, so the kernel-identity argument is not needed for it; the CPU
conversion always uses the NUTS kernels' ESS-per-draw (the reference runs
NUTS).

Driver-budget discipline (round 4, after BENCH_r03 rc:124/parsed:null):
the run is wall-clock-budgeted (``BENCH_BUDGET_S``, default 450 s).  The two
mandatory arms (16-chain NUTS → ESS-per-draw anchor; 64-chain hybrid →
headline candidate) run first; every further arm — the live CPU baseline,
the 4/64-chain NUTS ladder, the 128/256-chain hybrids — is gated on the
remaining budget against a conservative cost estimate and skipped (to
stderr) when it does not fit.  If the live CPU baseline is skipped, the
committed measurement ``benchmarks/cpu_baseline.json`` (same host, same
kernels; regenerated whenever the flagship program changes) supplies the
baseline rate, and ``cpu_config`` says so.  A watchdog thread prints the
best-so-far JSON at the budget deadline if the main flow has not printed
yet, so a stall anywhere still leaves the driver a parsed record.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
CATALOG = HERE / "benchmarks" / "flagship_catalog.npz"
WARMUP = HERE / "benchmarks" / "flagship_warmup.npz"
WARMUP16 = HERE / "benchmarks" / "flagship_warmup16.npz"
CPU_BASELINE = HERE / "benchmarks" / "cpu_baseline.json"

# wall-clock budget for the whole bench (driver windows are ~10 min; leave
# margin for interpreter startup + the driver's own overhead).  400 s, not
# 450: the round-4 record landed exactly at the watchdog deadline with a
# mid-flight arm burning ~180 s past it — the budget now leaves >=60 s of
# stated margin in a 10-min window even if an arm overruns its estimate.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "400"))
T0 = time.perf_counter()


def remaining() -> float:
    return BUDGET_S - (time.perf_counter() - T0)

N_CHAINS_CPU = 4  # the reference configuration (run_cosmo_fit.py:18)
N_CHAINS_ACCEL = 16  # TPU-native vectorized-chain NUTS configuration
N_ACCEL_DRAWS = 400  # per chain
SEED = 3281922803 % (2**31)

# hybrid (nuts+chees) headline candidate: fixed-length jittered HMC from the
# same adapted kernels — no ragged-tree tax, so it vectorizes to wide chain
# batches.  INIT_STEPS = round(T/eps) with T the ChEES-adapted trajectory
# length for the committed warmup16 kernel (T=10.9 at eps=0.159, 150-iter
# adaptation on v5e; scratch/r3_chees_widechain2.log) — committed like the
# warmup itself so the bench pays no adaptation phase.
N_CHAINS_HYBRID = 64
HYBRID_DRAWS = 300  # per chain
HYBRID_INIT_STEPS = 68


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _prepare(platform: str, warmup_path=None):
    """(spec, potential, warm) with data + state resident on ``platform``."""
    import jax

    from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
    from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
    from bumpcosmology_tpu.inference.model import make_potential
    from bumpcosmology_tpu.ops.interp import set_default_method
    from bumpcosmology_tpu.utils.checkpoint import load_warmup

    # None = backend-derived default (tiled two-level for unit-spaced lookups,
    # segment matmul otherwise) — an explicit "matmul" override is honored
    # literally and would downgrade the hot lookups (~1.9x slower/eval)
    set_default_method(None if platform in ("tpu", "axon") else "gather")
    dev = jax.devices(platform)[0]
    data = jax.device_put(flagship_pop_cosmo_data(str(CATALOG)), dev)
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    path = warmup_path or WARMUP
    warm = jax.device_put(load_warmup(str(path)), dev)
    return spec, potential, warm


def _ensure_warmup(platform: str) -> None:
    """Generate the committed adapted state if absent (first run only)."""
    if WARMUP.exists():
        return
    log(f"[bench] {WARMUP} missing — running 1000-step warmup on {platform}")
    import jax

    from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
    from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
    from bumpcosmology_tpu.inference.model import make_potential
    from bumpcosmology_tpu.inference.nuts import NutsConfig, run_warmup
    from bumpcosmology_tpu.inference.sampler import _finite_prior_init
    from bumpcosmology_tpu.ops.interp import set_default_method
    from bumpcosmology_tpu.utils.checkpoint import save_warmup

    set_default_method(None if platform in ("tpu", "axon") else "gather")
    dev = jax.devices(platform)[0]
    data = jax.device_put(flagship_pop_cosmo_data(str(CATALOG)), dev)
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    key = jax.random.PRNGKey(SEED)
    k_init, k_warm = jax.random.split(key)
    theta0 = _finite_prior_init(spec, potential, k_init, N_CHAINS_CPU)
    warm, _ = run_warmup(potential, theta0, k_warm, 1000, NutsConfig())
    jax.block_until_ready(warm.state.theta)
    save_warmup(str(WARMUP), warm)
    log(f"[bench] warmup state saved to {WARMUP}")


def _min_ess(spec, thetas) -> float:
    from bumpcosmology_tpu.inference.diagnostics import summary
    from bumpcosmology_tpu.inference.model import constrain

    sites = {k: np.asarray(v) for k, v in constrain(spec, thetas).items()}
    stats = summary({k: v for k, v in sites.items() if np.ndim(v) == 2})
    return min(s["ess"] for s in stats.values())


def _tile_warmup(warm, factor: int):
    """Replicate the 4 adapted kernels onto ``factor``x as many chains.

    Same construction as ``benchmarks/make_warmup16.py``: each adapted
    (eps, mass) kernel is reused on tiled start positions; chains decorrelate
    after a few draws since every chain consumes its own key stream."""
    import jax

    return jax.tree.map(lambda x: np.tile(np.asarray(x), (factor,) + (1,) * (x.ndim - 1)), warm)


def bench_accel(platform: str, warm, spec, potential, n_draws: int):
    """(min_ess_per_sec, ess_per_draw) from a measured sampling phase."""
    import jax

    from bumpcosmology_tpu.inference.nuts import NutsConfig, run_sampling

    n_chains = int(np.asarray(warm.eps).shape[0])
    cfg = NutsConfig()
    key = jax.random.PRNGKey(SEED + 1)

    # compile + decorrelate: one 25-draw chunk (run_sampling reuses the
    # compiled program for every chunk), carried into the timed phase so
    # tiled chain replicas have separated before ESS is measured
    _, _, warm = run_sampling(potential, warm, key, 25, cfg)
    jax.block_until_ready(warm.state.theta)

    t0 = time.perf_counter()
    thetas, stats, _ = run_sampling(potential, warm, jax.random.PRNGKey(SEED + 9), n_draws, cfg)
    jax.block_until_ready(thetas)
    dt = time.perf_counter() - t0

    total = n_chains * n_draws
    min_ess = _min_ess(spec, thetas)
    depth = float(np.median(np.asarray(stats.tree_depth)))
    log(
        f"[bench/{platform}] {n_chains} chains: {total} draws in {dt:.1f}s "
        f"({total / dt:.1f} draws/s), min-ESS {min_ess:.0f} "
        f"({min_ess / dt:.2f} ESS/s), median depth {depth:.0f}"
    )
    return min_ess / dt, min_ess / total


def bench_hybrid(platform: str, warm, spec, potential, n_draws: int):
    """min_ess_per_sec of the nuts+chees hybrid: fixed-length jittered HMC
    from the NUTS-adapted kernels at the committed trajectory length.

    A 25-draw unrecorded prefix decorrelates the tiled chain replicas (and
    compiles the chunk program); the timed phase measures ESS directly."""
    import jax

    from bumpcosmology_tpu.inference.chees import CheesConfig, run_chees_from_warmup

    n_chains = int(np.asarray(warm.eps).shape[0])
    cfg = CheesConfig(max_leapfrogs=96)
    pre = run_chees_from_warmup(
        potential, warm, jax.random.PRNGKey(SEED + 2), num_adapt=0,
        num_samples=25, cfg=cfg, init_steps=HYBRID_INIT_STEPS,
    )
    jax.block_until_ready(pre.thetas)

    t0 = time.perf_counter()
    res = run_chees_from_warmup(
        potential, pre.warm, jax.random.PRNGKey(SEED + 3), num_adapt=0,
        num_samples=n_draws, cfg=cfg, init_steps=HYBRID_INIT_STEPS,
    )
    jax.block_until_ready(res.thetas)
    dt = time.perf_counter() - t0

    total = n_chains * n_draws
    min_ess = _min_ess(spec, res.thetas)
    acc = float(np.mean(np.asarray(res.accept)))
    log(
        f"[bench/{platform}] nuts+chees {n_chains} chains: {total} draws in "
        f"{dt:.1f}s ({total / dt:.1f} draws/s), accept {acc:.2f}, min-ESS "
        f"{min_ess:.0f} ({min_ess / dt:.2f} ESS/s), ~{res.n_leapfrog} lf/draw"
    )
    return min_ess / dt


def bench_cpu_rate(n_chunks: int = 3, chunk: int = 10):
    """CPU draws/s at the identical kernel (best chunk of a short window)."""
    import jax

    from bumpcosmology_tpu.inference.nuts import NutsConfig, run_sampling

    spec, potential, warm = _prepare("cpu")
    cfg = NutsConfig()
    key = jax.random.PRNGKey(SEED + 1)

    out = run_sampling(potential, warm, key, chunk, cfg, chunk_size=chunk)  # compile
    jax.block_until_ready(out[0])

    chunk_rates = []
    state = warm
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        key, k = jax.random.split(key)
        tc = time.perf_counter()
        thetas, _, state = run_sampling(potential, state, k, chunk, cfg, chunk_size=chunk)
        jax.block_until_ready(thetas)
        chunk_rates.append(chunk * N_CHAINS_CPU / (time.perf_counter() - tc))
        if remaining() < 30.0:
            break
    dt = time.perf_counter() - t0

    # the shared host's throughput swings ~3x between runs (noisy
    # neighbors); credit the CPU its best chunk — the conservative
    # (ratio-shrinking) estimate of what this host can actually sustain
    rate = max(chunk_rates)
    log(
        f"[bench/cpu] {len(chunk_rates)} x {chunk * N_CHAINS_CPU}-draw chunks "
        f"in {dt:.1f}s (best chunk {rate:.2f} draws/s used as the baseline)"
    )
    # Persist only a full measurement: a budget-truncated single chunk (the
    # loop breaks early when remaining() < 30 s) must not overwrite the
    # committed multi-chunk baseline (round-4 advisor finding).
    if len(chunk_rates) >= n_chunks:
        _save_cpu_baseline(rate)
    else:
        log(
            f"[bench/cpu] only {len(chunk_rates)}/{n_chunks} chunks measured "
            "(budget) — committed baseline left untouched"
        )
    return rate


def _save_cpu_baseline(rate: float) -> None:
    """Persist the measured CPU rate for budget-starved future runs."""
    import datetime

    try:
        CPU_BASELINE.write_text(
            json.dumps(
                {
                    "draws_per_sec": round(float(rate), 4),
                    "n_chains": N_CHAINS_CPU,
                    "cpu_cores": os.cpu_count() or 1,
                    "measured": datetime.date.today().isoformat(),
                    "method": "best 40-draw chunk, reference 4-chain NUTS "
                    "kernels from benchmarks/flagship_warmup.npz",
                }
            )
            + "\n"
        )
    except OSError as err:
        log(f"[bench] could not persist cpu baseline: {err!r}")


def _load_cpu_baseline():
    """(draws_per_sec, description) from the committed measurement, or None.

    Validates host identity: a baseline measured with a different chain
    count or on a host with a different core count would silently skew
    ``vs_baseline_per_core`` (which divides by THIS host's cores), so a
    mismatch is refused and the caller falls back to a live measurement.
    """
    if not CPU_BASELINE.exists():
        return None
    try:
        d = json.loads(CPU_BASELINE.read_text())
        stored_chains = int(d.get("n_chains", N_CHAINS_CPU))
        stored_cores = int(d.get("cpu_cores", 0))
        here_cores = os.cpu_count() or 1
        if stored_chains != N_CHAINS_CPU or (stored_cores and stored_cores != here_cores):
            log(
                f"[bench] committed cpu baseline mismatch (chains {stored_chains} "
                f"vs {N_CHAINS_CPU}, cores {stored_cores} vs {here_cores}) — ignoring it"
            )
            return None
        return float(d["draws_per_sec"]), d.get("measured", "?")
    except (ValueError, KeyError) as err:
        log(f"[bench] bad {CPU_BASELINE}: {err!r}")
        return None


class _Snapshot:
    """Best-so-far result, printable exactly once (main flow or watchdog)."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._printed = False
        self.payload = None

    def update(self, **payload):
        with self._lock:
            if not self._printed:
                self.payload = payload

    def print_once(self, who: str) -> bool:
        with self._lock:
            if self._printed or self.payload is None:
                return False
            self._printed = True
            payload = self.payload
        print(json.dumps(payload), flush=True)
        if who != "main":
            log(f"[bench] {who}: budget hit at {time.perf_counter() - T0:.0f}s — "
                "emitted best-so-far JSON; remaining arms abandoned")
        return True

    @property
    def printed(self) -> bool:
        return self._printed


def _payload(ess_per_sec, sampler_name, accel_chains, scaling, vs_baseline,
             vs_baseline_per_core, cpu_cores, cpu_config):
    return dict(
        metric="joint_fit_min_ess_per_sec",
        value=round(float(ess_per_sec), 3),
        unit="ESS/s",
        vs_baseline=round(float(vs_baseline), 2),
        vs_baseline_per_core=round(float(vs_baseline_per_core), 2),
        cpu_cores=cpu_cores,
        cpu_config=cpu_config,
        accel_chains=accel_chains,
        sampler=sampler_name,
        scaling=list(scaling),
    )


def main():
    os.chdir(HERE)
    import threading

    import jax

    from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # repeat bench runs skip the 1-2 min compiles

    accel = None
    for p in ("tpu", "axon"):
        try:
            if jax.devices(p):
                accel = p
                break
        except RuntimeError:
            continue

    platform = accel or "cpu"
    _ensure_warmup(platform)

    snap = _Snapshot()
    stop = threading.Event()

    def watchdog():
        while not stop.wait(5.0):
            if remaining() <= 0.0 and snap.print_once("watchdog"):
                return

    threading.Thread(target=watchdog, daemon=True).start()

    cpu_cores = os.cpu_count() or 1
    scaling = []
    sampler_name = "nuts"
    accel_chains = N_CHAINS_ACCEL

    if accel is None:
        # CPU-only run (CI smoke): 4-chain state, short phase, no baseline arm
        spec, potential, warm = _prepare("cpu", WARMUP)
        ess_per_sec, ess_per_draw = bench_accel("cpu", warm, spec, potential, 50)
        snap.update(**_payload(ess_per_sec, "nuts", N_CHAINS_CPU, scaling, 1.0,
                               1.0, cpu_cores, "cpu-only smoke (no baseline arm)"))
        stop.set()
        snap.print_once("main")
        return

    dev = jax.devices(platform)[0]
    spec, potential, warm4 = _prepare(platform, WARMUP)
    if WARMUP16.exists():
        _, _, warm16 = _prepare(platform, WARMUP16)
    else:
        warm16 = jax.device_put(_tile_warmup(warm4, 4), dev)

    # Baseline bookkeeping: ``cpu_rate`` is filled by the live arm or the
    # committed measurement; until then early snapshots already use the
    # committed value (if any) so a watchdog print is never "vs_baseline: 1".
    cpu_rate = None
    cpu_config = f"reference 4-chain NUTS on {cpu_cores} host core(s)"
    ess_per_draw = None

    def vs_pair(ess_per_sec):
        if cpu_rate is None or ess_per_draw is None:
            return 1.0, 1.0
        cpu_ess_per_sec = ess_per_draw * cpu_rate
        # per-core normalization: the reference config runs its 4 chains in
        # parallel given >=4 cores, so a realistic multi-core host baseline
        # is ~(per-core throughput x min(cores, 4)); the per-core ratio makes
        # the headline portable across hosts
        cpu_ess_per_core = cpu_ess_per_sec / min(cpu_cores, N_CHAINS_CPU)
        return ess_per_sec / cpu_ess_per_sec, ess_per_sec / cpu_ess_per_core

    def refresh(ess_per_sec):
        vs, vs_core = vs_pair(ess_per_sec)
        snap.update(**_payload(
            ess_per_sec, sampler_name, accel_chains, scaling,
            vs, vs_core, cpu_cores,
            cpu_config if cpu_rate is not None else "baseline pending",
        ))

    cached = _load_cpu_baseline()
    if cached is not None:
        cpu_rate = cached[0]
        cpu_config += (
            f" (committed measurement of {cached[1]}, benchmarks/cpu_baseline.json)"
        )

    # --- mandatory arm 1: 16-chain NUTS (ESS-per-draw anchor + first headline)
    ess_per_sec, ess_per_draw = bench_accel(
        platform, warm16, spec, potential, N_ACCEL_DRAWS
    )
    scaling.append({"chains": 16, "sampler": "nuts",
                    "ess_per_sec": round(float(ess_per_sec), 3)})
    refresh(ess_per_sec)

    # --- mandatory arm 2: 64-chain hybrid (headline candidate)
    warm64 = jax.device_put(_tile_warmup(warm16, 4), dev)
    hybrid_eps = bench_hybrid(platform, warm64, spec, potential, HYBRID_DRAWS)
    scaling.append({"chains": 64, "sampler": "nuts+chees",
                    "ess_per_sec": round(float(hybrid_eps), 3)})
    if hybrid_eps > ess_per_sec:
        ess_per_sec, sampler_name, accel_chains = hybrid_eps, "nuts+chees", 64
    refresh(ess_per_sec)
    # ess_per_draw stays the NUTS-kernel value: the CPU baseline runs the
    # reference's own NUTS config, so its ESS/s conversion must use the
    # NUTS kernels' ESS-per-draw (kernel-identical method)

    # --- CPU baseline: live if the budget affords it, committed otherwise.
    # Live cost is dominated by the XLA:CPU compile (~130 s uncached on this
    # host) + three 40-draw chunks (~45 s each at the measured ~0.9 draws/s).
    live_cpu_cost = 260.0
    if remaining() > live_cpu_cost:
        try:
            live_rate = bench_cpu_rate()
            cpu_rate = live_rate
            cpu_config = (
                f"reference 4-chain NUTS on {cpu_cores} host core(s) (live measurement)"
            )
        except Exception as err:
            log(f"[bench] live CPU baseline failed: {err!r}")
        finally:
            # _prepare("cpu") switched the GLOBAL interp default to the
            # CPU-friendly gather path; the optional TPU arms below must get
            # the tiled accelerator default back (measured: the 4-chain NUTS
            # arm runs 30x slower on the gather path, scratch/r4_bench_full.log)
            from bumpcosmology_tpu.ops.interp import set_default_method

            set_default_method(None if platform in ("tpu", "axon") else "gather")
    elif cpu_rate is not None:
        log(f"[bench] budget ({remaining():.0f}s left) -> committed CPU "
            f"baseline {cpu_rate:.2f} draws/s")
    else:
        log(f"[bench] budget ({remaining():.0f}s left) and no committed "
            "baseline — vs_baseline will be 1.0")

    vs_baseline, vs_baseline_per_core = vs_pair(ess_per_sec)
    if cpu_rate is not None:
        log(
            f"[bench] accel {ess_per_sec:.2f} ESS/s vs CPU "
            f"{ess_per_draw * cpu_rate:.3f} ESS/s on {cpu_cores} core(s) -> "
            f"{vs_baseline:.1f}x ({vs_baseline_per_core:.1f}x per CPU core; "
            f"north-star target >=50x on v5e-8, BASELINE.json)"
        )
    refresh(ess_per_sec)

    # --- optional arms, cheapest-first, each gated on remaining budget
    # (costs are conservative wall estimates incl. compile on this chip)
    def arm_nuts(warm, n_draws, n_chains):
        nonlocal ess_per_sec, sampler_name, accel_chains
        eps, _ = bench_accel(platform, warm, spec, potential, n_draws)
        scaling.append({"chains": n_chains, "sampler": "nuts",
                        "ess_per_sec": round(float(eps), 3)})
        if eps > ess_per_sec:
            ess_per_sec, sampler_name, accel_chains = eps, "nuts", n_chains

    def arm_hybrid(n_chains, n_draws):
        nonlocal ess_per_sec, sampler_name, accel_chains
        warm = jax.device_put(_tile_warmup(warm16, n_chains // 16), dev)
        eps = bench_hybrid(platform, warm, spec, potential, n_draws)
        scaling.append({"chains": n_chains, "sampler": "nuts+chees",
                        "ess_per_sec": round(float(eps), 3)})
        if eps > ess_per_sec:
            ess_per_sec, sampler_name, accel_chains = eps, "nuts+chees", n_chains

    # Cost estimates are FULL-arm costs including the compile for a chain
    # width not yet traced this run (round-4 advisor finding: hybrid@128 was
    # estimated at 170 s, ran ~230 s with its compile, and the watchdog
    # emitted a stale headline while it was mid-flight).  An arm only starts
    # if its whole estimate fits with 60 s to spare — better to skip than to
    # start something that can finish only after the deadline.
    optional = [
        ("nuts@4", 60.0, lambda: arm_nuts(warm4, 400, 4)),
        ("hybrid@128", 240.0, lambda: arm_hybrid(128, 300)),
        ("nuts@64", 160.0, lambda: arm_nuts(
            jax.device_put(_tile_warmup(warm16, 4), dev), 150, 64)),
        ("hybrid@256", 330.0, lambda: arm_hybrid(256, 200)),
    ]
    for name, cost, run in optional:
        if snap.printed:
            break
        if remaining() < cost + 60.0:
            log(f"[bench] skipping {name} ({remaining():.0f}s left < {cost:.0f}s est + 60s margin)")
            continue
        try:
            run()
        except Exception as err:
            log(f"[bench] optional arm {name} failed: {err!r}")
        refresh(ess_per_sec)

    stop.set()
    snap.print_once("main")


if __name__ == "__main__":
    main()
