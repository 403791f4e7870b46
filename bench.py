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

N_CHAINS_CPU = 4  # the reference configuration (run_cosmo_fit.py:18)
N_CHAINS_ACCEL = 16  # TPU-native vectorized-chain NUTS configuration
N_ACCEL_DRAWS = 400  # per chain
CPU_BUDGET_S = 45.0  # CPU timing window (post-compile)
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


def bench_cpu_rate():
    """CPU draws/s at the identical kernel, plus a direct-ESS sanity line."""
    import jax

    from bumpcosmology_tpu.inference.nuts import NutsConfig, run_sampling

    spec, potential, warm = _prepare("cpu")
    cfg = NutsConfig()
    key = jax.random.PRNGKey(SEED + 1)

    out = run_sampling(potential, warm, key, 25, cfg)  # compile
    jax.block_until_ready(out[0])

    drawn = 0
    chunks = []
    chunk_rates = []
    state = warm
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < CPU_BUDGET_S and drawn < N_ACCEL_DRAWS:
        key, k = jax.random.split(key)
        tc = time.perf_counter()
        thetas, _, state = run_sampling(potential, state, k, 25, cfg)
        jax.block_until_ready(thetas)
        chunk_rates.append(25 * N_CHAINS_CPU / (time.perf_counter() - tc))
        chunks.append(thetas)
        drawn += 25
    dt = time.perf_counter() - t0

    total = N_CHAINS_CPU * drawn
    # the shared host's throughput swings ~3x between runs (noisy
    # neighbors); credit the CPU its best 25-draw chunk — the conservative
    # (ratio-shrinking) estimate of what this host can actually sustain
    rate = max(chunk_rates)
    log(
        f"[bench/cpu] {total} draws in {dt:.1f}s (mean {total / dt:.2f} "
        f"draws/s; best chunk {rate:.2f} draws/s used as the baseline)"
    )
    if drawn >= 100:
        thetas = np.concatenate([np.asarray(c) for c in chunks], axis=1)
        ess = _min_ess(spec, thetas)
        log(
            f"[bench/cpu] direct min-ESS over the window: {ess:.0f}/{total} "
            f"({ess / dt:.3f} ESS/s; noisy at this window length — the "
            "headline CPU ESS/s uses the kernel-identical ESS-per-draw)"
        )
    return rate


def main():
    os.chdir(HERE)
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

    # CPU-only runs (CI smoke) use the 4-chain state and a short phase; the
    # accelerator measures a 4/16/64-chain NUTS scaling ladder plus the
    # nuts+chees hybrid at 64 chains; the headline is the best measured
    # configuration (ESS always measured directly from the timed draws).
    on_cpu = accel is None
    scaling = []
    sampler_name = "nuts"
    accel_chains = N_CHAINS_ACCEL
    if on_cpu:
        spec, potential, warm = _prepare("cpu", WARMUP)
        ess_per_sec, ess_per_draw = bench_accel("cpu", warm, spec, potential, 50)
    else:
        spec, potential, warm4 = _prepare(platform, WARMUP)
        if WARMUP16.exists():
            _, _, warm16 = _prepare(platform, WARMUP16)
        else:
            warm16 = jax.device_put(_tile_warmup(warm4, 4), jax.devices(platform)[0])
        warm64 = jax.device_put(_tile_warmup(warm16, 4), jax.devices(platform)[0])
        for warm, n_draws in ((warm4, 400), (warm16, N_ACCEL_DRAWS), (warm64, 150)):
            n_chains = int(np.asarray(warm.eps).shape[0])
            eps, epd = bench_accel(platform, warm, spec, potential, n_draws)
            scaling.append(
                {"chains": n_chains, "sampler": "nuts", "ess_per_sec": round(float(eps), 3)}
            )
            if n_chains == N_CHAINS_ACCEL:
                ess_per_sec, ess_per_draw = eps, epd

        hybrid_eps = bench_hybrid(platform, warm64, spec, potential, HYBRID_DRAWS)
        scaling.append(
            {
                "chains": N_CHAINS_HYBRID,
                "sampler": "nuts+chees",
                "ess_per_sec": round(float(hybrid_eps), 3),
            }
        )
        if hybrid_eps > ess_per_sec:
            ess_per_sec = hybrid_eps
            sampler_name = "nuts+chees"
            accel_chains = N_CHAINS_HYBRID
        # ess_per_draw stays the NUTS-kernel value: the CPU baseline runs the
        # reference's own NUTS config, so its ESS/s conversion must use the
        # NUTS kernels' ESS-per-draw (kernel-identical method)

    cpu_cores = os.cpu_count() or 1
    vs_baseline = 1.0
    vs_baseline_per_core = 1.0
    if accel is not None:
        try:
            cpu_rate = bench_cpu_rate()
            cpu_ess_per_sec = ess_per_draw * cpu_rate
            vs_baseline = ess_per_sec / cpu_ess_per_sec
            # per-core normalization: the reference config runs its 4 chains
            # in parallel given >=4 cores, so a realistic multi-core host
            # baseline is ~(per-core throughput x min(cores, 4)); reporting
            # the per-core ratio makes the headline portable across hosts
            cpu_ess_per_core = cpu_ess_per_sec / min(cpu_cores, N_CHAINS_CPU)
            vs_baseline_per_core = ess_per_sec / cpu_ess_per_core
            log(
                f"[bench] accel {ess_per_sec:.2f} ESS/s vs CPU "
                f"{cpu_ess_per_sec:.3f} ESS/s on {cpu_cores} core(s) -> "
                f"{vs_baseline:.1f}x ({vs_baseline_per_core:.1f}x per CPU core; "
                f"north-star target >=50x on v5e-8, BASELINE.json)"
            )
        except Exception as err:
            log(f"[bench] CPU baseline failed: {err!r}")

    print(
        json.dumps(
            {
                "metric": "joint_fit_min_ess_per_sec",
                "value": round(float(ess_per_sec), 3),
                "unit": "ESS/s",
                "vs_baseline": round(float(vs_baseline), 2),
                "vs_baseline_per_core": round(float(vs_baseline_per_core), 2),
                "cpu_cores": cpu_cores,
                "cpu_config": f"reference 4-chain NUTS on {cpu_cores} host core(s)",
                "accel_chains": accel_chains,
                "sampler": sampler_name,
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
