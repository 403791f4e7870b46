"""PLPeak flagship refit with FIRST-CLASS multimodality (VERDICT r4 #3).

No hand-seeding: 16 chains from prior-overdispersed inits, then the
inference/modes machinery — mode assignment, per-mode split-R-hat/ESS,
per-mode bridge evidence -> posterior mode weights -> a mode-weighted
resampled posterior stored alongside the raw chains.  Replaces round 4's
initialize-in-the-dominant-mode trick (scratch/r4_flagship_refit_plpeak.py)
and its BF-table footnote.

Run on the TPU: PYTHONPATH=/root/repo python scratch/r5_plpeak_modes.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.ops.interp import set_default_method

set_default_method(None)

from bumpcosmology_tpu.data.weights import dm1sqz_dm1ddqdl, planck18_dl_np
from bumpcosmology_tpu.inference.likelihoods import (
    MASS_FAMILIES,
    make_pop_cosmo_data,
    make_pop_data,
)
from bumpcosmology_tpu.inference.modes import (
    assign_modes,
    mode_weighted_resample,
    mode_weights_by_bridge,
    split_rhat_per_mode,
)
from bumpcosmology_tpu.inference.nuts import NutsConfig
from bumpcosmology_tpu.inference.sampler import fit
from bumpcosmology_tpu.models.population import COORDS
from bumpcosmology_tpu.pipeline.stages import group_events
from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache
from bumpcosmology_tpu.utils.io import read_table
from bumpcosmology_tpu.utils.trace import Trace, save_trace

enable_compilation_cache()
DATA_DIR = "/root/repo/data/flagship"
N_CHAINS = 16

pe = read_table(f"{DATA_DIR}/pe-samples.h5")
sel = read_table(f"{DATA_DIR}/selection-samples.h5")
names, (m1s, qs, zs, wts) = group_events(pe)
pop_data = make_pop_data(
    m1s, qs, zs, wts,
    sel["m1"].to_numpy(), sel["q"].to_numpy(), sel["z"].to_numpy(),
    sel["pdraw"].to_numpy(), ndraw=float(sel["ndraw"].iloc[0]),
)
for df, wt_col in ((pe, "wt"), (sel, "pdraw")):
    df["m1d"] = df["m1"] * (1.0 + df["z"])
    df["dl"] = planck18_dl_np(df["z"].to_numpy())
    df["pdraw_cosmo"] = df[wt_col] * dm1sqz_dm1ddqdl(
        df["m1"].to_numpy(), df["q"].to_numpy(), df["z"].to_numpy()
    )
_, (m1d, qs2, dls, pdraws) = group_events(pe, cols=("m1d", "q", "dl", "pdraw_cosmo"))
cosmo_data = make_pop_cosmo_data(
    m1d, qs2, dls, pdraws,
    sel["m1d"].to_numpy(), sel["q"].to_numpy(), sel["dl"].to_numpy(),
    sel["pdraw_cosmo"].to_numpy(), ndraw=float(sel["ndraw"].iloc[0]),
)

fam = MASS_FAMILIES["plpeak"]
jobs = [
    (
        "pop_cosmo", fam.cosmo_trace_name,
        fam.cosmo_spec(cosmo_data, n_grid=256, n_z=1024),
        lambda s: fam.cosmo_det(s, cosmo_data, n_grid=256, n_z=1024), 717202,
    ),
    (
        "pop", fam.trace_name, fam.pop_spec(pop_data, n_grid=256),
        lambda s: fam.pop_det(s, pop_data, n_grid=256), 717101,
    ),
]
import os

if os.environ.get("MODES_JOINT_ONLY"):  # wall-clock fallback: flagship joint only
    jobs = jobs[:1]

for model, fname, spec, det_fn, seed in jobs:
    t0 = time.perf_counter()
    res = fit(
        spec, jax.random.PRNGKey(seed), num_warmup=1000, num_samples=1000,
        num_chains=N_CHAINS, cfg=NutsConfig(target_accept=0.9),
        deterministics_fn=det_fn,
    )
    post = {k: np.asarray(res.posterior[k]) for k in spec.priors}
    labels = assign_modes(post)
    n_modes = len(np.unique(labels))
    per_mode = split_rhat_per_mode(post, labels)
    weights, bridge = mode_weights_by_bridge(spec, res.posterior, labels, seed=seed + 7)
    ndiv = int(np.asarray(res.sample_stats["diverging"]).sum())
    mode_report = {
        "n_modes": int(n_modes),
        "chains_per_mode": np.bincount(labels).tolist(),
        "weights": [float(w) for w in weights],
        "log_z": [None if r is None else float(r.log_z) for r in bridge],
        "log_z_se": [None if r is None else float(r.se) for r in bridge],
        "per_mode_diag": {str(m): d for m, d in per_mode.items()},
        "divergences": ndiv,
    }
    print(f"[modes {model}/plpeak] {json.dumps(mode_report)}", flush=True)
    for m, d in per_mode.items():
        assert d["max_rhat"] < 1.02, f"mode {m} unconverged: {d}"

    # mode-weighted resampled posterior: the single-sample artifact users
    # consume (raw chains + labels stay in the trace for audits)
    resampled = mode_weighted_resample(
        {k: np.asarray(v) for k, v in res.posterior.items()},
        labels, weights, 4000, np.random.default_rng(seed + 9),
    )
    trace = Trace(
        res.posterior, res.sample_stats, coords=COORDS,
        attrs={
            "model": model, "family": "plpeak",
            "multimodality": json.dumps(mode_report),
            "mode_labels": json.dumps(labels.tolist()),
            "init": f"{N_CHAINS} prior-overdispersed chains, no mode seeding",
        },
    )
    save_trace(f"{DATA_DIR}/{fname}", trace)
    trace_w = Trace(
        resampled, {}, coords=COORDS,
        attrs={
            "model": model, "family": "plpeak",
            "content": "mode-weighted resample (bridge weights)",
            "weights": json.dumps([float(w) for w in weights]),
        },
    )
    save_trace(f"{DATA_DIR}/{fname}".replace(".h5", "_modeweighted.h5"), trace_w)
    print(
        f"[modes {model}/plpeak] saved raw + mode-weighted traces in "
        f"{time.perf_counter() - t0:.0f}s; div {ndiv}",
        flush=True,
    )
print("done")
