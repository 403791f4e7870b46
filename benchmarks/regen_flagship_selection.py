"""Regenerate the flagship catalog's SELECTION set at 24k UNIQUE injections.

Round-2 forensics (VERDICT r2 weak #2): the committed flagship catalog asked
for nsel=8192 from a 2.4M-draw campaign, but at the loud SNR_OBS>20 cut that
campaign only yields ~1.5k detections — ``benchdata._catalog`` padded the
rest by resampling WITH replacement, so the "8192-injection" selection set
had ~1.5k unique atoms and the measured selection noise was 1.30 nats
against DESIGN §5a's predicted ~0.9 (the same silent-clamp failure mode the
round-2 SBC chase found in its nsel dial).  This script draws a 40M-injection
campaign in host-memory-bounded chunks, keeps only detected rows, and
replaces the selection block with 24576 unique detections (Ndraw accounted),
leaving the 56x256 event block byte-identical.

Expected noise at the flagship fit: nobs/sqrt(neff_sel) ~ 0.3 nats (< the
1.0-nat bar of ``inference/sampler.py``'s fit-time warning).

Run on the TPU:  PYTHONPATH=/root/repo python benchmarks/regen_flagship_selection.py
"""
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

from bumpcosmology_tpu.data.weights import dm1sqz_dm1ddqdl, planck18_dl_np
from bumpcosmology_tpu.mock import add_observation_noise, draw_injection_campaign

CATALOG = HERE / "flagship_catalog.npz"
NSEL = 24576
THRESHOLD = 20.0
CHUNK_NDRAW = 4_000_000
N_CHUNKS = 10
BASE_SEED = 88_000_000

def main():
    keep_cols = ["m1", "q", "z", "pdraw_mqz", "SNR_OBS"]
    detected = []
    n_total = 0
    for i in range(N_CHUNKS):
        t0 = time.time()
        # tight precut: SNR/chirp_dist <= 4.05 empirically (q100 over 300k
        # draws); at chirp_dist < 9.6/4.5 an injection cannot clear even
        # snr_obs > threshold - 6*sigma (P < 1e-9), so skipping its SNR
        # changes nothing at the loud cut while cutting compute ~2x vs the
        # standard 1.5 precut -- and keeps this regen entirely on CPU
        inj = draw_injection_campaign(
            ndraw=CHUNK_NDRAW, seed=BASE_SEED + 2 * i, snr_chunk=65536,
            chirp_dist_min=(THRESHOLD - 10.4) / 4.5,
        )
        obs = add_observation_noise(inj, seed=BASE_SEED + 2 * i + 1, threshold=THRESHOLD)
        detected.append(obs[keep_cols].copy())
        n_total += len(inj)
        del inj, obs
        print(
            f"[regen] chunk {i + 1}/{N_CHUNKS}: pool now "
            f"{sum(len(d) for d in detected)} detections of {n_total} draws "
            f"({time.time() - t0:.0f}s)", flush=True,
        )
    det = pd.concat(detected, ignore_index=True)
    if len(det) < NSEL:
        raise SystemExit(
            f"only {len(det)} unique detections for nsel={NSEL}; add chunks"
        )
    rng = np.random.default_rng(4242)
    pick = rng.choice(len(det), size=NSEL, replace=False)
    sel = det.iloc[pick]
    ndraw_eff = float(n_total) * (NSEL / len(det))

    m1 = sel["m1"].to_numpy()
    q = sel["q"].to_numpy()
    z = sel["z"].to_numpy()
    pd_src = sel["pdraw_mqz"].to_numpy()
    m1d = m1 * (1.0 + z)
    dl = planck18_dl_np(z)
    pdraw_det = pd_src * dm1sqz_dm1ddqdl(m1, q, z)

    with np.load(CATALOG) as d:
        ev = {k: d[k] for k in ("ev_a", "ev_q", "ev_c", "ev_lp")}
    np.savez(
        CATALOG,
        **ev,
        sel_a=m1d, sel_q=q, sel_c=dl,
        sel_lp=np.log(pdraw_det), sel_ln=np.log(ndraw_eff),
    )
    print(
        f"[regen] wrote {CATALOG}: events {ev['ev_a'].shape}, selection "
        f"({NSEL},) unique atoms from {len(det)} detections / {n_total} draws "
        f"(Ndraw_eff {ndraw_eff:.3g})"
    )

if __name__ == "__main__":
    main()
