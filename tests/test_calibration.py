"""SBC harness smoke test (plumbing + rank mechanics, not full calibration)."""
import jax
import numpy as np
import pytest

from bumpcosmology_tpu.inference.calibration import (
    make_mock_pop_simulator,
    make_pop_sbc_spec_builder,
    run_sbc,
    sbc_uniformity_pvalues,
)
from bumpcosmology_tpu.mock import add_observation_noise, draw_injection_campaign


@pytest.mark.slow
def test_sbc_harness_smoke():
    inj = draw_injection_campaign(ndraw=30_000, seed=5, snr_chunk=8192)
    obs = add_observation_noise(inj, seed=6, threshold=20.0)
    assert len(obs) > 20

    simulate = make_mock_pop_simulator(
        obs, n_total_injections=len(inj), nobs=6, nsamp=32, nsel=128,
        pe_bank_size=512, seed=7,
    )
    ranks = run_sbc(
        make_pop_sbc_spec_builder(n_grid=64),
        simulate,
        n_sims=3,
        key=jax.random.PRNGKey(8),
        num_warmup=100,
        num_samples=64,
        thin=4,
        verbose=False,
    )
    n_bins = int(ranks["__n_bins__"])
    assert n_bins == 64 // 4 + 1
    for site, r in ranks.items():
        if site == "__n_bins__":
            continue
        assert r.shape == (3,)
        assert np.all((r >= 0) & (r < n_bins))
    # R_unit excluded by default
    assert "R_unit" not in ranks
    pvals = sbc_uniformity_pvalues(ranks)
    assert all(0.0 <= p <= 1.0 for p in pvals.values())
