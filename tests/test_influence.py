"""Leave-one-out influence diagnostics (inference/influence.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bumpcosmology_tpu.inference.influence import (
    influence_summary,
    loo_fit,
    make_loo_datas,
)
from bumpcosmology_tpu.inference.likelihoods import (
    make_pop_data,
    pop_loglike,
    pop_model_spec,
)


def _catalog(nobs=5, nsamp=24, nsel=48, seed=7):
    rng = np.random.default_rng(seed)
    return make_pop_data(
        rng.uniform(8.0, 60.0, size=(nobs, nsamp)),
        rng.uniform(0.4, 1.0, size=(nobs, nsamp)),
        rng.uniform(0.05, 1.2, size=(nobs, nsamp)),
        rng.uniform(0.5, 2.0, size=(nobs, nsamp)),
        rng.uniform(8.0, 60.0, size=nsel),
        rng.uniform(0.4, 1.0, size=nsel),
        rng.uniform(0.05, 1.2, size=nsel),
        rng.uniform(0.5, 2.0, size=nsel),
        ndraw=1000.0,
    )


def test_make_loo_datas_drops_the_right_event():
    data = _catalog(nobs=4)
    datas = make_loo_datas(data)
    # fleet axis = nobs; each member has nobs-1 events
    assert datas.events.a.shape == (4, 3, 24)
    # member i is the original catalog with row i deleted, order preserved
    for i in range(4):
        expect = np.delete(np.asarray(data.events.a), i, axis=0)
        np.testing.assert_array_equal(np.asarray(datas.events.a[i]), expect)
    # selection block replicated per fleet member
    assert datas.selection.a.shape == (4, 48)
    np.testing.assert_array_equal(np.asarray(datas.selection.a[0]), np.asarray(data.selection.a))
    with pytest.raises(ValueError):
        make_loo_datas(_catalog(nobs=1))


@pytest.mark.slow
def test_loo_fit_and_influence_summary():
    # slow tier: a real (tiny) LOO fleet fit, ~3 min of mostly compile on one
    # CPU core.  Fast-tier coverage: make_loo_datas above, the artifact/figure
    # test below, and the fleet mechanics in test_run_sbc_fleet_joint_model_smoke.
    data = _catalog()
    spec = pop_model_spec(data, n_grid=64)
    loo = loo_fit(
        spec,
        lambda sites, d: pop_loglike(sites, d, 64),
        data,
        jax.random.PRNGKey(0),
        num_warmup=75,
        num_samples=48,
        verbose=False,
    )
    nobs = 5
    for site in ("a", "mpisn", "sigma", "lam"):
        assert loo.posterior[site].shape == (nobs, 48)
        assert np.all(np.isfinite(loo.posterior[site]))
    assert loo.accept.shape == (nobs, 48) and loo.eps.shape == (nobs,)

    # influence vs a mock "full posterior" centered where the LOO fits sit:
    # dropping one of 5 near-exchangeable events should not move any site by
    # many posterior sds
    full = {
        site: np.broadcast_to(loo.posterior[site].reshape(1, -1), (1, nobs * 48))
        for site in loo.posterior
    }
    infl = influence_summary(loo, full)
    for site in ("a", "mpisn", "sigma", "lam"):
        assert infl[site]["z"].shape == (nobs,)
        assert np.all(np.isfinite(infl[site]["z"]))
        assert np.all(np.abs(infl[site]["z"]) < 3.0)
        np.testing.assert_allclose(
            infl[site]["delta_mean"],
            infl[site]["mean_loo"] - float(np.mean(full[site])),
            rtol=1e-6, atol=1e-8,
        )


def test_influence_artifact_and_figure(tmp_path):
    """The loo stage's artifact round-trips and renders the heatmap figure."""
    import h5py

    from bumpcosmology_tpu.figures.plots import event_influence
    from bumpcosmology_tpu.pipeline.stages import write_influence_artifact

    rng = np.random.default_rng(0)
    events = ["GW1", "GW2", "GW3"]
    infl = {
        site: {
            "mean_loo": rng.normal(size=3),
            "delta_mean": rng.normal(size=3),
            "z": rng.normal(size=3),
        }
        for site in ("h", "lam", "mpisn")
    }
    path = tmp_path / "influence.h5"
    write_influence_artifact(path, "pop_cosmo", events, infl)
    with h5py.File(path) as f:
        assert [e.decode() for e in f["event"][:]] == events
        np.testing.assert_allclose(f["h"]["z"][:], infl["h"]["z"])
        assert f.attrs["model"] == "pop_cosmo"
    out = event_influence(path, out=str(tmp_path / "event_influence.pdf"))
    import os

    assert os.path.exists(out)
