"""Fused Pallas detector-frame log-weight kernel vs the XLA path.

``cosmo_frame_logwts_pallas`` must reproduce
``inference.likelihoods._cosmo_frame_logwts_fused`` — the flagship joint
likelihood's hot loop (reference ``intensity_models.py:378-388``) — in both
value and gradient, where the gradient flows through the per-draw tables
(bump grid, detector table) and the scalar hyperparameters all the way back
to the raw population/cosmology parameters.  Interpret mode on CPU; the real
Mosaic lowering is exercised on the TPU backend (bench + manual runs).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bumpcosmology_tpu.inference.likelihoods import _cosmo_frame_logwts_fused
from bumpcosmology_tpu.models.cosmology import (
    build_cosmology,
    build_detector_table,
    z_and_logjac_at_dl,
)
from bumpcosmology_tpu.models.parameters import (
    DEFAULT_POPULATION,
    CosmoParams,
    PopulationParams,
)
from bumpcosmology_tpu.models.population import build_population
from bumpcosmology_tpu.ops.pallas_logwts import cosmo_frame_logwts_pallas

DL_LO, DL_HI = 1.0, 20.0
N_GRID = 256
N_Z = 257


def _tables(pop_params: PopulationParams, cosmo_params: CosmoParams):
    pop = build_population(pop_params, n_grid=N_GRID)
    cosmo = build_cosmology(cosmo_params, n=N_Z)
    det = build_detector_table(cosmo, DL_LO, DL_HI, n=N_Z)
    return pop, det


def _queries(seed: int, n: int, det):
    """Queries with both masses safely inside the bump-table support."""
    rng = np.random.default_rng(seed)
    dl = jnp.asarray(rng.uniform(DL_LO * 1.1, DL_HI * 0.9, n), jnp.float32)
    z, _ = z_and_logjac_at_dl(det, dl)
    m1_src = jnp.asarray(rng.uniform(10.0, 38.0, n), jnp.float32)
    q = jnp.asarray(rng.uniform(0.6, 1.0, n), jnp.float32)
    a = m1_src * (1.0 + z)  # detector-frame primary mass
    log_pdraw = jnp.asarray(rng.normal(size=n), jnp.float32)
    return a, q, dl, log_pdraw


@pytest.mark.slow
def test_pallas_logwts_forward_matches_xla():
    pop, det = _tables(DEFAULT_POPULATION, CosmoParams(h=0.7, Om=0.3, w=-1.0))
    a, q, dl, log_pdraw = _queries(0, 1000, det)
    ref = np.asarray(_cosmo_frame_logwts_fused(pop, det, a, q, dl, log_pdraw))
    got = np.asarray(
        cosmo_frame_logwts_pallas(pop, det, a, q, dl, log_pdraw, block=256, interpret=True)
    )
    assert np.isfinite(ref).all()
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_pallas_logwts_2d_shape_and_padding():
    """Non-block-divisible 2D query batches reshape/pad correctly."""
    pop, det = _tables(DEFAULT_POPULATION, CosmoParams(h=0.7, Om=0.3, w=-1.0))
    a, q, dl, log_pdraw = _queries(1, 7 * 13, det)
    shp = (7, 13)
    a, q, dl, log_pdraw = (x.reshape(shp) for x in (a, q, dl, log_pdraw))
    ref = np.asarray(_cosmo_frame_logwts_fused(pop, det, a, q, dl, log_pdraw))
    got = np.asarray(
        cosmo_frame_logwts_pallas(pop, det, a, q, dl, log_pdraw, block=64, interpret=True)
    )
    assert got.shape == shp
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_pallas_logwts_out_of_support_is_neg_inf():
    pop, det = _tables(DEFAULT_POPULATION, CosmoParams(h=0.7, Om=0.3, w=-1.0))
    a, q, dl, log_pdraw = _queries(2, 8, det)
    q = q.at[0].set(0.05)  # m2 far below MBH_MIN -> weight must vanish
    ref = np.asarray(_cosmo_frame_logwts_fused(pop, det, a, q, dl, log_pdraw))
    got = np.asarray(
        cosmo_frame_logwts_pallas(pop, det, a, q, dl, log_pdraw, block=8, interpret=True)
    )
    assert ref[0] == -np.inf and got[0] == -np.inf
    np.testing.assert_allclose(got[1:], ref[1:], rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_pallas_logwts_grad_matches_xla():
    """Cotangents agree through tables + scalars back to the raw params."""
    a, q, dl, log_pdraw = _queries(
        3, 512, _tables(DEFAULT_POPULATION, CosmoParams(h=0.7, Om=0.3, w=-1.0))[1]
    )
    g = jnp.asarray(np.random.default_rng(4).normal(size=512), jnp.float32)

    def loss(theta, impl):
        mass = DEFAULT_POPULATION.mass._replace(
            a=theta[0], mpisn=theta[1], mbhmax=theta[2], sigma=theta[3],
            fpl=theta[4], beta=theta[5], c=theta[6],
        )
        red = DEFAULT_POPULATION.redshift._replace(lam=theta[7], kappa=theta[8], zp=theta[9])
        pop, det = _tables(
            PopulationParams(mass=mass, redshift=red),
            CosmoParams(h=theta[10], Om=theta[11], w=theta[12]),
        )
        if impl == "pallas":
            w = cosmo_frame_logwts_pallas(pop, det, a, q, dl, log_pdraw, block=256, interpret=True)
        else:
            w = _cosmo_frame_logwts_fused(pop, det, a, q, dl, log_pdraw)
        return jnp.vdot(g, w)

    theta0 = jnp.asarray(
        [1.8, 31.0, 36.0, 2.3, 0.21, -2.2, 2.9, 4.7, 7.0, 3.0, 0.7, 0.3, -1.0],
        jnp.float32,
    )
    v_ref, g_ref = jax.value_and_grad(loss)(theta0, "xla")
    v_pal, g_pal = jax.value_and_grad(loss)(theta0, "pallas")
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=2e-5)
    names = "a mpisn mbhmax sigma fpl beta c lam kappa zp h Om w".split()
    for name, r, p in zip(names, np.asarray(g_ref), np.asarray(g_pal)):
        np.testing.assert_allclose(
            p, r, rtol=5e-4, atol=5e-4 * max(1.0, abs(float(v_ref))) * 1e-3 + 1e-3,
            err_msg=f"grad wrt {name}",
        )
