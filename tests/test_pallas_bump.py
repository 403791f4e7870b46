"""Pallas fused bump-grid kernel vs the pure-jnp reference (interpret mode).

The analytic backward kernel must reproduce JAX autodiff of the jnp
implementation exactly — including the gradient contributions through the
parameter-dependent grid coordinates and the trapezoid measure.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bumpcosmology_tpu.models.mass import pisn_bump_log_dndm_grid, set_bump_kernel
from bumpcosmology_tpu.models.parameters import DEFAULT_POPULATION
from bumpcosmology_tpu.ops.pallas_bump import bump_log_dn_pallas

MP = DEFAULT_POPULATION.mass


def _jax_ref(a, b, mpisn, mbhmax, sigma, n_grid=256):
    set_bump_kernel("jax")
    try:
        p = MP._replace(a=a, b=b, mpisn=mpisn, mbhmax=mbhmax, sigma=sigma)
        return pisn_bump_log_dndm_grid(p, n_grid)[2]
    finally:
        set_bump_kernel(None)


@pytest.mark.parametrize("n_grid", [128, 256])
def test_pallas_bump_forward_matches_jnp(n_grid):
    rng = np.random.default_rng(3)
    for _ in range(3):
        a = jnp.float32(MP.a + 0.3 * rng.normal())
        b = jnp.float32(MP.b + 0.3 * rng.normal())
        mpisn = jnp.float32(MP.mpisn + 2.0 * rng.normal())
        mbhmax = mpisn + jnp.float32(rng.uniform(2.0, 8.0))
        sigma = jnp.float32(rng.uniform(1.5, 3.5))
        ref = np.asarray(_jax_ref(a, b, mpisn, mbhmax, sigma, n_grid))
        got = np.asarray(bump_log_dn_pallas(a, b, mpisn, mbhmax, sigma, n_grid, True))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-5)


def test_pallas_bump_vjp_matches_autodiff():
    g = jnp.asarray(np.random.default_rng(0).normal(size=256).astype(np.float32))
    args0 = tuple(
        jnp.float32(v) for v in (MP.a, MP.b, MP.mpisn, MP.mbhmax, MP.sigma)
    )

    def loss_ref(*args):
        return jnp.vdot(g, _jax_ref(*args))

    def loss_pal(*args):
        return jnp.vdot(g, bump_log_dn_pallas(*args, 256, True))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args0)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(*args0)
    for name, r, p in zip(("a", "b", "mpisn", "mbhmax", "sigma"), gr, gp):
        np.testing.assert_allclose(
            float(p), float(r), rtol=2e-4, atol=1e-5, err_msg=f"grad wrt {name}"
        )


def test_pallas_bump_vmap_and_jit():
    from functools import partial

    f = partial(bump_log_dn_pallas, n_grid=128, interpret=True)
    rng = np.random.default_rng(1)
    B = 3
    a = jnp.asarray(1.8 + 0.1 * rng.normal(size=B), jnp.float32)
    b = jnp.asarray(-0.7 + 0.1 * rng.normal(size=B), jnp.float32)
    mpisn = jnp.asarray(31.0 + rng.normal(size=B), jnp.float32)
    mbhmax = mpisn + 5.0
    sigma = jnp.asarray(2.3 + 0.1 * rng.normal(size=B), jnp.float32)

    out = jax.jit(jax.vmap(f))(a, b, mpisn, mbhmax, sigma)
    assert out.shape == (B, 128) and np.isfinite(np.asarray(out)).all()

    grads = jax.jit(
        jax.grad(lambda *xs: 1e-4 * jnp.sum(jax.vmap(f)(*xs) ** 2), argnums=(0, 1, 2, 3, 4))
    )(a, b, mpisn, mbhmax, sigma)
    assert all(np.isfinite(np.asarray(x)).all() for x in grads)
