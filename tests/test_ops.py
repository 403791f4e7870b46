"""L0 kernel tests against scipy/numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.integrate as sint
from jax.scipy.special import logsumexp as jss_logsumexp

from bumpcosmology_tpu import ops


def test_cumtrapz_matches_scipy():
    rng = np.random.default_rng(0)
    xs = np.sort(rng.uniform(0, 10, size=257))
    ys = np.sin(xs) + 2.0
    got = np.asarray(ops.cumtrapz(jnp.asarray(ys), jnp.asarray(xs)))
    want = sint.cumulative_trapezoid(ys, xs, initial=0.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cumtrapz_batched_axis():
    rng = np.random.default_rng(1)
    xs = np.linspace(0.0, 1.0, 33)
    ys = rng.normal(size=(4, 33))
    got = np.asarray(ops.cumtrapz(jnp.asarray(ys), jnp.asarray(xs), axis=-1))
    for i in range(4):
        want = sint.cumulative_trapezoid(ys[i], xs, initial=0.0)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


def test_trapz_matches_numpy():
    xs = np.linspace(0, np.pi, 101)
    ys = np.sin(xs)
    got = float(ops.trapz(jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(got, np.trapezoid(ys, xs), rtol=1e-6)


def test_log_trapz_matches_linear_domain():
    xs = np.linspace(0.1, 5.0, 200)
    ys = np.exp(-0.5 * (xs - 2.0) ** 2) * xs
    got = float(ops.log_trapz(jnp.log(ys), jnp.asarray(xs)))
    want = np.log(np.trapezoid(ys, xs))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_log_trapz_stable_at_large_magnitudes():
    # weights of order exp(800) would overflow any linear-domain accumulation
    xs = np.linspace(0.0, 1.0, 64)
    log_ys = 800.0 + np.sin(xs)
    got = float(ops.log_trapz(jnp.asarray(log_ys), jnp.asarray(xs)))
    want = 800.0 + np.log(np.trapezoid(np.exp(np.sin(xs)), xs))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_log_cumtrapz_consistent_with_cumtrapz():
    xs = np.linspace(0.5, 3.0, 50)
    ys = np.cosh(xs)
    got = np.asarray(ops.log_cumtrapz(jnp.log(ys), jnp.asarray(xs)))
    want = sint.cumulative_trapezoid(ys, xs, initial=0.0)
    assert got[0] == -np.inf
    np.testing.assert_allclose(np.exp(got[1:]), want[1:], rtol=5e-4)


def test_interp_matches_jnp_interp():
    rng = np.random.default_rng(2)
    xp = np.sort(rng.uniform(-3, 3, size=64))
    fp = np.cos(xp)
    x = rng.uniform(-4, 4, size=(7, 11))
    got = np.asarray(ops.interp(jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp)))
    want = np.interp(x, xp, fp)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_interp_unit_spaced_matches_interp():
    x0, dx, n = -2.0, 0.125, 64
    xp = x0 + dx * np.arange(n)
    fp = np.sin(xp)
    x = np.linspace(-3, 7, 301)
    got = np.asarray(ops.interp_unit_spaced(jnp.asarray(x), x0, dx, jnp.asarray(fp)))
    want = np.interp(x, xp, fp)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_inverse_interp_roundtrip():
    xp = np.linspace(0.0, 10.0, 128)
    fp = xp**2 + xp  # strictly increasing
    x = np.linspace(0.5, 9.5, 77)
    y = np.interp(x, xp, fp)
    back = np.asarray(ops.inverse_interp(jnp.asarray(y), jnp.asarray(xp), jnp.asarray(fp)))
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


def test_interp_gradients_flow_through_table():
    xp = jnp.linspace(0.0, 1.0, 16)

    def f(scale):
        return ops.interp(jnp.asarray(0.53), xp, scale * xp**2)

    g = jax.grad(f)(2.0)
    assert np.isfinite(g) and abs(float(g) - 0.53**2) < 0.01


def test_log_neff_matches_definition():
    rng = np.random.default_rng(3)
    w = rng.uniform(0.1, 2.0, size=100)
    want = np.sum(w) ** 2 / np.sum(w**2)
    got = float(ops.neff(jnp.log(w)))
    np.testing.assert_allclose(got, want, rtol=3e-4)


def test_logmeanexp():
    a = np.array([0.0, 1.0, 2.0])
    got = float(ops.logmeanexp(jnp.asarray(a)))
    np.testing.assert_allclose(got, np.log(np.mean(np.exp(a))), rtol=1e-4)


def test_sharded_logsumexp_equals_dense(cpu_devices):
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(np.array(cpu_devices[:8]), ("data",))
    rng = np.random.default_rng(4)
    a = rng.normal(size=(8 * 16, 5)).astype(np.float32) * 10

    def local(x):
        return ops.sharded_logsumexp(x, "data", axis=0)

    fn = shard_map(local, mesh=mesh, in_specs=P("data", None), out_specs=P(None))
    got = np.asarray(fn(jnp.asarray(a)))
    want = np.asarray(jss_logsumexp(jnp.asarray(a), axis=0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sharded_logsumexp_handles_neginf_shards(cpu_devices):
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(np.array(cpu_devices[:8]), ("data",))
    a = np.full((8 * 4,), -np.inf, dtype=np.float32)
    a[0] = 1.5

    def local(x):
        return ops.sharded_logsumexp(x, "data", axis=0)

    fn = shard_map(local, mesh=mesh, in_specs=P("data"), out_specs=P())
    got = float(fn(jnp.asarray(a)))
    np.testing.assert_allclose(got, 1.5, rtol=1e-6)


def test_interp_matmul_matches_gather():
    rng = np.random.default_rng(10)
    xp = np.sort(rng.uniform(-3, 3, size=100))
    fp = np.sin(xp)
    x = rng.uniform(-4, 4, size=(5, 33))
    a = np.asarray(ops.interp(jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp), method="gather"))
    b = np.asarray(ops.interp(jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp), method="matmul"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # exact at the knots, including the last one (half-open-segment edge case)
    at_knots = np.asarray(ops.interp(jnp.asarray(xp), jnp.asarray(xp), jnp.asarray(fp), method="matmul"))
    np.testing.assert_allclose(at_knots, fp, rtol=1e-5, atol=1e-6)


def test_interp_unit_spaced_matmul_matches_gather():
    x0, dx, n = -1.0, 0.25, 40
    fp = np.cos(x0 + dx * np.arange(n))
    x = np.linspace(-2, 10, 301)
    a = np.asarray(ops.interp_unit_spaced(jnp.asarray(x), x0, dx, jnp.asarray(fp), method="gather"))
    b = np.asarray(ops.interp_unit_spaced(jnp.asarray(x), x0, dx, jnp.asarray(fp), method="matmul"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_interp_matmul_gradients_match_gather():
    xp = jnp.linspace(0.0, 1.0, 16)
    x = jnp.asarray([0.53, 0.01, 0.99])

    def f(method):
        def g(scale, xq):
            return jnp.sum(ops.interp(xq, xp, scale * xp**2, method=method))
        return g

    for arg in (0, 1):
        ga = jax.grad(f("gather"), argnums=arg)(2.0, x)
        gb = jax.grad(f("matmul"), argnums=arg)(2.0, x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-6)


def test_interp_matmul_nan_poisoning_documented():
    """matmul interp requires finite tables: -inf entries poison every query
    (0 * inf = NaN).  Producers clamp; this test pins the behavior."""
    fp = jnp.asarray([-jnp.inf, 1.0, 2.0, 3.0])
    x = jnp.asarray([2.5])
    good = ops.interp_unit_spaced(x, 0.0, 1.0, fp, method="gather")
    np.testing.assert_allclose(float(good[0]), 2.5)
    bad = ops.interp_unit_spaced(x, 0.0, 1.0, fp, method="matmul")
    assert np.isnan(float(bad[0]))
    # clamped table: both methods agree
    fp_c = jnp.asarray([-1e4, 1.0, 2.0, 3.0])
    a = ops.interp_unit_spaced(x, 0.0, 1.0, fp_c, method="matmul")
    np.testing.assert_allclose(float(a[0]), 2.5)


def test_interp_unit_tiled_exact_vs_flat():
    """Tiled two-level formulation is exact linear interp: matches gather and
    matmul for scalar and multi-column tables, any K (auto-padding), including
    out-of-range clamping and gradients through table AND queries."""
    import jax

    from bumpcosmology_tpu.ops.interp import interp_unit_spaced, interp_unit_tiled

    rng = np.random.default_rng(7)
    # two combos keep the coverage axes (multi-column, non-divisible K with
    # auto-padding) at half the compile count; the 1024-wide production shape
    # is exercised by the model-level lookup tests
    for K, C, tile in [(256, 2, 16), (100, 1, 32)]:
        fp = jnp.asarray(
            rng.normal(size=(K,)) if C == 1 else rng.normal(size=(K, C))
        )
        x0, dx = -1.5, 0.013
        x = jnp.asarray(rng.uniform(-2.5, x0 + dx * (K + 60), size=768))
        ref = interp_unit_spaced(x, x0, dx, fp, method="gather")
        for got in (
            interp_unit_tiled(x, x0, dx, fp, tile=tile),
            interp_unit_spaced(x, x0, dx, fp, method="tiled"),
            interp_unit_spaced(x, x0, dx, fp, method="matmul"),
        ):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6, atol=2e-6)

        g_ref = jax.grad(
            lambda f, xx: jnp.sum(interp_unit_spaced(xx, x0, dx, f, method="gather") ** 2),
            argnums=(0, 1),
        )(fp, x)
        g_til = jax.grad(
            lambda f, xx: jnp.sum(interp_unit_tiled(xx, x0, dx, f, tile=tile) ** 2),
            argnums=(0, 1),
        )(fp, x)
        for a, b in zip(g_ref, g_til):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_static_bracket_matches_gather():
    """fetch_static_bracket == interp_unit_spaced for in-range + clamped
    queries, single- and multi-column tables, value and table-gradient."""
    import jax

    from bumpcosmology_tpu.ops.interp import (
        fetch_static_bracket,
        interp_unit_spaced,
        static_bracket_weights,
    )

    rng = np.random.default_rng(11)
    for K, C in [(256, 2), (100, 1)]:
        fp = jnp.asarray(
            rng.normal(size=(K,)) if C == 1 else rng.normal(size=(K, C))
        )
        x0, dx = -0.8, 0.021
        # queries beyond both ends exercise the constant-extrapolation clamp
        x = rng.uniform(x0 - 0.5, x0 + dx * (K + 20), size=513)
        onehot, frac = static_bracket_weights(x, x0, dx, K)
        assert onehot.shape == (513, K - 1)
        np.testing.assert_allclose(onehot.sum(axis=1), 1.0)
        ref = interp_unit_spaced(jnp.asarray(x), x0, dx, fp, method="gather")
        got = fetch_static_bracket(onehot, frac, fp)
        # tolerance: the bracket positions are computed in float64 numpy, the
        # gather path computes (x-x0)/dx in f32 on device — in-cell positions
        # differ by ~K*eps_f32, so fetched values differ by up to ~1e-4*|df|
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

        g_ref = jax.grad(
            lambda f: jnp.sum(interp_unit_spaced(jnp.asarray(x), x0, dx, f, method="gather") ** 2)
        )(fp)
        g_got = jax.grad(lambda f: jnp.sum(fetch_static_bracket(onehot, frac, f) ** 2))(fp)
        # same f64-vs-f32 position tolerance as the value check above
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=2e-4, atol=5e-4)


def test_bracket_potential_matches_fused_path():
    """The joint potential with precomputed brackets equals the per-eval
    fused-table path at the same n_det (value + gradient, f32 tolerance)."""
    import jax

    from bumpcosmology_tpu.inference import likelihoods as lk
    from bumpcosmology_tpu.inference.model import make_potential, prior_sample
    from bumpcosmology_tpu.testing import synthetic_pop_cosmo_data

    data = synthetic_pop_cosmo_data(nobs=4, nsamp=16, nsel=64)
    spec = lk.pop_cosmo_model_spec(data, n_grid=48, n_z=128, n_det=128)
    try:
        lk.set_bracket_fetch(True)  # brackets default off on the CPU backend
        pot_new = jax.jit(jax.value_and_grad(make_potential(spec)))
        theta = prior_sample(spec, jax.random.PRNGKey(1))
        v_new, g_new = pot_new(theta)
    finally:
        lk.set_bracket_fetch(None)
    pot_old = jax.jit(
        jax.value_and_grad(
            make_potential(lk.pop_cosmo_model_spec(data, n_grid=48, n_z=128, n_det=128))
        )
    )
    v_old, g_old = pot_old(theta)
    np.testing.assert_allclose(float(v_new), float(v_old), rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_old), rtol=5e-3, atol=5e-3
    )
