"""Native (C++) kernel tests: build, ABI, and cross-checks vs JAX/numpy."""
import numpy as np
import pytest

from bumpcosmology_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_snr_matches_jax_kernel():
    import jax.numpy as jnp

    from bumpcosmology_tpu.data.weights import planck18_dl_np
    from bumpcosmology_tpu.mock.snr import frequency_grid, network_snr

    rng = np.random.default_rng(0)
    n = 200
    m1 = rng.uniform(10, 60, n)
    q = rng.uniform(0.4, 1.0, n)
    z = rng.uniform(0.05, 1.0, n)
    dl = planck18_dl_np(z)
    args = (
        m1 * (1 + z),
        m1 * q * (1 + z),
        dl,
        np.arccos(rng.uniform(-1, 1, n)),
        rng.uniform(0, 2 * np.pi, n),
        np.arcsin(rng.uniform(-1, 1, n)),
        rng.uniform(0, np.pi, n),
        rng.uniform(0, 2 * np.pi, n),
    )
    got = native.network_snr_native(*args)
    want = network_snr(*(jnp.asarray(a, jnp.float32) for a in args), frequency_grid())
    for det in ("H1", "L1", "V1", "net"):
        np.testing.assert_allclose(got[det], np.asarray(want[det]), rtol=5e-3, atol=1e-3)


def test_alias_sample_distribution():
    rng = np.random.default_rng(1)
    w = rng.uniform(0.1, 5.0, size=1000)
    k = 200_000
    idx = native.alias_sample(w, k, seed=42)
    assert idx.shape == (k,)
    assert idx.min() >= 0 and idx.max() < len(w)
    counts = np.bincount(idx, minlength=len(w))
    expected = w / w.sum() * k
    # chi^2-ish: relative error on well-populated bins
    mask = expected > 50
    rel = np.abs(counts[mask] - expected[mask]) / np.sqrt(expected[mask])
    assert np.mean(rel) < 2.0
    assert np.max(rel) < 6.0


def test_alias_sample_deterministic():
    w = np.array([1.0, 2.0, 3.0])
    a = native.alias_sample(w, 100, seed=7)
    b = native.alias_sample(w, 100, seed=7)
    np.testing.assert_array_equal(a, b)
    c = native.alias_sample(w, 100, seed=8)
    assert not np.array_equal(a, c)
