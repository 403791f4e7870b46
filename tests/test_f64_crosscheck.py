"""Cross-precision posterior validation (VERDICT #4b).

The reference runs numpyro on CPU where JAX defaults to float32 but the user
can enable x64; the rebuild runs f32 on TPU.  This check pins that f32 is
*sufficient*: the same physical mock catalog fit in float32 and float64 (same
NUTS config, CPU) must give posterior means within Monte-Carlo error for every
site — i.e. any f32-induced bias is far below statistical error.

Each precision runs in its own subprocess because ``jax_enable_x64`` is
process-global; the catalog is rebuilt identically from the seeded numpy
mock universe in both.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

_RUNNER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
X64 = sys.argv[1] == "1"
if X64:
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from bumpcosmology_tpu.benchdata import mock_pop_data
from bumpcosmology_tpu.inference.likelihoods import pop_model_spec
from bumpcosmology_tpu.inference.sampler import fit

dtype = jnp.float64 if X64 else jnp.float32
data = mock_pop_data(nobs=12, nsamp=48, nsel=384, ndraw_campaign=60_000,
                     threshold=20.0, seed=501, dtype=dtype)
assert data.events.a.dtype == dtype
spec = pop_model_spec(data, n_grid=128)
res = fit(spec, jax.random.PRNGKey(7), num_warmup=500, num_samples=800,
          num_chains=2, verbose=False)
summ = res.summary()
out = {k: {"mean": s["mean"], "sd": s["sd"], "ess": s["ess"], "rhat": s["rhat"]}
       for k, s in summ.items()}
print(json.dumps(out))
"""


def _run(x64: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    r = subprocess.run(
        [sys.executable, "-c", _RUNNER, x64],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_f32_posterior_matches_f64_within_mc_error():
    s32 = _run("0")
    s64 = _run("1")
    assert set(s32) == set(s64)
    worst = None
    for site in s32:
        a, b = s32[site], s64[site]
        assert a["rhat"] < 1.05 and b["rhat"] < 1.05, (site, a["rhat"], b["rhat"])
        se = np.hypot(
            a["sd"] / np.sqrt(max(a["ess"], 1.0)), b["sd"] / np.sqrt(max(b["ess"], 1.0))
        )
        zscore = abs(a["mean"] - b["mean"]) / max(se, 1e-12)
        worst = max(worst or 0.0, zscore)
        assert zscore < 4.0, (
            f"{site}: f32 mean {a['mean']:.4g} vs f64 {b['mean']:.4g} "
            f"differs by {zscore:.1f} MC standard errors"
        )
        # spread agreement too: f32 must not inflate/deflate the posterior
        assert 0.7 < a["sd"] / b["sd"] < 1.4, (site, a["sd"], b["sd"])
    print(f"worst |z| across sites: {worst:.2f}")


@pytest.mark.slow
def test_joint_f32_matches_f64_golden():
    """JOINT-model cross-precision check (VERDICT r2 #3): an f32 fit of the
    reference-scale detector-frame catalog must match the committed float64
    golden trace (``benchmarks/make_f64_joint_golden.py``) within MC error on
    every site, with spread agreement — covering exactly the f32-risk path
    (z(dL) inversion, detector-table interpolation, selection logsumexp)."""
    import jax

    golden_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "golden_joint_f64.npz",
    )
    if not os.path.exists(golden_path):
        pytest.skip("golden_joint_f64.npz not generated yet")
    import jax.numpy as jnp

    from bumpcosmology_tpu.benchdata import mock_pop_cosmo_data
    from bumpcosmology_tpu.inference.diagnostics import summary
    from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
    from bumpcosmology_tpu.inference.sampler import fit

    with np.load(golden_path) as d:
        cfg = json.loads(str(d["config"]))
        golden = {
            k[len("post_"):]: d[k] for k in d.files if k.startswith("post_")
        }
    g_summ = summary(golden)

    data = mock_pop_cosmo_data(
        nobs=cfg["nobs"], nsamp=cfg["nsamp"], nsel=cfg["nsel"],
        ndraw_campaign=cfg["ndraw_campaign"], threshold=cfg["threshold"],
        seed=cfg["seed"],
    )
    assert data.events.a.dtype == jnp.float32
    spec = pop_cosmo_model_spec(data, n_grid=cfg["n_grid"], n_z=cfg["n_z"])
    # smaller f32 draw budget: MC error is then dominated by this run and the
    # z-score below accounts for it through the combined standard error
    res = fit(spec, jax.random.PRNGKey(11), num_warmup=500, num_samples=400,
              num_chains=2, verbose=False)
    f_summ = res.summary()

    assert set(f_summ) == set(g_summ)
    worst = None
    for site in f_summ:
        a, b = f_summ[site], g_summ[site]
        assert a["rhat"] < 1.05, (site, a["rhat"])
        se = np.hypot(
            a["sd"] / np.sqrt(max(a["ess"], 1.0)), b["sd"] / np.sqrt(max(b["ess"], 1.0))
        )
        z = abs(a["mean"] - b["mean"]) / max(se, 1e-12)
        worst = max(worst or 0.0, z)
        assert z < 4.0, (
            f"{site}: f32 mean {a['mean']:.4g} vs f64 golden {b['mean']:.4g} "
            f"differs by {z:.1f} MC standard errors"
        )
        assert 0.7 < a["sd"] / b["sd"] < 1.4, (site, a["sd"], b["sd"])
    print(f"worst |z| across joint sites: {worst:.2f}")
