"""Rehearsal fixtures: format-faithful GWTC/endo3 files through the REAL
ingestion path and (slow) the full real-data pipeline journey."""
import h5py
import numpy as np
import pytest

from bumpcosmology_tpu.data import (
    default_pop_wt,
    extract_posterior_samples,
    extract_selection_samples,
)
from bumpcosmology_tpu.data.rehearsal import write_rehearsal_catalog


@pytest.fixture(scope="module")
def rehearsal_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("rehearsal")
    pe_dir = root / "pe-samples-raw"
    inj = root / "endo3_bbhpop-LIGO-T2100113-v12.hdf5"
    n = write_rehearsal_catalog(
        pe_dir, inj, n_events=6, nsamp_store=2048, campaign_ndraw=120_000,
        threshold=20.0, seed=11,
    )
    return root, pe_dir, inj, n


def test_rehearsal_pe_layout_matches_real_releases(rehearsal_dir):
    _, pe_dir, _, n = rehearsal_dir
    files = sorted(pe_dir.glob("*.h5"))
    assert len(files) == n >= 4
    o3a = [f for f in files if "GWTC2p1" in f.name]
    o3b = [f for f in files if "GWTC3p0" in f.name]
    assert o3a and o3b
    with h5py.File(o3a[0]) as f:
        # real O3a layout: PublicationSamples + sibling analyses
        assert "PublicationSamples" in f and "C01:IMRPhenomPv2" in f
        arr = f["PublicationSamples/posterior_samples"][:]
        for field in ("mass_1_source", "mass_ratio", "redshift", "luminosity_distance"):
            assert field in arr.dtype.names
    with h5py.File(o3b[0]) as f:
        assert "C01:Mixed" in f and "PublicationSamples" not in f


def test_rehearsal_files_pass_real_ingestion(rehearsal_dir):
    _, pe_dir, inj, _ = rehearsal_dir
    rng = np.random.default_rng(0)
    n_ok = 0
    for f in sorted(pe_dir.glob("*.h5")):
        try:
            m1, q, z, wt = extract_posterior_samples(
                f, 128, desired_pop_wt=default_pop_wt, rng=rng
            )
        except ValueError:
            continue  # m2/Neff rejection is allowed, as with real events
        assert np.all(np.isfinite(m1)) and np.all((q > 0) & (q <= 1)) and np.all(wt > 0)
        n_ok += 1
    assert n_ok >= 3, "too many rehearsal events rejected at ingestion"

    m1, q, z, pdraw, nsel = extract_selection_samples(
        inj, 512, desired_pop_wt=default_pop_wt, rng=rng
    )
    assert m1.shape == (512,)
    assert np.all(pdraw > 0) and np.isfinite(pdraw).all()


def test_rehearsal_injection_pdraw_roundtrip(rehearsal_dir):
    """pdf_m1m2 * pdf_z * m1 must reproduce the campaign's pdraw_mqz / yr."""
    _, _, inj, _ = rehearsal_dir
    with h5py.File(inj) as f:
        g = f["injections"]
        m1 = g["mass1_source"][:]
        pdraw = g["mass1_source_mass2_source_sampling_pdf"][:] * g["redshift_sampling_pdf"][:] * m1
        assert np.all(pdraw > 0)
        assert f.attrs["n_accepted"] + f.attrs["n_rejected"] == f.attrs["total_generated"]


@pytest.mark.slow
def test_real_data_pipeline_journey(tmp_path):
    """The full real-data path end-to-end on rehearsal inputs:
    draw_pe_samples -> draw_selection_samples -> sample + sample_cosmo
    -> all 8 figures, exactly as `pipeline all figures` would run them."""
    import matplotlib

    matplotlib.use("Agg")

    from bumpcosmology_tpu.pipeline.config import PipelineConfig
    from bumpcosmology_tpu.pipeline.stages import build_pipeline

    data_dir = tmp_path / "data"
    pe_dir = data_dir / "pe-samples-raw"
    inj = data_dir / "endo3_bbhpop-LIGO-T2100113-v12.hdf5"
    write_rehearsal_catalog(
        pe_dir, inj, n_events=10, nsamp_store=2048, campaign_ndraw=150_000,
        threshold=20.0, seed=13,
    )

    # small mock-branch artifact so the 8th figure (mock_observation_corner)
    # renders too — on real runs that comes from `pipeline mock`
    from bumpcosmology_tpu.mock import add_observation_noise, draw_injection_campaign
    from bumpcosmology_tpu.utils.io import write_table

    camp = draw_injection_campaign(ndraw=30_000, seed=5, snr_chunk=16384)
    write_table(
        data_dir / "mock_observations.h5",
        add_observation_noise(camp, seed=6, threshold=20.0),
        key="observations",
    )

    cfg = PipelineConfig()
    cfg.paths.data_dir = str(data_dir)
    cfg.paths.pe_raw_dir = str(pe_dir)
    cfg.paths.injection_file = str(inj)
    cfg.ingest.nsamp_pe = 64
    cfg.ingest.nsamp_sel = 512
    cfg.fit.num_warmup = 200
    cfg.fit.num_samples = 150
    cfg.fit.num_chains = 2
    cfg.fit.n_grid = 128
    cfg.fit.n_z = 256

    pipe = build_pipeline(cfg)
    pipe.run(["sample", "sample_cosmo"])

    assert (data_dir / "pe-samples.h5").exists()
    assert (data_dir / "selection-samples.h5").exists()
    assert (data_dir / "trace.h5").exists()
    assert (data_dir / "trace_cosmo.h5").exists()

    from bumpcosmology_tpu.figures.plots import FIGURES, render_all

    out = tmp_path / "figures"
    made = render_all(cfg, out_dir=out, skip_missing=False)
    assert len(made) == len(FIGURES)
    for p in made:
        assert p.exists() and p.stat().st_size > 0

    # the leave-one-out influence stage rides the same artifacts
    import h5py

    cfg.loo.model = "pop"
    cfg.loo.num_warmup = 100
    cfg.loo.num_samples = 64
    pipe.run(["loo"])
    assert (data_dir / "influence.h5").exists()
    with h5py.File(data_dir / "influence.h5") as f:
        nobs = len(f["event"])
        assert nobs >= 2
        assert f["h" if "h" in f else "a"]["z"].shape == (nobs,)
    made2 = render_all(cfg, out_dir=out, skip_missing=False)
    assert any(str(p).endswith("event_influence.pdf") for p in made2)

    # predictive model comparison rides the same two traces
    cfg.compare.max_draws = 64
    cfg.compare.batch = 16
    pipe.run(["compare"])
    assert (data_dir / "model_compare.h5").exists()
    with h5py.File(data_dir / "model_compare.h5") as f:
        assert f.attrs["best_model"] in ("pop", "pop_cosmo")
        for model in ("pop", "pop_cosmo"):
            assert f[model]["elpd_i"].shape == (nobs,)
            assert f[model]["khat"].shape == (nobs,)
            assert np.isfinite(f[model].attrs["elpd"])
            assert f[model].attrs["n_draws"] == 64
        assert "pop" in f.attrs["table"] and "pop_cosmo" in f.attrs["table"]
        # bridge-sampling marginal likelihoods ride the same pass
        assert "pop" in f.attrs["bf_table"]
        for model in ("pop", "pop_cosmo"):
            assert np.isfinite(f[model].attrs["log_z"])

    # a second mass-model family on the same catalog: the PLPeak fit writes
    # trace_plpeak.h5 and the compare stage picks it up automatically
    from bumpcosmology_tpu.pipeline.stages import run_pop_fit

    cfg.fit.mass_family = "plpeak"
    cfg.fit.num_warmup = 150
    cfg.fit.num_samples = 100
    run_pop_fit(cfg)
    cfg.fit.mass_family = "bump"
    assert (data_dir / "trace_plpeak.h5").exists()
    # re-run compare directly (the artifact cache would skip the stage)
    from bumpcosmology_tpu.pipeline.stages import _stage_compare

    _stage_compare(cfg)
    with h5py.File(data_dir / "model_compare.h5") as f:
        assert "pop_plpeak" in f
        assert f["pop_plpeak"]["elpd_i"].shape == (nobs,)
        assert np.isfinite(f["pop_plpeak"].attrs["elpd"])
        assert "pop_plpeak" in f.attrs["table"]
        assert np.isfinite(f["pop_plpeak"].attrs["log_z"])


@pytest.mark.slow
def test_pipeline_all_rehearsal_one_command(tmp_path):
    """VERDICT r2 #4 done-criterion: ONE command takes an empty data dir to
    figures + report with fetch unreachable — ``pipeline all --rehearsal``.
    The fetch stage fails fast offline, generates rehearsal fixtures, and the
    real ingestion → fits → figures → report chain completes against them."""
    from bumpcosmology_tpu.pipeline.__main__ import main

    data_dir = tmp_path / "empty"
    rc = main([
        "all", "--rehearsal", "--data-dir", str(data_dir),
        f"paths.pe_raw_dir={data_dir}/pe-samples-raw",
        f"paths.injection_file={data_dir}/endo3_rehearsal.hdf5",
        "ingest.rehearsal_events=6",
        "ingest.rehearsal_campaign_ndraw=150000",
        "ingest.nsamp_pe=64", "ingest.nsamp_sel=512",
        "fit.num_warmup=150", "fit.num_samples=100", "fit.num_chains=2",
        "fit.n_grid=64", "fit.n_z=128",
    ])
    assert rc == 0
    assert (data_dir / "input_manifest.json").exists()
    assert (data_dir / "pe-samples.h5").exists()
    assert (data_dir / "trace.h5").exists()
    assert (data_dir / "trace_cosmo.h5").exists()
    figs = list((data_dir / "figures").glob("*.pdf"))
    assert len(figs) >= 7  # mock-branch figure legitimately absent
    report = data_dir / "report"
    assert (report / "ms.tex").exists() and (report / "report.pdf").exists()


@pytest.mark.slow
def test_rehearsal_full_56_event_inventory(tmp_path):
    """Round-5 real-data on-ramp: the rehearsal writes the EXACT 56 Zenodo
    release filenames (33 GWTC-2.1 + 23 GWTC-3, Snakefile:3-58) in the real
    per-catalog layouts, and the real ingestion stages produce both fit
    inputs from them — a live environment needs zero new code after fetch."""
    from bumpcosmology_tpu.data.fetch import ZENODO_FILES
    from bumpcosmology_tpu.data.rehearsal import write_rehearsal_catalog
    from bumpcosmology_tpu.pipeline.config import PipelineConfig
    from bumpcosmology_tpu.pipeline.stages import build_pipeline

    data_dir = tmp_path / "data"
    pe_dir = data_dir / "pe-samples-raw"
    inj = data_dir / "endo3_bbhpop-LIGO-T2100113-v12.hdf5"
    n = write_rehearsal_catalog(
        pe_dir, inj, nsamp_store=1024, campaign_ndraw=1_200_000,
        threshold=12.0, seed=29, use_real_inventory=True,
    )
    assert n == 56
    want = {name for _, name in ZENODO_FILES}
    got = {p.name for p in pe_dir.glob("*.h5")}
    assert got == want, f"missing: {sorted(want - got)[:3]} extra: {sorted(got - want)[:3]}"

    cfg = PipelineConfig()
    cfg.paths.data_dir = str(data_dir)
    cfg.paths.pe_raw_dir = str(pe_dir)
    cfg.paths.injection_file = str(inj)
    cfg.ingest.nsamp_pe = 128  # the reference's own nsamp (draw_pe_samples.py:11)
    cfg.ingest.nsamp_sel = 1024

    pipe = build_pipeline(cfg)
    pipe.run(["draw_pe_samples", "draw_selection_samples"])
    assert (data_dir / "pe-samples.h5").exists()
    assert (data_dir / "selection-samples.h5").exists()

    from bumpcosmology_tpu.utils.io import read_table

    pe = read_table(data_dir / "pe-samples.h5")
    n_events = pe["evt"].nunique()
    # the m2-median / Neff ingestion rejections may drop a few events, as
    # they do on real data (weighting.py:88-100) — but the bulk must survive
    assert n_events >= 45, f"only {n_events}/56 events survived ingestion"
    assert set(pe.columns) >= {"evt", "m1", "q", "z", "wt"}
