"""Mock universe: inverse-CDF samplers, waveform/SNR kernels, catalog pipeline."""
from bumpcosmology_tpu.mock.sampling import MadauZPDF, PowerLawPDF, InterpolatedPDF
from bumpcosmology_tpu.mock.waveform import phenom_a_amplitude, chirp_mass, chirp_time_bound
from bumpcosmology_tpu.mock.detector import DETECTORS, antenna_pattern
from bumpcosmology_tpu.mock.psd import aligo_design_psd, advirgo_design_psd, tabulated_psd, PSDS
from bumpcosmology_tpu.mock.snr import frequency_grid, network_snr, network_snr_batched
from bumpcosmology_tpu.mock.catalog import (
    Z_HORIZON,
    CHIRP_DIST_MIN,
    DETECTION_SNR,
    draw_injection_campaign,
    campaign_summary,
    add_observation_noise,
    Uncertainties,
    draw_mock_pe_samples,
    draw_one_year_catalog,
)
