"""L3: catalog ingestion and importance weighting."""
from bumpcosmology_tpu.data.weights import (
    default_pop_wt,
    li_prior_wt,
    dm1sqz_dm1ddqdl,
    planck18_dl_np,
    planck18_dc_np,
    planck18_z_of_dl_np,
    planck18_dvc_dz_np,
    planck18_efunc_np,
)
from bumpcosmology_tpu.data.gwtc import (
    extract_posterior_samples,
    extract_selection_samples,
    RejectedEventError,
)
from bumpcosmology_tpu.data.resample import resample_injections, importance_neff
