"""L5: figure scripts (parity with the reference's 8 figures)."""
from bumpcosmology_tpu.figures.plots import (
    FIGURES,
    dndm_fitted,
    cosmo_params_corner,
    h_zoomin,
    omh2_zoomin,
    shape_corner,
    m1_vs_m2,
    dndm_pisn_effects,
    mock_observation_corner,
)
