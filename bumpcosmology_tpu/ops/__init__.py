"""L0 numerics kernels: quadrature, interpolation, log-domain reductions."""
from bumpcosmology_tpu.ops.integrate import cumtrapz, trapz, log_trapz, log_cumtrapz
from bumpcosmology_tpu.ops.interp import interp, interp_unit_spaced, inverse_interp, set_default_method
from bumpcosmology_tpu.ops.logsumexp import (
    logsumexp,
    logmeanexp,
    sharded_logsumexp,
    log_neff,
    neff,
)

__all__ = [
    "cumtrapz",
    "trapz",
    "log_trapz",
    "log_cumtrapz",
    "interp",
    "interp_unit_spaced",
    "inverse_interp",
    "logsumexp",
    "logmeanexp",
    "sharded_logsumexp",
    "log_neff",
    "neff",
]
