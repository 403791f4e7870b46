"""bumpcosmology_tpu — a TPU-native hierarchical Bayesian population-inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
BumpCosmology repository (spectral-siren cosmology with a physical PISN-bump
black-hole mass function; see ``/root/reference/src/scripts``): population and
cosmology models, hierarchical Monte-Carlo marginal likelihoods with
injection-based selection correction, a built-in NUTS sampler with dense-mass
windowed adaptation and vectorized chains, mesh-sharded likelihood reductions,
an on-device mock-injection (waveform + SNR) pipeline, GWTC catalog ingestion,
and an artifact-cached pipeline runner.

Layering (cf. SURVEY.md §1):

- :mod:`bumpcosmology_tpu.ops`        — L0 numerics (cumtrapz, log-trapz, interp, sharded logsumexp)
- :mod:`bumpcosmology_tpu.models`     — L1 population & cosmology models
- :mod:`bumpcosmology_tpu.inference`  — L2 probabilistic models, priors, NUTS, diagnostics
- :mod:`bumpcosmology_tpu.parallel`   — mesh/sharding layer (chains x data axes)
- :mod:`bumpcosmology_tpu.data`       — L3 catalog ingestion and importance weighting
- :mod:`bumpcosmology_tpu.mock`       — mock universe: inverse-CDF samplers, waveform/SNR kernels
- :mod:`bumpcosmology_tpu.pipeline`   — L4/L6 entry points and artifact-cached DAG
- :mod:`bumpcosmology_tpu.figures`    — L5 figure scripts
"""

__version__ = "0.1.0"
