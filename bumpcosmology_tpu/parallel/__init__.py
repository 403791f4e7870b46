"""Mesh/sharding layer: (chains, data) device meshes and sharded likelihoods."""
from bumpcosmology_tpu.parallel.mesh import (
    CHAIN_AXIS,
    DATA_AXIS,
    make_mesh,
    replicated,
    chain_sharding,
)
from bumpcosmology_tpu.parallel.sharding import (
    pop_data_pspecs,
    pop_cosmo_data_pspecs,
    shard_pop_data,
    shard_pop_cosmo_data,
    make_sharded_pop_loglike,
    make_sharded_pop_cosmo_loglike,
)
