"""Probe the inter-basin valley: barrier height along the connecting path,
and whether mpisn*(1+z_pivot(cosmo)) is conserved along it (the proposed
straightening coordinate)."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bumpcosmology_tpu.benchdata import mock_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec, cosmo_from_sites
from bumpcosmology_tpu.inference.model import constrain, make_potential
from bumpcosmology_tpu.models.cosmology import build_cosmology, z_at_dl

data = mock_pop_cosmo_data(nobs=56, nsamp=128, nsel=1024)
spec = pop_cosmo_model_spec(data)
potential = make_potential(spec)
names = list(spec.names)

dm = np.load("/root/repo/scratch/diag_cpu_128_1024.npz")
dg = np.load("/root/repo/scratch/diag_global.npz")
tm = dm["theta_map"]
ft, fu = dg["finals_theta"], dg["finals_u"]
deep = ft[np.argmin(fu)]

# median detector-frame dL of the catalog events = pivot distance
dl_piv = float(np.median(np.asarray(data.events.c)))
print(f"# pivot dL = {dl_piv:.3f} Gpc")

U = jax.jit(potential)
print("\n# --- path scan map -> deep basin (101 points, linear in unconstrained) ---")
ts = np.linspace(0.0, 1.0, 101)
pts = jnp.asarray(tm)[None, :] * (1 - ts)[:, None] + jnp.asarray(deep)[None, :] * ts[:, None]
us = np.asarray(jax.vmap(U)(pts))
print("U along path: start %.3f end %.3f max %.3f (barrier over line: %.3f)"
      % (us[0], us[-1], us.max(), us.max() - max(us[0], us[-1])))
i_max = np.argmax(us)
print("barrier at t=%.2f" % ts[i_max])
print("profile:", np.array2string(us[::10] - us.min(), precision=2))

print("\n# --- is mpisn*(1+z_piv) conserved along the path? ---")
for t_idx in range(0, 101, 10):
    sites = constrain(spec, pts[t_idx])
    cosmo = build_cosmology(cosmo_from_sites(sites), n=1024)
    zp = float(z_at_dl(cosmo, dl_piv))
    mp = float(sites["mpisn"])
    sg = float(sites["sigma"])
    h = float(sites["h"])
    print(f"t={ts[t_idx]:.1f}: h={h:.3f} mpisn={mp:6.2f} zpiv={zp:.3f} "
          f"mpisn*(1+zpiv)={mp*(1+zp):7.2f} sigma*(1+zpiv)={sg*(1+zp):6.2f} U={us[t_idx]:.2f}")
