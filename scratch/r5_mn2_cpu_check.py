"""CPU sanity: MN2 vs leapfrog stable step at matched accept on a Gaussian+quartic."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

LAM = 0.19318332750378357

def U(x):  # mildly anharmonic 8-dim target
    s = jnp.arange(1, 9, dtype=jnp.float32)
    return 0.5 * jnp.sum((x / s) ** 2) + 0.05 * jnp.sum((x / s) ** 4)

vag = jax.value_and_grad(U)

def traj_lf(x, p, eps, n):
    def body(i, c):
        x, p = c
        _, g = vag(x); p = p - 0.5 * eps * g
        x = x + eps * p
        _, g = vag(x); p = p - 0.5 * eps * g
        return x, p
    return jax.lax.fori_loop(0, n, body, (x, p))

def traj_mn2(x, p, eps, n):
    def body(i, c):
        x, p = c
        x = x + LAM * eps * p
        _, g = vag(x); p = p - 0.5 * eps * g
        x = x + (1 - 2 * LAM) * eps * p
        _, g = vag(x); p = p - 0.5 * eps * g
        x = x + LAM * eps * p
        return x, p
    return jax.lax.fori_loop(0, n, body, (x, p))

T = 12.0
key = jax.random.PRNGKey(0)
s = jnp.arange(1, 9, dtype=jnp.float32)
for name, traj, gpers in (("leapfrog", traj_lf, 2), ("mn2", traj_mn2, 2)):
    # note: this leapfrog impl also does 2 grads/step (unfused), so compare
    # accept at equal eps; the production leapfrog fuses to 1 grad/step --
    # the fair metric is grads per trajectory at matched accept.
    for eps in (0.2, 0.4, 0.6, 0.8, 1.0, 1.2):
        n = max(1, int(np.ceil(T / eps)))
        accs = []
        for i in range(200):
            key, k1, k2 = jax.random.split(key, 3)
            x0 = jax.random.normal(k1, (8,)) * s
            p0 = jax.random.normal(k2, (8,))
            h0 = U(x0) + 0.5 * jnp.sum(p0 ** 2)
            x1, p1 = traj(x0, p0, jnp.float32(eps), n)
            h1 = U(x1) + 0.5 * jnp.sum(p1 ** 2)
            accs.append(float(jnp.exp(jnp.minimum(h0 - h1, 0.0))))
        grads = n * (2 if name == "mn2" else 1)
        print(f"{name:8s} eps={eps:.1f} n={n:3d} grads/traj={grads:3d} accept={np.mean(accs):.3f}")
