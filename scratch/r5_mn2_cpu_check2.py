"""CPU sanity v2 (vectorized): MN2 vs leapfrog accept at matched grads/traj."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from functools import partial
jax.config.update("jax_platforms", "cpu")

LAM = 0.19318332750378357
S = jnp.arange(1, 9, dtype=jnp.float32)

def U(x):
    return 0.5 * jnp.sum((x / S) ** 2) + 0.05 * jnp.sum((x / S) ** 4)

vag = jax.value_and_grad(U)

@partial(jax.jit, static_argnames=("n", "kind"))
def batch_accept(key, eps, n, kind):
    def traj(x, p):
        if kind == "lf":
            def body(i, c):
                x, p = c
                _, g = vag(x); p = p - 0.5 * eps * g
                x = x + eps * p
                _, g = vag(x); p = p - 0.5 * eps * g
                return x, p
        else:
            def body(i, c):
                x, p = c
                x = x + LAM * eps * p
                _, g = vag(x); p = p - 0.5 * eps * g
                x = x + (1 - 2 * LAM) * eps * p
                _, g = vag(x); p = p - 0.5 * eps * g
                x = x + LAM * eps * p
                return x, p
        return jax.lax.fori_loop(0, n, body, (x, p))

    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (400, 8)) * S
    p0 = jax.random.normal(k2, (400, 8))
    h0 = jax.vmap(U)(x0) + 0.5 * jnp.sum(p0 ** 2, -1)
    x1, p1 = jax.vmap(traj)(x0, p0)
    h1 = jax.vmap(U)(x1) + 0.5 * jnp.sum(p1 ** 2, -1)
    return jnp.mean(jnp.exp(jnp.minimum(h0 - h1, 0.0)))

T = 12.0
key = jax.random.PRNGKey(0)
print("target accept 0.8; grads/traj = n (leapfrog, fused) vs 2n (mn2)")
for kind in ("lf", "mn2"):
    for eps in (0.2, 0.3, 0.4, 0.6, 0.8, 1.0, 1.2, 1.6, 2.0):
        n = max(1, int(np.ceil(T / eps)))
        key, k = jax.random.split(key)
        a = float(batch_accept(k, jnp.float32(eps), n, kind))
        grads = n * (2 if kind == "mn2" else 1)
        print(f"{kind:4s} eps={eps:.1f} n={n:3d} grads/traj={grads:3d} accept={a:.3f}")
