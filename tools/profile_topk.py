import sys; sys.path.insert(0, ".")
import time, numpy as np, jax, jax.numpy as jnp

N, K = 16384, 256
ITERS = 64

def scan_time(body, name):
    def scanned(key):
        xs = jax.random.split(key, ITERS)
        def f(c, k):
            x = jax.random.normal(k, (N,))
            return c + body(x, k), 0
        total, _ = jax.lax.scan(f, 0.0, xs)
        return total
    fn = jax.jit(scanned)
    float(np.asarray(fn(jax.random.PRNGKey(0))))
    t0 = time.perf_counter()
    float(np.asarray(fn(jax.random.PRNGKey(1))))
    print(f"{name}: {(time.perf_counter()-t0)/ITERS*1e3:.3f} ms/iter", flush=True)

scan_time(lambda x, k: 0.0, "baseline (rng only)")
scan_time(lambda x, k: jnp.sum(jax.lax.top_k(x, K)[1]), "exact top_k")
scan_time(lambda x, k: jnp.sum(jax.lax.approx_max_k(x, K)[1]), "approx_max_k")
scan_time(lambda x, k: jnp.sum(jax.lax.approx_max_k(x, K, recall_target=0.99)[1]), "approx_max_k r=0.99")
scan_time(lambda x, k: jnp.sum(jax.lax.top_k(x, K)[1]) + jnp.sum(jax.lax.top_k(jax.random.gumbel(k, (N,)), K)[1]), "2x exact (selection shape)")
scan_time(lambda x, k: jnp.sum(jax.lax.approx_max_k(x, K)[1]) + jnp.sum(jax.lax.approx_max_k(jax.random.gumbel(k, (N,)), K)[1]), "2x approx")
