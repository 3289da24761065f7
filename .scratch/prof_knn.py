import time, functools
import jax, jax.numpy as jnp
from uni_adapter_tpu.ops.geometry import knn_point, square_distance
from uni_adapter_tpu.ops.knn_pallas import knn_pallas

key = jax.random.PRNGKey(0)

def bench(f, *a, n=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

for (B, S, N, k) in [(30, 512, 1024, 32), (60, 512, 1024, 32),
                     (30, 512, 1024, 64), (60, 512, 1024, 64),
                     (8, 2048, 8192, 32)]:
    kx, kq = jax.random.split(jax.random.fold_in(key, B * N + k))
    xyz = jax.random.normal(kx, (B, N, 3), jnp.float32)
    q = jax.random.normal(kq, (S if False else S, 3) and (B, S, 3), jnp.float32)
    ref = knn_point(k, xyz, q)
    got = knn_pallas(k, xyz, q)
    match = bool(jnp.all(ref == got))
    # set-level agreement (order-insensitive) as fallback diagnostic
    setmatch = bool(jnp.all(jnp.sort(ref, -1) == jnp.sort(got, -1)))
    t_ref = bench(lambda: knn_point(k, xyz, q))
    t_pal = bench(lambda: knn_pallas(k, xyz, q))
    print(f"B{B} S{S} N{N} k{k}: exact={match} set={setmatch} xla={t_ref:.2f}ms pallas={t_pal:.2f}ms speedup={t_ref/t_pal:.2f}x")
