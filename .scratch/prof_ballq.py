import time
import jax, jax.numpy as jnp
from uni_adapter_tpu.ops.geometry import query_ball_point
from uni_adapter_tpu.ops.ballquery_pallas import query_ball_pallas

def bench(f, n=20):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

key = jax.random.PRNGKey(0)
for (B, S, N, k, r) in [(30, 384, 1024, 64, 0.2), (60, 384, 1024, 64, 0.2),
                        (60, 128, 384, 64, 0.4)]:
    kx, kq = jax.random.split(jax.random.fold_in(key, B + S))
    xyz = jax.random.uniform(kx, (B, N, 3), jnp.float32, -0.5, 0.5)
    q = jax.random.uniform(kq, (B, S, 3), jnp.float32, -0.5, 0.5)
    ref = query_ball_point(r, k, xyz, q)
    got = query_ball_pallas(r, k, xyz, q)
    match = bool(jnp.all(ref == got))
    t_ref = bench(lambda: query_ball_point(r, k, xyz, q))
    t_pal = bench(lambda: query_ball_pallas(r, k, xyz, q))
    print(f"B{B} S{S} N{N} k{k} r{r}: exact={match} xla={t_ref:.2f}ms pallas={t_pal:.2f}ms speedup={t_ref/t_pal:.2f}x")
