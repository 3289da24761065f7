"""A/B batch_group for attention_pallas_heads at ULIP/OpenShape sweep shapes.
Run: PYTHONPATH=/root/repo:/root/.axon_site python .scratch/prof_attn_bg.py"""
import time
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.ops.attention_pallas import attention_pallas_heads

def timed(f, *a, reps=30):
    def chain(*a):
        def body(c, _):
            r = f(*[x + (c * 0).astype(x.dtype) for x in a])
            return jnp.sum(r.astype(jnp.float32)) * 1e-9, None
        return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]
    cf = jax.jit(chain)
    _ = np.asarray(cf(*a))
    t0 = time.perf_counter(); _ = np.asarray(cf(*a))
    return (time.perf_counter() - t0) / reps * 1e3

rng = np.random.default_rng(0)
for label, B, H, N, hd in [("ULIP (30,6,513,64)", 30, 6, 513, 64),
                           ("OpenShape (30,8,513,64)", 30, 8, 513, 64)]:
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    for bg in (1, 2, 3, 5, 6):
        ms = timed(lambda q, k, v: attention_pallas_heads(q, k, v,
                                                          batch_group=bg),
                   q, k, v)
        print(f"{label} batch_group={bg}: {ms:.2f} ms", flush=True)
