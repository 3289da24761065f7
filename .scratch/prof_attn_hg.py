import time
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.ops.attention_pallas import attention_pallas_heads

def timed(f, *args, reps=30):
    def chain(*a):
        def body(c, _):
            r = f(a[0] + c, *a[1:])
            return jnp.float32(jnp.sum(r.astype(jnp.float32))) * 1e-12, None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=reps)[0]
    cf = jax.jit(chain)
    _ = np.asarray(cf(*args))
    t0 = time.perf_counter(); _ = np.asarray(cf(*args))
    return (time.perf_counter() - t0) / reps * 1e3

rng = np.random.default_rng(0)
B, H, N, hd = 30, 6, 513, 64
q = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
sc = hd ** -0.5
for hg in [1, 2, 3, 6]:
    for bg in [1, 2]:
        t = timed(lambda a,b,c: attention_pallas_heads(a,b,c,sc,head_group=hg,batch_group=bg), q, k, v)
        print(f"hg={hg} bg={bg}: {t:.2f}ms", flush=True)
