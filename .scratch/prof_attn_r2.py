"""Per-layer attention timing after asymmetric padding, vs XLA."""
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

def xla_attn(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)

rng = np.random.default_rng(0)
for (name, B, H, N, hd, bg) in [("ulip", 30, 6, 513, 64, 1),
                                ("ulip_bg2", 30, 6, 513, 64, 2),
                                ("ulip_bg5", 30, 6, 513, 64, 5),
                                ("eva", 30, 16, 513, 64, 1),
                                ("ppta", 30, 8, 385, 64, 1)]:
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
    sc = hd ** -0.5
    t_p = timed(lambda a, b, c: attention_pallas_heads(a, b, c, sc,
                                                       batch_group=bg), q, k, v)
    t_x = timed(lambda a, b, c: xla_attn(a, b, c, sc), q, k, v)
    print(f"{name}: pallas={t_p:.2f}ms xla={t_x:.2f}ms", flush=True)
