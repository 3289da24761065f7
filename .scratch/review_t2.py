import numpy as np, jax, jax.numpy as jnp
from uni_adapter_tpu.ops.attention_pallas import attention_pallas_heads, attention_pallas

rng = np.random.default_rng(1)
def xla_attn(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32))

for (B, H, N, hd) in [(2, 6, 513, 64), (2, 8, 128, 64), (1, 3, 70, 32), (2, 16, 640, 128)]:
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
    scale = hd ** -0.5
    ref = np.asarray(xla_attn(q, k, v, scale))
    got = np.asarray(attention_pallas_heads(q, k, v, scale))
    err = np.abs(ref - got).max()
    print((B,H,N,hd), "heads max err:", err)
    got2 = np.asarray(attention_pallas(q, k, v))
    print((B,H,N,hd), "plain max err:", np.abs(ref - got2).max())

# extreme negative scores row: all real scores very negative
q = jnp.asarray(rng.standard_normal((1, 1, 130, 64)), jnp.float32) * 30
k = jnp.asarray(rng.standard_normal((1, 1, 130, 64)), jnp.float32) * 30
v = jnp.asarray(rng.standard_normal((1, 1, 130, 64)), jnp.float32)
ref = np.asarray(xla_attn(q, k, v, 64**-0.5))
got = np.asarray(attention_pallas_heads(q, k, v, 64**-0.5))
print("extreme max err:", np.abs(ref-got).max(), "nan:", np.isnan(got).any())
