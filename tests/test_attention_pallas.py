"""Fused Pallas attention vs the XLA reference implementation."""
import numpy as np
import jax
import jax.numpy as jnp

from uni_adapter_tpu.ops.attention_pallas import attention_pallas


def _xla_attention(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)


def test_fused_attention_matches_xla():
    rng = np.random.default_rng(0)
    B, H, N, hd = 2, 3, 70, 32          # N, hd both unaligned
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
    want = np.asarray(_xla_attention(q, k, v, hd ** -0.5))
    got = np.asarray(attention_pallas(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_attention_rows_are_convex():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 16, 8)), jnp.float32)
    v = jnp.ones((1, 2, 16, 8), jnp.float32)
    out = np.asarray(attention_pallas(q, q, v, interpret=True))
    np.testing.assert_allclose(out, 1.0, atol=1e-5)  # convex combo of ones
