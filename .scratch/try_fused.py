"""Correctness + speed of eva_attention_fused vs the XLA module math."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import flax.linen as nn
from uni_adapter_tpu.utils.profiling import enable_compile_cache
enable_compile_cache("/root/repo")
from uni_adapter_tpu.ops.attention_pallas import eva_attention_fused
from uni_adapter_tpu.models.common import _attend

B, N, D, H = 30, 513, 1024, 16
hd = D // H
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
gq = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
bq = jnp.asarray(rng.standard_normal(hd) * 0.1, jnp.float32)
gk = jnp.asarray(rng.standard_normal(hd) * 0.1 + 1.0, jnp.float32)
bk = jnp.asarray(rng.standard_normal(hd) * 0.1, jnp.float32)
scale = hd ** -0.5

ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)

def xla_ref(q):
    qh = jnp.transpose(q.reshape(B, N, H, hd), (0, 2, 1, 3))
    kh = jnp.transpose(k.reshape(B, N, H, hd), (0, 2, 1, 3))
    vh = jnp.transpose(v.reshape(B, N, H, hd), (0, 2, 1, 3))
    qh = ln.apply({"params": {"scale": gq, "bias": bq}}, qh)
    kh = ln.apply({"params": {"scale": gk, "bias": bk}}, kh)
    o = _attend(qh, kh, vh, scale)
    return jnp.transpose(o, (0, 2, 1, 3)).reshape(B, N, D)

def fused(q):
    return eva_attention_fused(q, k, v, gq, bq, gk, bk, H, scale)

a = np.asarray(jax.jit(xla_ref)(q), np.float32)
b = np.asarray(fused(q), np.float32)
print("max abs diff:", np.abs(a - b).max(),
      "rms:", np.sqrt(((a - b) ** 2).mean()), flush=True)

def timed_scan(body, reps_lo=8, reps_hi=24):
    def make(r):
        @jax.jit
        def g(x):
            def bd(c, _):
                return jnp.mean(body(x + c.astype(x.dtype) * 1e-6)).astype(jnp.float32), None
            c, _ = jax.lax.scan(bd, jnp.float32(0.0), None, length=r)
            return c
        return g
    def t(f):
        o = f(q); np.asarray(o).ravel()[:1]
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); o = f(q); np.asarray(o).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(make(reps_hi)) - t(make(reps_lo))) / (reps_hi - reps_lo)

print(f"xla module-math: {timed_scan(xla_ref)*1e3:.3f} ms", flush=True)
print(f"fused kernel: {timed_scan(fused)*1e3:.3f} ms", flush=True)
