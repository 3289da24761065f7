"""A/B: XLA attention vs our pallas_heads vs jax TPU flash_attention at
the EVA02-L bench shape (30, 16, 513, 64)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from uni_adapter_tpu.utils.profiling import enable_compile_cache
enable_compile_cache("/root/repo")

B, H, N, hd = 30, 16, 513, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
scale = hd ** -0.5

def timed_scan(body, reps_lo=8, reps_hi=24):
    import functools
    def make(r):
        @jax.jit
        def g(q):
            def bd(c, _):
                return jnp.mean(body(q + c.astype(q.dtype) * 1e-6)).astype(jnp.float32), None
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

def xla_attn(q):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    s = s.astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)

print(f"xla: {timed_scan(xla_attn)*1e3:.3f} ms", flush=True)

from uni_adapter_tpu.ops.attention_pallas import attention_pallas_heads
print(f"pallas_heads: {timed_scan(lambda q: attention_pallas_heads(q, k, v, scale))*1e3:.3f} ms", flush=True)

from jax.experimental.pallas.ops.tpu.flash_attention import (
    flash_attention, BlockSizes)
NP = 640
pad = lambda x: jnp.pad(x, ((0,0),(0,0),(0,NP-N),(0,0)))
kp, vp = pad(k), pad(v)
seg_q = jnp.ones((B, NP), jnp.int32)
seg_kv = jnp.asarray(np.pad(np.ones((B, N), np.int32), ((0,0),(0,NP-N)),
                            constant_values=2))
from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds
bs = BlockSizes(block_q=128, block_k_major=128, block_k=128, block_b=1)
def flash(qx):
    qp = pad(qx)
    o = flash_attention(qp, kp, vp, segment_ids=SegmentIds(seg_q, seg_kv),
                        causal=False, sm_scale=scale, block_sizes=bs)
    return o[:, :, :N, :]
print(f"flash: {timed_scan(flash)*1e3:.3f} ms", flush=True)

# numerics check
a = np.asarray(xla_attn(q), np.float32)
b = np.asarray(flash(q), np.float32)
print("max diff flash vs xla:", np.abs(a - b).max(), flush=True)
