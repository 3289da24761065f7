"""ULIP/OpenShape shapes: natural-layout kernel vs transposed kernel vs
XLA, at the module-equivalent span (no qk norm)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from uni_adapter_tpu.utils.profiling import enable_compile_cache
enable_compile_cache("/root/repo")
from uni_adapter_tpu.ops.attention_pallas import (attention_pallas_heads,
                                                  eva_attention_fused)
from uni_adapter_tpu.models.common import _attend

def timed_scan(body, x, reps_lo=8, reps_hi=24):
    def make(r):
        @jax.jit
        def g(x):
            def bd(c, _):
                return jnp.mean(body(x + c.astype(x.dtype) * 1e-6)).astype(jnp.float32), None
            c, _ = jax.lax.scan(bd, jnp.float32(0.0), None, length=r)
            return c
        return g
    def t(f):
        o = f(x); np.asarray(o).ravel()[:1]
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); o = f(x); np.asarray(o).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(make(reps_hi)) - t(make(reps_lo))) / (reps_hi - reps_lo)

for name, (B, N, D, H) in [("ulip", (30, 513, 384, 6)),
                           ("openshape", (30, 513, 1280, 16))]:
    hd = D // H
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    scale = hd ** -0.5

    def to_heads(t):
        return jnp.transpose(t.reshape(B, N, H, hd), (0, 2, 1, 3))

    def xla(qx):
        o = _attend(to_heads(qx), to_heads(k), to_heads(v), scale)
        return jnp.transpose(o, (0, 2, 1, 3)).reshape(B, N, D)

    def transposed(qx):
        o = attention_pallas_heads(to_heads(qx), to_heads(k), to_heads(v),
                                   scale)
        return jnp.transpose(o, (0, 2, 1, 3)).reshape(B, N, D)

    def natural(qx):
        return eva_attention_fused(qx, k, v, num_heads=H, scale=scale)

    a = np.asarray(natural(q), np.float32)
    b = np.asarray(jax.jit(xla)(q), np.float32)
    print(f"{name}: natural-vs-xla max diff {np.abs(a-b).max():.4f}",
          flush=True)
    print(f"{name}: xla {timed_scan(xla, q)*1e3:.3f} ms  "
          f"transposed {timed_scan(transposed, q)*1e3:.3f} ms  "
          f"natural {timed_scan(natural, q)*1e3:.3f} ms", flush=True)
