"""Localize the pallas-attention integration overhead in EvaAttention."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from uni_adapter_tpu.utils.profiling import enable_compile_cache
enable_compile_cache("/root/repo")
from uni_adapter_tpu.models.common import EvaAttention

B, N, D, H = 30, 513, 1024, 16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)

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
        o = f(x); np.asarray(o).ravel()[:1]
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); o = f(x); np.asarray(o).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(make(reps_hi)) - t(make(reps_lo))) / (reps_hi - reps_lo)

for pallas in (False, True):
    m = EvaAttention(D, H, use_pallas=pallas, dtype=jnp.bfloat16)
    p = m.init(jax.random.PRNGKey(0), x)
    dt = timed_scan(lambda v: m.apply(p, v))
    print(f"EvaAttention use_pallas={pallas}: {dt*1e3:.3f} ms", flush=True)

# no qk-norm variant (isolate LN cost)
for pallas in (False, True):
    m = EvaAttention(D, H, use_qk_norm=False, use_pallas=pallas,
                     dtype=jnp.bfloat16)
    p = m.init(jax.random.PRNGKey(0), x)
    dt = timed_scan(lambda v: m.apply(p, v))
    print(f"EvaAttention noLN use_pallas={pallas}: {dt*1e3:.3f} ms", flush=True)
