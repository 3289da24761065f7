"""Non-trunk decomposition at the new clock: bare forward B=30, grouping
(fps+knn+gather), MiniPointNet embed."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from uni_adapter_tpu.utils.profiling import enable_compile_cache
enable_compile_cache("/root/repo")
from uni_adapter_tpu.config import ModelConfig
from uni_adapter_tpu.models.uni3d import create_uni3d

B, N = 30, 1024
cfg = ModelConfig()
model = create_uni3d(cfg)
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((B, N, 6)), jnp.float32)
params = jax.jit(model.init)(jax.random.PRNGKey(0), pc[:1])

def timed_scan(body, reps_lo=2, reps_hi=6):
    def make(r):
        @jax.jit
        def g(x):
            def bd(c, _):
                return jnp.mean(body(x + c.astype(x.dtype) * 1e-6)).astype(jnp.float32), None
            c, _ = jax.lax.scan(bd, jnp.float32(0.0), None, length=r)
            return c
        return g
    def t(f):
        o = f(pc); np.asarray(o).ravel()[:1]
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); o = f(pc); np.asarray(o).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(make(reps_hi)) - t(make(reps_lo))) / (reps_hi - reps_lo)

dt = timed_scan(lambda x: model.apply(params, x))
print(f"bare forward B={B}: {dt*1e3:.1f} ms", flush=True)
