"""Bare ULIP forward at bench B=30, scan-chained fetch-synced."""
import time
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import ModelConfig
from uni_adapter_tpu.models.pointbert import create_ulip

B = 30
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((B, 1024, 3)), jnp.float32)
cfg = ModelConfig(vlm3d="ulip", use_pallas_fps=True, use_pallas_knn=True,
                  use_pallas_attention=True)
model = create_ulip(cfg)
params = jax.jit(model.init)(jax.random.PRNGKey(0), pc[:1])["params"]

REPS = 20
def chain(p, x):
    def body(c, _):
        f = model.apply({"params": p}, x + c)
        return jnp.float32(jnp.sum(f)) * 1e-12, None
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[0]
cf = jax.jit(chain)
_ = np.asarray(cf(params, pc))
t0 = time.perf_counter(); _ = np.asarray(cf(params, pc))
dt = (time.perf_counter() - t0) / REPS * 1e3
print(f"ulip fwd B{B} incl grouping: {dt:.2f} ms", flush=True)

# grouping alone at the same batch
from uni_adapter_tpu.ops.geometry import group_points
def chain_g(x):
    def body(c, _):
        n, ctr, _ = group_points(x + c, None, 512, 32, use_pallas_fps=True,
                                 use_pallas_knn=True)
        return jnp.float32(jnp.sum(n) + jnp.sum(ctr)) * 1e-12, None
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[0]
cg = jax.jit(chain_g)
_ = np.asarray(cg(pc))
t0 = time.perf_counter(); _ = np.asarray(cg(pc))
print(f"ulip grouping B{B}: {(time.perf_counter()-t0)/REPS*1e3:.2f} ms", flush=True)
