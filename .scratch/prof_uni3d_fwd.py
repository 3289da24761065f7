"""Time the Uni3D-L forward (incl. grouping) at the bench's B=30 via a
scan chain with fetch sync; compare against the 141.7 ms full step."""
import time
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import ModelConfig
from uni_adapter_tpu.models.uni3d import create_uni3d

B = 30
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((B, 1024, 6)), jnp.float32)
cfg = ModelConfig(vlm3d="uni3d", use_pallas_fps=True, use_pallas_knn=True)
model = create_uni3d(cfg)
params = jax.jit(model.init)(jax.random.PRNGKey(0), pc[:1])["params"]

REPS = 8
def chain(p, x):
    def body(c, _):
        f = model.apply({"params": p}, x + c)
        return jnp.float32(jnp.sum(f)) * 1e-12, None
    return jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)[0]
cf = jax.jit(chain)
print("compiling...", flush=True)
_ = np.asarray(cf(params, pc))
print("compiled", flush=True)
t0 = time.perf_counter(); v = np.asarray(cf(params, pc))
dt = (time.perf_counter() - t0) / REPS * 1e3
t0 = time.perf_counter(); _ = np.asarray(cf(params, pc))
dt2 = (time.perf_counter() - t0) / REPS * 1e3
print(f"fwd B{B} incl grouping: {dt:.1f} / {dt2:.1f} ms per call", flush=True)
