import time
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import ModelConfig
from uni_adapter_tpu.models.uni3d import create_uni3d

B = 60
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((B, 1024, 6)), jnp.float32)
cfg = ModelConfig(vlm3d="uni3d", use_pallas_fps=True, use_pallas_knn=True)
model = create_uni3d(cfg)
params = model.init(jax.random.PRNGKey(0), pc[:1])["params"]
fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
r = fwd(params, pc)
print("devices:", r.devices(), r.shape, r.dtype)
t0 = time.perf_counter(); r = fwd(params, pc); jax.block_until_ready(r); print("1 call blocked:", (time.perf_counter()-t0)*1e3, "ms")
t0 = time.perf_counter()
for _ in range(10): r = fwd(params, pc)
jax.block_until_ready(r)
print("10 calls blocked on last:", (time.perf_counter()-t0)*1e2, "ms/call")
t0 = time.perf_counter(); x = np.asarray(r); print("to host:", (time.perf_counter()-t0)*1e3)
