"""Attribute ULIP step time: full forward vs no-attention forward, batch 30."""
import time
import numpy as np
import jax, jax.numpy as jnp
from uni_adapter_tpu.config import parse_args
from uni_adapter_tpu.models.pointbert import create_ulip
from uni_adapter_tpu.models.loader import init_or_load_params

cfg = parse_args(["--vlm3d", "ulip"])
model = create_ulip(cfg.model)
pc = jnp.asarray(np.random.default_rng(0).standard_normal((30, 1024, 3)), jnp.float32)
params = init_or_load_params(model, (pc[:1],), None, seed=0)

def chain(reps=8):
    def g(params, pc):
        def body(c, _):
            f = model.apply(params, pc + c.astype(pc.dtype) * 0)
            return jnp.mean(f).astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]
    return jax.jit(g)

f = chain()
_ = np.asarray(f(params, pc))
t0 = time.perf_counter(); _ = np.asarray(f(params, pc))
print(f"ULIP full forward batch30: {(time.perf_counter()-t0)/8*1e3:.2f} ms/forward", flush=True)

# Now with attention disabled (identity) via monkeypatch
import uni_adapter_tpu.models.common as common
orig = common._attend
common._attend = lambda q, k, v, scale, mask=None, bias=None: v
import importlib
# model modules captured _attend at class def? _attend is called at apply time via module-level name
f2 = chain()
_ = np.asarray(f2(params, pc))
t0 = time.perf_counter(); _ = np.asarray(f2(params, pc))
print(f"ULIP no-attn forward batch30: {(time.perf_counter()-t0)/8*1e3:.2f} ms/forward", flush=True)
common._attend = orig
