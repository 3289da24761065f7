"""ULIP full forward: XLA attention vs pallas-heads attention, batch 30."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from uni_adapter_tpu.config import parse_args
from uni_adapter_tpu.models.pointbert import create_ulip
from uni_adapter_tpu.models.loader import init_or_load_params
import uni_adapter_tpu.models.common as common
from uni_adapter_tpu.ops.attention_pallas import attention_pallas_heads

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

def run(tag):
    f = chain()
    r1 = np.asarray(f(params, pc))
    t0 = time.perf_counter(); _ = np.asarray(f(params, pc))
    print(f"{tag}: {(time.perf_counter()-t0)/8*1e3:.2f} ms/forward (out {r1:.5f})", flush=True)

run("XLA attend")
orig = common._attend
def pallas_attend(q, k, v, scale, mask=None, bias=None):
    if mask is None and bias is None:
        return attention_pallas_heads(q, k, v, scale).astype(v.dtype)
    return orig(q, k, v, scale, mask, bias)
common._attend = pallas_attend
run("pallas-heads attend")
common._attend = orig
