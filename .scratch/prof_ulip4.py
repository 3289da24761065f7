"""Alternate-order repeated measurement: full ULIP fwd, XLA vs pallas attn."""
import time
import numpy as np
import jax, jax.numpy as jnp
from uni_adapter_tpu.config import parse_args
from uni_adapter_tpu.models.pointbert import create_ulip

rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((30, 1024, 3)), jnp.float32)

def make(attn):
    cfg = parse_args(["--vlm3d", "ulip", "--use-pallas-fps", "true",
                      "--use-pallas-attention", str(attn).lower()])
    return create_ulip(cfg.model)

mx, mp_ = make(False), make(True)
params = mx.init(jax.random.PRNGKey(0), pc[:1])

def chain(model):
    def g(params, pc):
        def body(c, _):
            f = model.apply(params, pc + c.astype(pc.dtype)*0)
            return jnp.mean(f).astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0), None, length=10)[0]
    return jax.jit(g)

fx, fp = chain(mx), chain(mp_)
rx = np.asarray(fx(params, pc)); rp = np.asarray(fp(params, pc))
print(f"outputs: xla {rx:.6f} pallas {rp:.6f}")
for trial in range(3):
    t0=time.perf_counter(); _=np.asarray(fx(params,pc)); tx=(time.perf_counter()-t0)/10*1e3
    t0=time.perf_counter(); _=np.asarray(fp(params,pc)); tp=(time.perf_counter()-t0)/10*1e3
    print(f"trial{trial}: xla {tx:.2f} ms | pallas {tp:.2f} ms", flush=True)
