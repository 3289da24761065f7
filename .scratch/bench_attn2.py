import time, functools
import numpy as np
import jax, jax.numpy as jnp
from uni_adapter_tpu.ops.attention_pallas import attention_pallas_heads
from uni_adapter_tpu.models.common import _attend

def chain(fn, q, k, v, reps):
    def body(c, _):
        o = fn(q + c.astype(q.dtype) * 0, k, v)
        return jnp.mean(o).astype(jnp.float32), None
    out, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
    return out

def timed(fn, *args):
    _ = np.asarray(fn(*args))
    t0 = time.perf_counter(); _ = np.asarray(fn(*args))
    return time.perf_counter() - t0

REPS = 24
for name, (B, H, N, hd) in [("ULIP", (30, 6, 513, 64)),
                            ("EVA02-L", (30, 16, 513, 64))]:
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
               for _ in range(3))
    scale = hd ** -0.5
    res = [("xla", timed(jax.jit(lambda q,k,v: chain(
        lambda a,b,c: _attend(a,b,c,scale), q,k,v,REPS)), q,k,v))]
    for bg in (1, 2, 3, 5):
        for hg in (2, 4, 8) if H > 6 else (2, 3, 6):
            f = functools.partial(attention_pallas_heads, head_group=hg, batch_group=bg)
            try:
                t = timed(jax.jit(lambda q,k,v: chain(f, q,k,v,REPS)), q,k,v)
                res.append((f"bg{bg}/hg{hg}", t))
            except Exception as e:
                res.append((f"bg{bg}/hg{hg}", float("nan")))
    print(name, " | ".join(f"{n} {t*1e3/REPS:.2f}ms" for n, t in res), flush=True)
