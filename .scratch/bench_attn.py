"""Microbench: fused Pallas attention vs XLA bf16-storage path at sweep shapes."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from uni_adapter_tpu.ops.attention_pallas import attention_pallas_heads, attention_pallas
from uni_adapter_tpu.models.common import _attend


def xla_chain(q, k, v, scale, reps):
    def body(c, _):
        o = _attend(q + c.astype(q.dtype) * 0, k, v, scale)
        return jnp.mean(o).astype(jnp.float32)[None][0], None
    out, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
    return out


def pallas_chain(kern, q, k, v, reps):
    def body(c, _):
        o = kern(q + c.astype(q.dtype) * 0, k, v)
        return jnp.mean(o).astype(jnp.float32)[None][0], None
    out, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
    return out


def timed(fn, *args):
    r = fn(*args)
    _ = np.asarray(r)                     # true barrier: fetch
    t0 = time.perf_counter()
    r = fn(*args)
    _ = np.asarray(r)
    return time.perf_counter() - t0


REPS = 24
for name, (B, H, N, hd) in [("ULIP", (30, 6, 513, 64)),
                            ("EVA02-L", (30, 16, 513, 64)),
                            ("PPTA", (30, 8, 513, 64))]:
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, hd)),
                           jnp.bfloat16) for _ in range(3))
    scale = hd ** -0.5
    jx = jax.jit(lambda q, k, v: xla_chain(q, k, v, scale, REPS))
    ph = jax.jit(lambda q, k, v: pallas_chain(attention_pallas_heads, q, k, v, REPS))
    t_x = timed(jx, q, k, v)
    t_h = timed(ph, q, k, v)
    print(f"{name} {B}x{H}x{N}x{hd} x{REPS}: XLA {t_x*1e3:.1f} ms | "
          f"pallas-heads {t_h*1e3:.1f} ms | ratio {t_x/t_h:.2f}x")
