"""Bisect ULIP PointTransformer: tokens-stage vs blocks vs head."""
import time
import numpy as np
import jax, jax.numpy as jnp
import flax.linen as nn
from uni_adapter_tpu.models.pointbert import MiniPointNet
from uni_adapter_tpu.models.common import LN, ViTBlock
from uni_adapter_tpu.ops.geometry import group_points

rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((30, 1024, 3)), jnp.float32)

def timed(f, *a, reps=10):
    def chain(*a):
        def body(c, _):
            r = f(*[x + c*0 if isinstance(x, jax.Array) and x.dtype.kind=='f' else x for x in a])
            leaf = jax.tree_util.tree_leaves(r)[0]
            return jnp.sum(leaf.astype(jnp.float32)).astype(jnp.float32)*1e-9, None
        return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]
    cf = jax.jit(chain)
    _ = np.asarray(cf(*a)); t0 = time.perf_counter(); _ = np.asarray(cf(*a))
    return (time.perf_counter()-t0)/reps*1e3

# stage 1: grouping only
f1 = lambda p: group_points(p, None, 512, 32, use_pallas_fps=True)[0]
print(f"1 grouping:            {timed(f1, pc):.2f} ms", flush=True)

# stage 2: grouping + MPN
mpn = MiniPointNet(256, 3, dtype=jnp.bfloat16)
nbr0 = group_points(pc, None, 512, 32, use_pallas_fps=True)[0]
mp = mpn.init(jax.random.PRNGKey(0), nbr0)
def f2(p):
    nbr, center, _ = group_points(p, None, 512, 32, use_pallas_fps=True)
    return mpn.apply(mp, nbr)
print(f"2 grouping+MPN:        {timed(f2, pc):.2f} ms", flush=True)

# stage 2b: MPN alone on fp32 neighborhood (model feeds fp32)
nbr32 = nbr0.astype(jnp.float32)
print(f"2b MPN alone fp32 in:  {timed(lambda n: mpn.apply(mp, n), nbr32):.2f} ms", flush=True)
nbr16 = nbr0.astype(jnp.bfloat16)
print(f"2c MPN alone bf16 in:  {timed(lambda n: mpn.apply(mp, n), nbr16):.2f} ms", flush=True)
