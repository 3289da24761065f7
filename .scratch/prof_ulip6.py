"""Isolate the unattributed ~14ms: PT full vs PT with precomputed grouping."""
import time
import numpy as np
import jax, jax.numpy as jnp
import flax.linen as nn
from uni_adapter_tpu.models.pointbert import PointTransformer
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

pt = PointTransformer(use_pallas_fps=True, use_pallas_attention=True,
                      dtype=jnp.bfloat16)
params = pt.init(jax.random.PRNGKey(0), pc[:1])
print(f"PT full:        {timed(lambda p: pt.apply(params, p), pc):.2f} ms", flush=True)

# monkeypatch group_points to identity-return precomputed
import uni_adapter_tpu.models.pointbert as pb
nbr, center, _ = jax.jit(lambda p: group_points(p, None, 512, 32, use_pallas_fps=True))(pc)
orig = pb.group_points
pb.group_points = lambda *a, **k: (nbr, center, None)
print(f"PT w/o grouping: {timed(lambda p: pt.apply(params, p), pc):.2f} ms", flush=True)
pb.group_points = orig

# also: XLA fps variant
pt2 = PointTransformer(use_pallas_fps=False, use_pallas_attention=True,
                       dtype=jnp.bfloat16)
print(f"PT xla-fps:     {timed(lambda p: pt2.apply(params, p), pc):.2f} ms", flush=True)
