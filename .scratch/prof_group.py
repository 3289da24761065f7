"""Profile grouping sub-ops at ULIP shapes (30,1024)->512x32 on TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
from uni_adapter_tpu.ops import geometry as g
from uni_adapter_tpu.ops.fps_pallas import fps_pallas_batched

B, N, G, M = 30, 1024, 512, 32
rng = np.random.default_rng(0)
xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
color = jnp.ones((B, N, 3), jnp.float32)

def timed(f, *a, reps=20):
    def chain(*a):
        def body(c, _):
            r = f(*[x + (c*0 if x.dtype.kind=='f' else 0) if isinstance(x, jax.Array) else x for x in a])
            leaf = jax.tree_util.tree_leaves(r)[0]
            return jnp.sum(leaf.astype(jnp.float32)).astype(jnp.float32)*1e-9, None
        return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]
    cf = jax.jit(chain)
    _ = np.asarray(cf(*a))
    t0 = time.perf_counter(); _ = np.asarray(cf(*a))
    return (time.perf_counter()-t0)/reps*1e3

fps_idx = fps_pallas_batched(xyz, G)
center = g.index_points(xyz, fps_idx)
sqd = g.square_distance(center, xyz)
idx = g.knn_point(M, xyz, center)

print(f"fps_pallas:      {timed(lambda x: fps_pallas_batched(x, G), xyz):.2f} ms")
print(f"sqdist (30,512,1024): {timed(lambda c, x: g.square_distance(c, x), center, xyz):.2f} ms")
print(f"top_k32 of sqd:  {timed(lambda s: jax.lax.top_k(-s, M)[1], sqd):.2f} ms")
print(f"approx_k32:      {timed(lambda s: jax.lax.approx_max_k(-s, M)[1], sqd):.2f} ms")
print(f"onehot gather (30,16384,1024)x6: {timed(lambda x, i: g.index_points_matmul(x, i), jnp.concatenate([xyz, color], -1), idx):.2f} ms")
print(f"group_points full: {timed(lambda x, c: g.group_points(x, c, G, M, use_pallas_fps=True)[0], xyz, color):.2f} ms")
