"""Decompose the Uni3D-L step with fetch-synced scan-chain timing."""
import time
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import ModelConfig
from uni_adapter_tpu.models.uni3d import create_uni3d
from uni_adapter_tpu.ops.geometry import group_points, index_points, index_points_matmul
from uni_adapter_tpu.ops.fps_pallas import fps_pallas_batched
from uni_adapter_tpu.ops.knn_pallas import knn_pallas

def timed(f, *args, reps=10):
    """Chain f reps times inside one jit; fetch a scalar at the end."""
    def chain(*a):
        def body(c, _):
            r = f(*jax.tree_util.tree_map(lambda x: x + 0*c if jnp.issubdtype(x.dtype, jnp.floating) else x, a))
            leaves = [l.astype(jnp.float32).sum() for l in jax.tree_util.tree_leaves(r) if jnp.issubdtype(l.dtype, jnp.inexact) or jnp.issubdtype(l.dtype, jnp.integer)]
            s = sum([l.astype(jnp.float32) for l in leaves]) * 1e-9
            return (s).astype(jnp.float32)*1e-9, None
        return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]
    cf = jax.jit(chain)
    _ = np.asarray(cf(*args))
    t0 = time.perf_counter(); _ = np.asarray(cf(*args))
    return (time.perf_counter()-t0)/reps*1e3

B = 60
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((B, 1024, 6)), jnp.float32)
xyz, color = pc[..., :3], pc[..., 3:]
cfg = ModelConfig(vlm3d="uni3d", use_pallas_fps=True, use_pallas_knn=True)
model = create_uni3d(cfg)
params = model.init(jax.random.PRNGKey(0), pc[:1])["params"]

t_fwd = timed(lambda x: model.apply({"params": params}, x), pc, reps=5)
t_grp = timed(lambda x, c: group_points(x, c, 512, 64, use_pallas_fps=True, use_pallas_knn=True), xyz, color)
t_grp_xla = timed(lambda x, c: group_points(x, c, 512, 64, use_pallas_fps=True), xyz, color)
t_fps = timed(lambda x: fps_pallas_batched(x, 512), xyz)
ctr = index_points(xyz, fps_pallas_batched(xyz, 512))
t_knn = timed(lambda x, c: knn_pallas(64, x, c), xyz, ctr)
idx = knn_pallas(64, xyz, ctr)
joined = jnp.concatenate([xyz, color], -1)
t_gather = timed(lambda j, i: index_points_matmul(j, i), joined, idx)
print(f"B{B}: full_fwd={t_fwd:.1f}ms grouping_pallas={t_grp:.1f}ms grouping_xlaknn={t_grp_xla:.1f} fps={t_fps:.2f} knn={t_knn:.2f} gather={t_gather:.2f}")
