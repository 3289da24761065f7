"""Decompose the Uni3D-L sweep step: grouping vs trunk vs adaptation."""
import time
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import Config, ModelConfig, DotaConfig
from uni_adapter_tpu.models.uni3d import create_uni3d
from uni_adapter_tpu.ops.geometry import group_points
from uni_adapter_tpu.ops.fps_pallas import fps_pallas_batched
from uni_adapter_tpu.ops.knn_pallas import knn_pallas
from uni_adapter_tpu.ops.geometry import index_points, index_points_matmul, farthest_point_sample, knn_point

def bench(f, n=10):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f()
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

B = 60  # fused double-forward batch per stream
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((B, 1024, 6)), jnp.float32)
xyz, color = pc[..., :3], pc[..., 3:]

cfg = ModelConfig(vlm3d="uni3d", use_pallas_fps=True, use_pallas_knn=True)
model = create_uni3d(cfg)
params = model.init(jax.random.PRNGKey(0), pc[:1])["params"]

fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
grp = jax.jit(lambda x, c: group_points(x, c, 512, 64, use_pallas_fps=True, use_pallas_knn=True))
grp_xla = jax.jit(lambda x, c: group_points(x, c, 512, 64))

t_fwd = bench(lambda: fwd(params, pc))
t_grp = bench(lambda: grp(xyz, color))
t_grp_xla = bench(lambda: grp_xla(xyz, color))
t_fps = bench(lambda: fps_pallas_batched(xyz, 512))
ctr = index_points(xyz, fps_pallas_batched(xyz, 512))
t_knn = bench(lambda: knn_pallas(64, xyz, ctr))
idx = knn_pallas(64, xyz, ctr)
joined = jnp.concatenate([xyz, color], -1)
gat = jax.jit(lambda j, i: index_points_matmul(j, i))
t_gather = bench(lambda: gat(joined, idx))
print(f"B{B}: full_fwd={t_fwd:.1f}ms grouping={t_grp:.1f}ms (xla {t_grp_xla:.1f}) fps={t_fps:.2f} knn={t_knn:.2f} gather={t_gather:.2f}")
