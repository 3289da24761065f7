"""K=1156 (Objaverse-LVIS label space) pipeline on real TPU:
MODE-DOTA sweep throughput + cache path with the sparse graph; plus
odd-shape kernel sanity on hardware."""
import time
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import Config, ModelConfig, DotaConfig
from uni_adapter_tpu import engine

# odd-shape kernel sanity on real lowering
from uni_adapter_tpu.ops.geometry import knn_point, query_ball_point
from uni_adapter_tpu.ops.knn_pallas import knn_pallas
from uni_adapter_tpu.ops.ballquery_pallas import query_ball_pallas
rng = np.random.default_rng(0)
xyz = jnp.asarray(rng.standard_normal((3, 1000, 3)), jnp.float32)
q = jnp.asarray(rng.standard_normal((3, 100, 3)), jnp.float32)
print("odd-shape knn set-equal:",
      bool(jnp.all(jnp.sort(knn_point(16, xyz, q), -1)
                   == jnp.sort(knn_pallas(16, xyz, q), -1))), flush=True)
u = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 1000, 3)), jnp.float32)
uq = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 100, 3)), jnp.float32)
print("odd-shape ballq exact:",
      bool(jnp.all(query_ball_point(0.25, 16, u, uq)
                   == query_ball_pallas(0.25, 16, u, uq))), flush=True)

K = 1156
def run(method):
    dc = (DotaConfig(use_mode_dota=True, mode_M=4, res_learning=True)
          if method == "mode_dota" else
          DotaConfig(use_mode_dota=False, use_dota=False))
    cfg = Config(model=ModelConfig(vlm3d="uni3d", use_pallas_fps=True,
                                   use_pallas_knn=True),
                 dota=dc)
    from uni_adapter_tpu.models.uni3d import create_uni3d
    model = create_uni3d(cfg.model)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 1024, 6), jnp.float32))
    t = rng.standard_normal((K, 1024)).astype(np.float32)
    text = jnp.asarray(t / np.linalg.norm(t, axis=1, keepdims=True))
    S, T = 15, 8
    pcs = jnp.asarray(rng.standard_normal((T, S, 1, 1024, 3)), jnp.float32)
    rgbs = jnp.ones_like(pcs)
    tgt = jnp.asarray(rng.integers(0, K, (T, S, 1)), jnp.int32)
    scan_fn = jax.jit(engine.make_vmapped_scan_fn(cfg, model))
    states = engine.init_states_vmapped(cfg, text, S, seed=1)
    s1, out = scan_fn(params, text, states, pcs, rgbs, tgt)
    np.asarray(out.correct[-1])
    t0 = time.perf_counter()
    _ = np.asarray(jax.tree_util.tree_leaves(s1)[-1]); rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    s2, out = scan_fn(params, text, s1, pcs, rgbs, tgt)
    np.asarray(out.correct[-1])
    dt = time.perf_counter() - t0 - rt
    print(f"K=1156 {method}: {S*T/dt:.1f} pc/s/chip", flush=True)

run("mode_dota")
run("cache")
