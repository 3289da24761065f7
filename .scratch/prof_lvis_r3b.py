"""K=1156 MODE-DOTA sweep after the custom-VJP/mode-major residual rewrite
(round 3, second pass).  Pre-rewrite round-3 numbers: highest 26.5 /
high 32.4 / default 37.8; first post-rewrite readings: high 40.3,
highest 31.6."""
import sys
import time
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import Config, ModelConfig, DotaConfig
from uni_adapter_tpu import engine
from uni_adapter_tpu.models.uni3d import create_uni3d

rng = np.random.default_rng(0)
K = 1156
def run(prec):
    cfg = Config(model=ModelConfig(vlm3d="uni3d", use_pallas_fps=True,
                                   use_pallas_knn=True),
                 dota=DotaConfig(use_mode_dota=True, mode_M=4,
                                 res_learning=True,
                                 residual_precision=prec))
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
    print(f"K=1156 mode_dota prec={prec}: {S*T/dt:.1f} pc/s/chip", flush=True)

for prec in sys.argv[1:] or ["default", "high", "highest"]:
    run(prec)
