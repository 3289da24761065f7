"""Single-stream online-TTA step latency (serving profile): one cloud per
step, MODE-DOTA double-fit, per-backbone, kernels on.  Scan-chained
fetch-synced timing = pure device latency per step."""
import time
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import Config, ModelConfig, DotaConfig
from uni_adapter_tpu import engine

def measure(backbone, pallas_attn):
    cfg = Config(model=ModelConfig(vlm3d=backbone, use_pallas_fps=True,
                                   use_pallas_knn=True, use_pallas_ballq=True,
                                   use_pallas_attention=pallas_attn),
                 dota=DotaConfig(use_mode_dota=True, mode_M=4,
                                 res_learning=True))
    rng = np.random.default_rng(0)
    if backbone == "ulip":
        from uni_adapter_tpu.models.pointbert import create_ulip
        model = create_ulip(cfg.model)
        init_args = (jnp.zeros((1, 1024, 3), jnp.float32),)
        D = 512
    elif backbone == "openshape":
        from uni_adapter_tpu.models.ppta import create_openshape
        model = create_openshape(cfg.model)
        init_args = (jnp.zeros((1, 1024, 3), jnp.float32),
                     jnp.zeros((1, 1024, 6), jnp.float32))
        D = 1280
    else:
        from uni_adapter_tpu.models.uni3d import create_uni3d
        model = create_uni3d(cfg.model)
        init_args = (jnp.zeros((1, 1024, 6), jnp.float32),)
        D = 1024
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *init_args)
    t = rng.standard_normal((40, D)).astype(np.float32)
    text = jnp.asarray(t / np.linalg.norm(t, axis=1, keepdims=True))

    T = 24
    pcs = jnp.asarray(rng.standard_normal((T, 1, 1024, 3)), jnp.float32)
    rgbs = jnp.ones_like(pcs)
    tgt = jnp.zeros((T, 1), jnp.int32)
    scan_fn = jax.jit(engine.make_scan_fn(cfg, model))
    state = engine.init_state(cfg, text, jax.random.PRNGKey(0))
    s1, out = scan_fn(params, text, state, pcs, rgbs, tgt)
    np.asarray(out.correct[-1])
    t0 = time.perf_counter()
    _ = np.asarray(jax.tree_util.tree_leaves(s1)[-1])
    rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    s2, out = scan_fn(params, text, s1, pcs, rgbs, tgt)
    np.asarray(out.correct[-1])
    dt = (time.perf_counter() - t0 - rt) / T * 1e3
    print(f"{backbone} (attn_kernel={pallas_attn}): {dt:.2f} ms/step "
          f"({1000/dt:.0f} clouds/s single stream)", flush=True)

import sys
for bb, pa in [("uni3d", True), ("uni3d", False), ("ulip", True),
               ("openshape", True)]:
    measure(bb, pa)
