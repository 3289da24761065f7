"""TPU-lowering numerics validation: engine trajectories with Pallas
kernels on vs off (XLA twins). kNN/ballq/FPS must give identical neighbour
sets => identical trajectories up to attention-path rounding; attention
kernel is fp32-softmax (more precise than bf16-storage XLA), so compare
final correctness vectors and logit closeness."""
import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import Config, ModelConfig, DotaConfig
from uni_adapter_tpu import engine

def run(backbone, pallas):
    cfg = Config(model=ModelConfig(
        vlm3d=backbone, use_pallas_fps=pallas, use_pallas_knn=pallas,
        use_pallas_ballq=pallas, use_pallas_attention=(pallas and backbone != "uni3d")),
        dota=DotaConfig(use_mode_dota=True, mode_M=4, res_learning=True))
    rng = np.random.default_rng(0)
    if backbone == "ulip":
        from uni_adapter_tpu.models.pointbert import create_ulip
        model = create_ulip(cfg.model); D = 512
        init_args = (jnp.zeros((1, 1024, 3), jnp.float32),)
    elif backbone == "openshape":
        from uni_adapter_tpu.models.ppta import create_openshape
        model = create_openshape(cfg.model); D = 1280
        init_args = (jnp.zeros((1, 1024, 3), jnp.float32),
                     jnp.zeros((1, 1024, 6), jnp.float32))
    else:
        from uni_adapter_tpu.models.uni3d import create_uni3d
        model = create_uni3d(cfg.model); D = 1024
        init_args = (jnp.zeros((1, 1024, 6), jnp.float32),)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *init_args)
    t = rng.standard_normal((40, D)).astype(np.float32)
    text = jnp.asarray(t / np.linalg.norm(t, axis=1, keepdims=True))
    T = 12
    pcs = jnp.asarray(rng.standard_normal((T, 2, 1024, 3)), jnp.float32)
    rgbs = jnp.ones_like(pcs)
    tgt = jnp.asarray(rng.integers(0, 40, (T, 2)), jnp.int32)
    scan_fn = jax.jit(engine.make_scan_fn(cfg, model))
    state = engine.init_state(cfg, text, jax.random.PRNGKey(0))
    s, out = scan_fn(params, text, state, pcs, rgbs, tgt)
    return np.asarray(out.final_logits), np.asarray(out.correct)

for bb in ["uni3d", "ulip", "openshape"]:
    lg_p, c_p = run(bb, True)
    lg_x, c_x = run(bb, False)
    same_pred = float((np.argmax(lg_p, -1) == np.argmax(lg_x, -1)).mean())
    rel = np.max(np.abs(lg_p - lg_x)) / (np.max(np.abs(lg_x)) + 1e-9)
    print(f"{bb}: pred agreement={same_pred:.3f} correct_equal={bool((c_p==c_x).all())} max_rel_logit_diff={rel:.2e}", flush=True)
