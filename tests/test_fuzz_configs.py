"""Randomised-configuration robustness sweep: across random dims, mode
counts, methods, and batch sizes, every trajectory must stay finite and the
state invariants must hold (variance floors, simplex constraints, monotone
counts).  Catches shape/broadcast edge cases the targeted tests miss
(M=1, tiny K, B>1, odd dims)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D

CASES = []
_rng = np.random.default_rng(123)
for case in range(10):
    CASES.append(dict(
        K=int(_rng.integers(2, 8)),
        D=int(_rng.choice([8, 16, 24])),
        M=int(_rng.integers(1, 4)),
        B=int(_rng.choice([1, 2])),
        method=["mode", "dota", "cache", "gmm", "adaptive"][case % 5],
        res=bool(_rng.integers(0, 2)),
        fix_norm=bool(_rng.integers(0, 2)),
        T=int(_rng.integers(2, 5)),
    ))


@pytest.mark.parametrize("case", CASES)
def test_random_config_stays_finite(case):
    K, D, M, B, T = case["K"], case["D"], case["M"], case["B"], case["T"]
    dc = DotaConfig(use_dota=False, use_mode_dota=False, mode_M=M,
                    res_learning=case["res"], residual_steps=2,
                    fix_fusion_normalization=case["fix_norm"])
    if case["method"] == "mode":
        dc.use_mode_dota = True
    elif case["method"] == "dota":
        dc.use_dota = True
    elif case["method"] == "gmm":
        dc.use_gmm_dota = True
    elif case["method"] == "adaptive":
        dc.use_adaptive_dota = True
    cfg = Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                 cache=CacheConfig(shot_capacity=2, cg_max_iter=5,
                                   threshold=0.3))

    model = Uni3D(trans_dim=16, embed_dim=D, num_group=4, group_size=4,
                  encoder_dim=8, depth=1, num_heads=2, dtype=jnp.float32)
    rng = np.random.default_rng(hash(str(case)) % 2**32)
    pcs = rng.standard_normal((T, B, 24, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((B, 24, 6), jnp.float32))
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    targets = rng.integers(0, K, (T, B)).astype(np.int32)

    if case["method"] == "cache" and B > 1:
        # the cache protocol is strictly batch-1; the engine rejects B>1 at
        # trace time rather than silently adapting on sample 0 only
        with pytest.raises(ValueError, match="batch_size=1"):
            engine.run_stream_scan(
                cfg, model, params, jnp.asarray(text), jnp.asarray(pcs),
                jnp.asarray(np.ones_like(pcs)), jnp.asarray(targets))
        return

    state, outs = engine.run_stream_scan(
        cfg, model, params, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(np.ones_like(pcs)), jnp.asarray(targets))

    logits = np.asarray(outs.final_logits)
    assert logits.shape == (T, B, K)
    assert np.all(np.isfinite(logits)), case
    assert int(state.step) == T

    ms = state.method_state
    if case["method"] in ("mode", "adaptive"):
        assert np.all(np.asarray(ms.var)[np.asarray(ms.var) < 1e9] >= 1e-8)
        pi = np.asarray(ms.pi)
        np.testing.assert_allclose(pi.sum(1), 1.0, atol=1e-4)
    if case["method"] == "dota":
        assert np.all(np.asarray(ms.c) >= 1.0)
    if case["method"] == "gmm":
        np.testing.assert_allclose(np.asarray(ms.pi).sum(1), 1.0, atol=1e-4)
    if case["method"] == "cache":
        assert int(np.asarray(ms.valid).sum()) >= 1
