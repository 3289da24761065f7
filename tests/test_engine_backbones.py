"""Engine dispatch across all three backbones (get_logits_wrapper parity:
uni3d consumes xyz‖color, ulip xyz only, openshape (xyz, features))."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.pointbert import ULIP
from uni_adapter_tpu.models.ppta import PPTAPreset, Projected
from uni_adapter_tpu.models.uni3d import Uni3D

K, N, T = 4, 48, 3


def _stream(d, seed=0):
    rng = np.random.default_rng(seed)
    pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
    text = rng.standard_normal((K, d)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    targets = rng.integers(0, K, (T, 1)).astype(np.int32)
    return pcs, np.ones_like(pcs), targets, text


def _cfg(vlm3d):
    return Config(
        model=ModelConfig(vlm3d=vlm3d, compute_dtype="float32"),
        dota=DotaConfig(use_mode_dota=True, mode_M=2, res_learning=False),
        cache=CacheConfig(cg_max_iter=5))


def test_engine_ulip_backbone():
    d = 24
    model = ULIP(trans_dim=16, depth=1, num_heads=4, num_group=8,
                 group_size=8, encoder_dim=16, embed_dim=d, dtype=jnp.float32)
    pcs, rgbs, targets, text = _stream(d)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pcs[0]))
    st, outs = engine.run_stream_scan(
        _cfg("ulip"), model, params, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets))
    assert outs.final_logits.shape == (T, 1, K)
    assert np.all(np.isfinite(np.asarray(outs.final_logits)))


def test_engine_openshape_backbone():
    d = 20
    preset = PPTAPreset(dim=24, depth=1, heads=4, mlp_dim=48, sa_dim=16,
                        patches=8, prad=0.4, nsamp=8)
    model = Projected(preset=preset, out_channel=d, dtype=jnp.float32)
    pcs, rgbs, targets, text = _stream(d)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pcs[0]),
                        jnp.concatenate([jnp.asarray(pcs[0]),
                                         jnp.asarray(rgbs[0])], -1))
    st, outs = engine.run_stream_scan(
        _cfg("openshape"), model, params, jnp.asarray(text),
        jnp.asarray(pcs), jnp.asarray(rgbs), jnp.asarray(targets))
    assert outs.final_logits.shape == (T, 1, K)
    assert np.all(np.isfinite(np.asarray(outs.final_logits)))


def test_engine_bad_backbone_raises():
    model = Uni3D(trans_dim=16, embed_dim=8, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=2, dtype=jnp.float32)
    cfg = _cfg("nonexistent")
    pcs, rgbs, targets, text = _stream(8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, N, 6), jnp.float32))
    with pytest.raises(ValueError):
        engine.run_stream_scan(cfg, model, params, jnp.asarray(text),
                               jnp.asarray(pcs), jnp.asarray(rgbs),
                               jnp.asarray(targets))
