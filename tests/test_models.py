"""Backbone shape/sanity tests on tiny configurations (full-size EVA02-L is
exercised on real hardware via bench.py / __graft_entry__.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu.models.clip_text import TextEncoder
from uni_adapter_tpu.models.common import EvaBlock, ViTBlock
from uni_adapter_tpu.models.pointbert import ULIP, PointTransformer
from uni_adapter_tpu.models.ppta import PRESETS, PPTAPreset, Projected
from uni_adapter_tpu.models.uni3d import Uni3D

F32 = jnp.float32


@pytest.fixture
def pc():
    rng = np.random.default_rng(0)
    return jnp.array(rng.standard_normal((2, 128, 6)).astype(np.float32))


def test_uni3d_forward(pc):
    model = Uni3D(trans_dim=64, embed_dim=32, num_group=16, group_size=8,
                  encoder_dim=48, depth=2, num_heads=4, dtype=F32)
    params = model.init(jax.random.PRNGKey(0), pc)
    out = model.apply(params, pc)
    assert out.shape == (2, 32)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_uni3d_attention_maps(pc):
    model = Uni3D(trans_dim=64, embed_dim=32, num_group=16, group_size=8,
                  encoder_dim=48, depth=2, num_heads=4, dtype=F32)
    params = model.init(jax.random.PRNGKey(0), pc)
    out, attns = model.apply(params, pc, return_attn=True)
    assert len(attns) == 2
    assert attns[0].shape == (2, 4, 17, 17)       # G+1 tokens
    sums = np.asarray(jnp.sum(attns[0], axis=-1))
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_ulip_forward(pc):
    model = ULIP(trans_dim=32, depth=2, num_heads=4, num_group=16,
                 group_size=8, encoder_dim=24, embed_dim=40, dtype=F32)
    xyz = pc[:, :, :3]
    params = model.init(jax.random.PRNGKey(0), xyz)
    out = model.apply(params, xyz)
    assert out.shape == (2, 40)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pointbert_concat_pooling(pc):
    model = PointTransformer(trans_dim=32, depth=1, num_heads=4,
                             num_group=16, group_size=8, encoder_dim=24,
                             dtype=F32)
    xyz = pc[:, :, :3]
    params = model.init(jax.random.PRNGKey(0), xyz)
    out = model.apply(params, xyz)
    assert out.shape == (2, 64)                    # [CLS ‖ max-pool] = 2×dim


def test_ppta_forward(pc):
    preset = PPTAPreset(dim=32, depth=2, heads=4, mlp_dim=64, sa_dim=24,
                        patches=16, prad=0.4, nsamp=8)
    model = Projected(preset=preset, out_channel=20, dtype=F32)
    xyz = pc[:, :, :3]
    params = model.init(jax.random.PRNGKey(0), xyz, pc)
    out = model.apply(params, xyz, pc)
    assert out.shape == (2, 20)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ppta_presets_table():
    assert PRESETS[3].patches == 128 and PRESETS[3].depth == 12
    assert PRESETS[4].sa_dim == 256 and PRESETS[4].nsamp == 64


def test_text_encoder_eot_pooling():
    model = TextEncoder(vocab_size=100, width=32, layers=2, heads=4,
                        context_length=16, embed_dim=24, dtype=F32)
    # tokens: SOT=90, body, EOT=99 (highest id), padding zeros
    text = np.zeros((2, 16), np.int32)
    text[0, :4] = [90, 5, 7, 99]
    text[1, :6] = [90, 3, 2, 8, 4, 99]
    params = model.init(jax.random.PRNGKey(0), jnp.array(text))
    out = model.apply(params, jnp.array(text))
    assert out.shape == (2, 24)
    # moving the EOT position changes the pooled feature
    text2 = text.copy()
    text2[0, 3] = 0; text2[0, 10] = 99
    out2 = model.apply(params, jnp.array(text2))
    assert not np.allclose(np.asarray(out[0]), np.asarray(out2[0]))


def test_eva_block_shapes():
    blk = EvaBlock(dim=64, num_heads=4, dtype=F32)
    x = jnp.ones((1, 9, 64))
    params = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(params, x)
    assert y.shape == x.shape
    # separate q/k/v params exist; k has no bias
    att = params["params"]["attn"]
    assert "q_proj" in att and "k_proj" in att and "v_proj" in att
    assert "bias" not in att["k_proj"]
    assert "q_norm" in att and "k_norm" in att
    # SwiGLU structure
    assert set(params["params"]["mlp"]) == {"fc1_g", "fc1_x", "norm", "fc2"}


def test_vit_block_causal_equivalence():
    """ViTBlock with mask=None is permutation-equivariant (sanity)."""
    blk = ViTBlock(dim=16, num_heads=2, dtype=F32)
    x = jnp.array(np.random.default_rng(0).standard_normal((1, 6, 16)),
                  dtype=jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(params, x)
    perm = jnp.array([3, 1, 0, 2, 5, 4])
    y_perm = blk.apply(params, x[:, perm])
    np.testing.assert_allclose(np.asarray(y[:, perm]), np.asarray(y_perm),
                               atol=1e-4)
