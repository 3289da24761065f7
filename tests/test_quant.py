"""int8 QuantDense numerics: bounded error vs fp32 Dense, and the quantized
Uni3D trunk tracks the fp32 embedding direction."""
import numpy as np
import jax
import jax.numpy as jnp

from uni_adapter_tpu.models.common import QuantDense
from uni_adapter_tpu.models.uni3d import Uni3D
import flax.linen as nn


def test_quantdense_tracks_dense():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    qd = QuantDense(48, dtype=jnp.float32)
    params = qd.init(jax.random.PRNGKey(0), x)
    got = np.asarray(qd.apply(params, x))
    d = nn.Dense(48, dtype=jnp.float32)
    want = np.asarray(d.apply(params, x))   # identical param names/shapes
    # symmetric abs-max int8: relative error ~1/127 per factor
    rel = np.abs(got - want) / (np.abs(want).mean() + 1e-9)
    assert rel.mean() < 0.02
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999


def test_quantdense_param_compat():
    """Param tree identical to nn.Dense — converted checkpoints overlay."""
    x = jnp.ones((4, 8))
    qd_params = QuantDense(6).init(jax.random.PRNGKey(0), x)
    d_params = nn.Dense(6).init(jax.random.PRNGKey(0), x)
    assert (jax.tree.structure(qd_params) == jax.tree.structure(d_params))
    assert qd_params["params"]["kernel"].shape == (8, 6)


def test_quantized_uni3d_tracks_fp32():
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.standard_normal((2, 64, 6)), jnp.float32)
    kw = dict(trans_dim=32, embed_dim=24, num_group=8, group_size=8,
              encoder_dim=16, depth=2, num_heads=4, dtype=jnp.float32)
    fp = Uni3D(**kw)
    q8 = Uni3D(quantize=True, **kw)
    params = fp.init(jax.random.PRNGKey(0), pc)   # same tree for both
    a = np.asarray(fp.apply(params, pc))
    b = np.asarray(q8.apply(params, pc))
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                             * np.linalg.norm(b, axis=-1))
    assert np.all(cos > 0.99), cos
