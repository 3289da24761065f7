"""Tensor-parallel trunk sharding (parallel/tp.py) on the virtual 8-CPU
mesh: TP forwards must match the replicated forward, the compiled program
must actually communicate (all-reduce in HLO), and TP must compose with
data-sharded batches on a 2-D (data, model) mesh and with the full
MODE-DOTA engine step.

Beyond-reference capability (the reference is single-GPU; SURVEY.md §2.4).
"""
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.pointbert import PointTransformer
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import tp

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _tiny_uni3d():
    model = Uni3D(trans_dim=48, embed_dim=32, num_group=8, group_size=8,
                  encoder_dim=24, depth=2, num_heads=4, dtype=jnp.float32)
    pc = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 6)),
                     jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc[:1])
    return model, params, pc


def test_tp_specs_shard_the_trunk_only():
    model, params, _ = _tiny_uni3d()
    specs = tp.tp_param_specs(params)
    flat = {"/".join(tp._path_names(p)): s
            for p, s in jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda x: isinstance(x, P))[0]}
    assert flat["params/point_encoder/blocks_0/attn/q_proj/kernel"] == \
        P(None, "model")
    assert flat["params/point_encoder/blocks_0/attn/proj/kernel"] == \
        P("model", None)
    assert flat["params/point_encoder/blocks_0/mlp/fc1_g/kernel"] == \
        P(None, "model")
    assert flat["params/point_encoder/blocks_0/mlp/fc2/kernel"] == \
        P("model", None)
    # the SwiGLU hidden-dim LayerNorm follows the sharded hidden axis
    assert flat["params/point_encoder/blocks_0/mlp/norm/scale"] == P("model")
    # everything outside the trunk stays replicated
    assert flat["params/point_encoder/encoder/conv1/kernel"] == P()
    assert flat["params/point_encoder/trans2embed/kernel"] == P()
    assert flat["params/point_encoder/blocks_0/attn/q_norm/scale"] == P()


@requires_8
@pytest.mark.parametrize("tp_size", [2, 4])
def test_tp_forward_matches_replicated(tp_size):
    model, params, pc = _tiny_uni3d()
    want = np.asarray(jax.jit(model.apply)(params, pc))

    mesh = Mesh(np.asarray(jax.devices()[:tp_size]), ("model",))
    sharded = tp.shard_params_tp(params, mesh)
    fwd = tp.make_tp_forward(model, mesh)
    got = np.asarray(fwd(sharded, pc))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # the sharding must be real: the compiled module communicates
    hlo = fwd.lower(sharded, pc).compile().as_text()
    assert re.search(r"all-reduce|reduce-scatter|all-gather", hlo), \
        "TP program contains no collectives — params silently replicated?"


@requires_8
def test_tp_forward_fused_qkv_trunk():
    # ULIP-style trunk with a fused qkv projection (the GSPMD resharding
    # path at the head reshape)
    model = PointTransformer(trans_dim=48, depth=2, num_heads=4, num_group=8,
                             group_size=8, encoder_dim=24, dtype=jnp.float32)
    pc = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, 3)),
                     jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc[:1])
    want = np.asarray(jax.jit(model.apply)(params, pc))

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("model",))
    fwd = tp.make_tp_forward(model, mesh)
    got = np.asarray(fwd(tp.shard_params_tp(params, mesh), pc))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@requires_8
def test_tp_composes_with_data_axis():
    model, params, _ = _tiny_uni3d()
    pc = jnp.asarray(np.random.default_rng(2).standard_normal((4, 64, 6)),
                     jnp.float32)
    want = np.asarray(jax.jit(model.apply)(params, pc))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "model"))
    sharded = tp.shard_params_tp(params, mesh)
    fwd = tp.make_tp_forward(model, mesh, data_axis="data")
    got = np.asarray(fwd(sharded, pc))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@requires_8
def test_tp_engine_step_trajectory_matches():
    """The full MODE-DOTA adaptation scan runs with TP-sharded params and
    reproduces the replicated trajectory (adaptation state replicated,
    trunk weights sharded)."""
    model, params, _ = _tiny_uni3d()
    K, D, N, T = 5, 32, 64, 4
    rng = np.random.default_rng(3)
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    text = jnp.asarray(text)
    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_mode_dota=True, mode_M=2,
                                 res_learning=True, residual_steps=2),
                 cache=CacheConfig(cg_max_iter=10))
    pcs = jnp.asarray(rng.standard_normal((T, 1, N, 3)), jnp.float32)
    rgbs = jnp.ones_like(pcs)
    tgts = jnp.asarray(rng.integers(0, K, (T, 1)), jnp.int32)

    scan_fn = jax.jit(engine.make_scan_fn(cfg, model))
    state0 = engine.init_state(cfg, text, jax.random.PRNGKey(7))
    _, outs_rep = scan_fn(params, text, state0, pcs, rgbs, tgts)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("model",))
    sharded = tp.shard_params_tp(params, mesh)
    _, outs_tp = scan_fn(sharded, text, state0, pcs, rgbs, tgts)

    np.testing.assert_allclose(np.asarray(outs_tp.final_logits),
                               np.asarray(outs_rep.final_logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(outs_tp.correct),
                                  np.asarray(outs_rep.correct))
