"""Prototype: PP x TP — GPipe pipeline over `stage` (manual shard_map)
with Megatron TP over `model` left to GSPMD (partial-manual axis_names).
Run: python .scratch/proto_pp_tp.py
"""
import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import sys
sys.path.insert(0, "/root/repo")
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import pp, tp

mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("stage", "model"))
model = Uni3D(trans_dim=48, embed_dim=16, num_group=8, group_size=8,
              encoder_dim=16, depth=4, num_heads=4, dtype=jnp.float32)
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((4, 64, 6)), jnp.float32)
params = model.init(jax.random.PRNGKey(0), pc)
want = np.asarray(jax.jit(model.apply)(params, pc))

# ---- prepare: stack blocks, shard (stage, None, *tp_spec) ----
pe = params["params"]["point_encoder"]
S = 4
stacked = pp.stack_trunk_params(pe, model.depth, S)
block0 = pe["blocks_0"]
tp_specs = tp.tp_param_specs(block0, axis="model")
stacked_specs = jax.tree.map(
    lambda s: P(*(("stage", None) + tuple(s))), tp_specs,
    is_leaf=lambda x: isinstance(x, P))
stacked_sh = jax.tree.map(
    lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
    stacked, stacked_specs, is_leaf=lambda x: isinstance(x, jnp.ndarray))
rest = {k: v for k, v in pe.items() if not k.startswith("blocks_")}
rest_sh = jax.device_put(rest, NamedSharding(mesh, P()))

from uni_adapter_tpu.models.common import EvaBlock, LN
from uni_adapter_tpu.models.uni3d import MiniPointNet, PosEmbedMLP
from uni_adapter_tpu.ops.geometry import group_points

block = EvaBlock(model.trans_dim, model.num_heads, dtype=model.dtype)


def block_apply(p, x):
    return block.apply({"params": p}, x)


def pipe_body(stacked_local, micro_carry):
    local = jax.tree.map(lambda a: a[0], stacked_local)
    return pp._pipeline(block_apply, local, micro_carry, S, "stage")


pipe = jax.shard_map(pipe_body, mesh=mesh,
                     in_specs=(P("stage"), P()), out_specs=P(),
                     axis_names={"stage"}, check_vma=False)


@jax.jit
def fwd(stacked, rest, pc):
    xyz, color = pc[:, :, :3], pc[:, :, 3:]
    _, center, features = group_points(xyz, color, model.num_group,
                                       model.group_size)
    tokens = MiniPointNet(model.encoder_dim, 6, dtype=model.dtype).apply(
        {"params": rest["encoder"]}, features)
    tokens = jnp.matmul(tokens, rest["encoder2trans"]["kernel"]) + \
        rest["encoder2trans"]["bias"]
    B = tokens.shape[0]
    pos = PosEmbedMLP(model.trans_dim, dtype=model.dtype).apply(
        {"params": rest["pos_embed"]}, center)
    x = jnp.concatenate([jnp.broadcast_to(rest["cls_token"],
                                          (B, 1, model.trans_dim)), tokens],
                        axis=1)
    pos = jnp.concatenate([jnp.broadcast_to(rest["cls_pos"],
                                            (B, 1, model.trans_dim)), pos],
                          axis=1)
    x = x + pos
    x = pp._merge_micro(pipe(stacked, pp._split_micro(x, 2)))
    x = LN(dtype=model.dtype).apply({"params": rest["norm"]}, x[:, 0, :])
    x = LN(dtype=model.dtype).apply({"params": rest["fc_norm"]}, x)
    x = jnp.matmul(x, rest["trans2embed"]["kernel"]) + \
        rest["trans2embed"]["bias"]
    return x.astype(jnp.float32)


got = np.asarray(fwd(stacked_sh, rest_sh, pc))
err = np.abs(got - want).max()
print("max abs err:", err)
assert err < 2e-4, err
print("PP x TP OK")
