"""Stage-wise ULIP forward attribution on TPU, batch 30."""
import time
import numpy as np
import jax, jax.numpy as jnp
import flax.linen as nn
from uni_adapter_tpu.config import parse_args
from uni_adapter_tpu.models.pointbert import create_ulip, PointTransformer
from uni_adapter_tpu.models.common import ViTBlock, LN
from uni_adapter_tpu.ops.geometry import group_points

cfg = parse_args(["--vlm3d", "ulip", "--use-pallas-fps", "true"])
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((30, 1024, 3)), jnp.float32)

def timed(f, *a, reps=10):
    def chain(*a):
        def body(c, _):
            r = f(*[x if not isinstance(x, jax.Array) or x.dtype.kind != 'f' else x + c*0 for x in a])
            leaf = jax.tree_util.tree_leaves(r)[0]
            return jnp.sum(leaf.astype(jnp.float32)).astype(jnp.float32)*1e-9, None
        return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]
    cf = jax.jit(chain)
    _ = np.asarray(cf(*a)); t0 = time.perf_counter(); _ = np.asarray(cf(*a))
    return (time.perf_counter()-t0)/reps*1e3

# grouping
print(f"grouping(pallas fps): {timed(lambda x: group_points(x, None, 512, 32, use_pallas_fps=True)[0], pc):.2f} ms", flush=True)

# MiniPointNet tokens
from uni_adapter_tpu.models.pointbert import MiniPointNet
nbr = jnp.asarray(rng.standard_normal((30, 512, 32, 3)), jnp.bfloat16)
mpn = MiniPointNet(256, 3, dtype=jnp.bfloat16)
mp = mpn.init(jax.random.PRNGKey(0), nbr)
print(f"MiniPointNet (30,512,32,3)->256: {timed(lambda n: mpn.apply(mp, n), nbr):.2f} ms", flush=True)

# 12 transformer blocks alone
x = jnp.asarray(rng.standard_normal((30, 513, 384)), jnp.bfloat16)
blk = ViTBlock(384, 6, dtype=jnp.bfloat16)
bp = blk.init(jax.random.PRNGKey(0), x)
def blocks12(x):
    for _ in range(12):
        x = blk.apply(bp, x)
    return x
print(f"12 ViTBlocks XLA attn: {timed(blocks12, x):.2f} ms", flush=True)
blk2 = ViTBlock(384, 6, use_pallas_attention=True, dtype=jnp.bfloat16)
def blocks12p(x):
    for _ in range(12):
        x = blk2.apply(bp, x)
    return x
print(f"12 ViTBlocks pallas attn: {timed(blocks12p, x):.2f} ms", flush=True)

model = create_ulip(cfg.model)
params = model.init(jax.random.PRNGKey(0), pc[:1])
print(f"full ULIP fwd (pallas fps, xla attn): {timed(lambda p: model.apply(params, p), pc):.2f} ms", flush=True)
import dataclasses
cfg2 = parse_args(["--vlm3d", "ulip", "--use-pallas-fps", "true", "--use-pallas-attention", "true"])
model2 = create_ulip(cfg2.model)
print(f"full ULIP fwd (pallas fps + pallas attn): {timed(lambda p: model2.apply(params, p), pc):.2f} ms", flush=True)
