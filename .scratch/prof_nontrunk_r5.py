"""Round-5 cont.: re-profile the non-trunk portion of the Uni3D-L step at
the unclamped clock (ROADMAP round-6 carryover).  Small per-span programs
(tunnel kept crashing the big-program probes last session).

Spans at the bench's fused batch B=30, N=1024:
  full forward | grouping (fps+knn+gather) | MiniPointNet embed
  | trunk 24 blocks | head.
"""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import flax.linen as nn
import jax, jax.numpy as jnp

SPANS = set(sys.argv[1:]) or {"fwd", "grp", "mpn", "trunk"}
from uni_adapter_tpu.utils.profiling import enable_compile_cache
enable_compile_cache("/root/repo")
from uni_adapter_tpu.config import ModelConfig
from uni_adapter_tpu.models.uni3d import MiniPointNet, create_uni3d
from uni_adapter_tpu.models.common import EvaBlock
from uni_adapter_tpu.ops.geometry import group_points

B, N = 30, 1024
cfg = ModelConfig()
model = create_uni3d(cfg)
rng = np.random.default_rng(0)
pc = jnp.asarray(rng.standard_normal((B, N, 6)), jnp.float32)
params = jax.jit(model.init)(jax.random.PRNGKey(0), pc[:1])


def timed_scan(body, x, reps_lo=2, reps_hi=8):
    """Difference-timed scan: (t(hi) - t(lo)) / (hi - lo) removes dispatch
    + fetch overhead (the only reliable timing on the tunneled v5e)."""
    def make(r):
        @jax.jit
        def g(x):
            def bd(c, _):
                return jnp.mean(body(x + c.astype(x.dtype) * 1e-6)).astype(jnp.float32), None
            c, _ = jax.lax.scan(bd, jnp.float32(0.0), None, length=r)
            return c
        return g
    def t(f):
        o = f(x); np.asarray(o).ravel()[:1]
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); o = f(x); np.asarray(o).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(make(reps_hi)) - t(make(reps_lo))) / (reps_hi - reps_lo)


if "fwd" in SPANS:
    dt_fwd = timed_scan(lambda x: model.apply(params, x), pc, 1, 3)
    print(f"full forward B={B}: {dt_fwd*1e3:.2f} ms", flush=True)

# grouping span only
def grouping(x):
    xyz, color = x[:, :, :3], x[:, :, 3:]
    _, center, features = group_points(
        xyz, color, 512, 64, use_pallas_fps=True, use_pallas_knn=True)
    return center.astype(jnp.float32).mean() + features.astype(jnp.float32).mean()
if "grp" in SPANS:
    dt_grp = timed_scan(grouping, pc)
    print(f"grouping (fps+knn+gather): {dt_grp*1e3:.2f} ms", flush=True)

# embed span: MiniPointNet on pre-grouped features
if "mpn" in SPANS:
    feats = jnp.asarray(rng.standard_normal((B, 512, 64, 6)), jnp.bfloat16)
    mpn = MiniPointNet(512, 6)
    p_mpn = jax.jit(mpn.init)(jax.random.PRNGKey(1), feats)
    dt_mpn = timed_scan(lambda x: mpn.apply(p_mpn, x).astype(jnp.float32), feats)
    print(f"MiniPointNet embed: {dt_mpn*1e3:.2f} ms", flush=True)

# trunk span: 24 EVA blocks at (30, 513, 1024) x 16h
class Trunk(nn.Module):
    @nn.compact
    def __call__(self, x):
        for i in range(24):
            x = EvaBlock(1024, 16, mlp_ratio=4 * 2 / 3, name=f"blocks_{i}")(x)
        return x
if "trunk" in SPANS:
    tok = jnp.asarray(rng.standard_normal((B, 513, 1024)), jnp.bfloat16)
    trunk = Trunk()
    p_tr = jax.jit(trunk.init)(jax.random.PRNGKey(2), tok)
    dt_tr = timed_scan(lambda x: trunk.apply(p_tr, x).astype(jnp.float32).mean(),
                       tok, reps_lo=1, reps_hi=3)
    print(f"trunk 24 blocks: {dt_tr*1e3:.2f} ms", flush=True)
