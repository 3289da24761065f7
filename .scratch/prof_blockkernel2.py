"""A/B with ONE compiled program per variant: scan(trunk, length=R),
fetch-subtracted timing (bench.py convention)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import flax.linen as nn
import jax, jax.numpy as jnp
from uni_adapter_tpu.utils.profiling import enable_compile_cache
enable_compile_cache("/root/repo")
from uni_adapter_tpu.models.common import EvaBlock

B, N, D = 30, 513, 1024
MODE = sys.argv[1] if len(sys.argv) > 1 else "both"
DEPTH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
R = int(sys.argv[3]) if len(sys.argv) > 3 else 8


class Trunk(nn.Module):
    blockk: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(DEPTH):
            x = EvaBlock(D, 16, mlp_ratio=4 * 2 / 3,
                         use_pallas_attn_block=self.blockk,
                         name=f"blocks_{i}")(x)
        return x


rng = np.random.default_rng(0)
tok = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
p = jax.jit(Trunk(False).init)(jax.random.PRNGKey(2), tok)


def measure(blockk):
    mod = Trunk(blockk)

    @jax.jit
    def g(p, x):
        # params as ARGUMENTS — closed-over arrays embed as HLO constants
        # and blow the tunnel's remote-compile body limit (HTTP 413)
        def bd(c, _):
            return jnp.mean(mod.apply(p, x + c.astype(x.dtype) * 1e-6)
                            ).astype(jnp.float32), None
        c, _ = jax.lax.scan(bd, jnp.float32(0.0), None, length=R)
        return c

    o = g(p, tok); np.asarray(o)               # compile + warm
    t0 = time.perf_counter(); np.asarray(g(p, tok)); t1 = time.perf_counter()
    np.asarray(o)                              # fetch-only round trip
    t2 = time.perf_counter()
    best = t1 - t0
    for _ in range(2):
        t0 = time.perf_counter(); np.asarray(g(p, tok))
        best = min(best, time.perf_counter() - t0)
    rt = t2 - t1
    return (best - rt) / R


if MODE in ("both", "xla"):
    print(f"trunk{DEPTH} XLA: {measure(False)*1e3:.2f} ms/iter", flush=True)
if MODE in ("both", "blk"):
    print(f"trunk{DEPTH} block-kernel: {measure(True)*1e3:.2f} ms/iter",
          flush=True)
    y0 = Trunk(False).apply(p, tok[:2])
    y1 = Trunk(True).apply(p, tok[:2])
    d = jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32)))
    s = jnp.max(jnp.abs(y0.astype(jnp.float32)))
    print(f"max abs diff {float(d):.4f} (scale {float(s):.2f})", flush=True)
