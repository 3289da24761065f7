"""A/B: 24-block EVA trunk with the whole-span attention kernel
(use_pallas_attn_block) vs plain XLA, at (30, 513, 1024) x 16h."""
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
DEPTH = int(sys.argv[2]) if len(sys.argv) > 2 else 24


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


def timed_scan(body, x, reps_lo=1, reps_hi=3):
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


if MODE in ("both", "xla"):
    dt0 = timed_scan(lambda x: Trunk(False).apply(p, x).astype(jnp.float32).mean(), tok)
    print(f"trunk{DEPTH} XLA: {dt0*1e3:.2f} ms", flush=True)
if MODE in ("both", "blk"):
    dt1 = timed_scan(lambda x: Trunk(True).apply(p, x).astype(jnp.float32).mean(), tok)
    print(f"trunk{DEPTH} block-kernel: {dt1*1e3:.2f} ms", flush=True)
    # numeric sanity on device
    y0 = Trunk(False).apply(p, tok[:2])
    y1 = Trunk(True).apply(p, tok[:2])
    d = jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32)))
    s = jnp.max(jnp.abs(y0.astype(jnp.float32)))
    print(f"max abs diff {float(d):.4f} (scale {float(s):.2f})", flush=True)
