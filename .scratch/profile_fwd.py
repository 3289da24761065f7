"""Where do the 142 ms go?  The tunnel device now measures ~197 TF/s on
bare matmuls (round-5), yet the Uni3D-L B=30 forward still takes ~140 ms
(~10.1 TF => ~72 TF/s).  Break the forward down: bare GEMMs at the trunk
shapes, depth ablation (per-block cost), grouping-only cost."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from uni_adapter_tpu.config import ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D, create_uni3d
from uni_adapter_tpu.utils.profiling import enable_compile_cache

enable_compile_cache("/root/repo")
B, N = 30, 1024


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def chain_timed(fn, x, reps=8):
    """Chain fn 'reps' times with a data dependency; report per-call ms
    by difference vs reps//2 (cancels dispatch/fetch)."""
    def make(n):
        @jax.jit
        def g(x):
            y = fn(x)
            for _ in range(n - 1):
                y = fn(x + 1e-6 * jnp.mean(y))
            return y
        return g
    t_full = timed(make(reps), x)
    t_half = timed(make(reps // 2), x)
    return (t_full - t_half) / (reps - reps // 2)


def gemm_probe():
    rng = np.random.default_rng(0)
    for (m, k, n) in [(15390, 1024, 1024), (15390, 1024, 2730),
                      (15390, 2730, 1024), (15390, 1024, 3072)]:
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)) * 0.01, jnp.bfloat16)
        dt = chain_timed(lambda x: jnp.dot(x, b), a)
        print(f"GEMM {m}x{k}x{n}: {dt*1e3:.2f} ms = "
              f"{2*m*k*n/dt/1e12:.1f} TF/s", flush=True)


def fwd_probe():
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.standard_normal((B, N, 6)), jnp.float32)
    for depth in (24, 12, 0):
        try:
            model = Uni3D(trans_dim=1024, embed_dim=1024, num_group=512,
                          group_size=64, encoder_dim=512, depth=depth,
                          num_heads=16, dtype=jnp.bfloat16)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), pc[:1])
            dt = chain_timed(lambda x: model.apply(params, x), pc, reps=4)
            print(f"forward depth={depth}: {dt*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"depth={depth} failed: {e}", flush=True)


if __name__ == "__main__":
    gemm_probe()
    fwd_probe()
