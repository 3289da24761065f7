"""Forward breakdown v2: lax.scan-chained timing (one compiled body per
program; per-iteration cost from the difference of two trip counts,
cancelling dispatch/fetch)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.utils.profiling import enable_compile_cache

enable_compile_cache("/root/repo")
B, N = 30, 1024


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def scan_cost(body_fn, x, r_lo, r_hi):
    """Per-iteration seconds of body_fn via scan-length difference."""
    def make(r):
        @jax.jit
        def g(x):
            def body(c, _):
                return jnp.mean(body_fn(x + 1e-6 * c)).astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=r)
            return c
        return g
    t_hi = timed(make(r_hi), x)
    t_lo = timed(make(r_lo), x)
    return (t_hi - t_lo) / (r_hi - r_lo)


def gemm_probe():
    rng = np.random.default_rng(0)
    for (m, k, n) in [(15390, 1024, 1024), (15390, 1024, 2730),
                      (15390, 2730, 1024)]:
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)) * 0.01, jnp.bfloat16)
        dt = scan_cost(lambda x: jnp.dot(x, b), a, 64, 192)
        print(f"GEMM {m}x{k}x{n}: {dt*1e3:.3f} ms = "
              f"{2*m*k*n/dt/1e12:.1f} TF/s", flush=True)


def fwd_probe():
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.standard_normal((B, N, 6)), jnp.float32)
    results = {}
    for depth in (24, 12):
        model = Uni3D(trans_dim=1024, embed_dim=1024, num_group=512,
                      group_size=64, encoder_dim=512, depth=depth,
                      num_heads=16, dtype=jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), pc[:1])
        dt = scan_cost(lambda x: model.apply(params, x), pc, 2, 4)
        results[depth] = dt
        print(f"forward depth={depth}: {dt*1e3:.1f} ms", flush=True)
    per_block = (results[24] - results[12]) / 12
    overhead = results[24] - 24 * per_block
    print(f"per-block: {per_block*1e3:.2f} ms; "
          f"grouping/embed/head: {overhead*1e3:.1f} ms", flush=True)
    # matmul lower bound per block at measured peak:
    L, D, F, peak = 513, 1024, 2730, 195e12
    flops = 2 * B * L * (4 * D * D + 3 * D * F) + 4 * B * L * L * D
    print(f"block matmul FLOPs {flops/1e9:.1f} GF -> "
          f"{flops/peak*1e3:.2f} ms at peak "
          f"(measured {per_block*1e3:.2f})", flush=True)


def block_probe():
    """One EVA block at (30, 513, 1024): measured per-iteration cost vs
    its matmul lower bound; plus attention-only and mlp-only variants."""
    from uni_adapter_tpu.models.common import EvaBlock, EvaAttention, SwiGLU

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((30, 513, 1024)), jnp.bfloat16)

    blk = EvaBlock(1024, 16, dtype=jnp.bfloat16)
    p_blk = blk.init(jax.random.PRNGKey(0), x)
    dt = scan_cost(lambda v: blk.apply(p_blk, v), x, 8, 24)
    print(f"EVA block: {dt*1e3:.3f} ms", flush=True)

    attn = EvaAttention(1024, 16, dtype=jnp.bfloat16)
    p_at = attn.init(jax.random.PRNGKey(0), x)
    dt_a = scan_cost(lambda v: attn.apply(p_at, v), x, 8, 24)
    print(f"  attention part: {dt_a*1e3:.3f} ms", flush=True)

    mlp = SwiGLU(1024, 2730, dtype=jnp.bfloat16)
    p_m = mlp.init(jax.random.PRNGKey(0), x)
    dt_m = scan_cost(lambda v: mlp.apply(p_m, v), x, 8, 24)
    print(f"  swiglu part: {dt_m*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    if "gemm" in sys.argv:
        gemm_probe()
    if "fwd" in sys.argv:
        fwd_probe()
    if "block" in sys.argv:
        block_probe()
