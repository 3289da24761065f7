"""Probe round 3: Mosaic dynamic-gather via take_along_axis with ALL shapes
equal — out[s, l] = tab[s, idx[s, l]], tiles of (C, N) with lane count == N."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, K, N, C = 30, 512, 64, 1024, 8
R = S * K
PACK = 8  # tiles of N lanes handled per grid step (B5)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    out.block_until_ready()
    float(jnp.sum(out)[None][0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out)[None][0])
    return (time.perf_counter() - t0) / reps * 1e3


# --- B4: one (C, N) gather per grid step ------------------------------------
def _kern_b4(idx_ref, tabt_ref, out_ref):
    idx = jnp.broadcast_to(idx_ref[0], (C, N))
    out_ref[0] = jnp.take_along_axis(tabt_ref[0], idx, axis=1)


@jax.jit
def gather_b4(idx, tabt):
    out = pl.pallas_call(
        _kern_b4,
        grid=(B, R // N),
        in_specs=[
            pl.BlockSpec((1, 1, N), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, N), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, R), jnp.float32),
    )(idx.reshape(B, 1, R), tabt)
    return out


# --- B5: PACK gathers per grid step ------------------------------------------
def _kern_b5(idx_ref, tabt_ref, out_ref):
    tab = tabt_ref[0]
    for i in range(PACK):
        idx = jnp.broadcast_to(idx_ref[0, :, pl.ds(i * N, N)], (C, N))
        out_ref[0, :, pl.ds(i * N, N)] = jnp.take_along_axis(tab, idx,
                                                             axis=1)


@jax.jit
def gather_b5(idx, tabt):
    out = pl.pallas_call(
        _kern_b5,
        grid=(B, R // (N * PACK)),
        in_specs=[
            pl.BlockSpec((1, 1, N * PACK), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, N * PACK), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, R), jnp.float32),
    )(idx.reshape(B, 1, R), tabt)
    return out


@jax.jit
def xla_onehot_t(idx, tabt):
    onehot = jax.nn.one_hot(idx, N, dtype=jnp.float32)
    return jnp.einsum("bcn,brn->bcr", tabt, onehot,
                      precision=jax.lax.Precision.HIGHEST)


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=(B, R)), jnp.int32)
    tabt = jnp.asarray(rng.standard_normal((B, C, N)), jnp.float32)

    ref = np.asarray(jnp.take_along_axis(
        tabt, jnp.broadcast_to(idx[:, None, :], (B, C, R)), axis=2))

    for name, fn in [
        ("B4 pallas dyn-gather 1x", gather_b4),
        ("B5 pallas dyn-gather x8", gather_b5),
        ("X0t xla onehot", xla_onehot_t),
    ]:
        try:
            out = fn(idx, tabt)
            ok = np.array_equal(np.asarray(out), ref)
            ms = timeit(fn, idx, tabt)
            print(f"{name:26s} ok={ok}  {ms:7.3f} ms")
        except Exception as e:
            msg = str(e).split(chr(10))[0][:160]
            print(f"{name:26s} FAILED: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
