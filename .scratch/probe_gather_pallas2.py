"""Probe round 2: transposed layouts — gather along the LANE axis with C on
sublanes, so every block tiles as (8k, 128m).  Also XLA minor-dim gather."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, K, N, C = 30, 512, 64, 1024, 8
R = S * K
RT = 4096          # lanes per take (R/RT grid steps); 4096 = 32*128


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    float(jnp.sum(out)[None][0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out)[None][0])
    return (time.perf_counter() - t0) / reps * 1e3


# --- B1: lane gather, idx 2D (rows, 128), out 4D ----------------------------
def _kern_b1(idx_ref, tabt_ref, out_ref):
    # idx (1, R//128, 128) ; tabt (1, C, N) ; out (1, C, R//128, 128)
    out_ref[0] = jnp.take(tabt_ref[0], idx_ref[0], axis=1)


@jax.jit
def gather_b1(idx2, tabt):
    RR = R // 128
    out = pl.pallas_call(
        _kern_b1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, RR, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, RR, 128), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, RR, 128), jnp.float32),
    )(idx2, tabt)
    return out.reshape(B, C, R)


# --- B2: lane gather, flat idx as (1, R) lane vector -------------------------
def _kern_b2(idx_ref, tabt_ref, out_ref):
    # idx (1, 1, RT) ; tabt (1, C, N) ; out (1, C, RT)
    idx = idx_ref[0, 0]                       # (RT,) lane vector
    out_ref[0] = jnp.take(tabt_ref[0], idx, axis=1)


@jax.jit
def gather_b2(idx, tabt):
    out = pl.pallas_call(
        _kern_b2,
        grid=(B, R // RT),
        in_specs=[
            pl.BlockSpec((1, 1, RT), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, RT), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, R), jnp.float32),
    )(idx.reshape(B, 1, R), tabt)
    return out


# --- B3: like B2 but via fancy indexing tabt[:, idx] -------------------------
def _kern_b3(idx_ref, tabt_ref, out_ref):
    idx = idx_ref[0, 0]
    out_ref[0] = tabt_ref[0][:, idx]


@jax.jit
def gather_b3(idx, tabt):
    out = pl.pallas_call(
        _kern_b3,
        grid=(B, R // RT),
        in_specs=[
            pl.BlockSpec((1, 1, RT), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, RT), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, R), jnp.float32),
    )(idx.reshape(B, 1, R), tabt)
    return out


# --- XLA baselines -----------------------------------------------------------
@jax.jit
def xla_onehot_t(idx, tabt):
    onehot = jax.nn.one_hot(idx, N, dtype=jnp.float32)          # (B, R, N)
    return jnp.einsum("bcn,brn->bcr", tabt, onehot,
                      precision=jax.lax.Precision.HIGHEST)


@jax.jit
def xla_take_minor(idx, tabt):
    return jnp.take_along_axis(tabt, idx[:, None, :], axis=2)   # (B, C, R)


@jax.jit
def xla_onehot(idx, tab):
    onehot = jax.nn.one_hot(idx, N, dtype=jnp.float32)
    return jnp.einsum("brn,bnc->brc", onehot, tab,
                      precision=jax.lax.Precision.HIGHEST)


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=(B, R)), jnp.int32)
    tab = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    tabt = jnp.swapaxes(tab, 1, 2).copy()
    idx2 = idx.reshape(B, R // 128, 128)

    ref = np.swapaxes(
        np.asarray(jnp.take_along_axis(tab, idx[..., None], axis=1)), 1, 2)

    for name, fn, args, post in [
        ("B1 pallas lane take 4D", gather_b1, (idx2, tabt), None),
        ("B2 pallas lane take flat", gather_b2, (idx, tabt), None),
        ("B3 pallas fancy index", gather_b3, (idx, tabt), None),
        ("X2 xla take minor-dim", xla_take_minor, (idx, tabt), None),
        ("X0t xla onehot->(B,C,R)", xla_onehot_t, (idx, tabt), None),
        ("X0 xla onehot (B,R,C)", xla_onehot, (idx, tab),
         lambda o: np.swapaxes(o, 1, 2)),
    ]:
        try:
            out = fn(*args)
            o = np.asarray(out)
            if post:
                o = post(o)
            ok = np.array_equal(o, ref)
            ms = timeit(fn, *args)
            print(f"{name:28s} ok={ok}  {ms:7.3f} ms")
        except Exception as e:
            msg = str(e).split(chr(10))[0][:150]
            print(f"{name:28s} FAILED: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
