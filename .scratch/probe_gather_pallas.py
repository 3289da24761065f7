"""Probe: can Mosaic lower a true dynamic gather inside a Pallas TPU kernel
on this toolchain, and does it beat the fused one-hot-matmul gather?

Context: index_points_matmul (ops/geometry.py:115-134) is exact and MXU-
resident, but the gather-as-matmul output is only C=8 lanes wide -> ~8/128
MXU utilisation; at Uni3D bench shapes (B=30, rows=512*64, N=1024, C=6+2)
it measures ~2.5 ms of the 142 ms step.  A true VMEM gather is ~1 MB/batch
of traffic => ~0.1 ms if Mosaic's dynamic-gather path lowers.

Variants:
  A  jnp.take(tab, idx, axis=0)  inside the kernel (sublane gather)
  B  out^T via jnp.take(tab_T, idx, axis=1)  (lane gather)
  C  in-kernel one-hot matmul (tile R), VMEM-resident indicator
  X0 XLA one-hot einsum (current default, index_points_matmul)
  X1 XLA take_along_axis (index_points)

Run on an otherwise idle host: python .scratch/probe_gather_pallas.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, K, N, C = 30, 512, 64, 1024, 8
R = S * K


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    # fetch-synced: pull a scalar to defeat async dispatch on the tunnel
    float(jnp.sum(out if isinstance(out, jax.Array) else out[0])[None][0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out if isinstance(out, jax.Array) else out[0])[None][0])
    return (time.perf_counter() - t0) / reps * 1e3


# --- variant A: sublane gather ---------------------------------------------
def _kern_a(idx_ref, tab_ref, out_ref):
    out_ref[...] = jnp.take(tab_ref[...], idx_ref[...], axis=0)


@jax.jit
def gather_a(idx, tab):
    return pl.pallas_call(
        _kern_a,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, C), jnp.float32),
    )(idx, tab)


def _kern_a2(idx_ref, tab_ref, out_ref):
    # 2D refs (drop the leading block axis via reshape-free indexing)
    out_ref[0] = jnp.take(tab_ref[0], idx_ref[0], axis=0)


@jax.jit
def gather_a2(idx, tab):
    return pl.pallas_call(
        _kern_a2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, C), jnp.float32),
    )(idx, tab)


# --- variant B: lane gather (transposed) ------------------------------------
def _kern_b(idx_ref, tabt_ref, outt_ref):
    # tabt (C, N), idx (R,) -> out^T (C, R)
    outt_ref[0] = jnp.take(tabt_ref[0], idx_ref[0], axis=1)


@jax.jit
def gather_b(idx, tabt):
    return pl.pallas_call(
        _kern_b,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, R), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, R), jnp.float32),
    )(idx, tabt)


# --- variant C: in-kernel one-hot matmul, tiled ------------------------------
RT = 512  # rows per tile


def _kern_c(idx_ref, tab_ref, out_ref):
    t = pl.program_id(1)
    idx = idx_ref[0, pl.ds(t * RT, RT)]                      # (RT,)
    onehot = (idx[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (RT, N), 1)
              ).astype(jnp.float32)
    out_ref[0, pl.ds(t * RT, RT), :] = jnp.dot(
        onehot, tab_ref[0], preferred_element_type=jnp.float32)


@jax.jit
def gather_c(idx, tab):
    return pl.pallas_call(
        _kern_c,
        grid=(B, R // RT),
        in_specs=[
            pl.BlockSpec((1, R), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, C), jnp.float32),
    )(idx, tab)


# --- XLA baselines -----------------------------------------------------------
@jax.jit
def xla_onehot(idx, tab):
    onehot = jax.nn.one_hot(idx, N, dtype=jnp.float32)
    return jnp.einsum("brn,bnc->brc", onehot, tab,
                      precision=jax.lax.Precision.HIGHEST)


@jax.jit
def xla_take(idx, tab):
    return jnp.take_along_axis(tab, idx[..., None], axis=1)


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=(B, R)), jnp.int32)
    tab = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    tabt = jnp.swapaxes(tab, 1, 2)

    ref = np.asarray(xla_take(idx, tab))

    for name, fn, args, tf in [
        ("A  pallas take axis0", gather_a, (idx, tab), None),
        ("A2 pallas take axis0 2d", gather_a2, (idx, tab), None),
        ("B  pallas take axis1 (lane)", gather_b, (idx, tabt),
         lambda o: np.swapaxes(np.asarray(o), 1, 2)),
        ("C  pallas onehot tiled", gather_c, (idx, tab), None),
        ("X0 xla onehot einsum", xla_onehot, (idx, tab), None),
        ("X1 xla take_along_axis", xla_take, (idx, tab), None),
    ]:
        try:
            out = fn(*args)
            o = tf(out) if tf else np.asarray(out)
            ok = np.array_equal(o, ref)
            ms = timeit(fn, *args)
            print(f"{name:30s} ok={ok}  {ms:7.3f} ms")
        except Exception as e:
            msg = str(e).split(chr(10))[0][:140]
            print(f"{name:30s} FAILED: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
