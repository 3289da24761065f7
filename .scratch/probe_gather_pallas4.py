"""Probe round 4: minimal sublane-direction dynamic gather —
out[i, j] = op[idx[i, j], j] via take_along_axis(axis=0), all shapes equal."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, L = 1024, 128


def _kern(idx_ref, op_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(op_ref[...], idx_ref[...], axis=0)


@jax.jit
def gather_sub(idx, op):
    return pl.pallas_call(
        _kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
    )(idx, op)


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, M, size=(M, L)), jnp.int32)
    op = jnp.asarray(rng.standard_normal((M, L)), jnp.float32)
    ref = np.take_along_axis(np.asarray(op), np.asarray(idx), axis=0)
    try:
        out = gather_sub(idx, op)
        ok = np.array_equal(np.asarray(out), ref)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(100):
            out = gather_sub(idx, op)
        float(jnp.sum(out)[None][0])
        ms = (time.perf_counter() - t0) / 100 * 1e3
        print(f"sublane take_along_axis ok={ok}  {ms:.4f} ms per (1024,128)")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:200]
        print(f"FAILED: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
