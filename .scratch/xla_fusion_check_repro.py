"""Minimal repro: XLA TPU fusion-pass CHECK on a tiny point-transformer
under an outer vmap.

Toolchain: jax/jaxlib 0.9.0, v5e via the axon tunnel (first seen
2026-08-16, commit 0e95493; still-present check re-dated in BASELINE.md).

Symptom: compiling a TINY Uni3D configuration (num_group=32, group_size=16
MiniPointNet) vmapped over a leading "client" axis SIGABRTs in the remote
compile helper with

    fusion_util.cc ... TransformWindow: Loop will not make progress

regardless of dtype/precision settings.  The full-size model (num_group=512,
group_size=64) compiles fine, as does the tiny model WITHOUT the outer vmap
— hence examples/serving_demo.py forces the full-size model on TPU backends
and keeps the tiny configuration for CPU runs.

Run on the TPU host (expect SIGABRT while the bug persists; a clean "ok"
means the toolchain fixed it and the demo workaround can be dropped):

    PYTHONPATH=/root/repo:/root/.axon_site timeout 600 \
        python .scratch/xla_fusion_check_repro.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from uni_adapter_tpu.models.uni3d import Uni3D

model = Uni3D(trans_dim=64, embed_dim=48, num_group=32, group_size=16,
              encoder_dim=32, depth=2, num_heads=4, dtype=jnp.float32)
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 1024, 6), jnp.float32))

fwd = jax.jit(jax.vmap(lambda pc: model.apply(params, pc)))
pcs = jnp.asarray(np.random.default_rng(0).standard_normal((3, 1, 1024, 6)),
                  jnp.float32)
out = np.asarray(fwd(pcs))
print("ok", out.shape, "— toolchain bug no longer reproduces", flush=True)
