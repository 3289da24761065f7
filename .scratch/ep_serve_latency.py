"""Single-chip serving latency for dist_mode='ep' at K=1156 (VERDICT r4
item 6): the EP server on a 1-device classes mesh, Uni3D-L at full dims,
B=1 submits — per-submit wall latency after warmup, vs the replicated
server on the same chip."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import create_uni3d
from uni_adapter_tpu.serve import TTAServer
from uni_adapter_tpu.utils.profiling import enable_compile_cache

enable_compile_cache("/root/repo")

K, N = 1156, 1024


def run(dist_mode):
    cfg = Config(model=ModelConfig(),
                 dota=DotaConfig(use_mode_dota=True, mode_M=4,
                                 res_learning=True),
                 cache=CacheConfig(shot_capacity=8))
    model = create_uni3d(cfg.model)
    rng = np.random.default_rng(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, N, 6), jnp.float32))
    t = rng.standard_normal((K, 1024)).astype(np.float32)
    text = t / np.linalg.norm(t, axis=1, keepdims=True)

    kw = {}
    if dist_mode == "ep":
        from uni_adapter_tpu.parallel import ep
        kw = dict(dist_mode="ep", mesh=ep.make_classes_mesh(1))
    server = TTAServer(cfg, model, params, text, sizes=(1,), seed=42, **kw)
    server.register("a")
    pc = rng.standard_normal((1, N, 3)).astype(np.float32)

    # warm (compile)
    t0 = time.perf_counter()
    server.submit([("a", pc, None)])
    print(f"{dist_mode}: first submit (incl. compile) "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = server.submit([("a", pc, None)])
        np.asarray(out["a"]).ravel()[:1]
        lats.append((time.perf_counter() - t0) * 1e3)
    lats = np.array(lats)
    print(f"{dist_mode}: K={K} B=1 submit latency p50={np.percentile(lats,50):.2f} "
          f"ms p90={np.percentile(lats,90):.2f} ms min={lats.min():.2f} ms",
          flush=True)


if __name__ == "__main__":
    for mode in sys.argv[1:] or ["replicated", "ep"]:
        run(mode)
