import jax, jax.numpy as jnp
import numpy as np
from uni_adapter_tpu.config import Config, ModelConfig, DotaConfig
from uni_adapter_tpu.models.uni3d import create_uni3d
from uni_adapter_tpu.serve import TTAServer
from uni_adapter_tpu.anchors import load_precomputed

mc = ModelConfig()
model = create_uni3d(mc)
text = load_precomputed("large", "modelnet")
cfg = Config(model=mc, dota=DotaConfig(use_mode_dota=True, mode_M=4,
                                       res_learning=False))
rng = np.random.default_rng(0)
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 1024, 6), jnp.float32))
server = TTAServer(cfg, model, params, text, sizes=(1, 2, 4))
for cid in ["alpha", "beta", "gamma"]:
    server.register(cid)
reqs = [(c, rng.standard_normal((1, 1024, 3)).astype(np.float32), None)
        for c in ["alpha", "beta", "gamma"]]
out = server.submit(reqs)
print("submit ok:", {k: v.shape for k, v in out.items()}, flush=True)
