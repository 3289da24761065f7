"""Diagnose the k=64 kNN hardware twin mismatch: how many entries differ,
and are they exact-distance ties at the k-th boundary?"""
import numpy as np
import jax, jax.numpy as jnp
from uni_adapter_tpu.ops import geometry as G
from uni_adapter_tpu.ops.knn_pallas import knn_pallas

B, S, N, k = 30, 512, 1024, 64
rng = np.random.default_rng(B + k)
xyz = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
q = jnp.asarray(np.random.default_rng(B + k + 1).standard_normal(
    (B, S, 3)).astype(np.float32))

want = np.sort(np.asarray(G.knn_point(k, xyz, q)), axis=-1)
got = np.sort(np.asarray(knn_pallas(k, xyz, q)), axis=-1)
rows_diff = (want != got).any(-1)
print(f"mismatching rows: {rows_diff.sum()} / {B*S}", flush=True)

xyz_np = np.asarray(xyz); q_np = np.asarray(q)
bad = np.argwhere(rows_diff)[:8]
for b, s in bad:
    w, g = set(want[b, s]), set(got[b, s])
    only_w, only_g = sorted(w - g), sorted(g - w)
    d = ((xyz_np[b] - q_np[b, s]) ** 2).sum(-1)
    d64 = ((xyz_np[b].astype(np.float64)
            - q_np[b, s].astype(np.float64)) ** 2).sum(-1)
    kth = np.sort(d)[k - 1]
    print(f"row ({b},{s}): only_xla={only_w} only_pallas={only_g}")
    for i in only_w + only_g:
        print(f"   idx {i}: d32={d[i]:.9e} d64={d64[i]:.17e} "
              f"(k-th d32={kth:.9e})")
