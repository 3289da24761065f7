import numpy as np, jax, jax.numpy as jnp
from uni_adapter_tpu.ops.geometry import knn_point, query_ball_point, farthest_point_sample, group_points
from uni_adapter_tpu.ops.knn_pallas import knn_pallas, knn_gather_pallas
from uni_adapter_tpu.ops.ballquery_pallas import query_ball_pallas
from uni_adapter_tpu.ops.fps_pallas import fps_pallas, fps_pallas_batched

rng = np.random.default_rng(0)
# odd sizes: N not mult of 128, S not mult of 8
B, N, S, k = 3, 1000, 130, 7
xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
q = jnp.asarray(rng.standard_normal((B, S, 3)), jnp.float32)

ref = np.asarray(knn_point(k, xyz, q))
got = np.asarray(knn_pallas(k, xyz, q))
print("knn match:", (ref == got).mean())

vals = jnp.concatenate([xyz, jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)], -1)
idx2, gath = knn_gather_pallas(k, xyz, q, vals)
print("knn_gather idx match:", (np.asarray(idx2) == ref).mean())
exact = np.take_along_axis(np.asarray(vals), np.asarray(ref)[..., None].reshape(B, -1, 1), axis=1).reshape(B, S, k, 6)
print("knn_gather vals match:", np.allclose(np.asarray(gath), exact))

# ball query incl. empty balls (far query)
qf = q.at[:, 0].set(100.0)
r, ns = 0.9, 9
ref_b = np.asarray(query_ball_point(r, ns, xyz, qf))
got_b = np.asarray(query_ball_pallas(r, ns, xyz, qf))
print("ballq match:", (ref_b == got_b).mean())

# fps
reff = np.asarray(farthest_point_sample(xyz, 37))
gotf = np.asarray(fps_pallas(xyz, 37))
gotfb = np.asarray(fps_pallas_batched(xyz, 37))
print("fps grid match:", (reff == gotf).mean(), "fps batched match:", (reff == gotfb).mean())
