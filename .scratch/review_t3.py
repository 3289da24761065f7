import numpy as np, jax, jax.numpy as jnp
from uni_adapter_tpu.utils.math import conjugate_gradient, online_value_refinement_new, online_value_refinement_old

# reference torch-style CG in numpy (do-while semantics)
def ref_cg(A, b, tol=1e-5, max_iter=100):
    x = np.zeros_like(b); r = b - A @ x; p = r.copy(); rz_old = (r*r).sum(0)
    for _ in range(max_iter):
        Ap = A @ p
        alpha = (rz_old / ((p*Ap).sum(0) + 1e-8))[None]
        x = x + alpha * p; r = r - alpha * Ap
        rz_new = (r*r).sum(0)
        if np.all(rz_new < tol): break
        beta = (rz_new / (rz_old + 1e-8))[None]
        p = r + beta * p; rz_old = rz_new
    return x

rng = np.random.default_rng(0)
N, K = 40, 16
M = rng.standard_normal((N, N)).astype(np.float32)
A = (M @ M.T + N * np.eye(N)).astype(np.float32)
b = rng.standard_normal((N, K)).astype(np.float32)
print("normal case diff:", np.abs(ref_cg(A, b) - np.asarray(conjugate_gradient(jnp.asarray(A), jnp.asarray(b)))).max())

# degenerate: b tiny so rz0 < tol everywhere
b2 = (b * 1e-4).astype(np.float32)
r = ref_cg(A, b2); g = np.asarray(conjugate_gradient(jnp.asarray(A), jnp.asarray(b2)))
print("tiny-b ref norm:", np.abs(r).max(), "ours norm:", np.abs(g).max(), "diff:", np.abs(r-g).max())

# refinement with degenerate small probs and 1 valid row, large K
K2 = 1156
keys = rng.standard_normal((N, 64)).astype(np.float32)
probs = np.full((N, K2), 1.0 / K2, np.float32)
valid = np.zeros((N,), bool); valid[0] = True
out = np.asarray(online_value_refinement_new(jnp.asarray(keys), jnp.asarray(probs), jnp.asarray(valid)))
print("refined row0 sum:", out[0].sum(), "max:", out[0].max())
