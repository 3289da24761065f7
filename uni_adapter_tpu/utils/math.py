"""Math utilities: entropy, conjugate gradient, graph-Laplacian refinement.

TPU-first rebuild of the reference's utils/math_utils.py:1-110.  The CG loop
becomes a fixed-trip-count `lax.fori_loop` (static shapes, fully fusable under
jit); the graph refinement supports a validity mask so it operates on the
fixed-capacity cache arrays (SURVEY.md §7 hard part 4) — masked slots are
decoupled from the graph and solve trivially.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def softmax_entropy(x: jax.Array, enable_softmax: bool = True,
                    temperature: float = 1.0) -> jax.Array:
    """Shannon entropy of softmax(x) rows (reference: math_utils.py:8-13).

    Args:
      x: (B, K) logits, or probabilities when enable_softmax=False.
    Returns:
      (B,) entropies in nats.
    """
    probs = jax.nn.softmax(x / temperature, axis=1) if enable_softmax else x
    return -(probs * jnp.log(probs + 1e-10)).sum(axis=1)


def normalized_entropy(ent: jax.Array, num_classes: int) -> jax.Array:
    """Entropy normalised by log2(K) (reference: math_utils.py:15-17 /
    Uni_Adapter.py:28-30 `get_entropy`).  Note the reference normalises a
    natural-log entropy by a base-2 log — reproduced as-is for parity."""
    return (ent / jnp.log2(float(num_classes))).astype(jnp.float32)


def conjugate_gradient(A, b: jax.Array, max_iter: int = 100,
                       tol: float = 1e-5) -> jax.Array:
    """Solve A @ x = b by CG, column-wise step sizes.

    Matches the reference solver (math_utils.py:21-45): per-column alpha/beta
    (b may be (N, K)), no preconditioner.  The torch version iterates EVERY
    column until ALL residuals drop below tol (`torch.all(rz_new < tol)`
    then break) — converged columns keep refining until the last one lands.
    A lax.while_loop reproduces that break exactly (a per-column freeze
    would stop each column ~sqrt(tol) early and diverge from the reference
    by ~3e-3 — caught by tests/test_reference_import_oracle.py driving the
    reference's own CG), and unlike a gated fixed-trip fori_loop it stops
    PAYING for the matvec once converged — CG on the cache graphs typically
    lands in far fewer than max_iter trips, and each dead trip is a full
    (N, N) @ (N, K) matmul.

    Args:
      A: (N, N) matrix, or a callable p -> A @ p (row-sharded operators:
        parallel/ep.py gathers a per-device matvec so the CG state stays
        replicated while the N² work divides over the mesh).
    """
    matvec = A if callable(A) else \
        (lambda p: jnp.matmul(A, p, precision=_HIGH))
    x = jnp.zeros_like(b)
    r = b - matvec(x)
    p = r
    rz = jnp.sum(r * r, axis=0)

    def cond(carry):
        i, x, r, p, rz = carry
        # do-while: the torch loop ALWAYS runs its first iteration — the
        # break tests rz_new after the update, never the initial residual
        # (math_utils.py:30-38).  Checking rz before iteration 0 would
        # return x = 0 whenever b is tiny (early near-uniform caches at
        # large K), where the reference returns x ∝ b, which row-normalises
        # to proper probabilities.
        return (i < max_iter) & ((i == 0) | ~jnp.all(rz < tol))

    def body(carry):
        i, x, r, p, rz_old = carry
        Ap = matvec(p)
        alpha = (rz_old / (jnp.sum(p * Ap, axis=0) + 1e-8))[None, :]
        x = x + alpha * p
        r = r - alpha * Ap
        rz_new = jnp.sum(r * r, axis=0)
        beta = (rz_new / (rz_old + 1e-8))[None, :]
        p = r + beta * p
        return i + 1, x, r, p, rz_new

    _, x, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), x, r, p, rz))
    return x


def _masked_laplacian(keys: jax.Array, valid: jax.Array, threshold: float,
                      lambda_reg: float) -> jax.Array:
    """Regularised normalised graph Laplacian over valid cache entries.

    Reference (math_utils.py:48-61): cosine adjacency thresholded, normalised
    Laplacian L = I - D^{-1/2} W D^{-1/2}, regularised L + 2λI.  Invalid rows
    and columns are zeroed out of W; their diagonal stays (1 + 2λ), so the
    linear system is block-diagonal with trivial masked blocks.
    """
    n = keys.shape[0]
    normed = keys / (jnp.linalg.norm(keys, axis=1, keepdims=True) + 1e-12)
    W = jnp.matmul(normed, normed.T, precision=_HIGH)
    W = jnp.where(W < threshold, 0.0, W)
    vmask = valid.astype(W.dtype)
    W = W * vmask[:, None] * vmask[None, :]
    d_inv_sqrt = 1.0 / (jnp.sqrt(W.sum(axis=1)) + 1e-8)
    I = jnp.eye(n, dtype=W.dtype)
    L_norm = I - d_inv_sqrt[:, None] * W * d_inv_sqrt[None, :]
    return (L_norm + 2.0 * lambda_reg * I).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("max_iter",))
def online_value_refinement_new(cache_keys: jax.Array, all_probs: jax.Array,
                                valid: jax.Array, threshold: float = 0.5,
                                lambda_reg: float = 0.13,
                                max_iter: int = 100) -> jax.Array:
    """Graph-Laplacian label smoothing solved by conjugate gradient.

    Reference: math_utils.py:48-98 ("new" path — CG, no explicit inverse).

    Args:
      cache_keys: (N, D) prototype features (masked slots arbitrary).
      all_probs: (N, K) per-prototype class probabilities.
      valid: (N,) bool validity mask for the fixed-capacity cache layout.
    Returns:
      (N, K) refined, row-normalised probabilities (invalid rows zeroed).
    """
    L_reg = _masked_laplacian(cache_keys, valid, threshold, lambda_reg)
    probs = all_probs * valid[:, None].astype(all_probs.dtype)
    sol = conjugate_gradient(L_reg, 2.0 * lambda_reg * probs, max_iter=max_iter)
    sol = sol / (sol.sum(axis=1, keepdims=True) + 1e-12)
    return sol * valid[:, None].astype(sol.dtype)


def online_value_refinement_old(cache_keys: jax.Array, all_probs: jax.Array,
                                valid: jax.Array, threshold: float = 0.5,
                                lambda_reg: float = 0.13) -> jax.Array:
    """Explicit-inverse variant (reference: math_utils.py:100-110)."""
    L_reg = _masked_laplacian(cache_keys, valid, threshold, lambda_reg)
    probs = all_probs * valid[:, None].astype(all_probs.dtype)
    sol = jnp.linalg.solve(L_reg, 2.0 * lambda_reg * probs)
    sol = sol / (sol.sum(axis=1, keepdims=True) + 1e-12)
    return sol * valid[:, None].astype(sol.dtype)
