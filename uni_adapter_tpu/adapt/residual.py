"""Text-residual learning: the one gradient-based piece of the pipeline.

Rebuild of the reference's residual optimisation
(Uni_Adapter.py:191-270 `compute_text_alignment_loss` + the inline 10-step
Adam loop at :444-486).  A trainable (K, D) residual tensor is added to the
frozen initial text features; each stream step (after the first) runs
`residual_steps` Adam updates of an alignment loss over the (K, K)
class-embedding log-likelihood matrix under the current mixture state.

TPU shape: the inner loop is `lax.fori_loop` over `jax.grad` +
`optax.adam` updates of a pure function of (residuals, mixture state) —
exactly the structure SURVEY.md §7 prescribes.  Adam moments persist across
stream steps (the reference builds its optimiser once per corruption run),
so the optimiser state rides in the engine carry.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from uni_adapter_tpu.adapt import mode_dota


class ResidualState(NamedTuple):
    residuals: jax.Array   # (K, D)
    opt_state: optax.OptState


def make_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    """Adam, reference defaults (Uni_Adapter.py:350-352; lr start == end)."""
    return optax.adam(lr)


def init(text_features_initial: jax.Array,
         optimizer: optax.GradientTransformation) -> ResidualState:
    residuals = jnp.zeros_like(text_features_initial, dtype=jnp.float32)
    return ResidualState(residuals, optimizer.init(residuals))


class FrozenMixtureTerms(NamedTuple):
    """Everything the alignment loss needs from the (frozen) mixture.

    The mixture is constant across the 10-step Adam loop
    (Uni_Adapter.py:449-476 re-reads the same fitted model every iteration),
    so 1/var, μ/var, Σμ²/var, Σlog var, and log π are loop-invariant.
    Precomputing them (a) removes ~5 elementwise K·M·D passes plus the
    transcendentals from every step and (b) folds the two likelihood
    matmuls into ONE [x², x] @ [1/v; −2μ/v]ᵀ contraction — the x-dependent
    work per step drops to a single (K, 2D) @ (2D, KM) matmul and its VJP.
    """
    proj_t: jax.Array    # (2D, K·M): [1/var ‖ −2·μ/var]ᵀ — stored
                         # pre-transposed so the loop body contains no
                         # layout change of the 568 MB (LVIS-scale) operand
    base: jax.Array      # (K, M): log π − ½·(Σ log var + Σ μ²/var)


def frozen_mixture_terms(state: mode_dota.ModeDotaState,
                         epsilon: float) -> FrozenMixtureTerms:
    var = mode_dota.regularized_var(state, epsilon)       # (K, M, D)
    K, M, D = var.shape
    inv_v = 1.0 / var
    mu_over_v = state.mu / var
    quad_const = jnp.sum(state.mu * state.mu / var, axis=-1)      # (K, M)
    log_det = jnp.sum(jnp.log(var), axis=-1)                      # (K, M)
    proj_t = jnp.concatenate([inv_v.reshape(K * M, D),
                              -2.0 * mu_over_v.reshape(K * M, D)], axis=1).T
    base = jnp.log(state.pi + 1e-10) - 0.5 * (log_det + quad_const)
    return FrozenMixtureTerms(proj_t, base)


def _alignment_loss_from_terms(class_embeddings: jax.Array,
                               terms: FrozenMixtureTerms,
                               precision: jax.lax.Precision) -> jax.Array:
    K, M = terms.base.shape
    x = class_embeddings.astype(jnp.float32)
    X = jnp.concatenate([x * x, x], axis=1)               # (B, 2D)
    maha_x = jnp.matmul(X, terms.proj_t, precision=precision)  # (B, KM)
    log_joint = terms.base[None] - 0.5 * maha_x.reshape(-1, K, M)
    lm = jax.scipy.special.logsumexp(log_joint, axis=2)   # (B, K)
    lm_normalized = lm / jnp.max(lm)
    e = jnp.exp(jnp.exp(lm_normalized))
    diag = jnp.diagonal(e)
    return -(diag / e.sum(axis=1)).mean() - (diag / e.sum(axis=0)).mean()


def alignment_loss(class_embeddings: jax.Array, state: mode_dota.ModeDotaState,
                   epsilon: float,
                   precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
                   ) -> jax.Array:
    """Alignment loss over the (K, K) likelihood matrix
    (Uni_Adapter.py:191-270).

    L[i, k] = log P(e_i | class k) under the mixture; the loss sharpens the
    diagonal of exp(exp(L / max(L))):
      loss = −mean(diag/rowsum) − mean(diag/colsum).
    """
    return _alignment_loss_from_terms(
        class_embeddings, frozen_mixture_terms(state, epsilon), precision)


def optimize_residuals(res_state: ResidualState,
                       text_features_initial: jax.Array,
                       mixture: mode_dota.ModeDotaState,
                       optimizer: optax.GradientTransformation,
                       epsilon: float, num_steps: int = 10,
                       precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
                       unroll: bool = False) -> ResidualState:
    """Run `num_steps` Adam updates of the residuals (Uni_Adapter.py:449-476).

    Each step: renormalise (initial + residuals) per class row, evaluate the
    alignment loss against the *current* (frozen) mixture, step Adam.

    The mixture-dependent terms are computed ONCE here, outside the
    fori_loop (see FrozenMixtureTerms) — at LVIS scale (K=1156) the 10-step
    loop's likelihood matmuls dominate the whole pipeline step, so only the
    genuinely x-dependent single fused matmul (+ its VJP) stays inside.
    """
    terms = frozen_mixture_terms(mixture, epsilon)

    def loss_fn(residuals):
        text = text_features_initial + residuals
        text = text / (jnp.linalg.norm(text, axis=1, keepdims=True) + 1e-12)
        return _alignment_loss_from_terms(text, terms, precision)

    grad_fn = jax.grad(loss_fn)

    def body(_, rs: ResidualState) -> ResidualState:
        grads = grad_fn(rs.residuals)
        updates, opt_state = optimizer.update(grads, rs.opt_state, rs.residuals)
        return ResidualState(optax.apply_updates(rs.residuals, updates),
                             opt_state)

    if unroll:
        # same math, flat program (XLA fusion order may differ at ulp
        # level): lets XLA overlap one step's
        # elementwise tail (lse/loss/Adam passes) with the next step's
        # likelihood matmul — the fori_loop's serial body can't (the
        # non-matmul passes are the dominant residual cost at K=1156,
        # BASELINE.md round-3 decomposition); costs ~num_steps× body
        # compile time
        for i in range(num_steps):
            res_state = body(i, res_state)
        return res_state
    return jax.lax.fori_loop(0, num_steps, body, res_state)


def adapted_text_weights(res_state: ResidualState,
                         text_features_initial: jax.Array) -> jax.Array:
    """clip_weights = normalize(initial + residuals)ᵀ, (D, K)
    (Uni_Adapter.py:388-396; residuals detached for the forward pass)."""
    text = text_features_initial + jax.lax.stop_gradient(res_state.residuals)
    text = text / (jnp.linalg.norm(text, axis=1, keepdims=True) + 1e-12)
    return text.astype(jnp.float32).T
