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
    cur_var = mode_dota.regularized_var(state, epsilon)
    log_lik = mode_dota.log_likelihood(class_embeddings, state.mu, cur_var,
                                       precision=precision)
    log_pi = jnp.log(state.pi + 1e-10)[None]                      # (1, K, M)
    lm = jax.scipy.special.logsumexp(log_pi + log_lik, axis=2)    # (K, K)
    lm_normalized = lm / jnp.max(lm)
    e = jnp.exp(jnp.exp(lm_normalized))
    diag = jnp.diagonal(e)
    return -(diag / e.sum(axis=1)).mean() - (diag / e.sum(axis=0)).mean()


def optimize_residuals(res_state: ResidualState,
                       text_features_initial: jax.Array,
                       mixture: mode_dota.ModeDotaState,
                       optimizer: optax.GradientTransformation,
                       epsilon: float, num_steps: int = 10,
                       precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
                       ) -> ResidualState:
    """Run `num_steps` Adam updates of the residuals (Uni_Adapter.py:449-476).

    Each step: renormalise (initial + residuals) per class row, evaluate the
    alignment loss against the *current* (frozen) mixture, step Adam.
    """
    def loss_fn(residuals):
        text = text_features_initial + residuals
        text = text / (jnp.linalg.norm(text, axis=1, keepdims=True) + 1e-12)
        return alignment_loss(text, mixture, epsilon, precision=precision)

    grad_fn = jax.grad(loss_fn)

    def body(_, rs: ResidualState) -> ResidualState:
        grads = grad_fn(rs.residuals)
        updates, opt_state = optimizer.update(grads, rs.opt_state, rs.residuals)
        return ResidualState(optax.apply_updates(rs.residuals, updates),
                             opt_state)

    return jax.lax.fori_loop(0, num_steps, body, res_state)


def adapted_text_weights(res_state: ResidualState,
                         text_features_initial: jax.Array) -> jax.Array:
    """clip_weights = normalize(initial + residuals)ᵀ, (D, K)
    (Uni_Adapter.py:388-396; residuals detached for the forward pass)."""
    text = text_features_initial + jax.lax.stop_gradient(res_state.residuals)
    text = text / (jnp.linalg.norm(text, axis=1, keepdims=True) + 1e-12)
    return text.astype(jnp.float32).T
