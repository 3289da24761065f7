"""MODE-DOTA: streaming per-class diagonal Gaussian mixture (the paper's method).

Pure-functional rebuild of the reference's `DOTA_mix` (dota_mixture.py:7-274):
M diagonal-Gaussian modes per class, streaming EM over the test stream, and a
`predict` that returns logsumexp class log-likelihoods on the CLIP-logit
scale.  State is a pytree; `fit` is a pure `(state, x, gamma) -> state` step
so the whole adaptation trajectory rides inside one `lax.scan`.

Sufficient statistics of the EM M-step (Σγ, Σγx, Σγx², class counts) are
additive ⇒ exact cross-device merging via psum (SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST
_VAR_FLOOR = 1e-8


class ModeDotaState(NamedTuple):
    mu: jax.Array            # (K, M, D) mode means
    var: jax.Array           # (K, M, D) diagonal variances
    pi: jax.Array            # (K, M) mixture weights
    c: jax.Array             # (K, M) soft counts
    class_counts: jax.Array  # (K,)
    t: jax.Array             # () int32 samples seen


def resolve_sigma_init(sigma_cfg: float, input_dim: int) -> float:
    """Auto-correct sigma for L2-normalised embeddings.

    Reference (dota_mixture.py:46-55): per-dimension variance of unit-norm
    D-dim embeddings is ≈ 1/D; a config sigma ≥ 0.1 is assumed to be a
    full-covariance-scale mistake and replaced by 1/D.
    """
    return 1.0 / input_dim if sigma_cfg >= 0.1 else sigma_cfg


def init(epsilon: float, sigma: float, input_dim: int, num_classes: int,
         clip_weights: jax.Array, num_modes: int = 4) -> ModeDotaState:
    """Initialise the mixture (dota_mixture.py:58-113).

    Args:
      clip_weights: (D, K) L2-normalised text anchors.

    Means = class center + tiny per-mode offset along axis (m % D) of size
    delta·(m+1) with delta = 0.1·sigma_init; variances = sigma_init scaled
    1 + 0.05·m per mode (symmetry breaking); pi uniform; soft counts 1/M.
    """
    del epsilon
    K, M, D = num_classes, num_modes, input_dim
    sigma_init = resolve_sigma_init(sigma, D)
    centers = clip_weights.T.astype(jnp.float32)                 # (K, D)

    delta = sigma_init * 0.1
    mode_ids = jnp.arange(M)
    offsets = jnp.zeros((M, D), jnp.float32).at[
        mode_ids, mode_ids % D].set(delta * (mode_ids + 1.0))
    mu = centers[:, None, :] + offsets[None, :, :]               # (K, M, D)

    scale_m = 1.0 + 0.05 * jnp.arange(M, dtype=jnp.float32)      # (M,)
    var = jnp.clip(
        jnp.full((K, M, D), sigma_init, jnp.float32) * scale_m[None, :, None],
        min=_VAR_FLOOR)

    return ModeDotaState(
        mu=mu, var=var,
        pi=jnp.full((K, M), 1.0 / M, jnp.float32),
        c=jnp.full((K, M), 1.0 / M, jnp.float32),
        class_counts=jnp.zeros((K,), jnp.float32),
        t=jnp.zeros((), jnp.int32),
    )


def regularized_var(state: ModeDotaState, epsilon: float) -> jax.Array:
    """var + ε, floored (dota_mixture.py:119-121)."""
    return jnp.clip(state.var + epsilon, min=_VAR_FLOOR)


def log_likelihood(x: jax.Array, mu: jax.Array, var: jax.Array,
                   precision: jax.lax.Precision = _HIGH) -> jax.Array:
    """Diagonal Gaussian log-likelihood, constant dropped.

    Reference (dota_mixture.py:123-156): -0.5·[Σ_d log var_d + Σ_d (x-μ)²/var].
    The D·log(2π) constant cancels in every downstream softmax/logsumexp.

    MXU formulation: rather than materialising the (B, K, M, D) difference
    tensor, expand the Mahalanobis quadratic —
        Σ_d (x-μ)²/v = Σ_d x²·(1/v) − 2·Σ_d x·(μ/v) + Σ_d μ²/v
    so the B-dependent work is two (B, D) @ (D, K·M) matmuls.

    Args:
      x: (B, D); mu, var: (K, M, D).
    Returns:
      (B, K, M).
    """
    K, M, D = mu.shape
    x = x.astype(jnp.float32)
    inv_v = (1.0 / var).reshape(K * M, D)                        # (KM, D)
    mu_over_v = (mu / var).reshape(K * M, D)
    quad_const = jnp.sum(mu * mu / var, axis=-1)                 # (K, M)
    log_det = jnp.sum(jnp.log(var), axis=-1)                     # (K, M)

    x_sq_term = jnp.matmul(x * x, inv_v.T, precision=precision)  # (B, KM)
    cross_term = jnp.matmul(x, mu_over_v.T, precision=precision)  # (B, KM)
    maha = (x_sq_term - 2.0 * cross_term).reshape(-1, K, M) + quad_const
    return -0.5 * (log_det[None] + maha)


def fit(state: ModeDotaState, x: jax.Array, gamma_class: jax.Array,
        epsilon: float, streaming_update_sigma: bool = True,
        axis_name: Optional[str] = None) -> ModeDotaState:
    """One streaming EM step (dota_mixture.py:162-234).

    Args:
      x: (B, D) L2-normalised features.
      gamma_class: (B, K) zero-shot class probabilities.
      axis_name: if set (inside shard_map/pmap), the EM sufficient statistics
        (Σγ, Σγx, Σγx², class counts, B) are psum-merged across the device
        axis before the M-step — the per-device states stay bitwise
        replicated and the update equals a single-device fit on the
        concatenated global batch (SURVEY.md §5.8: the statistics are
        additive, so cross-device merging is exact).
    """
    x = x.astype(jnp.float32)
    gamma_class = gamma_class.astype(jnp.float32)
    B = jnp.asarray(x.shape[0], jnp.int32)

    # ---- E-step ----
    cur_var = regularized_var(state, epsilon)
    log_lik = log_likelihood(x, state.mu, cur_var)               # (B, K, M)
    log_pi = jnp.log(state.pi + 1e-10)[None]                     # (1, K, M)
    log_joint = log_pi + log_lik
    log_r = log_joint - jax.scipy.special.logsumexp(log_joint, axis=2,
                                                    keepdims=True)
    gamma = gamma_class[:, :, None] * jnp.exp(log_r)             # (B, K, M)

    # ---- local sufficient statistics ----
    sum_gamma = gamma.sum(axis=0)                                # (K, M)
    gamma_perm = jnp.transpose(gamma, (1, 2, 0))                 # (K, M, B)
    weighted_x = jnp.matmul(gamma_perm, x, precision=_HIGH)      # (K, M, D)
    weighted_x_sq = jnp.matmul(gamma_perm, x * x, precision=_HIGH)
    class_sum = gamma_class.sum(axis=0)                          # (K,)

    if axis_name is not None:
        sum_gamma, weighted_x, weighted_x_sq, class_sum, B = jax.lax.psum(
            (sum_gamma, weighted_x, weighted_x_sq, class_sum, B), axis_name)

    # ---- M-step (streaming) ----
    c_new = state.c + sum_gamma
    mu_new = (state.c[..., None] * state.mu + weighted_x) / (
        c_new[..., None] + 1e-10)

    var = state.var
    if streaming_update_sigma:
        # Σ_b γ (x−μ_old)² = Σγx² − 2μ_old·Σγx + Σγ·μ_old²
        wsq = (weighted_x_sq - 2.0 * state.mu * weighted_x
               + sum_gamma[..., None] * state.mu ** 2)
        var = jnp.clip(
            (state.c[..., None] * state.var + wsq) / (c_new[..., None] + 1e-10),
            min=_VAR_FLOOR)

    pi_new = c_new / (c_new.sum(axis=1, keepdims=True) + 1e-10)
    return ModeDotaState(
        mu=mu_new, var=var, pi=pi_new, c=c_new,
        class_counts=state.class_counts + class_sum,
        t=state.t + B,
    )


def predict(state: ModeDotaState, x: jax.Array, epsilon: float,
            source_priors: Optional[jax.Array] = None,
            alpha_max: float = 0.5) -> jax.Array:
    """Class scores log P(x|y=k) = logsumexp_m[log π + log lik]
    (dota_mixture.py:236-267), optionally with a blended prior."""
    cur_var = regularized_var(state, epsilon)
    log_lik = log_likelihood(x, state.mu, cur_var)               # (B, K, M)
    log_pi = jnp.log(state.pi + 1e-10)[None]
    scores = jax.scipy.special.logsumexp(log_pi + log_lik, axis=2)
    if source_priors is not None:
        p_est = state.class_counts / (state.class_counts.sum() + 1e-10)
        t = state.t.astype(jnp.float32)
        alpha_t = jnp.minimum(alpha_max, t / (t + 100.0))
        p_k = (1.0 - alpha_t) * source_priors + alpha_t * p_est
        scores = scores + jnp.log(p_k + 1e-10)[None]
    return scores


def update(state: ModeDotaState) -> ModeDotaState:
    """No-op kept for the fit/predict/update protocol
    (dota_mixture.py:269-274)."""
    return state
