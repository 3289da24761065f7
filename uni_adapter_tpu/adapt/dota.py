"""DOTA: streaming per-class Gaussian with shared-covariance LDA logits.

Pure-functional rebuild of the reference's `DOTA` module (dota.py:19-88):
state is an explicit pytree, `fit`/`update`/`predict` are pure
`(state, batch) -> ...` functions, so the whole online loop threads through
`jax.lax.scan` with no host round-trips.

Numerics deviation (documented, SURVEY.md §7 hard part 5): the reference
computes the precision matrix and scores in fp16 (`.half()` at dota.py:31,
69,76); we keep fp32 throughout — TPU MXU bf16/fp32 accumulate makes fp16
state both unnecessary and less accurate.

The sufficient statistics of `fit` (weighted sums and counts) are additive,
so cross-device `psum` of (Σy, Σyᵀx, Δ) gives exact multi-chip streaming
updates (SURVEY.md §5.8) — see `fit(axis_name=...)` below and
parallel/mesh.run_stream_psum.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


class DOTAState(NamedTuple):
    mu: jax.Array             # (K, D) per-class means
    c: jax.Array              # (K,) effective counts
    sigma: jax.Array          # (K, D, D) per-class covariance
    lam: jax.Array            # (D, D) shared precision
    cum_soft_labels: jax.Array  # (1, K) cumulative prior evidence
    prior_step: jax.Array     # () int32


def init(epsilon: float, sigma: float, input_dim: int, num_classes: int,
         clip_weights: jax.Array) -> DOTAState:
    """Initialise DOTA state.

    Mirrors dota.py:20-37: mu from clip_weights.T, counts 1, per-class
    Sigma = sigma·I, shared precision = pinv(mean Sigma) = I/sigma.

    Args:
      clip_weights: (D, K).  NOTE the reference's driver passes a constant
        0.001 matrix here rather than the text features
        (Uni_Adapter.py:329-330) — that choice lives in the engine, not here.
    """
    del epsilon
    mu = clip_weights.T.astype(jnp.float32)                      # (K, D)
    c = jnp.ones((num_classes,), jnp.float32)
    eye = jnp.eye(input_dim, dtype=jnp.float32)
    sig = jnp.broadcast_to(sigma * eye, (num_classes, input_dim, input_dim))
    lam = eye / sigma   # pinv(sigma·I)
    return DOTAState(mu, c, sig, lam,
                     jnp.zeros((1, num_classes), jnp.float32),
                     jnp.zeros((), jnp.int32))


def fit_rows(mu: jax.Array, c: jax.Array, sigma: jax.Array,
             x: jax.Array, y: jax.Array,
             streaming_update_sigma: bool = True,
             axis_name: Optional[str] = None):
    """Row-local core of `fit`: the streaming mean/covariance update on a
    (K_rows, ·) block — K_rows may be the full class set (`fit`) or a
    class-sharded block (parallel/ep.py feeds its device's rows with the
    matching soft-label column slice; zero columns freeze pad rows).

    Returns (new_mu, new_c, new_sigma, sum_w, n_fit)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    sum_w = jnp.sum(y, axis=0)                                   # (K,)
    weighted_x = jnp.matmul(y.T, x, precision=_HIGH)             # (K, D)
    n_fit = jnp.asarray(x.shape[0], jnp.int32)                   # ()

    delta = None
    if streaming_update_sigma:
        # delta[k] = Σ_b y[b,k] (x_b - mu_k)(x_b - mu_k)ᵀ  — one einsum, MXU
        xm = x[:, None, :] - mu[None, :, :]                      # (B, K, D)
        delta = jnp.einsum("bji,bjk->jik", y[:, :, None] * xm, xm,
                           precision=_HIGH)                      # (K, D, D)

    if axis_name is not None:
        sum_w, weighted_x, n_fit = jax.lax.psum(
            (sum_w, weighted_x, n_fit), axis_name)
        if delta is not None:
            delta = jax.lax.psum(delta, axis_name)

    new_mu = (weighted_x + c[:, None] * mu) / (
        sum_w[:, None] + c[:, None])
    new_c = c + sum_w

    new_sigma = sigma
    if streaming_update_sigma:
        denom = (c + sum_w)[:, None, None]
        new_sigma = (c[:, None, None] * sigma + delta) / denom
    return new_mu, new_c, new_sigma, sum_w, n_fit


def fit(state: DOTAState, x: jax.Array, y: jax.Array,
        streaming_update_sigma: bool = True,
        axis_name: Optional[str] = None) -> DOTAState:
    """Soft-label-weighted streaming mean/covariance update (dota.py:40-64).

    Args:
      x: (B, D) features.
      y: (B, K) soft labels (class probabilities).
      axis_name: if set, the sufficient statistics (Σy, Σyᵀx, Δ) are
        psum-merged across the device axis — exact global streaming update
        (SURVEY.md §5.8).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    new_mu, new_c, sigma, sum_w, n_fit = fit_rows(
        state.mu, state.c, state.sigma, x, y,
        streaming_update_sigma=streaming_update_sigma,
        axis_name=axis_name)

    # The reference increments prior_step by 1 per fit CALL and adds y with
    # a (1,K)+(B,K) broadcast (dota.py:45-46) — coherent only at the
    # protocol's B=1.  We sum y over the batch (see predict's note), so the
    # step counter tracks the SAMPLES consumed (psum-merged above): at B=1
    # both accountings are identical, and at B>1 / multi-device the prior
    # stays a true average instead of drowning the uniform pseudo-counts
    # B× (prior mass grows by B per fit, the reference's denominator by 1).
    cum = state.cum_soft_labels + sum_w[None, :]
    return state._replace(mu=new_mu, c=new_c, sigma=sigma,
                          cum_soft_labels=cum,
                          prior_step=state.prior_step + n_fit)


def update(state: DOTAState, epsilon: float) -> DOTAState:
    """Refresh the shared precision Λ = ((1-ε)·Σ̄ + ε·I)⁻¹ (dota.py:67-70)."""
    d = state.mu.shape[1]
    overall = jnp.mean(state.sigma, axis=0)
    reg = (1.0 - epsilon) * overall + epsilon * jnp.eye(d, dtype=jnp.float32)
    return state._replace(lam=jnp.linalg.inv(reg))


def predict(state: DOTAState, x: jax.Array,
            prior_pre_steps: Optional[int] = None) -> jax.Array:
    """LDA-discriminant scores X·W − ½·diag(MᵀW) (dota.py:73-88).

    Args:
      x: (B, D).
      prior_pre_steps: if set, add log of the cumulative-soft-label prior
        blended with `prior_pre_steps` pseudo-counts of a uniform prior.
    Returns:
      (B, K) scores.
    """
    M = state.mu.T                                               # (D, K)
    W = jnp.matmul(state.lam, M, precision=_HIGH)                # (D, K)
    c = 0.5 * jnp.sum(M * W, axis=0)                             # (K,)
    scores = jnp.matmul(x.astype(jnp.float32), W, precision=_HIGH) - c
    if prior_pre_steps is not None:
        # cum_soft_labels here is summed over the batch; the reference's
        # `self.cum_soft_labels + y` (dota.py:45) broadcasts (1,K)+(B,K)
        # into per-batch-row partial sums — a shape quirk that only
        # coincides with a real cumulative prior at the protocol's B=1,
        # where the two are identical (tests/test_reference_import_oracle
        # .test_dota_prior_path_parity)
        k = state.mu.shape[0]
        prior = state.cum_soft_labels + (prior_pre_steps / k)
        prior = prior / (prior_pre_steps + state.prior_step)
        scores = scores + jnp.log(prior + 1e-10)
    return scores
