"""GMM-DOTA: per-class diagonal Gaussian mixture with QR-orthonormal init.

Pure-functional rebuild of the reference's `GMMDOTA`
(gmm_dota_adaptation_model.py:6-256).  Differences from MODE-DOTA
(adapt/mode_dota.py) that define this variant:
  * means initialised as clip center + perturbation_scale · orthonormal rows
    from a QR decomposition of a random (D, M) matrix (:62-76);
  * covariance M-step uses the OLD mean via an explicit weighted
    (x − μ_old)² sum (:171-175) rather than the E[x²] decomposition;
  * `update()` applies shrinkage toward the all-ones diagonal
    (Σ_reg = (1−ε)Σ + ε·1, :196-202) and `predict` always blends an
    empirical class prior with the uniform prior (:205-256).

NOTE: imported nowhere in the reference's driver (SURVEY.md §2.1 — present,
unused); included for component parity and available through the engine via
`use_gmm_dota`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from uni_adapter_tpu.adapt.mode_dota import resolve_sigma_init

_HIGH = jax.lax.Precision.HIGHEST
_FLOOR = 1e-8


class GMMDotaState(NamedTuple):
    mu: jax.Array            # (K, M, D)
    sigma: jax.Array         # (K, M, D) diagonal
    sigma_reg: jax.Array     # (K, M, D) regularised copy used by predict
    pi: jax.Array            # (K, M)
    C: jax.Array             # (K, M) soft counts
    class_counts: jax.Array  # (K,)
    total_samples: jax.Array  # () int32


def class_counts_per_class(state: GMMDotaState) -> jax.Array:
    """(K,) per-class effective counts (reference `c` property, :98-103)."""
    return state.C.sum(axis=1)


def init(epsilon: float, sigma: float, input_dim: int, num_classes: int,
         clip_weights: jax.Array, num_modes: int = 4,
         perturbation_scale: float = 0.01,
         rng: jax.Array | None = None) -> GMMDotaState:
    """Initialise (gmm_dota_adaptation_model.py:25-96).

    clip_weights: (D, K) or (K, D), auto-detected like the reference.
    """
    del epsilon
    K, M, D = num_classes, num_modes, input_dim
    sigma_init = resolve_sigma_init(sigma, D)
    cw = jnp.asarray(clip_weights, jnp.float32)
    if cw.shape == (D, K):
        base = cw.T
    elif cw.shape == (K, D):
        base = cw
    else:
        raise ValueError(f"clip_weights shape {cw.shape} incompatible with "
                         f"D={D}, K={K}")

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if M > 1 and D >= M:
        rv = jax.random.normal(rng, (K, D, M))
        q, _ = jnp.linalg.qr(rv)                    # (K, D, M)
        ortho = jnp.swapaxes(q, 1, 2)               # (K, M, D)
    else:
        rv = jax.random.normal(rng, (K, M, D))
        ortho = rv / (jnp.linalg.norm(rv, axis=-1, keepdims=True) + 1e-12)
    mu = base[:, None, :] + perturbation_scale * ortho

    sigma_arr = jnp.full((K, M, D), sigma_init, jnp.float32)
    return GMMDotaState(
        mu=mu, sigma=sigma_arr, sigma_reg=sigma_arr,
        pi=jnp.full((K, M), 1.0 / M, jnp.float32),
        C=jnp.full((K, M), 1.0 / (K * M), jnp.float32),
        class_counts=jnp.zeros((K,), jnp.float32),
        total_samples=jnp.zeros((), jnp.int32),
    )


def _log_gauss_diag(x, mu, sigma_diag):
    """Diagonal log-Gaussian, constant dropped (:105-126)."""
    s = jnp.clip(sigma_diag, min=_FLOOR)
    diff = x - mu
    return -0.5 * ((diff * diff / s).sum(-1) + jnp.log(s).sum(-1))


def fit(state: GMMDotaState, x: jax.Array, y_zs_prob: jax.Array,
        axis_name: str | None = None) -> GMMDotaState:
    """Vectorised streaming EM step (:128-190); covariance uses OLD mu."""
    x = x.astype(jnp.float32)
    y = y_zs_prob.astype(jnp.float32)
    B = jnp.asarray(x.shape[0], jnp.int32)

    log_l = _log_gauss_diag(x[:, None, None, :], state.mu[None],
                            state.sigma[None])            # (B, K, M)
    log_pi = jnp.log(jnp.clip(state.pi, min=1e-10))
    r = jax.nn.softmax(log_pi[None] + log_l, axis=2)
    gamma = y[:, :, None] * r                             # (B, K, M)

    sum_gamma = gamma.sum(0)
    weighted_x = jnp.einsum("bkm,bd->kmd", gamma, x, precision=_HIGH)
    diff = x[:, None, None, :] - state.mu[None]
    wdsq = jnp.einsum("bkm,bkmd->kmd", gamma, diff * diff, precision=_HIGH)
    class_sum = y.sum(0)

    if axis_name is not None:
        sum_gamma, weighted_x, wdsq, class_sum, B = jax.lax.psum(
            (sum_gamma, weighted_x, wdsq, class_sum, B), axis_name)

    new_C = state.C + sum_gamma
    denom = jnp.clip(new_C[..., None], min=1e-10)
    mu_new = (state.C[..., None] * state.mu + weighted_x) / denom
    sigma_new = jnp.clip(
        (state.C[..., None] * state.sigma + wdsq) / denom, min=_FLOOR)
    pi_new = new_C / jnp.clip(new_C.sum(1, keepdims=True), min=1e-10)
    return state._replace(
        mu=mu_new, sigma=sigma_new, pi=pi_new, C=new_C,
        class_counts=state.class_counts + class_sum,
        total_samples=state.total_samples + B)


def update(state: GMMDotaState, epsilon: float) -> GMMDotaState:
    """Shrinkage toward the all-ones diagonal (:192-202)."""
    reg = (1.0 - epsilon) * state.sigma + epsilon * jnp.ones_like(state.sigma)
    return state._replace(sigma_reg=jnp.clip(reg, min=_FLOOR))


def predict(state: GMMDotaState, x: jax.Array,
            alpha_max: float = 0.6,
            num_classes: int | None = None,
            total_counts: jax.Array | None = None) -> jax.Array:
    """Discriminant scores with uniform/empirical blended prior (:204-256).

    The per-class discriminant is row-local, so a CLASS-ROW BLOCK of the
    state yields the matching column block of the scores — the blended
    prior is the one term that crosses classes.  Class-sharded callers
    (parallel/ep.py) pass the REAL class count and the psum'd
    `total_counts` normaliser; both default to this state's own rows.
    """
    x = x.astype(jnp.float32)
    K = state.mu.shape[0]
    f_km = _log_gauss_diag(x[:, None, None, :], state.mu[None],
                           state.sigma_reg[None])
    log_pi = jnp.log(jnp.clip(state.pi, min=1e-10))
    log_class_lik = jax.scipy.special.logsumexp(log_pi[None] + f_km, axis=-1)

    n_cls = K if num_classes is None else num_classes
    total = (state.class_counts.sum() if total_counts is None
             else total_counts)
    uniform = jnp.full((K,), 1.0 / n_cls, jnp.float32)
    t = state.total_samples.astype(jnp.float32)
    est = state.class_counts / jnp.clip(total, min=1e-10)
    alpha_t = jnp.minimum(alpha_max, t / (t + 100.0))
    p_k = jnp.where(t > 0, (1 - alpha_t) * uniform + alpha_t * est, uniform)
    return log_class_lik + jnp.log(jnp.clip(p_k, min=1e-10))[None]
