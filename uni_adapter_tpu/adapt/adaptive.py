"""Adaptive-modes DOTA: start at M=1/class, split components as they widen.

Pure-functional rebuild of the reference's `DOTA_mix_adaptive`
(dota_mixture_adaptive.py:7-438).  The reference keeps ragged per-class
lists and rebuilds padded tensors after every split; under jit that design
is impossible, so here the padded representation IS the state
(SURVEY.md §7 architecture stance): fixed (K, max_modes, D) arrays with a
validity mask, allocated once.  Splitting becomes a fully-vectorised masked
scatter — no reallocation, no host round-trips.

Split criterion (reference :173-210): a component is eligible when its max
diagonal variance exceeds `split_threshold` (default 10·σ_init, :74-78),
its count ≥ `min_count_to_split`, and the class has spare capacity.  Split
mechanics (:212-260): replace the parent with a child offset +½σ along the
highest-variance dim, append a −½σ child, halve the variance on that dim and
the parent's count/weight.

One representational difference, documented: the reference splits every
eligible component of a class in one check; here each vectorised pass splits
the single worst (largest max-variance) eligible component per class, and
the pass is repeated `max_modes` times per check — the same set of splits,
children appended in worst-first rather than index order (mode order is
semantically irrelevant: the mixture is exchangeable over modes).  A child
whose remaining variance still exceeds the threshold may re-qualify within
the same check, where the reference defers it to the next
`split_check_interval`; both converge to the same refinement with timing
differing by at most one interval.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST
_FLOOR = 1e-8
_PAD_VAR = 1e10   # huge variance on masked slots → -inf log-likelihood


class AdaptiveState(NamedTuple):
    mu: jax.Array            # (K, Mmax, D)
    var: jax.Array           # (K, Mmax, D)
    pi: jax.Array            # (K, Mmax)
    c: jax.Array             # (K, Mmax)
    mask: jax.Array          # (K, Mmax) bool — valid components
    class_counts: jax.Array  # (K,)
    t: jax.Array             # () int32
    fit_calls: jax.Array     # () int32


def resolve_sigma_init(sigma_cfg: float, input_dim: int) -> float:
    return 1.0 / input_dim if sigma_cfg >= 0.1 else sigma_cfg


def init(epsilon: float, sigma: float, input_dim: int, num_classes: int,
         clip_weights: jax.Array, max_modes: int = 8) -> AdaptiveState:
    """M=1 per class, mean = clip center, var = σ_init (reference :95-113)."""
    del epsilon
    K, M, D = num_classes, max_modes, input_dim
    sigma_init = resolve_sigma_init(sigma, D)
    centers = jnp.asarray(clip_weights, jnp.float32).T        # (K, D)
    mu = jnp.zeros((K, M, D), jnp.float32).at[:, 0].set(centers)
    var = jnp.full((K, M, D), _PAD_VAR, jnp.float32).at[:, 0].set(sigma_init)
    pi = jnp.zeros((K, M), jnp.float32).at[:, 0].set(1.0)
    c = jnp.zeros((K, M), jnp.float32).at[:, 0].set(1.0)
    mask = jnp.zeros((K, M), bool).at[:, 0].set(True)
    return AdaptiveState(mu, var, pi, c, mask,
                         jnp.zeros((K,), jnp.float32),
                         jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))


def num_modes_per_class(state: AdaptiveState) -> jax.Array:
    return state.mask.sum(axis=1).astype(jnp.int32)


def _get_var(state: AdaptiveState, epsilon: float) -> jax.Array:
    return jnp.clip(state.var + epsilon, min=_FLOOR)


def _log_likelihood(x, mu, var):
    diff = x[:, None, None, :] - mu[None]
    maha = jnp.sum(diff * diff / var[None], axis=-1)
    log_det = jnp.sum(jnp.log(var), axis=-1)
    return -0.5 * (log_det[None] + maha)


def _masked_log_pi(state: AdaptiveState) -> jax.Array:
    lp = jnp.log(state.pi + 1e-10)
    return jnp.where(state.mask, lp, -jnp.inf)


def _split_once(state: AdaptiveState, split_threshold: float,
                min_count: float) -> AdaptiveState:
    """Split the worst eligible component of every class that has one
    (vectorised over K)."""
    K, M, D = state.mu.shape
    max_var = jnp.where(state.mask, state.var.max(-1), -jnp.inf)   # (K, M)
    n_modes = num_modes_per_class(state)                           # (K,)
    eligible = (state.mask & (state.c >= min_count)
                & (max_var > split_threshold))                     # (K, M)
    class_can = (n_modes < M) & eligible.any(axis=1)               # (K,)

    parent = jnp.argmax(jnp.where(eligible, max_var, -jnp.inf), axis=1)  # (K,)
    child_slot = n_modes                                           # first free
    # clamp for safe indexing; class_can gates the actual write
    child_slot = jnp.minimum(child_slot, M - 1)

    ks = jnp.arange(K)
    mu_p = state.mu[ks, parent]                                    # (K, D)
    var_p = state.var[ks, parent]
    c_p = state.c[ks, parent]
    pi_p = state.pi[ks, parent]

    split_dim = jnp.argmax(var_p, axis=1)                          # (K,)
    split_std = jnp.sqrt(var_p[ks, split_dim])
    e = jax.nn.one_hot(split_dim, D, dtype=jnp.float32)            # (K, D)
    mu_c1 = mu_p + 0.5 * split_std[:, None] * e
    mu_c2 = mu_p - 0.5 * split_std[:, None] * e
    var_c = jnp.clip(var_p * (1.0 - 0.5 * e), min=_FLOOR)          # halve d*

    def put(arr, idx, val):
        new = arr.at[ks, idx].set(val)
        return jnp.where(class_can[:, None, None] if arr.ndim == 3
                         else class_can[:, None], new, arr)

    mu = put(put(state.mu, parent, mu_c1), child_slot, mu_c2)
    var = put(put(state.var, parent, var_c), child_slot, var_c)
    c = put(put(state.c, parent, c_p * 0.5), child_slot, c_p * 0.5)
    pi = put(put(state.pi, parent, pi_p * 0.5), child_slot, pi_p * 0.5)
    mask = state.mask.at[ks, child_slot].set(True)
    mask = jnp.where(class_can[:, None], mask, state.mask)
    return state._replace(mu=mu, var=var, c=c, pi=pi, mask=mask)


def check_and_split(state: AdaptiveState, split_threshold: float,
                    min_count_to_split: float = 5.0) -> AdaptiveState:
    """Split all eligible components (reference _check_and_split,
    :173-210), as `max_modes` vectorised worst-first passes."""
    M = state.mu.shape[1]

    def body(_, s):
        return _split_once(s, split_threshold, min_count_to_split)

    return jax.lax.fori_loop(0, M, body, state)


def fit(state: AdaptiveState, x: jax.Array, gamma_class: jax.Array,
        epsilon: float, split_threshold: float,
        min_count_to_split: float = 5.0, split_check_interval: int = 50,
        streaming_update_sigma: bool = True,
        axis_name: Optional[str] = None) -> AdaptiveState:
    """Masked streaming EM step + periodic split check (reference :287-385)."""
    x = x.astype(jnp.float32)
    gamma_class = gamma_class.astype(jnp.float32)
    B = jnp.asarray(x.shape[0], jnp.int32)

    cur_var = _get_var(state, epsilon)
    log_lik = _log_likelihood(x, state.mu, cur_var)         # (B, K, M)
    log_joint = _masked_log_pi(state)[None] + log_lik
    log_r = log_joint - jax.scipy.special.logsumexp(log_joint, axis=2,
                                                    keepdims=True)
    r = jnp.where(state.mask[None], jnp.exp(log_r), 0.0)
    gamma = gamma_class[:, :, None] * r

    sum_gamma = gamma.sum(0)
    gamma_perm = jnp.transpose(gamma, (1, 2, 0))
    weighted_x = jnp.matmul(gamma_perm, x, precision=_HIGH)
    weighted_x_sq = jnp.matmul(gamma_perm, x * x, precision=_HIGH)
    class_sum = gamma_class.sum(0)

    if axis_name is not None:
        sum_gamma, weighted_x, weighted_x_sq, class_sum, B = jax.lax.psum(
            (sum_gamma, weighted_x, weighted_x_sq, class_sum, B), axis_name)

    c_new = state.c + sum_gamma
    mu_new = (state.c[..., None] * state.mu + weighted_x) / (
        c_new[..., None] + 1e-10)
    mu = jnp.where(state.mask[..., None], mu_new, state.mu)

    var = state.var
    if streaming_update_sigma:
        wsq = (weighted_x_sq - 2.0 * state.mu * weighted_x
               + sum_gamma[..., None] * state.mu ** 2)
        var_new = jnp.clip(
            (state.c[..., None] * state.var + wsq) / (c_new[..., None] + 1e-10),
            min=_FLOOR)
        var = jnp.where(state.mask[..., None], var_new, state.var)

    c = jnp.where(state.mask, c_new, 0.0)
    pi = c / (c.sum(1, keepdims=True) + 1e-10)
    new = state._replace(
        mu=mu, var=var, pi=pi, c=c,
        class_counts=state.class_counts + class_sum,
        t=state.t + B, fit_calls=state.fit_calls + 1)

    def with_split(s):
        return check_and_split(s, split_threshold, min_count_to_split)

    return jax.lax.cond(new.fit_calls % split_check_interval == 0,
                        with_split, lambda s: s, new)


def predict(state: AdaptiveState, x: jax.Array, epsilon: float,
            source_priors: Optional[jax.Array] = None,
            alpha_max: float = 0.5) -> jax.Array:
    """Masked logsumexp class scores (reference :387-417)."""
    cur_var = _get_var(state, epsilon)
    log_lik = _log_likelihood(x.astype(jnp.float32), state.mu, cur_var)
    scores = jax.scipy.special.logsumexp(
        _masked_log_pi(state)[None] + log_lik, axis=2)
    if source_priors is not None:
        p_est = state.class_counts / (state.class_counts.sum() + 1e-10)
        t = state.t.astype(jnp.float32)
        alpha_t = jnp.minimum(alpha_max, t / (t + 100.0))
        p_k = (1 - alpha_t) * source_priors + alpha_t * p_est
        scores = scores + jnp.log(p_k + 1e-10)[None]
    return scores


def update(state: AdaptiveState) -> AdaptiveState:
    """No-op, API protocol compatibility (reference :419-421)."""
    return state


def get_mode_stats(state: AdaptiveState) -> dict:
    """Mode-count summary (reference :423-438)."""
    counts = list(map(int, jax.device_get(num_modes_per_class(state))))
    return {"per_class": counts, "total": sum(counts), "min": min(counts),
            "max": max(counts), "mean": sum(counts) / len(counts)}
