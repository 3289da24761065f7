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

Split semantics are slot-exact with the reference, vectorised: the
reference collects eligible components in ascending index order until the
class hits `max_modes` (:186-200), then executes the collected splits in
REVERSE index order, each appending its −offset child at the end of the
ragged list (:202-206, :252-258).  `check_and_split` reproduces that
placement in one masked scatter — the selected parent with ascending rank
r (of S selected) keeps the +offset child in place and writes the −offset
child to slot `n_modes + (S − 1 − r)`.  Eligibility is evaluated once from
the pre-check state, so a fresh child never re-qualifies within the same
check, exactly like the reference (tests/test_reference_import_oracle.py
drives the reference's ACTUAL DOTA_mix_adaptive against this module).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# single home of the sigma >= 0.1 → 1/D auto-correction (the variants must
# resolve the same effective sigma for the same config)
from uni_adapter_tpu.adapt.mode_dota import resolve_sigma_init  # noqa: F401

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


def check_and_split(state: AdaptiveState, split_threshold: float,
                    min_count_to_split: float = 5.0) -> AdaptiveState:
    """Split eligible components, slot-exact with the reference's
    collect-ascending / execute-reversed protocol (_check_and_split
    :173-210 + _split_component :211-260), in one masked scatter.

    Per class: eligible slots are taken in ascending index order up to the
    spare capacity `max_modes − n_modes` (the reference's collection break
    at :197-200 is inclusive of the split that reaches capacity, so the
    cap IS the spare capacity).  Execution in reverse index order means the
    selected parent of ascending rank r (out of S selected) appends its
    −offset child at ragged-list position n_modes + (S − 1 − r)."""
    K, M, D = state.mu.shape
    n_modes = num_modes_per_class(state)                           # (K,)
    max_var = jnp.where(state.mask, state.var.max(-1), -jnp.inf)   # (K, M)
    eligible = (state.mask & (state.c >= min_count_to_split)
                & (max_var > split_threshold))                     # (K, M)
    cap = jnp.maximum(M - n_modes, 0)                              # (K,)
    rank = jnp.cumsum(eligible, axis=1) - 1                        # (K, M)
    selected = eligible & (rank < cap[:, None])                    # (K, M)
    n_sel = selected.sum(axis=1)                                   # (K,)
    # reverse-execution placement: rank r of S → child slot n_modes+S−1−r
    child_slot = n_modes[:, None] + n_sel[:, None] - 1 - rank      # (K, M)
    # non-selected rows scatter out of bounds and are dropped
    child_slot = jnp.where(selected, child_slot, M)

    split_dim = jnp.argmax(state.var, axis=-1)                     # (K, M)
    split_std = jnp.sqrt(jnp.take_along_axis(
        state.var, split_dim[..., None], axis=-1))                 # (K, M, 1)
    e = jax.nn.one_hot(split_dim, D, dtype=jnp.float32)            # (K, M, D)
    offset = 0.5 * split_std * e
    var_c = jnp.clip(state.var * (1.0 - 0.5 * e), min=_FLOOR)      # halve d*

    sel3 = selected[..., None]
    rows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, M))
    mu = jnp.where(sel3, state.mu + offset, state.mu)              # parent→c1
    mu = mu.at[rows, child_slot].set(state.mu - offset, mode="drop")
    var = jnp.where(sel3, var_c, state.var)
    var = var.at[rows, child_slot].set(var_c, mode="drop")
    c = jnp.where(selected, state.c * 0.5, state.c)
    c = c.at[rows, child_slot].set(state.c * 0.5, mode="drop")
    pi = jnp.where(selected, state.pi * 0.5, state.pi)
    pi = pi.at[rows, child_slot].set(state.pi * 0.5, mode="drop")
    mask = state.mask.at[rows, child_slot].set(True, mode="drop")
    return state._replace(mu=mu, var=var, c=c, pi=pi, mask=mask)


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
