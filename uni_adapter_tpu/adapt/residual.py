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

Performance anatomy at LVIS scale (K=1156, M=4, 15 vmapped streams; see
BASELINE.md round-3): the 10-step loop's cost splits into the two big
matmuls per step (fwd likelihood + input-VJP, MXU-bound) and what used to
be a larger tail of relayout copies and re-materialised transposes that XLA
emitted *inside* the while body.  Three structural choices remove that
tail:

  * **One projection operand, two `dot_general` forms.**  The frozen
    projection is stored once as `proj (M·K, 2D)`; the forward contracts
    over its minor axis and the backward over its major axis via explicit
    dimension numbers inside a `jax.custom_vjp` — no transpose op exists
    for XLA to re-materialise per iteration (the autodiff-generated
    transpose was 568 MB × 3 per step at LVIS scale).
  * **Mode-major column order.**  Projection rows are ordered mode-major
    (column index m·K + j), so the (B, M·K) likelihood reshapes to
    (B, M, K) with *classes* on the 128-lane axis and the M-logsumexp on a
    middle axis — the class-major order put M=4 on the lanes, wasting
    31/32 of every vector register in the reduction and its VJP.
  * **Mask-diagonal, not `jnp.diagonal`.**  Under vmap the batched
    diagonal lowers to a gather; an eye-mask multiply-reduce fuses with the
    row/column sums (measured 2.8× on the loss chain alone).
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
    matmuls into ONE [x², x] @ proj contraction — the x-dependent work per
    step drops to a single (B, 2D)·(2D, M·K) matmul and its VJP.
    """
    proj: jax.Array      # (M·K, 2D): rows mode-major (index m·K + j),
                         # each row [1/var ‖ −2·μ/var] for (class j, mode m)
    base: jax.Array      # (M, K): log π − ½·(Σ log var + Σ μ²/var),
                         # transposed to match the mode-major column order
    num_modes: int       # static M (for the (B, M, K) reshape)


def frozen_mixture_terms(state: mode_dota.ModeDotaState,
                         epsilon: float) -> FrozenMixtureTerms:
    var = mode_dota.regularized_var(state, epsilon)       # (K, M, D)
    K, M, D = var.shape
    inv_v = 1.0 / var
    mu_over_v = state.mu / var
    quad_const = jnp.sum(state.mu * state.mu / var, axis=-1)      # (K, M)
    log_det = jnp.sum(jnp.log(var), axis=-1)                      # (K, M)
    proj = jnp.concatenate(
        [jnp.transpose(inv_v, (1, 0, 2)).reshape(M * K, D),
         jnp.transpose(-2.0 * mu_over_v, (1, 0, 2)).reshape(M * K, D)],
        axis=1)                                                   # (MK, 2D)
    base = (jnp.log(state.pi + 1e-10) - 0.5 * (log_det + quad_const)).T
    return FrozenMixtureTerms(proj, base, M)


def _log_marginal_fn(terms: FrozenMixtureTerms,
                     precision: jax.lax.Precision):
    """Build lm(X): (B, 2D) → (B, K) log-marginal likelihood with a custom
    VJP.  Forward and backward each issue exactly one dot_general against
    the SAME stored operand (different contraction dims), and the backward
    recomputes the M-softmax from the saved likelihood matrix instead of
    saving the (B, M, K) responsibilities."""
    proj, base, M = terms.proj, terms.base, terms.num_modes
    K = base.shape[1]
    # fwd: X(B,2D) · proj(MK,2D) over 2D → (B, MK)
    dn_fwd = (((1,), (1,)), ((), ()))
    # bwd: dmaha(B,MK) · proj(MK,2D) over MK → (B, 2D)
    dn_bwd = (((1,), (0,)), ((), ()))

    def _forward(X):
        maha = jax.lax.dot_general(X, proj, dn_fwd, precision=precision)
        lj = base[None] - 0.5 * maha.reshape(-1, M, K)
        lm = jax.scipy.special.logsumexp(lj, axis=1)      # (B, K)
        return lm, (maha, lm)

    @jax.custom_vjp
    def lm_fn(X):
        return _forward(X)[0]

    def _bwd(resid, dlm):
        maha, lm = resid
        lj = base[None] - 0.5 * maha.reshape(-1, M, K)
        p = jnp.exp(lj - lm[:, None, :])                  # (B, M, K)
        dmaha = (-0.5) * (p * dlm[:, None, :]).reshape(-1, M * K)
        dX = jax.lax.dot_general(dmaha, proj, dn_bwd, precision=precision)
        return (dX,)

    lm_fn.defvjp(_forward, _bwd)
    return lm_fn


def _alignment_loss_from_terms(class_embeddings: jax.Array,
                               terms: FrozenMixtureTerms,
                               precision: jax.lax.Precision) -> jax.Array:
    x = class_embeddings.astype(jnp.float32)
    X = jnp.concatenate([x * x, x], axis=1)               # (B, 2D)
    lm = _log_marginal_fn(terms, precision)(X)            # (B, K)
    lm_normalized = lm / jnp.max(lm)
    e = jnp.exp(jnp.exp(lm_normalized))
    B, K = e.shape
    diag_mask = (jnp.arange(B)[:, None] == jnp.arange(K)[None, :]
                 ).astype(e.dtype)
    diag = (e * diag_mask).sum(axis=1)
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
    loop used to dominate the whole pipeline step; after hoisting, only the
    genuinely x-dependent fused matmul (+ its VJP) and the (B, K)
    loss chain stay inside (see the module docstring for the layout and
    custom-VJP choices that keep the loop body free of relayout copies).
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
        # likelihood matmul — the fori_loop's serial body can't; costs
        # ~num_steps× body compile time.  Measured neutral at LVIS scale
        # (BASELINE.md round-3 A/Bs) — kept as an opt-in.
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
