"""Text-residual learning: the one gradient-based piece of the pipeline.

Rebuild of the reference's residual optimisation
(Uni_Adapter.py:191-270 `compute_text_alignment_loss` + the inline 10-step
Adam loop at :444-486).  A trainable (K, D) residual tensor is added to the
frozen initial text features; each stream step (after the first) runs
`residual_steps` Adam updates of an alignment loss over the (K, K)
class-embedding log-likelihood matrix under the current mixture state.

Measured value (round-5, tests/test_efficacy_residual_realistic.py): at
the reference's own protocol (lr=1e-3, 10 steps/batch) this mechanism
REDUCES accuracy on every calibrated recoverable-drift stream measured —
toy dims AND realistic dims (K=40, D=512-1024) — with the reference's own
loop agreeing on the same streams, and no robust positive-lr regime found.
It ships correctness-pinned and perf-optimized because the reference
enables it in its headline configuration, but users should expect
`res_learning=False` to be the stronger setting.

TPU shape: the inner loop is `lax.fori_loop` over `jax.grad` +
`optax.adam` updates of a pure function of (residuals, mixture state) —
exactly the structure SURVEY.md §7 prescribes.  Adam moments persist across
stream steps (the reference builds its optimiser once per corruption run),
so the optimiser state rides in the engine carry.

Performance anatomy at LVIS scale (K=1156, M=4, 15 vmapped streams; see
BASELINE.md round-3): the 10-step loop's cost splits into the likelihood
matmuls per step (fwd + input-VJP, MXU-bound) and an elementwise tail that
is pure HBM bandwidth.  Three structural choices keep that tail at the
floor:

  * **M separate (B, 2D)·(2D, K) dots, every elementwise tensor (B, K).**
    A single (B, 2D)·(2D, M·K) contraction needs a rank-3 (B, M, K) view
    for the M-logsumexp, and on TPU that view has a different tiled layout
    (T(4,128)) than the rank-2 dot result (T(8,128)) — HLO inspection
    showed XLA materialising a 306 MB relayout copy plus two 306 MB
    broadcasts of (B, K) operands per while iteration.  Splitting the
    projection per mode keeps everything rank-2 and layout-uniform: the
    lse/softmax chain is M-way elementwise over (B, K) tensors, which XLA
    fuses with no copies (measured 22.1 → 16.1 ms per Adam step at 'high',
    15.8 → 8.2 at 'default').
  * **`jax.custom_vjp` with explicit `dot_general` dimension numbers.**
    The backward contracts the SAME per-mode (K, 2D) operand over its
    major axis — no transpose op exists for XLA to re-materialise per
    iteration (autodiff's transpose was 568 MB × 3 per step).
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
    matmuls into per-mode [x², x] @ proj[m] contractions — the x-dependent
    work per step drops to M (B, 2D)·(2D, K) matmuls and their VJPs.
    """
    proj: jax.Array      # (M, K, 2D): per-mode rows [1/var ‖ −2·μ/var]
    base: jax.Array      # (M, K): log π − ½·(Σ log var + Σ μ²/var)


def frozen_mixture_terms(state: mode_dota.ModeDotaState,
                         epsilon: float) -> FrozenMixtureTerms:
    var = mode_dota.regularized_var(state, epsilon)       # (K, M, D)
    inv_v = 1.0 / var
    mu_over_v = state.mu / var
    quad_const = jnp.sum(state.mu * state.mu / var, axis=-1)      # (K, M)
    log_det = jnp.sum(jnp.log(var), axis=-1)                      # (K, M)
    proj = jnp.transpose(
        jnp.concatenate([inv_v, -2.0 * mu_over_v], axis=-1),      # (K, M, 2D)
        (1, 0, 2))                                                # (M, K, 2D)
    base = (jnp.log(state.pi + 1e-10) - 0.5 * (log_det + quad_const)).T
    return FrozenMixtureTerms(proj, base)


def _log_marginal_fn(terms: FrozenMixtureTerms,
                     precision: jax.lax.Precision):
    """Build lm(X): (B, 2D) → (B, K) log-marginal likelihood with a custom
    VJP.  Forward and backward issue one dot_general per mode against the
    SAME stored (K, 2D) operand (different contraction dims), and the
    backward recomputes the M-softmax from the saved per-mode likelihoods
    instead of saving the responsibilities."""
    proj, base = terms.proj, terms.base
    M = base.shape[0]
    # fwd: X(B,2D) · proj[m](K,2D) over 2D → (B, K)
    dn_fwd = (((1,), (1,)), ((), ()))
    # bwd: dmaha(B,K) · proj[m](K,2D) over K → (B, 2D)
    dn_bwd = (((1,), (0,)), ((), ()))

    def _forward(X):
        mahas = tuple(
            jax.lax.dot_general(X, proj[m], dn_fwd, precision=precision)
            for m in range(M))                            # M × (B, K)
        ljs = tuple(base[m][None] - 0.5 * mahas[m] for m in range(M))
        mx = ljs[0]
        for m in range(1, M):
            mx = jnp.maximum(mx, ljs[m])
        sm = sum(jnp.exp(lj - mx) for lj in ljs)
        lm = mx + jnp.log(sm)                             # (B, K)
        return lm, (mahas, lm)

    @jax.custom_vjp
    def lm_fn(X):
        return _forward(X)[0]

    def _bwd(resid, dlm):
        mahas, lm = resid
        dX = None
        for m in range(M):
            lj = base[m][None] - 0.5 * mahas[m]
            dmaha = (-0.5) * jnp.exp(lj - lm) * dlm       # (B, K)
            part = jax.lax.dot_general(dmaha, proj[m], dn_bwd,
                                       precision=precision)
            dX = part if dX is None else dX + part
        return (dX,)

    lm_fn.defvjp(_forward, _bwd)
    return lm_fn


def _loss_tail(lm: jax.Array) -> jax.Array:
    """The (B, K) → scalar tail of the alignment loss: sharpen the diagonal
    of exp(exp(L / max(L))) (Uni_Adapter.py:236-266).  Split out so the
    class-sharded path (parallel/ep.py) reuses the identical elementwise
    chain on its gathered likelihood matrix."""
    lm_normalized = lm / jnp.max(lm)
    e = jnp.exp(jnp.exp(lm_normalized))
    B, K = e.shape
    diag_mask = (jnp.arange(B)[:, None] == jnp.arange(K)[None, :]
                 ).astype(e.dtype)
    diag = (e * diag_mask).sum(axis=1)
    return -(diag / e.sum(axis=1)).mean() - (diag / e.sum(axis=0)).mean()


def _alignment_loss_from_terms(class_embeddings: jax.Array,
                               terms: FrozenMixtureTerms,
                               precision: jax.lax.Precision) -> jax.Array:
    x = class_embeddings.astype(jnp.float32)
    X = jnp.concatenate([x * x, x], axis=1)               # (B, 2D)
    lm = _log_marginal_fn(terms, precision)(X)            # (B, K)
    return _loss_tail(lm)


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


def optimize_residuals_sharded(res_state: ResidualState,
                               text_init_local: jax.Array,
                               mixture_local: "mode_dota.ModeDotaState",
                               optimizer: optax.GradientTransformation,
                               epsilon: float, axis_name: str,
                               num_classes: int, num_steps: int = 10,
                               precision: jax.lax.Precision =
                               jax.lax.Precision.HIGHEST,
                               unroll: bool = False) -> ResidualState:
    """Class-sharded residual optimisation (for parallel/ep.py).

    Every K-leading operand — residuals, text anchors, the frozen mixture
    terms — holds this device's contiguous block of classes; the device
    axis `axis_name` covers all blocks (padded to K_pad = n·K_local, the
    pad tail carrying zero gradients by construction).

    Numerics vs `optimize_residuals` on the full state: the per-step
    likelihood matmuls are column blocks of the replicated matmuls (each
    output element an independent dot product), the gathered (K, K)
    matrix feeds the SAME `_loss_tail`, and the only genuine reorder is
    the input-VJP's cross-device reduce_scatter (the replicated path
    contracts all K columns in one dot) — float-roundoff in practice
    (tests/test_ep.py one-step parity: ≤2e-6 per Adam step).
    What divides by n_devices is exactly the loop's dominant cost: the M
    (K, 2D)·(2D, K) contractions and their VJPs (module docstring;
    BASELINE.md LVIS profile).
    """
    terms = frozen_mixture_terms(mixture_local, epsilon)
    lm_fn = _log_marginal_fn(terms, precision)

    def loss_fn(residuals_local):
        text = text_init_local + residuals_local
        text = text / (jnp.linalg.norm(text, axis=1, keepdims=True) + 1e-12)
        x = jax.lax.all_gather(text.astype(jnp.float32), axis_name,
                               axis=0, tiled=True)        # (K_pad, D)
        x = x[:num_classes]
        X = jnp.concatenate([x * x, x], axis=1)           # (K, 2D)
        lm_local = lm_fn(X)                               # (K, K_local)
        lm = jax.lax.all_gather(lm_local, axis_name, axis=1,
                                tiled=True)[:, :num_classes]
        return _loss_tail(lm)

    grad_fn = jax.grad(loss_fn)

    def body(_, rs: ResidualState) -> ResidualState:
        grads = grad_fn(rs.residuals)
        updates, opt_state = optimizer.update(grads, rs.opt_state,
                                              rs.residuals)
        return ResidualState(optax.apply_updates(rs.residuals, updates),
                             opt_state)

    if unroll:
        # same opt-in flat-program variant as optimize_residuals; lets XLA
        # overlap a step's elementwise tail with the next step's matmuls
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
