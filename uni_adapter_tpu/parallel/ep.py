"""Class-sharded (expert-parallel) MODE-DOTA evaluation over a mesh.

The reference has no notion of sharding the adaptation STATE — its only
distributed code is vestigial DDP scaffolding (SURVEY.md §2.4, §5.8).  At
Objaverse-LVIS scale (K=1156 classes) the MODE-DOTA pipeline is dominated
by K-proportional work: the EM likelihood matmuls and — with text-residual
learning on — the 10-step Adam loop whose per-step cost is M
(K, 2D)·(2D, K) contractions plus their VJPs (adapt/residual.py docstring;
BASELINE.md round-3 LVIS profile: 48.9 pc/s vs 106 at K=40, matmul-bound).
All of that work is CLASS-local:

  * the mixture state (mu, var, pi, c, class_counts) leads with K;
  * `fit`'s within-class responsibilities normalise over modes only
    (dota_mixture.py:162-234), so a class-row block of the EM update
    depends on other classes solely through the (B, K) zero-shot prob_map;
  * `predict` and the CLIP logits are column-block matmuls — a column
    slice of a matmul is bitwise the slice of the full matmul;
  * the residual alignment loss factors into per-class-column likelihood
    blocks joined by a small (K, K) elementwise tail (gathered; ~5 MB at
    LVIS scale, negligible next to the matmuls it joins).

So sharding K over a `classes` mesh axis divides the dominant matmuls by
n_devices while reproducing the single-device trajectory: the batch is
REPLICATED (every device consumes the same stream step — this mode does
not change the adaptation order, unlike dist_mode='psum'), the state
update is class-local math on identical inputs, and the only genuine
cross-class reorders are the fusion weight's mean(c) psum and the
residual gradient's reduce_scatter.  Differences vs the replicated run
are float-roundoff (EP compiles a different program, so XLA fusion
reassociates elementwise chains at the ulp level; tests/test_ep.py pins
the envelope, with a tight one-step gradient-parity contract for the
residual loop).

This is the TPU-native expert parallelism of this framework: the K·M
diagonal-Gaussian modes are the experts, each device owns a contiguous
K/n block of them, and routing is dense (every sample scores every
expert).  The encoder forward is recomputed per device — at the K this
mode exists for, the adaptation rather than the trunk is the bottleneck;
compose with trunk parallelism on a 2-D mesh if the trunk dominates.

Round-4 completes the family: EVERY adaptation method class-shards —
plain DOTA (_make_dota_step: (K, D, D) covariance rows, psum'd shared
precision), GMM-DOTA (_make_gmm_step: real-K QR init, psum'd blended
prior), adaptive-modes (_make_adaptive_step: the split scatter is
class-row-local), and the cache below.

The prototype-CACHE path shards the same way (round-4): CacheState's
K-leading leaves split over the class axis — at LVIS scale the
(K, C, K) probability state is ~160 MB/stream and the prototype-graph
refinement builds a (K, K) adjacency every step, both class-leading
(_make_cache_step; reference semantics Uni_Adapter.py:78-189).  The
insert-or-merge becomes owner-masked collective arithmetic (single-
contributor psums are bitwise the owner's values) and the graph
refinement row-shards its adjacency build and CG matvec while the small
CG state stays replicated (_sharded_refinement).

K need not divide the mesh: anchors pad to K_pad = ceil(K/n)·n with unit
rows whose logits never reach the stream (the gathered logits slice back
to K before any softmax), so the pad classes' state and residual rows
stay frozen at init and the trajectory is that of the unpadded problem.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from uni_adapter_tpu import engine
from uni_adapter_tpu.adapt import adaptive as adaptive_mod
from uni_adapter_tpu.adapt import cache as cache_mod
from uni_adapter_tpu.adapt import dota as dota_mod
from uni_adapter_tpu.adapt import fusion, gmm as gmm_mod, mode_dota, residual
from uni_adapter_tpu.config import Config
from uni_adapter_tpu.utils.math import (
    conjugate_gradient,
    normalized_entropy,
    softmax_entropy,
)
from uni_adapter_tpu.utils.metrics import topk_correct

_HIGH = jax.lax.Precision.HIGHEST


def make_classes_mesh(n_devices: Optional[int] = None,
                      axis: str = "classes") -> Mesh:
    """1-D mesh whose axis shards the class dimension."""
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devs), (axis,))


def pad_classes(text: np.ndarray, n_shards: int):
    """Pad (K, D) anchors to K_pad = ceil(K/n)·n rows.

    Pad rows are unit e_0 vectors: valid Gaussians to init the (frozen)
    pad-class modes from, never scored (logits slice back to K)."""
    text = np.asarray(text)
    K, D = text.shape
    K_pad = -(-K // n_shards) * n_shards
    if K_pad != K:
        pad = np.zeros((K_pad - K, D), text.dtype)
        pad[:, 0] = 1.0
        text = np.concatenate([text, pad], axis=0)
    return text, K_pad


def make_ep_step_fn(cfg: Config, model, axis: str, num_classes: int,
                    n_shards: int,
                    encode_fn: Optional[Callable] = None,
                    shard_encoder: bool = False) -> Callable:
    """Per-sample step for INSIDE shard_map over the `axis` class mesh:
        step(params, text_local, state, batch) -> (state, StepOutput)
    where `text_local` is this device's (K_pad/n, D) anchor block, `state`
    the matching class-block EngineState, and `batch` the REPLICATED
    (pc, rgb, target) step.  Mirrors engine.make_step_fn's MODE-DOTA branch
    (engine.py:240-278) with the class-axis collectives spliced in.

    shard_encoder: also split the fused 2B encoder batch over the class
      axis (each device encodes ceil(2B/n) rows; features all_gather
      back) — the otherwise-replicated trunk forward then scales with
      the mesh too, making EP a full-step lever rather than
      adaptation-only.  Batches that don't divide the mesh pad with zero
      clouds (sliced off after the gather), so ANY B works — incl. the
      paper's batch_size-1 protocol, where each device encodes one row
      of the padded fused batch instead of both.  Per-sample encoder
      math is batch-independent, so the gathered features match the
      replicated forward to float roundoff; the noise is generated for
      the FULL batch and sliced, so the consumed values are identical.
    """
    dc = cfg.dota
    is_cache = not (dc.use_dota or dc.use_mode_dota or dc.use_gmm_dota
                    or dc.use_adaptive_dota)
    if is_cache:
        # the prototype cache is the OTHER method with K-proportional
        # cost: its (K, C, K) probability state and the class-prototype
        # graph both lead with K (adapt/cache.py; at LVIS scale the probs
        # leaf alone is ~160 MB/stream) — class-shard them the same way
        if shard_encoder:
            raise ValueError(
                "shard_encoder requires the fused 2-forward MODE-DOTA "
                "batch; the cache path runs one batch-1 forward per step "
                "(get_logits_wrapper coerces pred to an int, "
                "Uni_Adapter.py:72) — nothing to split")
        encode = encode_fn if encode_fn is not None else \
            engine.make_encode_fn(cfg, model)
        return _make_cache_step(cfg, encode, axis, num_classes, n_shards)
    if dc.use_dota and not dc.use_mode_dota:
        # plain DOTA's (K, D, D) per-class covariance is the MOST
        # memory-dominant class-leading state of the family (4.8 GB at
        # LVIS K=1156, D=1024 — 600 MB/device on an EP-8 mesh); its fit
        # and LDA predict are class-row-local, only the shared precision
        # Λ = inv((1-ε)·Σ̄+ε·I) needs a psum of Σ row sums
        if shard_encoder:
            raise ValueError(
                "shard_encoder requires the fused 2-forward MODE-DOTA "
                "batch; plain DOTA runs one forward per step — nothing "
                "to split")
        encode = encode_fn if encode_fn is not None else \
            engine.make_encode_fn(cfg, model)
        return _make_dota_step(cfg, encode, axis, num_classes, n_shards)
    if dc.use_gmm_dota and not dc.use_mode_dota:
        # GMM-DOTA's (K, M, D) mixture is class-row-local like MODE-DOTA's;
        # only its blended prior (class_counts normalisation) and the
        # fusion weight cross classes — both psums of valid-row sums
        if shard_encoder:
            raise ValueError(
                "shard_encoder requires the fused 2-forward MODE-DOTA "
                "batch; GMM-DOTA runs one forward per step — nothing "
                "to split")
        encode = encode_fn if encode_fn is not None else \
            engine.make_encode_fn(cfg, model)
        return _make_gmm_step(cfg, encode, axis, num_classes, n_shards)
    if dc.use_adaptive_dota and not dc.use_mode_dota:
        # adaptive-modes is class-row-local THROUGH its splits: the
        # collect-ascending/execute-reversed scatter operates per class
        # row (adapt/adaptive.check_and_split), the masked EM normalises
        # over modes only, and predict has no cross-class term (the
        # engine passes source_priors=None) — only the fusion weight's
        # mean(c) psums valid rows.  The split-check cadence rides the
        # replicated fit_calls scalar, so every device splits on the
        # same step.
        if shard_encoder:
            raise ValueError(
                "shard_encoder requires the fused 2-forward MODE-DOTA "
                "batch; adaptive-DOTA runs one forward per step — "
                "nothing to split")
        encode = encode_fn if encode_fn is not None else \
            engine.make_encode_fn(cfg, model)
        return _make_adaptive_step(cfg, encode, axis, num_classes,
                                   n_shards)
    encode = encode_fn if encode_fn is not None else \
        engine.make_encode_fn(cfg, model)
    use_res = dc.res_learning
    res_opt = residual.make_optimizer(dc.residual_lr) if use_res else None
    res_prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}.get(
        dc.residual_precision)
    if use_res and res_prec is None:
        raise ValueError(
            f"unknown residual_precision {dc.residual_precision!r} "
            f"(expected 'highest', 'high', or 'default')")

    def step(params, text_local, state: engine.EngineState, batch):
        pc, rgb, target = batch
        text_local = text_local.astype(jnp.float32)
        k_local = text_local.shape[0]
        k_pad = k_local * n_shards
        offset = jax.lax.axis_index(axis) * k_local
        # pad-class rows (global index >= K) are masked out of cross-class
        # statistics; their state never moves (zero prob_map columns)
        valid = ((offset + jnp.arange(k_local)) < num_classes
                 ).astype(jnp.float32)

        # the carried key is replicated across the class axis, so the noise
        # augmentation is identical on every device — the SAME sample, not
        # a decorrelated shard (contrast engine.make_step_fn's psum mode,
        # which folds in the device index because batches differ)
        rng, noise_rng = jax.random.split(state.rng)

        if use_res:
            clip_w_local = residual.adapted_text_weights(state.res_state,
                                                         text_local)
        else:
            clip_w_local = text_local.T                   # (D, K_local)

        # fused clean + noise-augmented forward (engine.py:195-201)
        B = pc.shape[0]
        pc_aug = pc + dc.noise_std * jax.random.normal(noise_rng, pc.shape,
                                                       pc.dtype)
        pc_both = jnp.concatenate([pc, pc_aug], axis=0)
        rgb_both = jnp.concatenate([rgb, rgb], axis=0)
        if shard_encoder:
            # pad the fused batch up to the mesh size so ANY B works —
            # in particular the paper's batch_size-1 protocol
            # (utils/params.py:87), where 2B=2 would otherwise only
            # divide a ≤2-way class mesh (VERDICT r3 weak #6).  Pad rows
            # are zero clouds: the encoder normalisation epsilon keeps
            # them finite and the gather slices them off before use.
            total = 2 * B
            chunk = -(-total // n_shards)
            pad = chunk * n_shards - total
            if pad:
                pc_both = jnp.concatenate(
                    [pc_both, jnp.zeros((pad,) + pc_both.shape[1:],
                                        pc_both.dtype)], axis=0)
                rgb_both = jnp.concatenate(
                    [rgb_both, jnp.zeros((pad,) + rgb_both.shape[1:],
                                         rgb_both.dtype)], axis=0)
            start = jax.lax.axis_index(axis) * chunk
            feat_local = encode(
                params,
                jax.lax.dynamic_slice_in_dim(pc_both, start, chunk, 0),
                jax.lax.dynamic_slice_in_dim(rgb_both, start, chunk, 0))
            feat_both = jax.lax.all_gather(feat_local, axis, axis=0,
                                           tiled=True)[:total]
        else:
            feat_both = encode(params, pc_both, rgb_both)
        feat, feat_aug = feat_both[:B], feat_both[B:]

        # CLIP logits: local column block, gathered, pads sliced off BEFORE
        # any softmax — bitwise the replicated logits
        logits_local = cfg.model.logit_scale * jnp.matmul(
            feat.astype(jnp.float32), clip_w_local, precision=_HIGH)
        clip_logits = jax.lax.all_gather(
            logits_local, axis, axis=1, tiled=True)[:, :num_classes]
        prob_map = jax.nn.softmax(clip_logits, axis=1)
        prob_local = jax.lax.dynamic_slice_in_dim(
            jnp.pad(prob_map, ((0, 0), (0, k_pad - num_classes))),
            offset, k_local, axis=1)

        # mean feature fed to predict (engine.py:209-216)
        m = jnp.mean(feat, axis=0, keepdims=True)
        if dc.fp16_predict_input:
            m = m.astype(jnp.float16).astype(jnp.float32)

        ms = state.method_state
        scores_local = mode_dota.predict(ms, m, dc.epsilon)
        dota_logits = jax.lax.all_gather(
            scores_local, axis, axis=1, tiled=True)[:, :num_classes]

        # streaming EM + noise-augmented double fit: class-row-local, the
        # unchanged mode_dota.fit on this device's block
        ms = mode_dota.fit(ms, feat, prob_local, dc.epsilon)
        ms = mode_dota.fit(ms, feat_aug, prob_local, dc.epsilon)

        res_state = state.res_state
        if use_res:
            def do_opt(rs):
                return residual.optimize_residuals_sharded(
                    rs, text_local, ms, res_opt, dc.epsilon, axis,
                    num_classes, num_steps=dc.residual_steps,
                    precision=res_prec, unroll=dc.residual_unroll)
            res_state = jax.lax.cond(state.step > 0, do_opt,
                                     lambda rs: rs, state.res_state)

        # fusion weight mean(c) over the REAL (K, M) entries (pads masked);
        # psum of block sums == jnp.mean up to reduction order
        c_sum = jax.lax.psum(jnp.sum(ms.c * valid[:, None]), axis)
        w = fusion.dota_fusion_weight(dc.rho, dc.eta,
                                      c_sum / (num_classes * dc.mode_M),
                                      float(B))
        final = fusion.fuse_mode_dota(
            clip_logits, dota_logits, w,
            fix_normalization=dc.fix_fusion_normalization)

        out = engine.StepOutput(final, clip_logits,
                                topk_correct(final, target, (1, 3, 5)))
        return engine.EngineState(ms, res_state, state.step + 1, rng), out

    return step


def _single_forward_preamble(encode, scale: float, axis: str,
                             num_classes: int, n_shards: int,
                             params, text_local, state, batch):
    """Shared preamble of the single-forward EP steps (plain DOTA, GMM,
    adaptive — MODE-DOTA's fused 2-forward step has its own): the
    replicated-batch encode, column-block CLIP logits gathered then
    sliced to the real K, the zero-shot prob_map re-localised to this
    device's class rows (pad columns zero — the masks that freeze pad
    rows), the pad-row validity mask, and the engine's per-step rng
    split (engine.make_step_fn always splits, so the carried key stays
    bitwise the replicated engine's).

    Returns (feat, clip_logits, prob_pad, prob_local, valid, rng)."""
    pc, rgb, _ = batch
    text_local = text_local.astype(jnp.float32)
    k_local = text_local.shape[0]
    k_pad = k_local * n_shards
    offset = jax.lax.axis_index(axis) * k_local
    valid = ((offset + jnp.arange(k_local)) < num_classes
             ).astype(jnp.float32)
    rng, _ = jax.random.split(state.rng)

    feat = encode(params, pc, rgb)
    logits_local = scale * jnp.matmul(
        feat.astype(jnp.float32), text_local.T, precision=_HIGH)
    clip_logits = jax.lax.all_gather(
        logits_local, axis, axis=1, tiled=True)[:, :num_classes]
    prob_map = jax.nn.softmax(clip_logits, axis=1)
    prob_pad = jnp.pad(prob_map, ((0, 0), (0, k_pad - num_classes)))
    prob_local = jax.lax.dynamic_slice_in_dim(prob_pad, offset,
                                              k_local, axis=1)
    return feat, clip_logits, prob_pad, prob_local, valid, rng


def _make_dota_step(cfg: Config, encode: Callable, axis: str,
                    num_classes: int, n_shards: int) -> Callable:
    """Per-sample plain-DOTA step for INSIDE shard_map over the class mesh.

    DOTAState shards by class rows: mu (K_local, D), c (K_local,),
    sigma (K_local, D, D); the shared precision `lam` (D, D), the
    cumulative prior `cum_soft_labels` (1, K_pad), and `prior_step`
    replicate.  fit's soft-label-weighted mean/covariance updates are
    class-row-local (adapt/dota.py:60-110 on the local block, zero prob
    columns freezing the pads); the LDA predict is a column-block matmul
    gathered like the CLIP logits; `update`'s Σ̄ = mean over classes is
    the one genuinely cross-class reduction — a psum of valid-row sums
    (reference semantics dota.py:19-88, Uni_Adapter.py:409-412).
    """
    dc = cfg.dota
    scale = cfg.model.logit_scale

    def step(params, text_local, state: engine.EngineState, batch):
        target = batch[2]
        B = batch[0].shape[0]
        feat, clip_logits, prob_pad, prob_local, valid, rng = \
            _single_forward_preamble(encode, scale, axis, num_classes,
                                     n_shards, params, text_local, state,
                                     batch)

        m = jnp.mean(feat, axis=0, keepdims=True)
        if dc.fp16_predict_input:
            m = m.astype(jnp.float16).astype(jnp.float32)

        ms = state.method_state
        # predict BEFORE fit (engine.py DOTA branch order): dota.predict on
        # the local class-row block (mu local, lam replicated) is the
        # column block of the full LDA scores; prior (replicated cum)
        # applied AFTER the gather
        scores_local = dota_mod.predict(ms, m)
        dota_logits = jax.lax.all_gather(
            scores_local, axis, axis=1, tiled=True)[:, :num_classes]
        if dc.prior_pre_steps is not None:
            prior = (ms.cum_soft_labels[:, :num_classes]
                     + dc.prior_pre_steps / num_classes)
            prior = prior / (dc.prior_pre_steps + ms.prior_step)
            dota_logits = dota_logits + jnp.log(prior + 1e-10)

        # fit: the row-local core on this device's rows with the matching
        # soft-label column slice (adapt/dota.py:fit_rows)
        new_mu, new_c, sigma, _, _ = dota_mod.fit_rows(
            ms.mu, ms.c, ms.sigma, feat, prob_local)
        cum = ms.cum_soft_labels + jnp.sum(prob_pad, axis=0)[None, :]

        # update: Σ̄ over the REAL classes only (pads would drag the mean
        # toward their frozen σ·I init), psum of valid-row block sums
        d = feat.shape[1]
        overall = jax.lax.psum(
            jnp.sum(sigma * valid[:, None, None], axis=0), axis) \
            / num_classes
        reg = (1.0 - dc.epsilon) * overall \
            + dc.epsilon * jnp.eye(d, dtype=jnp.float32)
        lam = jnp.linalg.inv(reg)
        ms = dota_mod.DOTAState(new_mu, new_c, sigma, lam, cum,
                                ms.prior_step + jnp.int32(B))

        c_mean = jax.lax.psum(jnp.sum(new_c * valid), axis) / num_classes
        w = fusion.dota_fusion_weight(dc.rho, dc.eta, c_mean, float(B))
        final = fusion.fuse_dota(clip_logits, dota_logits, w)
        out = engine.StepOutput(final, clip_logits,
                                topk_correct(final, target, (1, 3, 5)))
        return engine.EngineState(ms, state.res_state, state.step + 1,
                                  rng), out

    return step


def _make_gmm_step(cfg: Config, encode: Callable, axis: str,
                   num_classes: int, n_shards: int) -> Callable:
    """Per-sample GMM-DOTA step for INSIDE shard_map over the class mesh.

    GMMDotaState shards by class rows (mu/sigma/sigma_reg (K_local, M, D),
    pi/C (K_local, M), class_counts (K_local,)); `total_samples`
    replicates.  fit's streaming EM normalises responsibilities over modes
    only (adapt/gmm.py:93-125 on the local rows, zero prob columns
    freezing pads); predict's per-class discriminant is a column block,
    with the blended empirical prior's normaliser psum'd over valid rows
    (reference semantics gmm_dota_adaptation_model.py:204-256).

    NOTE the QR-orthonormal mean perturbations at init draw from a
    (K, D, M)-shaped normal and the soft-count init is 1/(K·M) — a
    PADDED-shape draw produces different values on the real rows, so
    run_stream_ep splices an UNPADDED init over them (its fresh-init
    path) and run_streams_ep's per-block init redoes the real-K draw
    inside shard_map (_init_local_state's GMM branch).
    """
    dc = cfg.dota
    scale = cfg.model.logit_scale

    def step(params, text_local, state: engine.EngineState, batch):
        target = batch[2]
        B = batch[0].shape[0]
        feat, clip_logits, _, prob_local, valid, rng = \
            _single_forward_preamble(encode, scale, axis, num_classes,
                                     n_shards, params, text_local, state,
                                     batch)

        ms = state.method_state
        # predict BEFORE fit (engine.py GMM branch order): the per-class
        # discriminant is a row block of gmm.predict — only the blended
        # prior's normaliser crosses classes, psum'd over valid rows and
        # injected into the one source of truth (adapt/gmm.predict)
        total_counts = jax.lax.psum(jnp.sum(ms.class_counts * valid), axis)
        scores_local = gmm_mod.predict(
            ms, jnp.mean(feat, axis=0, keepdims=True),
            alpha_max=dc.alpha_max, num_classes=num_classes,
            total_counts=total_counts)
        gmm_logits = jax.lax.all_gather(
            scores_local, axis, axis=1, tiled=True)[:, :num_classes]

        ms = gmm_mod.fit(ms, feat, prob_local)
        ms = gmm_mod.update(ms, dc.epsilon)

        c_mean = jax.lax.psum(jnp.sum(ms.C.sum(axis=1) * valid), axis) \
            / num_classes
        w = fusion.dota_fusion_weight(dc.rho, dc.eta, c_mean, float(B))
        final = fusion.fuse_mode_dota(
            clip_logits, gmm_logits, w,
            fix_normalization=dc.fix_fusion_normalization)
        out = engine.StepOutput(final, clip_logits,
                                topk_correct(final, target, (1, 3, 5)))
        return engine.EngineState(ms, state.res_state, state.step + 1,
                                  rng), out

    return step


def _make_adaptive_step(cfg: Config, encode: Callable, axis: str,
                        num_classes: int, n_shards: int) -> Callable:
    """Per-sample adaptive-modes step for INSIDE shard_map over the class
    mesh.

    AdaptiveState shards by class rows (mu/var (K_local, Mmax, D),
    pi/c/mask (K_local, Mmax), class_counts (K_local,)); the t/fit_calls
    scalars replicate, so the 50-fit split-check cond fires identically
    on every device.  fit's masked EM and check_and_split's masked
    scatter are class-row-local (adapt/adaptive.py:94-194 — the split
    collect/execute protocol never crosses class rows); predict carries
    no cross-class term in the engine protocol (source_priors=None,
    engine.py adaptive branch).  Pad rows stay inert: zero prob columns
    give zero sufficient statistics, and their slot-0 variance only
    shrinks (never crosses the split threshold).

    Reference semantics: dota_mixture_adaptive.py:7-438.
    """
    dc = cfg.dota
    scale = cfg.model.logit_scale

    def step(params, text_local, state: engine.EngineState, batch):
        target = batch[2]
        B = batch[0].shape[0]
        feat, clip_logits, _, prob_local, valid, rng = \
            _single_forward_preamble(encode, scale, axis, num_classes,
                                     n_shards, params, text_local, state,
                                     batch)

        ms = state.method_state
        sigma_init = adaptive_mod.resolve_sigma_init(
            dc.sigma, feat.shape[1])
        # predict BEFORE fit (engine.py adaptive branch order): the masked
        # logsumexp class scores are a row block, gathered then sliced
        m = jnp.mean(feat, axis=0, keepdims=True)
        scores_local = adaptive_mod.predict(ms, m, dc.epsilon)
        ad_logits = jax.lax.all_gather(
            scores_local, axis, axis=1, tiled=True)[:, :num_classes]

        ms = adaptive_mod.fit(ms, feat, prob_local, dc.epsilon,
                              split_threshold=10.0 * sigma_init)

        c_mean = jax.lax.psum(jnp.sum(ms.c * valid[:, None]), axis) \
            / (num_classes * ms.c.shape[1])
        w = fusion.dota_fusion_weight(dc.rho, dc.eta, c_mean, float(B))
        final = fusion.fuse_mode_dota(
            clip_logits, ad_logits, w,
            fix_normalization=dc.fix_fusion_normalization)
        out = engine.StepOutput(final, clip_logits,
                                topk_correct(final, target, (1, 3, 5)))
        return engine.EngineState(ms, state.res_state, state.step + 1,
                                  rng), out

    return step


def _make_cache_step(cfg: Config, encode: Callable, axis: str,
                     num_classes: int, n_shards: int) -> Callable:
    """Per-sample cache step for INSIDE shard_map over the class mesh.

    The CacheState shards by its leading class axis: each device holds its
    (K_local, C, ·) block — feats/conf/counts/valid row-local, the probs
    leaf (K_local, C, K_pad) keeping the FULL padded class-probability
    vector per prototype (its last axis is what predict reads, not a
    shardable node axis).  The per-step collectives are tiny: the gathered
    (1, K) clip logits, a handful of psums for the insert-or-merge
    (exactly one device owns the predicted row, so each psum has a single
    non-zero contribution and is bitwise the owner's value), and the
    refinement's gathered CG vectors.  What divides by n_shards is the
    K-proportional work: the prototype collapse, the (rows, N) adjacency
    build, and the CG matvec (reference semantics
    Uni_Adapter.py:78-189, utils/math_utils.py:21-110).
    """
    cc = cfg.cache
    scale = cfg.model.logit_scale

    def step(params, text_local, state: engine.EngineState, batch):
        pc, rgb, target = batch
        if pc.shape[0] != 1:
            raise ValueError(
                f"the prototype-cache path requires batch_size=1 "
                f"(got {pc.shape[0]}); see adapt/cache.py docstring")
        text_local = text_local.astype(jnp.float32)
        k_local = text_local.shape[0]
        k_pad = k_local * n_shards
        rng, _ = jax.random.split(state.rng)
        clip_w_local = text_local.T                      # (D, K_local)

        feat = encode(params, pc, rgb)                   # (1, D)
        logits_local = scale * jnp.matmul(
            feat.astype(jnp.float32), clip_w_local, precision=_HIGH)
        clip_logits = jax.lax.all_gather(
            logits_local, axis, axis=1, tiled=True)[:, :num_classes]
        ent = softmax_entropy(clip_logits)
        prob_map = jax.nn.softmax(clip_logits, axis=1)
        pred = jnp.argmax(clip_logits[0]).astype(jnp.int32)
        prop_ent = normalized_entropy(ent, num_classes)[0]

        ms = _ep_update_cache(state.method_state, axis, pred, feat,
                              prop_ent, prob_map, clip_w_local,
                              num_classes, k_pad, beta=cc.beta,
                              logit_scale=scale)
        cache_logits = _ep_cache_logits(feat, ms, axis, num_classes,
                                        cc.threshold, cc.lambda_reg,
                                        cc.use_new_approximation,
                                        cc.cg_max_iter, cc.graph_mode)
        final = fusion.fuse_cache(clip_logits, cache_logits,
                                  logit_scale=scale)
        out = engine.StepOutput(final, clip_logits,
                                topk_correct(final, target, (1, 3, 5)))
        return engine.EngineState(ms, state.res_state, state.step + 1,
                                  rng), out

    return step


def _ep_update_cache(s: "cache_mod.CacheState", axis: str, pred, feat,
                     prop_ent, prob_map, clip_w_local, num_classes: int,
                     k_pad: int, beta: float, logit_scale: float):
    """Collective insert-or-merge on the class-sharded cache
    (adapt/cache.py:update_cache re-derived for SPMD).

    Exactly one device owns the predicted class row.  Because collectives
    may not diverge across devices, the owner's row quantities broadcast
    via owner-masked psums (single non-zero term ⇒ bitwise the owner's
    value, no reduction reorder) and every device computes the merge
    arithmetic on identical replicated scalars; only the final row write
    is owner-masked.  The merged prototype's probs re-derive from its
    gathered full-K logits, mirroring the replicated path's
    `logits = scale·f@W` over all classes (Uni_Adapter.py:106-108).
    """
    k_local, C = s.conf.shape
    offset = jax.lax.axis_index(axis) * k_local
    in_block = (pred >= offset) & (pred < offset + k_local)
    o = in_block.astype(jnp.float32)
    lp = jnp.clip(pred - offset, 0, k_local - 1)

    confidence = jnp.exp(-beta * prop_ent)
    feat0 = feat[0].astype(jnp.float32)                  # (D,)
    prob_pad = jnp.pad(prob_map[0].astype(jnp.float32),
                       (0, k_pad - num_classes))         # (K_pad,)

    n_valid = jax.lax.psum(o * jnp.sum(s.valid[lp].astype(jnp.float32)),
                           axis).astype(jnp.int32)
    has_room = n_valid < C

    def insert_vals(_):
        return (n_valid, feat0, confidence, prob_pad,
                jnp.float32(1.0))

    def merge_vals(_):
        # owner's merge candidate (garbage on non-owners, masked by o);
        # has_room is replicated across the mesh, so every device takes
        # this branch together and the collectives stay uniform (same
        # replicated-predicate pattern as the residual do_opt cond).
        # On the unvmapped run_stream_ep/serving path insert steps (the
        # whole warm-up) skip these collectives entirely; under
        # run_streams_ep the step is vmapped and lax.cond lowers to
        # both-branch execution, so they run every step there (uniformly
        # on every device — correct, just not skipped)
        sims = jax.lax.psum(
            o * jnp.matmul(s.feats[lp], feat0, precision=_HIGH),
            axis)                                              # (C,)
        m = jnp.argmax(sims).astype(n_valid.dtype)
        feat_c = jax.lax.psum(o * s.feats[lp, m], axis)
        conf_c = jax.lax.psum(o * s.conf[lp, m], axis)
        count_c = jax.lax.psum(o * s.counts[lp, m], axis)

        # confidence-count-weighted running mean with the same underflow
        # guard as adapt/cache.py:update_cache
        denom = count_c * conf_c + confidence
        weighted = (conf_c * count_c * feat_c + confidence * feat0) / \
            jnp.where(denom > 0.0, denom, 1.0)
        new_feat = jnp.where(denom > 0.0, weighted,
                             (count_c * feat_c + feat0) / (count_c + 1.0))
        new_feat = new_feat / (jnp.linalg.norm(new_feat) + 1e-12)
        lg_local = logit_scale * jnp.matmul(new_feat[None], clip_w_local,
                                            precision=_HIGH)
        lg = jax.lax.all_gather(lg_local, axis, axis=1,
                                tiled=True)[:, :num_classes]
        new_prob = jnp.pad(jax.nn.softmax(lg, axis=1)[0],
                           (0, k_pad - num_classes))
        new_pent = normalized_entropy(softmax_entropy(lg), num_classes)[0]
        new_conf = jnp.exp(-beta * new_pent)
        return m, new_feat, new_conf, new_prob, count_c + 1.0

    slot, w_feat, w_conf, w_prob, w_count = jax.lax.cond(
        has_room, insert_vals, merge_vals, None)

    def owner_write(arr, val):
        return jnp.where(in_block, arr.at[lp, slot].set(val), arr)

    return cache_mod.CacheState(
        feats=owner_write(s.feats, w_feat),
        conf=owner_write(s.conf, w_conf),
        probs=owner_write(s.probs, w_prob),
        counts=owner_write(s.counts, w_count),
        valid=owner_write(s.valid, True),
    )


def _sharded_refinement(nodes_local, probs_local, valid_local, axis: str,
                        threshold: float, lambda_reg: float,
                        use_new_approximation: bool, max_iter: int):
    """Row-sharded graph-Laplacian label refinement.

    Each device owns a contiguous block of graph nodes.  The adjacency
    rows W_local = normed_local @ normed_fullᵀ and the CG matvec are the
    N²-proportional work — they divide over the mesh; the CG state
    (x, r, p — (N, K) vectors) stays replicated, so alpha/beta and the
    while_loop trip count are identical on every device.  Per-row dot
    products equal the replicated _masked_laplacian's rows, so the
    refinement matches utils/math.online_value_refinement_new to float
    roundoff.  Returns the FULL (N, K) refined matrix (replicated).
    """
    n_local, D = nodes_local.shape
    offset = jax.lax.axis_index(axis) * n_local
    n_total = n_local * jax.lax.psum(1, axis)

    normed_local = nodes_local / (jnp.linalg.norm(
        nodes_local, axis=1, keepdims=True) + 1e-12)
    normed_full = jax.lax.all_gather(normed_local, axis, axis=0,
                                     tiled=True)          # (N, D)
    vmask_local = valid_local.astype(jnp.float32)
    vmask_full = jax.lax.all_gather(vmask_local, axis, axis=0, tiled=True)

    W_local = jnp.matmul(normed_local, normed_full.T, precision=_HIGH)
    W_local = jnp.where(W_local < threshold, 0.0, W_local)
    W_local = W_local * vmask_local[:, None] * vmask_full[None, :]
    deg_local = W_local.sum(axis=1)
    deg_full = jax.lax.all_gather(deg_local, axis, axis=0, tiled=True)
    dis_full = 1.0 / (jnp.sqrt(deg_full) + 1e-8)
    dis_local = jax.lax.dynamic_slice_in_dim(dis_full, offset, n_local, 0)
    I_local = jax.nn.one_hot(offset + jnp.arange(n_local), n_total,
                             dtype=W_local.dtype)
    L_local = I_local - dis_local[:, None] * W_local * dis_full[None, :]
    A_local = (L_local + 2.0 * lambda_reg * I_local).astype(jnp.float32)

    probs_masked = probs_local * vmask_local[:, None]
    b_full = 2.0 * lambda_reg * jax.lax.all_gather(
        probs_masked, axis, axis=0, tiled=True)           # (N, K)

    if use_new_approximation:
        def matvec(p):
            return jax.lax.all_gather(
                jnp.matmul(A_local, p, precision=_HIGH), axis, axis=0,
                tiled=True)

        sol = conjugate_gradient(matvec, b_full, max_iter=max_iter)
    else:
        # 'old' explicit-solve presets: gather the full system — it only
        # runs where the per-dataset tables choose it (small graphs)
        A_full = jax.lax.all_gather(A_local, axis, axis=0, tiled=True)
        sol = jnp.linalg.solve(A_full, b_full)
    sol = sol / (sol.sum(axis=1, keepdims=True) + 1e-12)
    return sol * vmask_full[:, None]


def _ep_cache_logits(pc_features, s: "cache_mod.CacheState", axis: str,
                     num_classes: int, threshold: float, lambda_reg: float,
                     use_new_approximation: bool, cg_max_iter: int,
                     graph_mode: str):
    """Class-sharded compute_cache_logits (adapt/cache.py:135-260).

    graph_mode resolves on the GLOBAL node count (same dense↔prototype
    switch point as the replicated path).  Node rows — prototype collapse,
    refinement, affinity — are row-local; the readout's count-normalise
    and the (B, K) logits psum over the node blocks.
    """
    k_local, C, D = s.feats.shape
    if graph_mode == "auto":
        graph_mode = "dense" if num_classes * C <= 4096 else "prototype"

    if graph_mode == "prototype":
        w = s.conf * s.valid.astype(jnp.float32)            # (K_local, C)
        wsum = w.sum(axis=1, keepdims=True)
        vmask = s.valid.astype(jnp.float32)
        w = jnp.where(wsum > 0.0, w, vmask)
        wsum = w.sum(axis=1, keepdims=True)
        w = w / jnp.maximum(wsum, 1e-30)
        nodes_local = jnp.einsum("kc,kcd->kd", w, s.feats, precision=_HIGH)
        nodes_local = nodes_local / (jnp.linalg.norm(
            nodes_local, axis=1, keepdims=True) + 1e-12)
        probs_local = jnp.einsum("kc,kcp->kp", w, s.probs,
                                 precision=_HIGH)[:, :num_classes]
        valid_local = s.valid.any(axis=1)
        n_local = k_local
    elif graph_mode == "dense":
        nodes_local = s.feats.reshape(k_local * C, D)
        probs_local = s.probs.reshape(k_local * C, -1)[:, :num_classes]
        valid_local = s.valid.reshape(k_local * C)
        n_local = k_local * C
    else:
        raise ValueError(f"unknown graph_mode {graph_mode!r} "
                         "(expected 'auto', 'dense', or 'prototype')")

    refined_full = _sharded_refinement(
        nodes_local, probs_local, valid_local, axis, threshold, lambda_reg,
        use_new_approximation, cg_max_iter)                 # (N, K)
    offset = jax.lax.axis_index(axis) * n_local
    refined_local = jax.lax.dynamic_slice_in_dim(refined_full, offset,
                                                 n_local, 0)

    # _graph_readout, block-distributed: values count-normalise over ALL
    # nodes; the affinity contraction psums over the node blocks
    new_classes = jnp.argmax(refined_local, axis=1)
    values = jax.nn.one_hot(new_classes, num_classes, dtype=jnp.float32)
    values = values * valid_local[:, None].astype(jnp.float32)
    cache_counts = jax.lax.psum(values.sum(axis=0), axis) + 1e-6
    values = values / cache_counts

    pc = pc_features / (jnp.linalg.norm(pc_features, axis=-1,
                                        keepdims=True) + 1e-12)
    affinity = jnp.matmul(pc.astype(jnp.float32), nodes_local.T,
                          precision=_HIGH)
    affinity = affinity * valid_local[None, :].astype(jnp.float32)
    return jax.lax.psum(jnp.matmul(affinity, values, precision=_HIGH),
                        axis)


#: leaves that replicate across the class mesh despite being arrays: the
#: PRNG key (matched by path — its (2,) shape could collide with a tiny
#: K_local), plain DOTA's shared precision (D, D), and its cumulative
#: prior (1, K_pad — class axis trailing, not leading)
_REPLICATED_NAMES = frozenset({"rng", "lam", "cum_soft_labels"})


def _path_name(entry) -> str:
    """Exact field/key name of one tree-path entry (GetAttrKey.name,
    DictKey.key, FlattenedIndexKey/SequenceKey have none).  Exact-segment
    matching, NOT substring containment of keystr: a future field whose
    path merely CONTAINS a token ('lam_inv', 'prng') must not silently
    classify as replicated."""
    for attr in ("name", "key"):
        v = getattr(entry, attr, None)
        if isinstance(v, str):
            return v
    return ""


def _is_replicated_path(path) -> bool:
    return any(_path_name(e) in _REPLICATED_NAMES for e in path)


def _is_class_leaf(path, leaf) -> bool:
    """K-leading leaves shard over the class axis; scalars (step, t, Adam
    count) and the _REPLICATED_NAMES leaves replicate."""
    return leaf.ndim > 0 and not _is_replicated_path(path)


def _has_padded_class_tail(path) -> bool:
    """Leaves whose TRAILING axis carries the padded class dimension: the
    cache probs (K, C, K_pad) and DOTA's cum_soft_labels (1, K_pad).
    They pad/strip on splice/return alongside the anchors."""
    return any(_path_name(e) in ("probs", "cum_soft_labels") for e in path)


def _init_local_state(cfg: Config, text_local, rng, k_pad: int,
                      axis: Optional[str] = None,
                      num_classes: Optional[int] = None):
    """init_state on a LOCAL class block (inside shard_map): trailing
    class axes (cache probs, DOTA cum prior) must still span the full
    padded class dimension.

    For GMM-DOTA the local init must also reproduce the replicated
    engine's FULL-K init values on its rows: the QR mean-perturbation
    draw is (K, D, M)-shaped and the soft-count init is 1/(K·M)
    (adapt/gmm.init) — both depend on the real K, so a local-shape
    redraw would diverge from the replicated trajectory at step 0.
    Pass `axis`/`num_classes` inside shard_map to enable that branch
    (the eval_shape template path omits them; shapes are unaffected).
    """
    st = engine.init_state(cfg, text_local, rng)
    ms = st.method_state
    if isinstance(ms, cache_mod.CacheState):
        k_local, C = ms.conf.shape
        ms = ms._replace(probs=jnp.zeros((k_local, C, k_pad), jnp.float32))
        st = engine.EngineState(ms, st.res_state, st.step, st.rng)
    elif isinstance(ms, dota_mod.DOTAState):
        ms = ms._replace(
            cum_soft_labels=jnp.zeros((1, k_pad), jnp.float32))
        st = engine.EngineState(ms, st.res_state, st.step, st.rng)
    elif isinstance(ms, gmm_mod.GMMDotaState) and axis is not None:
        K = num_classes
        k_local, M, Dm = ms.mu.shape
        # engine.init_state's split order: carry = split[0], init draw
        # = split[1] (engine.py GMM branch) — st.rng already carries
        # split[0]; redo the draw at the REAL K and take this device's
        # row block (pad rows beyond K get a zero perturbation — frozen
        # unit-anchor Gaussians, never scored)
        init_rng = jax.random.split(rng)[1]
        if M > 1 and Dm >= M:
            rv = jax.random.normal(init_rng, (K, Dm, M))
            q, _ = jnp.linalg.qr(rv)
            ortho = jnp.swapaxes(q, 1, 2)              # (K, M, D)
        else:
            rv = jax.random.normal(init_rng, (K, M, Dm))
            ortho = rv / (jnp.linalg.norm(rv, axis=-1, keepdims=True)
                          + 1e-12)
        ortho = jnp.pad(ortho, ((0, k_pad - K), (0, 0), (0, 0)))
        offset = jax.lax.axis_index(axis) * k_local
        ortho_local = jax.lax.dynamic_slice_in_dim(ortho, offset,
                                                   k_local, axis=0)
        # 0.01 = gmm.init's perturbation_scale default (the engine does
        # not override it)
        mu = text_local.astype(jnp.float32)[:, None, :] + 0.01 * ortho_local
        ms = ms._replace(
            mu=mu, C=jnp.full((k_local, M), 1.0 / (K * M), jnp.float32))
        st = engine.EngineState(ms, st.res_state, st.step, st.rng)
    return st


def _is_stacked_class_leaf(path, leaf) -> bool:
    """Same, one vmapped stream axis in front (run_streams_ep): class
    leaves are (C_local, K_local, ...); per-stream scalars/keys are
    (C_local,) or (C_local, 2); the replicated-by-name leaves (lam, cum
    prior) carry the stream axis only."""
    return leaf.ndim > 1 and not _is_replicated_path(path)


def make_padded_state(cfg: Config, text, text_pad, rng,
                      initial_state: Optional[engine.EngineState] = None
                      ) -> engine.EngineState:
    """Padded-K_pad EngineState ready to shard over the class mesh.

    A fresh init on the padded anchors covers the frozen pad rows; the
    REAL rows always splice in from either the caller's full-K resume
    carry or a fresh UNPADDED init — the latter keeps rng-consuming
    inits (GMM's (K, D, M) QR draw) bitwise the replicated engine's (a
    padded-shape draw produces different values on the real rows;
    row-deterministic inits are unaffected).  Trailing-class-axis leaves
    (cache probs, DOTA cum prior) re-pad their last axis on splice.
    """
    text = jnp.asarray(text)
    K = text.shape[0]
    state0 = engine.init_state(cfg, jnp.asarray(text_pad), rng)
    if initial_state is None:
        initial_state = engine.init_state(cfg, text, rng)

    def _splice(p, init_l, given_l):
        g = jnp.asarray(given_l)
        if _has_padded_class_tail(p) and \
                g.shape[-1] != init_l.shape[-1]:
            # full-K carry → re-pad the trailing class axis
            pad = [(0, 0)] * (g.ndim - 1) \
                + [(0, init_l.shape[-1] - g.shape[-1])]
            g = jnp.pad(g, pad)
        if not _is_class_leaf(p, init_l):
            return g
        return jnp.concatenate([g, init_l[K:]], axis=0)

    return jax.tree_util.tree_map_with_path(_splice, state0, initial_state)


def strip_padded_state(state: engine.EngineState,
                       num_classes: int) -> engine.EngineState:
    """Strip the frozen pad-class rows back off: class leaves slice their
    leading axis to K; trailing-class-axis leaves slice their last axis
    too.  The result is a full-K state interchangeable with the
    replicated engine's (resume, checkpointing, cross-mesh moves)."""
    K = num_classes

    def _strip(p, l):
        if _is_class_leaf(p, l):
            l = l[:K]
        return l[..., :K] if _has_padded_class_tail(p) else l

    return jax.tree_util.tree_map_with_path(_strip, state)


def state_partition_specs(state, axis: str):
    """PartitionSpecs mirroring the EngineState pytree: class-block leaves
    live sharded as global (K_pad, ...) arrays, scalars/keys replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda p, l: P(axis) if _is_class_leaf(p, l) else P(), state)


def run_streams_ep(cfg: Config, model, params, text_features_initial,
                   pcs, rgbs, targets, mesh: Mesh, data_axis: str = "data",
                   classes_axis: str = "classes", seed: int = 42,
                   shard_encoder: bool = False):
    """DP × EP: independent STREAMS sharded over `data_axis`, the
    adaptation class state (any method — see make_ep_step_fn) sharded
    over `classes_axis` — shard_map(vmap(scan)) on a 2-D mesh.  The realistic Objaverse-LVIS deployment of the benchmark
    sweep: the 15 corruption streams scale across one axis exactly like
    mesh.run_streams_sharded (same per-stream seeds), while each stream's
    K-proportional adaptation work divides over the other.

    Args:
      pcs: (C, T, B, N, 3); rgbs likewise; targets: (C, T, B).  C must be
        a multiple of the data-axis size.
      shard_encoder: forward make_ep_step_fn's encoder-sharding lever —
        each class-axis device encodes ceil(2B/n_cls) rows of the
        (zero-padded) fused batch.
    Returns:
      (stacked final EngineStates with leading C axis and full-K class
       leaves, summary dict with per-stream acc1).
    """
    assert {data_axis, classes_axis} <= set(mesh.axis_names), mesh
    n_data = mesh.shape[data_axis]
    n_cls = mesh.shape[classes_axis]
    C, T, B = pcs.shape[0], pcs.shape[1], pcs.shape[2]
    if C % n_data:
        raise ValueError(f"stream count {C} must divide over the "
                         f"{n_data}-device data axis")
    text = np.asarray(text_features_initial, np.float32)
    K = text.shape[0]
    text_pad, k_pad = pad_classes(text, n_cls)
    step = make_ep_step_fn(cfg, model, classes_axis, K, n_cls,
                           shard_encoder=shard_encoder)
    # per-stream seeds match engine.init_states_vmapped / run_streams_sharded
    keys = jnp.stack([jax.random.PRNGKey(seed + i) for i in range(C)])

    def body(params, text_local, keys_c, pcs_c, rgbs_c, tgts_c):
        # local block: (C/n_data, T, ...) streams × (K_pad/n_cls) classes
        states = jax.vmap(
            lambda r: _init_local_state(cfg, text_local, r, k_pad,
                                        axis=classes_axis,
                                        num_classes=K))(keys_c)
        tf = lambda a: jnp.swapaxes(a, 0, 1)                # time leads

        def scan_body(states, batch):
            return jax.vmap(step, in_axes=(None, None, 0, 0))(
                params, text_local, states, batch)

        states, outs = jax.lax.scan(
            scan_body, states, (tf(pcs_c), tf(rgbs_c), tf(tgts_c)))
        correct = jnp.sum(outs.correct, axis=0)             # (C/n_data, 3)
        # replicated over classes already (identical math on gathered
        # logits); gather the tiny counters over the data axis so they
        # come back fully replicated (host-fetchable)
        correct = jax.lax.all_gather(correct, data_axis,
                                     axis=0, tiled=True)
        return states, correct

    template = jax.eval_shape(
        lambda: jax.vmap(lambda r: _init_local_state(
            cfg, jnp.zeros((k_pad // n_cls, text.shape[1]), jnp.float32),
            r, k_pad))(keys[:C // n_data]))
    # stacked states: axis 0 is the stream block (data axis), axis 1 the
    # class block for K-leading leaves; per-stream keys/scalars carry the
    # stream axis only
    state_specs = jax.tree_util.tree_map_with_path(
        lambda p, l: (P(data_axis, classes_axis)
                      if _is_stacked_class_leaf(p, l) else P(data_axis)),
        template)

    body_fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(classes_axis), P(data_axis), P(data_axis),
                  P(data_axis), P(data_axis)),
        out_specs=(state_specs, P()), check_vma=False))
    states, correct = body_fn(params, jnp.asarray(text_pad), keys,
                              jnp.asarray(pcs), jnp.asarray(rgbs),
                              jnp.asarray(targets))
    # strip pad classes (leaf axis 1 for class leaves; trailing-class-axis
    # leaves — cache probs, DOTA cum prior — also slice their last axis)
    def _strip_stacked(p, l):
        if _is_stacked_class_leaf(p, l):
            l = l[:, :K]
        return l[..., :K] if _has_padded_class_tail(p) else l

    states = jax.tree_util.tree_map_with_path(_strip_stacked, states)

    correct = np.asarray(correct)                           # (C, 3)
    n_samples = T * B
    summary = {
        "acc1_per_stream": (100.0 * correct[:, 0] / n_samples).tolist(),
        "acc1": float(100.0 * correct[:, 0].sum() / (C * n_samples)),
        "acc3": float(100.0 * correct[:, 1].sum() / (C * n_samples)),
        "acc5": float(100.0 * correct[:, 2].sum() / (C * n_samples)),
        "n_samples": C * n_samples, "n_class_shards": n_cls,
        "padded_classes": k_pad - K,
    }
    return states, summary


def run_stream_ep(cfg: Config, model, params, text_features_initial,
                  pcs, rgbs, targets, mesh: Optional[Mesh] = None,
                  seed: int = 42,
                  initial_state: Optional[engine.EngineState] = None,
                  shard_encoder: bool = False,
                  encode_fn: Optional[Callable] = None,
                  classes_axis: Optional[str] = None):
    """Run the stream with the adaptation state class-sharded over the mesh
    (MODE-DOTA or the prototype cache — see make_ep_step_fn).

    The batch is replicated — same adaptation ORDER as the single-device
    run (one step consumes one stream step), with the K-proportional work
    divided over devices.  Returns (EngineState with full-K leaves on the
    host, summary dict), matching run_stream_scan's trajectory to float
    roundoff (see module docstring).

    Args:
      pcs: (T, B, N, 3); rgbs likewise; targets: (T, B).
      initial_state: resume the adaptation trajectory from this FULL-K
        carry (as returned by this function or by the replicated engine —
        continual TTA / elastic resume, mirroring run_stream_scan); the
        class leaves re-shard over the mesh, pad classes re-init frozen.
      encode_fn / classes_axis: EP × trunk-parallel composition on a 2-D
        (classes, model) mesh: pass parallel/tp.make_tp_encode_fn's encode
        (built on THIS mesh with its model axis) plus TP-prepared params,
        and name `classes_axis`.  The shard_map then goes PARTIAL-manual —
        manual over classes, the model axis automatic — and GSPMD inserts
        the Megatron all-reduces inside the per-step trunk forward (the
        same partial-manual pattern as parallel/pp.py's PP × TP).  PP/SP
        trunks are themselves shard_map-based and cannot nest here; use
        TP for the trunk leg.
    """
    mesh = mesh or make_classes_mesh()
    axis = classes_axis or mesh.axis_names[0]
    n = mesh.shape[axis]
    text = np.asarray(text_features_initial, np.float32)
    K = text.shape[0]
    text_pad, k_pad = pad_classes(text, n)
    step = make_ep_step_fn(cfg, model, axis, K, n,
                           shard_encoder=shard_encoder,
                           encode_fn=encode_fn)

    def body(params, text_local, state, pcs, rgbs, tgts):
        state, outs = jax.lax.scan(
            lambda s, b: step(params, text_local, s, b), state,
            (pcs, rgbs, tgts))
        return state, jnp.sum(outs.correct, axis=0), outs.final_logits

    state0 = make_padded_state(cfg, text, text_pad,
                               jax.random.PRNGKey(seed),
                               initial_state=initial_state)
    state_specs = state_partition_specs(state0, axis)

    # partial-manual when the mesh carries extra (trunk) axes: manual over
    # classes, the rest automatic for GSPMD (the TP trunk's constraints)
    extra = ({"axis_names": {axis}} if len(mesh.axis_names) > 1 else {})
    body_fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), state_specs, P(), P(), P()),
        out_specs=(state_specs, P(), P()), check_vma=False, **extra))
    state, correct, _ = body_fn(params, jnp.asarray(text_pad), state0,
                                jnp.asarray(pcs), jnp.asarray(rgbs),
                                jnp.asarray(targets))

    state = strip_padded_state(state, K)

    correct = np.asarray(correct)                 # replicated across the mesh
    n_samples = pcs.shape[0] * pcs.shape[1]
    summary = {"acc1": 100.0 * correct[0] / n_samples,
               "acc3": 100.0 * correct[1] / n_samples,
               "acc5": 100.0 * correct[2] / n_samples,
               "n_samples": n_samples, "n_class_shards": n,
               "padded_classes": k_pad - K}
    return state, summary
