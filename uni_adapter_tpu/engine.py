"""TTA engine: the online adaptation loop as a jit-compiled scan.

Rebuild of the reference's `test_zeroshot_3d_core` (Uni_Adapter.py:272-595)
with the idiomatic JAX shape (SURVEY.md §7 architecture stance):

  * the frozen encoder forward is a pure function of (params, batch);
  * ALL adaptation state — mixture parameters, residuals + Adam moments,
    prototype cache, PRNG key, step counter — is one explicit pytree carry;
  * one stream step is a pure `(params, text, carry, batch) -> (carry,
    outputs)` function, so the whole corruption stream runs as a single
    `jax.lax.scan` entirely on-device (`run_stream_scan`), or step-by-step
    from a host iterator (`run_stream`) with identical numerics.

Model parameters and text anchors are ARGUMENTS of every jitted function,
never Python closures: a closed-over concrete array is baked into the
program as a constant, and a 300M-parameter constant makes compilation
pathological (measured: 13s as an argument vs minutes/hang as a closure on
the v5e tunnel).

The three mutually exclusive adaptation mechanisms keep the reference's
dispatch (Uni_Adapter.py:409-574): DOTA, MODE-DOTA (+ optional text-residual
learning and noise-augmented double fit), the present-but-unwired GMM /
adaptive variants, or the Uni-Adapter prototype cache with graph refinement.
Reference bugs consciously resolved (SURVEY.md §7 hard part 6) are handled
in adapt/fusion.py and documented there.
"""
from __future__ import annotations


import logging
import os
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uni_adapter_tpu.adapt import adaptive as adaptive_mod
from uni_adapter_tpu.adapt import cache as cache_mod
from uni_adapter_tpu.adapt import dota, fusion, gmm, mode_dota, residual
from uni_adapter_tpu.config import Config
from uni_adapter_tpu.utils.math import normalized_entropy, softmax_entropy
from uni_adapter_tpu.utils.metrics import topk_correct

_HIGH = jax.lax.Precision.HIGHEST


class EngineState(NamedTuple):
    """The full adaptation carry — a pytree, trivially checkpointable."""
    method_state: Any                 # DOTAState | ModeDotaState | CacheState
    res_state: Optional[residual.ResidualState]
    step: jax.Array                   # () int32
    rng: jax.Array                    # PRNG key


class StepOutput(NamedTuple):
    final_logits: jax.Array           # (B, K)
    clip_logits: jax.Array            # (B, K)
    correct: jax.Array                # (3,) top-1/3/5 correct counts
    # frozen-anchor top-1/3/5 counts from the SAME forward: the zero-shot
    # baseline every adapted accuracy should be read against (the
    # reference has no such in-run readout; real-weight validation wants
    # zero-shot and adapted per corruption in ONE run).  None on the
    # parallel EP/mesh paths (replicated engine only).
    zs_correct: Optional[jax.Array] = None


def encode_with(kind: str, apply_fn: Callable) -> Callable:
    """Per-backbone encode over any raw forward `apply_fn(params, *inputs)`:
    (params, pc, rgb) -> L2-normalised (B, D).

    Mirrors get_logits_wrapper's input conventions (Uni_Adapter.py:53-67):
    uni3d consumes xyz‖color, ulip xyz only, openshape (xyz, xyz‖color).
    The single home of this dispatch and the normalisation epsilon —
    alternate forwards (TP/PP pipelines) plug in via `apply_fn` so they
    cannot drift from the plain path.
    """
    def encode(params, pc: jax.Array, rgb: jax.Array) -> jax.Array:
        if kind == "uni3d":
            feat = apply_fn(params, jnp.concatenate([pc, rgb], axis=-1))
        elif kind == "ulip":
            feat = apply_fn(params, pc)
        elif kind == "openshape":
            feature = jnp.concatenate([pc, rgb], axis=-1)
            feat = apply_fn(params, pc, feature)
        else:
            raise ValueError(kind)
        return feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-12)

    return encode


def make_encode_fn(cfg: Config, model) -> Callable:
    """Model-dispatch forward: (params, pc, rgb) -> L2-normalised (B, D)."""
    return encode_with(cfg.model.vlm3d, model.apply)


def clip_logits_from(feat: jax.Array, clip_weights: jax.Array,
                     scale: float = 100.0):
    """logits = scale·f@W plus entropy / prob / pred
    (reference Uni_Adapter.py:53-75; 100× at :57, 40× in the older loop
    Uni_Adapter copy.py:57)."""
    logits = scale * jnp.matmul(feat.astype(jnp.float32), clip_weights,
                                precision=_HIGH)
    ent = softmax_entropy(logits)
    prob_map = jax.nn.softmax(logits, axis=1)
    pred = jnp.argmax(logits[0]).astype(jnp.int32)   # batch-1 cache semantics
    return logits, ent, prob_map, pred


def init_state(cfg: Config, text_features_initial: jax.Array,
               rng: jax.Array) -> EngineState:
    """Initialise the adaptation carry (Uni_Adapter.py:323-361).

    Args:
      text_features_initial: (K, D) text anchors.
    """
    K, D = text_features_initial.shape
    dc = cfg.dota
    res_state = None
    if dc.use_dota and not dc.use_mode_dota:
        # The reference initialises DOTA's mu from a constant 0.001 matrix
        # rather than the text anchors (Uni_Adapter.py:329-330) — reproduced.
        const = jnp.full((D, K), 0.001, jnp.float32)
        ms: Any = dota.init(dc.epsilon, dc.sigma, D, K, const)
    elif dc.use_mode_dota:
        ms = mode_dota.init(dc.epsilon, dc.sigma, D, K,
                            text_features_initial.T, num_modes=dc.mode_M)
        if dc.res_learning:
            opt = residual.make_optimizer(dc.residual_lr)
            res_state = residual.init(text_features_initial, opt)
    elif dc.use_gmm_dota:
        rng, init_rng = jax.random.split(rng)
        ms = gmm.init(dc.epsilon, dc.sigma, D, K, text_features_initial.T,
                      num_modes=dc.mode_M, rng=init_rng)
    elif dc.use_adaptive_dota:
        ms = adaptive_mod.init(dc.epsilon, dc.sigma, D, K,
                               text_features_initial.T, max_modes=dc.mode_M)
    else:
        ms = cache_mod.init(K, cfg.cache.shot_capacity, D)
    return EngineState(ms, res_state, jnp.zeros((), jnp.int32), rng)


def make_step_fn(cfg: Config, model,
                 axis_name: Optional[str] = None,
                 encode_fn: Optional[Callable] = None) -> Callable:
    """Build the pure per-sample step:
        step(params, text_init, state, batch) -> (state, StepOutput)
    where `batch` is (pc (B,N,3), rgb (B,N,3), target (B,)).

    With `axis_name` set (inside shard_map), each device feeds its local
    batch shard and the fit sufficient statistics psum-merge — the
    adaptation state stays replicated and the update is the exact global
    streaming update (SURVEY.md §5.8).

    `encode_fn` overrides the model-apply forward — `params` is then
    whatever pytree the override consumes (e.g. the stage-sharded
    (stacked, rest) pair of parallel/pp.make_pp_encode_fn, which runs the
    trunk as a GPipe pipeline for models too large for one chip)."""
    encode = encode_fn if encode_fn is not None else \
        make_encode_fn(cfg, model)
    dc, cc = cfg.dota, cfg.cache
    is_cache_path = not (dc.use_dota or dc.use_mode_dota or dc.use_gmm_dota
                         or dc.use_adaptive_dota)
    if axis_name is not None and is_cache_path:
        # the DOTA-family fits psum-merge their additive sufficient
        # statistics, but the prototype cache's insert-or-merge update is
        # order-dependent and has no collective form — a psum step would
        # silently produce divergent per-device caches (same precondition
        # parallel/mesh.run_stream_psum enforces; use dist_mode='sharded')
        raise ValueError(
            "axis_name requires an adaptation method with additive "
            "sufficient statistics (DOTA family); the prototype cache "
            "cannot be psum-merged — run it sharded (independent "
            "per-device state) instead")
    use_res = dc.use_mode_dota and dc.res_learning
    res_opt = residual.make_optimizer(dc.residual_lr) if use_res else None

    def step(params, text_init, state: EngineState,
             batch) -> tuple[EngineState, StepOutput]:
        pc, rgb, target = batch
        text_init = text_init.astype(jnp.float32)
        K = text_init.shape[0]
        rng, noise_rng = jax.random.split(state.rng)
        if axis_name is not None:
            # decorrelate the noise augmentation across devices while the
            # carried key stays replicated
            noise_rng = jax.random.fold_in(noise_rng,
                                           jax.lax.axis_index(axis_name))

        # --- current text anchors (Uni_Adapter.py:388-401) ---
        if use_res:
            clip_weights = residual.adapted_text_weights(state.res_state,
                                                         text_init)
        else:
            clip_weights = text_init.T

        # --- A. base logits ---
        if dc.use_mode_dota:
            # fuse the clean and noise-augmented forwards into one batched
            # encoder pass (weights stream from HBM once, not twice)
            B = pc.shape[0]
            pc_aug = pc + dc.noise_std * jax.random.normal(noise_rng, pc.shape,
                                                           pc.dtype)
            feat_both = encode(params, jnp.concatenate([pc, pc_aug], axis=0),
                               jnp.concatenate([rgb, rgb], axis=0))
            feat, feat_aug = feat_both[:B], feat_both[B:]
        else:
            feat = encode(params, pc, rgb)
        clip_logits, ent, prob_map, pred = clip_logits_from(
            feat, clip_weights, scale=cfg.model.logit_scale)

        res_state = state.res_state

        def predict_input(f):
            # mean feature fed to predict; the reference rounds it through
            # fp16 (`.half()`, Uni_Adapter.py:410,416) — emulated exactly
            # when fp16_predict_input is set (see DotaConfig)
            m = jnp.mean(f, axis=0, keepdims=True)
            if dc.fp16_predict_input:
                m = m.astype(jnp.float16).astype(jnp.float32)
            return m

        # fusion weight w = clamp(rho*mean(c)/B, eta) uses the batch the
        # fit consumed (Uni_Adapter.py:489-494).  Under psum mode the fit's
        # sufficient statistics merge across devices, so mean(c) grows with
        # the GLOBAL per-step batch — divide by it, not the local shard,
        # or w saturates n_devices times too fast and the emitted logits
        # diverge from the equivalent single-device batched run.
        if axis_name is not None:
            fit_batch = jax.lax.psum(jnp.float32(pc.shape[0]), axis_name)
        else:
            fit_batch = float(pc.shape[0])

        # --- B. adapt ---
        if dc.use_dota and not dc.use_mode_dota:
            ms = state.method_state
            dota_logits = dota.predict(ms, predict_input(feat),
                                       prior_pre_steps=dc.prior_pre_steps)
            ms = dota.fit(ms, feat, prob_map, axis_name=axis_name)
            ms = dota.update(ms, dc.epsilon)
            w = fusion.dota_fusion_weight(dc.rho, dc.eta, jnp.mean(ms.c),
                                          fit_batch)
            final = fusion.fuse_dota(clip_logits, dota_logits, w)

        elif dc.use_mode_dota:
            ms = state.method_state
            dota_logits = mode_dota.predict(ms, predict_input(feat),
                                            dc.epsilon)
            ms = mode_dota.fit(ms, feat, prob_map, dc.epsilon,
                               axis_name=axis_name)
            # noise-augmented double fit with the CLEAN prob_map
            # (Uni_Adapter.py:419-430).  feat_aug was computed alongside the
            # clean features in one batched forward (see above) — at batch 1
            # the encoder is HBM-bound on its 300M-parameter weight reads,
            # so one 2B forward costs ~half of two 1B forwards.
            ms = mode_dota.fit(ms, feat_aug, prob_map, dc.epsilon,
                               axis_name=axis_name)

            if use_res:
                res_prec = {"highest": jax.lax.Precision.HIGHEST,
                            "high": jax.lax.Precision.HIGH,
                            "default": jax.lax.Precision.DEFAULT}.get(
                    dc.residual_precision)
                if res_prec is None:
                    raise ValueError(
                        f"unknown residual_precision "
                        f"{dc.residual_precision!r} (expected 'highest', "
                        f"'high', or 'default')")

                def do_opt(rs):
                    return residual.optimize_residuals(
                        rs, text_init, ms, res_opt, dc.epsilon,
                        num_steps=dc.residual_steps, precision=res_prec,
                        unroll=dc.residual_unroll)
                # i > 0 gate (Uni_Adapter.py:444)
                res_state = jax.lax.cond(state.step > 0, do_opt,
                                         lambda rs: rs, state.res_state)

            w = fusion.dota_fusion_weight(dc.rho, dc.eta, jnp.mean(ms.c),
                                          fit_batch)
            final = fusion.fuse_mode_dota(
                clip_logits, dota_logits, w,
                fix_normalization=dc.fix_fusion_normalization)

        elif dc.use_gmm_dota:
            # present-but-unwired in the reference (SURVEY.md §2.1); fused
            # like MODE-DOTA, the protocol the variants share
            ms = state.method_state
            gmm_logits = gmm.predict(ms, jnp.mean(feat, axis=0, keepdims=True),
                                     alpha_max=dc.alpha_max)
            ms = gmm.fit(ms, feat, prob_map, axis_name=axis_name)
            ms = gmm.update(ms, dc.epsilon)
            w = fusion.dota_fusion_weight(
                dc.rho, dc.eta, jnp.mean(gmm.class_counts_per_class(ms)),
                fit_batch)
            final = fusion.fuse_mode_dota(
                clip_logits, gmm_logits, w,
                fix_normalization=dc.fix_fusion_normalization)

        elif dc.use_adaptive_dota:
            # `--use-adaptive-dota` is parsed but never read in the reference
            # (utils/params.py:114, SURVEY.md §2.1); wired here
            ms = state.method_state
            sigma_init = adaptive_mod.resolve_sigma_init(
                dc.sigma, text_init.shape[1])
            ad_logits = adaptive_mod.predict(
                ms, jnp.mean(feat, axis=0, keepdims=True), dc.epsilon)
            ms = adaptive_mod.fit(ms, feat, prob_map, dc.epsilon,
                                  split_threshold=10.0 * sigma_init,
                                  axis_name=axis_name)
            w = fusion.dota_fusion_weight(dc.rho, dc.eta, jnp.mean(ms.c),
                                          fit_batch)
            final = fusion.fuse_mode_dota(
                clip_logits, ad_logits, w,
                fix_normalization=dc.fix_fusion_normalization)

        else:
            if pc.shape[0] != 1:
                # the cache protocol is strictly batch-1 (the reference's
                # get_logits_wrapper coerces pred to a Python int,
                # Uni_Adapter.py:72): with B>1 only sample 0 would enter
                # the cache while all B are scored against it — reject at
                # trace time rather than silently degrade
                raise ValueError(
                    f"the prototype-cache path requires batch_size=1 "
                    f"(got {pc.shape[0]}); see adapt/cache.py docstring")
            prop_ent = normalized_entropy(ent, K)[0]
            ms, _ = cache_mod.update_cache(
                state.method_state, pred, feat[:1], prop_ent, prob_map[:1],
                clip_weights, beta=cc.beta,
                logit_scale=cfg.model.logit_scale)
            cache_logits = cache_mod.compute_cache_logits(
                feat, ms, cc.threshold, cc.lambda_reg,
                use_new_approximation=cc.use_new_approximation,
                cg_max_iter=cc.cg_max_iter, graph_mode=cc.graph_mode)
            final = fusion.fuse_cache(clip_logits, cache_logits,
                                      logit_scale=cfg.model.logit_scale)

        # frozen-anchor readout for the zero-shot baseline column; when
        # res learning is off clip_weights == text_init.T and this reuses
        # clip_logits, else one extra (B, K) matmul
        if use_res:
            zs_logits, _, _, _ = clip_logits_from(
                feat, text_init.T, scale=cfg.model.logit_scale)
        else:
            zs_logits = clip_logits
        out = StepOutput(final, clip_logits,
                         topk_correct(final, target, (1, 3, 5)),
                         topk_correct(zs_logits, target, (1, 3, 5)))
        return EngineState(ms, res_state, state.step + 1, rng), out

    return step


def make_scan_fn(cfg: Config, model,
                 axis_name: Optional[str] = None,
                 encode_fn: Optional[Callable] = None) -> Callable:
    """scan_fn(params, text, state, pcs, rgbs, targets) -> (state, outs).
    Jit this (or embed in shard_map); all arrays are arguments."""
    step = make_step_fn(cfg, model, axis_name=axis_name,
                        encode_fn=encode_fn)

    def scan_fn(params, text, state, pcs, rgbs, targets):
        return jax.lax.scan(
            lambda s, b: step(params, text, s, b), state,
            (pcs, rgbs, targets))

    return scan_fn


def run_stream_scan(cfg: Config, model, params,
                    text_features_initial: jax.Array,
                    pcs: jax.Array, rgbs: jax.Array, targets: jax.Array,
                    seed: int = 42, scan_fn: Optional[Callable] = None,
                    initial_state: Optional[EngineState] = None):
    """Run the entire stream as one on-device lax.scan.

    The corrupted test sets are small (ModelNet40-C ≈ 30 MB), so the whole
    stream lives in HBM and the TTA trajectory compiles to a single program
    with zero host round-trips — the TPU-first answer to the reference's
    per-batch DataLoader loop (main_test-time.py:78-96).

    Args:
      pcs: (T, B, N, 3); rgbs: (T, B, N, 3); targets: (T, B).
      scan_fn: optional pre-jitted result of `jax.jit(make_scan_fn(cfg,
        model))`.  Pass ONE such function across repeated calls (e.g. the
        15-corruption loop in main.py) — rebuilding it per call creates a
        fresh Python callable, which defeats jit's compile cache and costs
        a full ~25 s recompile per corruption.
      initial_state: resume the adaptation trajectory from this carry
        instead of a fresh init (continual TTA: chain streams without a
        reset — the reference always re-inits per corruption,
        Uni_Adapter.py:323-361).
    Returns:
      (final EngineState, StepOutput with leading T axis)
    """
    if scan_fn is None:
        scan_fn = jax.jit(make_scan_fn(cfg, model))
    state = (initial_state if initial_state is not None else
             init_state(cfg, text_features_initial, jax.random.PRNGKey(seed)))
    return scan_fn(params, text_features_initial, state, pcs, rgbs, targets)


def run_streams_vmapped(cfg: Config, model, params,
                        text_features_initial: jax.Array,
                        pcs: jax.Array, rgbs: jax.Array, targets: jax.Array,
                        seed: int = 42, scan_fn=None):
    """Run C independent streams simultaneously as one vmapped scan.

    The benchmark's 15 corruption streams are independent online
    trajectories; the reference evaluates them sequentially
    (main_test-time.py:55-96).  Here they run as `vmap(step)` inside one
    scan: the encoder sees an effective batch of C·B per step (C·2B for
    MODE-DOTA's fused noise forward), which converts the batch-1 protocol's
    HBM-bound weight reads into MXU-efficient batched matmuls — per-stream
    numerics identical to C separate scans (each stream carries its own
    adaptation state and PRNG key, seeded seed+i like the reference's
    seed+rank convention).

    Args:
      pcs: (C, T, B, N, 3); rgbs likewise; targets: (C, T, B).
      scan_fn: pass jax.jit(make_vmapped_scan_fn(cfg, model)) to reuse one
        compiled program across calls (e.g. a severity sweep) — same
        compile-cache guidance as run_stream_scan above.
    Returns:
      (stacked final EngineStates with leading C axis,
       StepOutput with leading (T, C) axes)
    """
    C = pcs.shape[0]
    if scan_fn is None:
        scan_fn = jax.jit(make_vmapped_scan_fn(cfg, model))
    states = init_states_vmapped(cfg, text_features_initial, C, seed)
    # time axis leading for the scan: (C, T, ...) → (T, C, ...)
    t_first = lambda a: jnp.swapaxes(jnp.asarray(a), 0, 1)
    return scan_fn(params, text_features_initial, states,
                   t_first(pcs), t_first(rgbs), t_first(targets))


def init_states_vmapped(cfg: Config, text_features_initial: jax.Array,
                        n_streams: int, seed: int = 42):
    """Stacked per-stream EngineStates, seeded seed+i (the reference's
    seed+rank convention, main_test-time.py:18-23)."""
    rngs = jnp.stack([jax.random.PRNGKey(seed + i) for i in range(n_streams)])
    return jax.vmap(lambda r: init_state(cfg, text_features_initial, r))(rngs)


def make_vmapped_scan_fn(cfg: Config, model) -> Callable:
    """scan_fn(params, text, states, pcs_t, rgbs_t, tgts_t) with
    time-leading (T, C, ...) inputs; jit once and reuse."""
    step = make_step_fn(cfg, model)

    def scan_fn(params, text, states, pcs_t, rgbs_t, tgts_t):
        def body(states, batch):
            return jax.vmap(step, in_axes=(None, None, 0, 0))(
                params, text, states, batch)

        return jax.lax.scan(body, states, (pcs_t, rgbs_t, tgts_t))

    return scan_fn


def summarize_vmapped(outputs: StepOutput, n_samples_per_stream: int) -> list:
    """Per-stream result dicts from run_streams_vmapped outputs."""
    correct = np.asarray(jnp.sum(outputs.correct, axis=0))   # (C, 3)
    out = [{"acc1": 100.0 * c[0] / n_samples_per_stream,
            "acc3": 100.0 * c[1] / n_samples_per_stream,
            "acc5": 100.0 * c[2] / n_samples_per_stream} for c in correct]
    if outputs.zs_correct is not None:
        zs = np.asarray(jnp.sum(outputs.zs_correct, axis=0))  # (C, 3)
        for d, z in zip(out, zs):
            d["zs_acc1"] = 100.0 * z[0] / n_samples_per_stream
    return out


def run_stream(cfg: Config, model, params, text_features_initial: jax.Array,
               batches, seed: int = 42, print_freq: Optional[int] = None,
               checkpoint_every: Optional[int] = None,
               checkpoint_path: Optional[str] = None,
               step_fn: Optional[Callable] = None,
               initial_state: Optional[EngineState] = None):
    """Host-iterator variant: identical numerics, one jitted step per batch.

    Elastic recovery (a capability the reference lacks — SURVEY.md §5.3/5.4):
    with `checkpoint_every` set, the full adaptation carry plus the running
    accuracy counters persist every N steps; an interrupted run restarted
    with the same checkpoint_path resumes mid-stream exactly (the carry
    includes the PRNG key and step counter), skipping already-seen batches.

    Args:
      batches: iterable of (pc, rgb, target) numpy/JAX arrays.
      initial_state: resume the adaptation trajectory from this carry
        instead of a fresh init (continual TTA — see run_stream_scan).
        A checkpoint restore, which recovers THIS run exactly, still
        takes precedence over it.
    Returns:
      dict with acc1/acc3/acc5 (percent) and per-step timings.
    """
    from uni_adapter_tpu import checkpoint as ckpt
    from uni_adapter_tpu.utils.metrics import DeviceTimer

    # reuse a caller-provided jitted step across corruptions (see
    # run_stream_scan's scan_fn note)
    step = step_fn if step_fn is not None else jax.jit(make_step_fn(cfg, model))
    state = (initial_state if initial_state is not None else
             init_state(cfg, text_features_initial, jax.random.PRNGKey(seed)))
    totals = np.zeros(3)
    zs_totals = np.zeros(3)
    n = 0
    start_step = 0
    if checkpoint_path and os.path.exists(checkpoint_path + ".npz"):
        saved = ckpt.restore_state(checkpoint_path)
        state, totals, n = (saved["state"], np.asarray(saved["totals"]),
                            int(saved["n"]))
        # pre-round-5 checkpoints carry no zero-shot counters
        zs_totals = np.asarray(saved.get("zs_totals", np.zeros(3)))
        start_step = int(state.step)
        logging.info("resumed adaptation state at step %d", start_step)

    timer = DeviceTimer(sync_leaf=lambda out: out[1].correct)
    for i, (pc, rgb, target) in enumerate(batches):
        if i < start_step:
            continue
        batch = (jnp.asarray(pc), jnp.asarray(rgb), jnp.asarray(target))
        state, out = timer.timed(step, params, text_features_initial, state,
                                 batch)
        totals += np.asarray(out.correct)
        zs_totals += np.asarray(out.zs_correct)
        n += int(batch[0].shape[0])
        if print_freq and i % print_freq == 0:
            logging.info("step %d: acc1=%.3f%%", i, 100 * totals[0] / n)
        if (checkpoint_every and checkpoint_path
                and (i + 1) % checkpoint_every == 0):
            ckpt.save_state(checkpoint_path,
                            {"state": state, "totals": totals, "n": n,
                             "zs_totals": zs_totals})
    accs = 100.0 * totals / max(n, 1)
    return {"acc1": accs[0], "acc3": accs[1], "acc5": accs[2],
            "zs_acc1": 100.0 * zs_totals[0] / max(n, 1),
            "total_time_ms": timer.total_ms, "state": state}


def summarize(outputs: StepOutput, n_samples: int) -> dict:
    """Aggregate scan outputs into the reference's result dict
    (Uni_Adapter.py:581-595), plus the in-run zero-shot baseline."""
    correct = np.asarray(jnp.sum(outputs.correct, axis=0))
    result = {"acc1": 100.0 * correct[0] / n_samples,
              "acc3": 100.0 * correct[1] / n_samples,
              "acc5": 100.0 * correct[2] / n_samples}
    if outputs.zs_correct is not None:
        zs = np.asarray(jnp.sum(outputs.zs_correct, axis=0))
        result["zs_acc1"] = 100.0 * zs[0] / n_samples
    return result
