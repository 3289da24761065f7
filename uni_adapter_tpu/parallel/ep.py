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
from uni_adapter_tpu.adapt import fusion, mode_dota, residual
from uni_adapter_tpu.config import Config
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
      axis (each device encodes 2B/n samples; features all_gather back) —
      the otherwise-replicated trunk forward then scales with the mesh
      too, making EP a full-step lever rather than adaptation-only.
      Requires 2B % n == 0 (checked at trace time).  Per-sample encoder
      math is batch-independent, so the gathered features match the
      replicated forward to float roundoff; the noise is generated for
      the FULL batch and sliced, so the consumed values are identical.
    """
    dc = cfg.dota
    if not dc.use_mode_dota:
        raise ValueError(
            "class-sharded (EP) evaluation supports MODE-DOTA only: the "
            "mixture state and the residual loop are what shard by class; "
            "use dist_mode='sharded'/'psum' for the other methods")
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
            if (2 * B) % n_shards:
                raise ValueError(
                    f"shard_encoder requires the fused encoder batch "
                    f"2B={2 * B} to divide over the {n_shards}-device "
                    f"class axis")
            chunk = 2 * B // n_shards
            start = jax.lax.axis_index(axis) * chunk
            feat_local = encode(
                params,
                jax.lax.dynamic_slice_in_dim(pc_both, start, chunk, 0),
                jax.lax.dynamic_slice_in_dim(rgb_both, start, chunk, 0))
            feat_both = jax.lax.all_gather(feat_local, axis, axis=0,
                                           tiled=True)
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


def _is_class_leaf(path, leaf) -> bool:
    """K-leading leaves shard over the class axis; scalars (step, t, Adam
    count) and the PRNG key replicate.  The key is matched by path — its
    (2,) shape could collide with a tiny K_local."""
    return leaf.ndim > 0 and "rng" not in jax.tree_util.keystr(path)


def _is_stacked_class_leaf(path, leaf) -> bool:
    """Same, one vmapped stream axis in front (run_streams_ep): class
    leaves are (C_local, K_local, ...); per-stream scalars/keys are
    (C_local,) or (C_local, 2)."""
    return leaf.ndim > 1 and "rng" not in jax.tree_util.keystr(path)


def run_streams_ep(cfg: Config, model, params, text_features_initial,
                   pcs, rgbs, targets, mesh: Mesh, data_axis: str = "data",
                   classes_axis: str = "classes", seed: int = 42,
                   shard_encoder: bool = False):
    """DP × EP: independent STREAMS sharded over `data_axis`, the MODE-DOTA
    class state sharded over `classes_axis` — shard_map(vmap(scan)) on a
    2-D mesh.  The realistic Objaverse-LVIS deployment of the benchmark
    sweep: the 15 corruption streams scale across one axis exactly like
    mesh.run_streams_sharded (same per-stream seeds), while each stream's
    K-proportional adaptation work divides over the other.

    Args:
      pcs: (C, T, B, N, 3); rgbs likewise; targets: (C, T, B).  C must be
        a multiple of the data-axis size.
      shard_encoder: forward make_ep_step_fn's encoder-sharding lever —
        each class-axis device encodes 2B/n_cls of the fused batch
        (requires 2B % n_cls == 0; checked at trace time).
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
            lambda r: engine.init_state(cfg, text_local, r))(keys_c)
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
        lambda: jax.vmap(lambda r: engine.init_state(
            cfg, jnp.zeros((k_pad // n_cls, text.shape[1]), jnp.float32), r)
        )(keys[:C // n_data]))
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
    # strip pad classes (leaf axis 1 for class leaves)
    states = jax.tree_util.tree_map_with_path(
        lambda p, l: l[:, :K] if _is_stacked_class_leaf(p, l) else l, states)

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
                  shard_encoder: bool = False):
    """Run the stream with the MODE-DOTA state class-sharded over the mesh.

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
    """
    mesh = mesh or make_classes_mesh()
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    text = np.asarray(text_features_initial, np.float32)
    K = text.shape[0]
    text_pad, k_pad = pad_classes(text, n)
    step = make_ep_step_fn(cfg, model, axis, K, n,
                           shard_encoder=shard_encoder)

    def body(params, text_local, state, pcs, rgbs, tgts):
        state, outs = jax.lax.scan(
            lambda s, b: step(params, text_local, s, b), state,
            (pcs, rgbs, tgts))
        return state, jnp.sum(outs.correct, axis=0), outs.final_logits

    # the padded initial carry: a fresh init on the padded anchors (which
    # covers the frozen pad classes), with the caller's full-K state
    # spliced over the real rows when resuming
    state0 = engine.init_state(cfg, jnp.asarray(text_pad),
                               jax.random.PRNGKey(seed))
    if initial_state is not None:
        state0 = jax.tree_util.tree_map_with_path(
            lambda p, init_l, given_l: (
                jnp.concatenate([jnp.asarray(given_l), init_l[K:]], axis=0)
                if _is_class_leaf(p, init_l) else jnp.asarray(given_l)),
            state0, initial_state)

    # state specs mirror the EngineState pytree: class-block leaves live
    # sharded as global (K_pad, ...) arrays, scalars/keys replicated
    state_specs = jax.tree_util.tree_map_with_path(
        lambda p, l: P(axis) if _is_class_leaf(p, l) else P(), state0)

    body_fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), state_specs, P(), P(), P()),
        out_specs=(state_specs, P(), P()), check_vma=False))
    state, correct, _ = body_fn(params, jnp.asarray(text_pad), state0,
                                jnp.asarray(pcs), jnp.asarray(rgbs),
                                jnp.asarray(targets))

    # strip the pad classes from the gathered state
    state = jax.tree_util.tree_map_with_path(
        lambda p, l: l[:K] if _is_class_leaf(p, l) else l, state)

    correct = np.asarray(correct)                 # replicated across the mesh
    n_samples = pcs.shape[0] * pcs.shape[1]
    summary = {"acc1": 100.0 * correct[0] / n_samples,
               "acc3": 100.0 * correct[1] / n_samples,
               "acc5": 100.0 * correct[2] / n_samples,
               "n_samples": n_samples, "n_class_shards": n,
               "padded_classes": k_pad - K}
    return state, summary
