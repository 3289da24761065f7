"""Distributed evaluation over a jax.sharding.Mesh.

The reference's distributed story is vestigial NCCL scaffolding — process
bootstrap plus all-reduce of accuracy meters (utils/distributed.py:5-107,
utils/utils.py:5-99), with no sampler and no DDP wrap.  The TPU-native
design (SURVEY.md §2.4, §5.8) makes data parallelism first-class with two
explicit, documented semantics for the order-dependent online state:

  * 'sharded' — the stream is split into contiguous per-device shards; each
    device runs an independent adaptation trajectory over its shard (this is
    what DDP semantics would have given the reference).  Accuracy counters
    merge at the end.
  * 'psum'    — the state is replicated and every step consumes one sample
    per device; the fit sufficient statistics psum over ICI, so every device
    applies the exact global streaming update.  This changes the trajectory
    from "one sample at a time" to "n_devices samples at a time" — a batched
    stream, stated explicitly because online TTA is order-dependent
    (SURVEY.md §7 hard part 3).

Both run as ONE jit-compiled shard_map(scan) program: collectives ride ICI,
nothing touches the host mid-stream.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import Config


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D device mesh over ICI (multi-host handled identically by the jax
    runtime — the rebuild of init_distributed_device,
    utils/distributed.py:65-107)."""
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devs), (axis,))


def is_primary() -> bool:
    """Rank-0 gate for logging (reference patches print on rank 0,
    utils/utils.py:14-23)."""
    return jax.process_index() == 0


def shard_stream(pcs: np.ndarray, rgbs: np.ndarray, targets: np.ndarray,
                 n_shards: int):
    """Split a (T, B, ...) stream into (n_shards, T//n_shards, B, ...)
    contiguous per-device shards, truncating the remainder."""
    T = (pcs.shape[0] // n_shards) * n_shards
    if T == 0:
        raise ValueError(
            f"stream of {pcs.shape[0]} steps is shorter than the "
            f"{n_shards}-device mesh — sharding would truncate to zero "
            f"steps (NaN accuracies); run unsharded or shrink the mesh")
    def r(a):
        return np.asarray(a)[:T].reshape(n_shards, T // n_shards,
                                         *a.shape[1:])
    return r(pcs), r(rgbs), r(targets), T


def run_stream_sharded(cfg: Config, model, params, text_features_initial,
                       pcs, rgbs, targets, mesh: Optional[Mesh] = None,
                       seed: int = 42):
    """'sharded' mode: independent per-device adaptation trajectories.

    Returns (per-shard final EngineStates stacked on axis 0, summary dict).
    """
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    pcs_s, rgbs_s, targets_s, T = shard_stream(pcs, rgbs, targets, n)

    scan_fn = engine.make_scan_fn(cfg, model)

    def shard_body(params, text, pc_shard, rgb_shard, tgt_shard, rngs):
        # leading singleton device axis from shard_map block
        state = engine.init_state(cfg, text, rngs[0])
        state, outs = scan_fn(params, text, state, pc_shard[0], rgb_shard[0],
                              tgt_shard[0])
        correct = jax.lax.psum(jnp.sum(outs.correct, axis=0), axis)
        # correct is psum-replicated — emit it with a replicated out_spec
        # (P()); a P(axis)-sharded copy could not be fetched on a
        # multi-host mesh (non-addressable devices)
        return (jax.tree.map(lambda x: x[None], state),
                correct, outs.final_logits[None])

    # distinct PRNG per shard (matches the reference's seed+rank offset,
    # main_test-time.py:18-23)
    rngs = jnp.stack([jax.random.PRNGKey(seed + i) for i in range(n)])

    # check_vma=False: the adaptation carry mixes replicated constants with
    # shard-varying data inside nested control flow; correctness is
    # guaranteed by construction (psum-merged outputs are replicated).
    # params/text are replicated shard_map arguments (never closures — a
    # closed-over param pytree bakes into the program as constants, which is
    # pathological at 300M params; see engine.py module docstring)
    shard_fn = jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(), P(axis)), check_vma=False))
    states, correct, logits = shard_fn(params, text_features_initial,
                                       jnp.asarray(pcs_s), jnp.asarray(rgbs_s),
                                       jnp.asarray(targets_s), rngs)
    correct = np.asarray(correct)  # psum ⇒ replicated, host-fetchable
    n_samples = T * pcs.shape[1]
    summary = {"acc1": 100.0 * correct[0] / n_samples,
               "acc3": 100.0 * correct[1] / n_samples,
               "acc5": 100.0 * correct[2] / n_samples,
               "n_samples": n_samples}
    return states, summary


def run_streams_sharded(cfg: Config, model, params, text_features_initial,
                        pcs, rgbs, targets, mesh: Optional[Mesh] = None,
                        seed: int = 42):
    """Shard independent STREAMS (e.g. the 15 corruptions) across devices,
    each device running a vmapped scan over its subset — shard_map(vmap(scan)).

    The realistic multi-chip deployment of the benchmark sweep: stream
    trajectories are exactly those of engine.run_streams_vmapped (same
    seeds), throughput scales with devices since streams are independent.

    Args:
      pcs: (C, T, B, N, 3); rgbs likewise; targets: (C, T, B).  C must be a
        multiple of the mesh size (pad with repeated streams if needed).
    Returns:
      (stacked final EngineStates with leading C axis, summary dict with a
       per-stream acc1 list).
    """
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    C, T, B = pcs.shape[0], pcs.shape[1], pcs.shape[2]
    if C % n:
        raise ValueError(f"stream count {C} must divide over {n} devices")

    scan_fn = engine.make_vmapped_scan_fn(cfg, model)
    states = engine.init_states_vmapped(cfg, text_features_initial, C, seed)

    def body(params, text, states, pcs_c, rgbs_c, tgts_c):
        # local block: (C/n, T, ...) streams — time axis must lead the scan
        tf = lambda a: jnp.swapaxes(a, 0, 1)
        st, outs = scan_fn(params, text, states, tf(pcs_c), tf(rgbs_c),
                           tf(tgts_c))
        correct = jnp.sum(outs.correct, axis=0)          # (C/n, 3)
        # gather the tiny (C/n, 3) counters so they come back replicated
        # (host-fetchable on a multi-host mesh); device order == stream
        # order, so the reshape recovers the (C, 3) layout exactly
        correct = jax.lax.all_gather(correct, axis).reshape(-1, 3)
        return st, correct

    body_fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()), check_vma=False))
    states_f, correct = body_fn(params, text_features_initial, states,
                                jnp.asarray(pcs), jnp.asarray(rgbs),
                                jnp.asarray(targets))
    correct = np.asarray(correct)                        # (C, 3)
    n_samples = T * B
    summary = {
        "acc1_per_stream": (100.0 * correct[:, 0] / n_samples).tolist(),
        "acc1": float(100.0 * correct[:, 0].sum() / (C * n_samples)),
        "acc3": float(100.0 * correct[:, 1].sum() / (C * n_samples)),
        "acc5": float(100.0 * correct[:, 2].sum() / (C * n_samples)),
        "n_samples": C * n_samples,
    }
    return states_f, summary


def run_stream_psum(cfg: Config, model, params, text_features_initial,
                    pcs, rgbs, targets, mesh: Optional[Mesh] = None,
                    seed: int = 42):
    """'psum' mode: replicated state, n_devices samples per step, exact
    global streaming updates via psum of the fit sufficient statistics.

    The (T, B, ...) stream is reinterpreted as (T//n, n·B, ...): step t
    consumes samples t·n … t·n+n−1, one per device.
    """
    if not (cfg.dota.use_dota or cfg.dota.use_mode_dota
            or cfg.dota.use_gmm_dota or cfg.dota.use_adaptive_dota):
        raise ValueError(
            "psum mode requires an adaptation method with additive "
            "sufficient statistics (DOTA family); the prototype cache's "
            "insert-or-merge update is order-dependent and cannot be "
            "psum-merged — use dist_mode='sharded' instead")
    mesh = mesh or make_mesh()
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    T = (pcs.shape[0] // n) * n
    if T == 0:
        raise ValueError(
            f"stream of {pcs.shape[0]} steps is shorter than the "
            f"{n}-device mesh — psum regrouping would truncate to zero "
            f"steps (NaN accuracies); run unsharded or shrink the mesh")
    B = pcs.shape[1]

    def regroup(a):
        a = np.asarray(a)[:T]
        return a.reshape(T // n, n * B, *a.shape[2:])

    pcs_g, rgbs_g, targets_g = regroup(pcs), regroup(rgbs), regroup(targets)

    scan_fn = engine.make_scan_fn(cfg, model, axis_name=axis)

    def body(params, text, pc_all, rgb_all, tgt_all):
        # each device sees its (T//n, B, ...) slice of every step
        state = engine.init_state(cfg, text, jax.random.PRNGKey(seed))
        state, outs = scan_fn(params, text, state, pc_all, rgb_all, tgt_all)
        correct = jax.lax.psum(jnp.sum(outs.correct, axis=0), axis)
        return state, correct

    body_fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(), P()), check_vma=False))
    state, correct = body_fn(params, text_features_initial,
                             jnp.asarray(pcs_g), jnp.asarray(rgbs_g),
                             jnp.asarray(targets_g))
    correct = np.asarray(correct)
    n_samples = T * B
    summary = {"acc1": 100.0 * correct[0] / n_samples,
               "acc3": 100.0 * correct[1] / n_samples,
               "acc5": 100.0 * correct[2] / n_samples,
               "n_samples": n_samples}
    return state, summary
