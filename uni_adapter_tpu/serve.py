"""Online-serving layer: multi-client TTA with per-client adaptation state.

Production wrapper over the engine (a capability the reference, a research
script, does not have).  Each client is an independent online-adaptation
stream (its own EngineState: mixture parameters, residuals, cache, PRNG);
requests arriving in the same tick from different clients batch into ONE
vmapped step, so concurrent clients ride the same MXU-efficient program the
corruption sweep uses (engine.run_streams_vmapped) while keeping every
client's trajectory bitwise identical to a dedicated sequential run
(tests/test_serve.py).

Batching strategy: vmapped step programs are compiled per batch size from
`sizes` (powers of two by default); a tick with n pending requests is
greedily decomposed into compiled sizes (9 → 8+1, 13 → 8+4+1), so encoder
FLOPs are exactly n per tick — nothing is padded away — while at most
len(sizes) programs ever compile.  Only if the ladder cannot represent n
exactly (no size 1) does the final chunk pad with an inert copy of its
first request (state updates discarded).

dist_mode='ep' (round 4) swaps the batching axis for a CLASS axis: every
client's adaptation state class-shards over a `classes` mesh
(parallel/ep.py) — the Objaverse-LVIS-scale online deployment, where the
per-step cost is K-proportional adaptation math rather than the trunk.
Requests then serialise (the class mesh already saturates on each one)
and snapshots strip to full-K states that restore onto any mesh width.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import Config


class TTAServer:
    """Stateful multi-client test-time-adaptation server."""

    def __init__(self, cfg: Config, model, params, text_features,
                 sizes: Sequence[int] = (1, 2, 4, 8, 16), seed: int = 42,
                 encode_fn=None, dist_mode: str = "replicated",
                 mesh=None):
        """`encode_fn` (with matching `params`) swaps the trunk forward —
        e.g. parallel/tp.shard_params_tp'd params, or
        parallel/pp.make_pp_encode_fn for trunks larger than one chip's
        HBM; the serving loop is encode-agnostic.

        dist_mode='ep' class-shards every client's adaptation state over
        a `classes` mesh (parallel/ep.py) — the large-K online
        deployment: at Objaverse-LVIS scale the per-step K-proportional
        work (EM likelihoods, the residual Adam loop) divides over the
        devices and per-client state memory drops n_devices-fold.  The
        multi-client vmap ladder is disabled under EP (sizes forces to
        (1,)): the batch is replicated over the class mesh, so EVERY
        device already works on every request — coalescing clients adds
        no device utilisation, only queueing; requests serialise per
        tick instead.  Snapshots strip to full-K states, so they
        restore onto any mesh width or back onto a replicated server
        (elastic re-deployment).  EP × TP composes: pass a 2-D
        (classes, model) mesh plus parallel/tp.make_tp_encode_fn's
        encode built on it (partial-manual shard_map, like
        ep.run_stream_ep; PP/SP trunks cannot nest — parse_args already
        rejects --trunk-parallel with --dist-mode ep from the CLI)."""
        self.cfg = cfg
        self.params = params
        self.text = jnp.asarray(text_features)
        self.seed = seed
        self._ep = None
        if dist_mode == "ep":
            from jax.sharding import PartitionSpec as P
            from uni_adapter_tpu.parallel import ep as ep_mod

            mesh = mesh or ep_mod.make_classes_mesh()
            axis = mesh.axis_names[0]
            n = mesh.shape[axis]
            text_np = np.asarray(text_features, np.float32)
            K = text_np.shape[0]
            text_pad, _ = ep_mod.pad_classes(text_np, n)
            estep = ep_mod.make_ep_step_fn(cfg, model, axis, K, n,
                                           encode_fn=encode_fn)
            # specs need only leaf paths/ndims — trace the init
            # abstractly (at LVIS+GMM scale the concrete init runs a
            # (K, D, M) batched QR this would otherwise pay twice)
            template = jax.eval_shape(
                lambda: ep_mod.make_padded_state(
                    cfg, text_np, text_pad, jax.random.PRNGKey(0)))
            specs = ep_mod.state_partition_specs(template, axis)
            # partial-manual when the mesh carries extra (trunk) axes:
            # manual over classes, the rest automatic — EP × TP serving
            # on a 2-D (classes, model) mesh via the encode_fn hook, the
            # same pattern as ep.run_stream_ep (PP/SP trunks are
            # themselves shard_map-based and cannot nest here)
            extra = ({"axis_names": {axis}}
                     if len(mesh.axis_names) > 1 else {})
            self._step1 = jax.jit(jax.shard_map(
                estep, mesh=mesh,
                in_specs=(P(), P(axis), specs, P()),
                out_specs=(specs, P()), check_vma=False, **extra))
            self._vstep = None
            self.text = jnp.asarray(text_pad)
            self._ep = (ep_mod, text_np, text_pad, K)
            self.sizes = [1]
            logging.info("EP serving: K=%d over a %d-way class mesh "
                         "(vmap ladder disabled — the class mesh already "
                         "saturates on every request)", K, n)
        elif dist_mode != "replicated":
            raise ValueError(
                f"dist_mode {dist_mode!r}: the serving loop supports "
                "'replicated' (per-client vmap ladder) or 'ep' "
                "(class-sharded state); stream sharding modes belong to "
                "the sweep CLI")
        else:
            self.sizes = sorted(sizes)
            self._step = engine.make_step_fn(cfg, model, encode_fn=encode_fn)
            self._vstep = jax.jit(jax.vmap(self._step,
                                           in_axes=(None, None, 0, 0)))
            # single-request fast path: the raw (unvmapped) step, no state
            # stack/slice — tree.map per-leaf slicing costs one dispatch
            # per leaf per tick, which dominates single-client latency on
            # remote devices (measured 66 -> ~7 ms/step over the tunneled
            # v5e)
            self._step1 = jax.jit(self._step)
        self.states: Dict[str, engine.EngineState] = {}
        self._next_client = 0

    def warmup(self, npoints: int, batch: int = 1) -> None:
        """Pre-compile the step programs for every ladder size (plus the
        single-request fast path) on a throwaway state, so the first real
        request never pays a trunk compile (~25 s on the tunneled v5e).
        No client state is touched."""
        pc = jnp.zeros((batch, npoints, 3), jnp.float32)
        rgb = jnp.ones_like(pc)
        targets = jnp.zeros((batch,), jnp.int32)
        scratch = engine.init_state(self.cfg, self.text,
                                    jax.random.PRNGKey(0))
        out, _ = self._step1(self.params, self.text, scratch,
                             (pc, rgb, targets))
        jax.block_until_ready(out)
        for size in self.sizes:
            if size == 1:
                continue   # a size-1 chunk always takes the _step1 fast
                           # path above; the vmapped width-1 program would
                           # compile ~25 s of dead code
            stacked = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (size,) + x.shape), scratch)
            batched = (jnp.broadcast_to(pc, (size,) + pc.shape),
                       jnp.broadcast_to(rgb, (size,) + rgb.shape),
                       jnp.broadcast_to(targets, (size,) + targets.shape))
            out, _ = self._vstep(self.params, self.text, stacked, batched)
            jax.block_until_ready(jax.tree.leaves(out)[0])
        logging.info("warmed up step programs for sizes %s (npoints=%d, "
                     "batch=%d)", list(self.sizes), npoints, batch)

    def register(self, client_id: str) -> None:
        """Create a fresh adaptation stream for a client (seeded seed+i —
        the reference's seed+rank convention)."""
        if client_id in self.states:
            raise ValueError(f"client {client_id!r} already registered")
        rng = jax.random.PRNGKey(self.seed + self._next_client)
        self._next_client += 1
        if self._ep is not None:
            ep_mod, text_np, text_pad, _ = self._ep
            self.states[client_id] = ep_mod.make_padded_state(
                self.cfg, text_np, text_pad, rng)
        else:
            self.states[client_id] = engine.init_state(self.cfg, self.text,
                                                       rng)

    def reset(self, client_id: str) -> None:
        """Restart a client's adaptation from scratch (fresh seed — seed
        slots are never reused, so restarted streams stay decorrelated)."""
        if client_id not in self.states:
            raise ValueError(f"client {client_id!r} is not registered "
                             f"(known: {sorted(self.states)})")
        del self.states[client_id]
        self.register(client_id)

    def submit(self, requests: List[Tuple[str, np.ndarray, Optional[np.ndarray]]]
               ) -> Dict[str, np.ndarray]:
        """Process one tick of requests.

        Args:
          requests: list of (client_id, pc (B,N,3), rgb (B,N,3) or None).
            At most one request per client per tick; clients must be
            registered.
        Returns:
          {client_id: final_logits (B, K)} — each client's logits are
          identical to what a dedicated sequential stream would produce.

        Atomicity: no client state is written back until EVERY chunk of
        the tick has computed.  If any chunk raises (device error, bad
        input that slipped validation), the whole tick leaves all states
        untouched — a client that retries after an error cannot
        double-step its adaptation stream.
        """
        if not requests:
            return {}
        ids = [r[0] for r in requests]
        if len(set(ids)) != len(ids):
            raise ValueError("one request per client per tick")
        for cid in ids:
            if cid not in self.states:
                raise KeyError(f"client {cid!r} not registered")

        # greedy decomposition into compiled sizes: largest size ≤ remaining,
        # falling back to the smallest size (padded) only for a final
        # remainder the ladder cannot express exactly
        result: Dict[str, np.ndarray] = {}
        new_states: Dict[str, engine.EngineState] = {}
        i = 0
        while i < len(requests):
            rem = len(requests) - i
            fit = [s for s in self.sizes if s <= rem]
            size = max(fit) if fit else self.sizes[0]
            chunk = requests[i:i + size]
            states, logits = self._run_chunk(chunk, size)
            new_states.update(states)
            result.update(logits)
            i += len(chunk)
        self.states.update(new_states)   # commit only after all chunks ran
        return result

    def _run_chunk(self, requests, size: int):
        """Run ≤size requests as one compiled vmapped step of width size.
        Returns ({client: new_state}, {client: logits}) WITHOUT touching
        self.states — submit() commits after the whole tick succeeds."""
        if len(requests) == 1 and size == 1:
            cid, pc, rgb = requests[0]
            pc = jnp.asarray(np.asarray(pc, np.float32))
            rgb = (jnp.asarray(np.asarray(rgb, np.float32))
                   if rgb is not None else jnp.ones_like(pc))
            targets = jnp.zeros((pc.shape[0],), jnp.int32)   # unused label
            new_state, outs = self._step1(self.params, self.text,
                                          self.states[cid],
                                          (pc, rgb, targets))
            return {cid: new_state}, {cid: np.asarray(outs.final_logits)}
        ids = [r[0] for r in requests]
        pcs = [np.asarray(r[1], np.float32) for r in requests]
        rgbs = [np.asarray(r[2], np.float32) if r[2] is not None
                else np.ones_like(p) for r, p in zip(requests, pcs)]
        pad = size - len(requests)   # only a ladder-remainder chunk pads
        states = [self.states[c] for c in ids] + [self.states[ids[0]]] * pad
        pcs_b = jnp.asarray(np.stack(pcs + [pcs[0]] * pad))
        rgbs_b = jnp.asarray(np.stack(rgbs + [rgbs[0]] * pad))
        targets = jnp.zeros((size, pcs_b.shape[1]), jnp.int32)  # unused label

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        new_states, outs = self._vstep(self.params, self.text, stacked,
                                       (pcs_b, rgbs_b, targets))

        states_out, result = {}, {}
        for i, cid in enumerate(ids):
            states_out[cid] = jax.tree.map(lambda x, i=i: x[i], new_states)
            result[cid] = np.asarray(outs.final_logits[i])
        return states_out, result

    def snapshot(self, client_id: str, path: str,
                 blocking: bool = True) -> None:
        """Persist one client's adaptation state (exact-resume capable).

        With `blocking=False`, the snapshot runs on orbax's async background
        thread — the serving loop keeps ticking while IO drains (call
        `drain_snapshots()` before shutdown)."""
        from uni_adapter_tpu import checkpoint

        state = self.states[client_id]
        if self._ep is not None:
            # strip the frozen pad rows: snapshots are full-K states,
            # interchangeable with the replicated engine's and restorable
            # onto any class-mesh width (elastic re-deployment)
            ep_mod, _, _, K = self._ep
            state = ep_mod.strip_padded_state(state, K)
        if blocking:
            checkpoint.save_state(path, state)
            return
        if not hasattr(self, "_snapshotter"):
            self._snapshotter = checkpoint.AsyncSnapshotter()
        self._snapshotter.save(path, state)

    def drain_snapshots(self) -> None:
        """Block until all async snapshots have hit disk."""
        if hasattr(self, "_snapshotter"):
            self._snapshotter.wait()

    def restore(self, client_id: str, path: str) -> None:
        from uni_adapter_tpu import checkpoint

        # Drain in-flight async snapshots BEFORE probing the path: orbax
        # commits via a tmp-dir rename, so isdir() is false while a save is
        # in flight and the npz loader would be (mis)chosen.
        if hasattr(self, "_snapshotter"):
            self._snapshotter.wait()
        # orbax stores pytrees structurally (dirs); restore against the live
        # state as template so the EngineState NamedTuple shape survives.
        # Restoring an unregistered client (the fresh-process restart case)
        # registers it first so a typed template exists — but unwinds the
        # registration if the load fails, so a bad path surfaces as an
        # error on the next submit instead of silently adapting from a
        # fresh state.
        fresh = client_id not in self.states
        if fresh:
            self.register(client_id)
        try:
            template = self.states.get(client_id)
            if self._ep is not None:
                # snapshots are full-K (see snapshot()); the live padded
                # state strips down to the matching template shape
                ep_mod, text_np, text_pad, K = self._ep
                template = ep_mod.strip_padded_state(template, K)
            # the same path may hold BOTH an orbax dir (non-blocking
            # snapshot) and an .npz pair (blocking snapshot); restore
            # whichever was written last, not a fixed preference — a stale
            # orbax dir must not shadow a newer npz
            has_dir = os.path.isdir(path)
            has_npz = os.path.isfile(path + ".npz")
            if has_dir and (not has_npz or os.path.getmtime(path)
                            >= os.path.getmtime(path + ".npz")):
                loaded = checkpoint.restore_state_orbax(
                    path, template=template)
            else:
                loaded = checkpoint.restore_state(path)
            if self._ep is not None:
                # re-pad onto THIS mesh width — the snapshot may come from
                # a different width or from a replicated server
                loaded = ep_mod.make_padded_state(
                    self.cfg, text_np, text_pad,
                    jax.random.PRNGKey(self.seed), initial_state=loaded)
            self.states[client_id] = loaded
        except Exception:
            if fresh:
                del self.states[client_id]
            raise
        logging.info("client %s state restored", client_id)
