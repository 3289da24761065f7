"""Interleaved virtual-stage pipeline schedule (Megatron-style 1F1B
interleaving, forward form) — the bubble-reduction follow-up to the GPipe
schedule in parallel/pp.py.

No reference analogue — the reference has no pipeline parallelism anywhere
(SURVEY.md §2.4); this completes the beyond-reference parallelism portfolio.

Why: GPipe's bubble is (S-1)/(m+S-1) of the ticks — each device idles while
the pipeline fills and drains, and each tick costs a full L/S-block stage.
Interleaving splits every device's blocks into V *virtual* chunks of
L/(S·V) blocks; logical stage j ∈ [0, S·V) runs on device j mod S as its
chunk j div S, and a microbatch rides the ring V times.  The tick is now a
CHUNK time (V× smaller), devices fill/drain in ~S chunk-ticks instead of
S stage-ticks, and the bubble shrinks by ~V (Megatron's (p-1)/(v·m) law).

Mechanics (all static, SPMD-safe): the schedule — which (chunk, microbatch)
each device runs at every tick, which queue slot feeds it, where each
arrival is stored — is computed ONCE on the host by a deterministic
drain-first greedy simulation (`build_interleaved_schedule`) and baked into
the compiled program as small int32 tables; the device-side executor
(`pipeline_interleaved`) is a lax.scan over ticks that indexes the tables
by `jax.lax.axis_index`, applies its scheduled chunk via lax.switch (static
per-chunk block stacks — no dynamic parameter gathers), rotates one buffer
per tick with lax.ppermute, and lands finished microbatches on device 0.

The policy is Megatron-shaped: device 0 FILLS until S·V microbatches are
in flight (the pipeline depth), then switches to drain-first (highest
logical stage wins a device's tick) — the 1F1B steady state.  In-flight
work is capped at S·V regardless of m, so queue occupancy — and therefore
activation memory — is bounded by the pipeline depth, not the microbatch
count; measured makespans sit within ~S−1 chunk-ticks of the V·m
per-device work lower bound (vs GPipe's V·(S−1) bubble).

Scheduling is work-conserving and the tables are validated by invariants in
tests/test_pp_interleave.py: every (stage, microbatch) computed exactly
once, strictly after its predecessor's arrival, with makespan strictly
below GPipe's V·(m+S-1) chunk-tick equivalent.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class InterleavedSchedule:
    """Static tick tables for the interleaved ring executor.

    All tables are (T, S) int32, indexed [tick, device].  `cmp_*` describe
    the chunk a device computes that tick (chunk 0 on garbage for idle
    ticks — routed to the trash slot, never observable); `rcv_slot`/`out_m`
    describe where the buffer ARRIVING at the end of that tick goes.
    Flat queue-slot indices are chunk*Q + q; V*Q is the trash slot.
    """
    n_stages: int
    interleave: int
    n_micro: int
    ticks: int
    queue: int                 # Q: queue slots per (device, chunk)
    cmp_chunk: np.ndarray      # local chunk index computed (0 when idle)
    cmp_slot: np.ndarray       # flat input slot (trash when inject/idle)
    cmp_m: np.ndarray          # microbatch computed this tick (-1 idle)
    inj_m: np.ndarray          # microbatch injected at stage 0 (-1 none)
    rcv_slot: np.ndarray       # flat slot for this tick's arrival (trash ok)
    out_m: np.ndarray          # output slot for this tick's arrival (-1)
    busy: np.ndarray           # (S,) busy-tick counts (bubble accounting)

    @property
    def gpipe_chunk_ticks(self) -> int:
        """The GPipe schedule's cost in the same chunk-tick units: it runs
        (m + S - 1) ticks of V chunks each."""
        return self.interleave * (self.n_micro + self.n_stages - 1)


def build_interleaved_schedule(n_stages: int, interleave: int,
                               n_micro: int) -> InterleavedSchedule:
    """Simulate the drain-first greedy schedule and emit its tick tables.

    Model: one chunk-apply per device per tick; each tick every device
    ppermutes the buffer it just produced to the next ring device, where it
    becomes consumable the FOLLOWING tick.  Device 0 injects microbatches
    into logical stage 0 (directly from the microbatch store — no queue
    slot) whenever it has no higher-stage work ready; completed microbatches
    (stage S·V - 1, computed on device S-1) arrive back at device 0 as
    outputs.
    """
    S, V, M = n_stages, interleave, n_micro
    if S < 1 or V < 1 or M < 1:
        raise ValueError(f"bad schedule request S={S} V={V} M={M}")
    J = S * V

    pools: list[list[list[bool]]] = [
        [[] for _ in range(V)] for _ in range(S)]
    ready: list[list[tuple]] = [[] for _ in range(S)]  # (j, m, (v, q))
    rows: list[dict] = []
    next_inject = 0
    done = 0
    t = 0
    max_t = 4 * (V * M + J + S) + 16   # generous watchdog, never binds

    while done < M:
        if t >= max_t:
            raise RuntimeError(
                f"schedule simulation did not converge (S={S} V={V} M={M})")
        row = {
            "cmp_chunk": np.zeros(S, np.int32),
            "cmp_slot": [-1] * S,          # (v, q) tuples where active
            "cmp_m": np.full(S, -1, np.int32),
            "inj_m": np.full(S, -1, np.int32),
            "rcv_slot": [-1] * S,          # (v, q) tuples where active
            "out_m": np.full(S, -1, np.int32),
        }
        sends: list[tuple | None] = [None] * S

        # compute phase: Megatron-shaped policy on device 0 — FILL until
        # S*V microbatches are in flight (the pipeline depth), then
        # drain-first (1F1B steady state); other devices always drain
        # their highest ready stage.  Pure drain-first starves injection
        # (only ~S in flight) and degenerates to the GPipe bubble.
        in_flight = next_inject - done
        for s in range(S):
            best = None
            for entry in ready[s]:
                j, m, _ = entry
                key = (j, -m)
                if best is None or key > best[0]:
                    best = (key, entry)
            if s == 0 and next_inject < M and (
                    best is None or in_flight < J):
                row["inj_m"][0] = next_inject
                row["cmp_chunk"][0] = 0
                row["cmp_m"][0] = next_inject
                sends[0] = (0, next_inject)
                next_inject += 1
                continue
            if best is None:
                continue
            _, (j, m, (v, q)) = best
            ready[s].remove((j, m, (v, q)))
            pools[s][v][q] = False          # slot consumed at body start
            row["cmp_chunk"][s] = j // S
            row["cmp_slot"][s] = (v, q)     # flattened after Q is known
            row["cmp_m"][s] = m
            sends[s] = (j, m)

        # arrival phase: buffers land at end of tick t, consumable at t+1
        for s in range(S):
            if sends[s] is None:
                continue
            j, m = sends[s]
            d = (s + 1) % S
            if j + 1 == J:
                assert d == 0, "final stage must feed device 0"
                row["out_m"][0] = m
                done += 1
                continue
            v2 = (j + 1) // S
            pool = pools[d][v2]
            try:
                q2 = pool.index(False)
                pool[q2] = True
            except ValueError:
                pool.append(True)
                q2 = len(pool) - 1
            row["rcv_slot"][d] = (v2, q2)
            ready[d].append((j + 1, m, (v2, q2)))

        rows.append(row)
        t += 1

    Q = max(1, max(len(p) for dev in pools for p in dev))
    trash = V * Q

    # cmp_slot / rcv_slot rows hold (v, q) tuples where active, -1 where not
    cmp_slot = np.full((t, S), trash, np.int32)
    rcv_slot = np.full((t, S), trash, np.int32)
    for tt, row in enumerate(rows):
        for s in range(S):
            for name, table in (("cmp_slot", cmp_slot),
                                ("rcv_slot", rcv_slot)):
                v = row[name][s]
                if isinstance(v, tuple):
                    table[tt, s] = v[0] * Q + v[1]
    busy = np.zeros(S, np.int64)
    for row in rows:
        for s in range(S):
            active = (row["inj_m"][s] >= 0
                      or isinstance(row["cmp_slot"][s], tuple))
            busy[s] += bool(active)

    return InterleavedSchedule(
        n_stages=S, interleave=V, n_micro=M, ticks=t, queue=Q,
        cmp_chunk=np.stack([r["cmp_chunk"] for r in rows]),
        cmp_slot=cmp_slot,
        cmp_m=np.stack([r["cmp_m"] for r in rows]),
        inj_m=np.stack([r["inj_m"] for r in rows]),
        rcv_slot=rcv_slot,
        out_m=np.stack([r["out_m"] for r in rows]),
        busy=busy,
    )


def stack_trunk_params_interleaved(trunk_params: dict, depth: int,
                                   n_stages: int, interleave: int,
                                   fmt: str = "blocks_{}"):
    """Stack per-block params into leaves of shape (S, V, depth/(S·V), ...):
    element [s, v, c] is block (v·S + s)·Lc + c — logical stage v·S + s is
    device s's chunk v (contiguous blocks per logical stage)."""
    S, V = n_stages, interleave
    if depth % (S * V):
        raise ValueError(
            f"depth {depth} not divisible by {S} stages x {V} chunks")
    Lc = depth // (S * V)
    blocks = [trunk_params[fmt.format(i)] for i in range(depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    # (depth, ...) -> (V, S, Lc, ...) -> (S, V, Lc, ...)
    return jax.tree.map(
        lambda a: a.reshape(V, S, Lc, *a.shape[1:]).swapaxes(0, 1),
        stacked)


def pipeline_interleaved(block_apply, local_blocks, micro_carry,
                         sched: InterleavedSchedule, axis: str,
                         micro_extras=None):
    """Interleaved ring executor; runs inside shard_map over `axis`.

    local_blocks: this device's (V, Lc, ...) stacked chunk params.
    micro_carry: replicated pytree with leading (n_micro, Bm, ...) axes.
    micro_extras: optional replicated pytree of per-microbatch constants
    (same leading axes) every block consumes but never transforms; they
    do NOT rotate through the ring — the `cmp_m` schedule table says
    which microbatch a device computes each tick, so it re-takes the
    extras locally (with extras, block_apply(p, carry, extras)).
    Returns the pytree after all S·V logical stages, same leading axes.
    """
    from uni_adapter_tpu.parallel.pp import ring_perm, take_micro as take

    idx = jax.lax.axis_index(axis)
    S, V, Q = sched.n_stages, sched.interleave, sched.queue
    n_micro = jax.tree.leaves(micro_carry)[0].shape[0]
    assert n_micro == sched.n_micro

    def chunk_fn(v):
        def run(carry, extras):
            def blk(c, p):
                if micro_extras is None:
                    return block_apply(p, c), None
                return block_apply(p, c, extras), None
            params_v = jax.tree.map(lambda a: a[v], local_blocks)
            carry, _ = jax.lax.scan(blk, carry, params_v)
            return carry
        return run

    branches = [chunk_fn(v) for v in range(V)]
    proto = jax.tree.map(jnp.zeros_like, take(micro_carry, 0))
    qbuf = jax.tree.map(
        lambda a: jnp.zeros((V * Q + 1,) + a.shape, a.dtype), proto)
    outs = jax.tree.map(jnp.zeros_like, micro_carry)
    perm = ring_perm(S)

    xs = tuple(jnp.asarray(tbl) for tbl in (
        sched.cmp_chunk, sched.cmp_slot, sched.cmp_m, sched.inj_m,
        sched.rcv_slot, sched.out_m))

    def tick(state, row):
        qbuf, outs = state
        cmp_chunk_r, cmp_slot_r, cmp_m_r, inj_m_r, rcv_slot_r, out_m_r = row
        cc = cmp_chunk_r[idx]
        cs = cmp_slot_r[idx]
        im = inj_m_r[idx]
        rs = rcv_slot_r[idx]
        om = out_m_r[idx]

        qin = take(qbuf, cs)
        inj = take(micro_carry, jnp.clip(im, 0, n_micro - 1))
        x = jax.tree.map(lambda a, b: jnp.where(im >= 0, a, b), inj, qin)
        extras = None
        if micro_extras is not None:
            # idle ticks (cmp_m == -1) compute chunk 0 on a dead buffer
            # that only ever lands in the trash slot — the clip is harmless
            extras = take(micro_extras,
                          jnp.clip(cmp_m_r[idx], 0, n_micro - 1))
        y = jax.lax.switch(cc, branches, x, extras)
        arr = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm), y)

        qbuf = jax.tree.map(
            lambda qb, a: jax.lax.dynamic_update_index_in_dim(qb, a, rs, 0),
            qbuf, arr)
        mc = jnp.clip(om, 0, n_micro - 1)
        outs = jax.tree.map(
            lambda o, a: jnp.where(
                om >= 0, jax.lax.dynamic_update_index_in_dim(o, a, mc, 0),
                o),
            outs, arr)
        return (qbuf, outs), None

    (_, outs), _ = jax.lax.scan(tick, (qbuf, outs), xs)
    # finished microbatches land on device 0 only — psum broadcasts them
    return jax.tree.map(lambda o: jax.lax.psum(o, axis), outs)
