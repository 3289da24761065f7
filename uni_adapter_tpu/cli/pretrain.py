"""CLI: contrastive pretraining of a point encoder into CLIP space.

The training entry point the reference never shipped (it carries the
Uni3D training-era loss and DDP scaffolding — `models/losses.py:7-69`,
`utils/distributed.py` — but no driver; it is a TTA repo).  This wires the
full TPU-first stack end to end:

  sharded corpus (data/streaming.ShardedCorpus, mmap/C++ fast path)
    → deterministic resumable StreamingLoader (per-process slices)
    → global jax.Array over the mesh dp axis (streaming.global_batch)
    → train.make_dp_train_step (all_gather negatives, pmean grads), or
      `--parallel pp`: parallel/pp.make_pp_train_step_uni3d (GPipe stages
      over the device ring, trunk weights + optimizer moments sharded
      depth-wise, replicated batch; `--pp-tp-size K` composes PP x TP on
      a 2-D (stage, model) mesh — block matrices Megatron-shard over the
      model axis too), or
      `--parallel sp`: parallel/sp.make_sp_train_step_uni3d (trunk tokens
      sharded over the mesh, exact ring attention, replicated batch)
    → checkpoint.save_state every --ckpt-every steps, including the
      LOADER cursor — `--resume` continues the exact batch schedule.

Multi-host: launch one process per host with the same flags (plus
`parallel.bootstrap` env); each process reads only its own rows.
Falls back to a synthetic corpus when no shards are given, so the
pipeline is runnable anywhere:

    python pretrain.py --device cpu --steps 20 --batch-size 16 \
        --depth 1 --out /tmp/pretrain
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import time


def _synthetic_corpus(root: str, n_shards: int = 2, per_shard: int = 64,
                      npoints: int = 128, dim: int = 64):
    """Write a tiny random corpus (pc + frozen-tower embedding shards)."""
    import numpy as np

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    pc, tx, im = [], [], []
    for s in range(n_shards):
        for tag, shape, group in (("pc", (per_shard, npoints, 6), pc),
                                  ("text", (per_shard, dim), tx),
                                  ("image", (per_shard, dim), im)):
            # shape in the name: re-running with different --embed-dim /
            # --npoints into the same --out never reuses stale shards
            p = os.path.join(
                root, f"{tag}_{'x'.join(map(str, shape[1:]))}_{s:03d}.npy")
            if not os.path.exists(p):
                np.save(p, rng.standard_normal(shape).astype(np.float32))
            group.append(p)
    return pc, tx, im


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pc-shards", default=None,
                        help="glob of point-cloud .npy shards")
    parser.add_argument("--text-shards", default=None)
    parser.add_argument("--image-shards", default=None)
    parser.add_argument("--out", default="outputs/pretrain")
    parser.add_argument("--batch-size", type=int, default=64,
                        help="GLOBAL batch (split across processes)")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--warmup-steps", type=int, default=10)
    parser.add_argument("--weight-decay", type=float, default=0.05)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--prefetch", type=int, default=2)
    parser.add_argument("--ckpt-every", type=int, default=50)
    parser.add_argument("--resume", action="store_true",
                        help="resume from <out>/ckpt if present")
    parser.add_argument("--ckpt-async", action="store_true",
                        help="write checkpoints on a background thread so "
                             "the train loop never stalls on IO (jax "
                             "arrays are immutable — serialising the "
                             "previous state races nothing; the atomic "
                             "tmp+rename in checkpoint.save_state still "
                             "guarantees a consistent file pair)")
    parser.add_argument("--log-every", type=int, default=10)
    # model size (Uni3D point encoder; defaults are demo-sized — pass the
    # EVA02-L numbers for a real run)
    parser.add_argument("--depth", type=int, default=2)
    parser.add_argument("--trans-dim", type=int, default=64)
    parser.add_argument("--embed-dim", type=int, default=64,
                        help="must match the frozen-tower embedding dim")
    parser.add_argument("--num-group", type=int, default=16)
    parser.add_argument("--group-size", type=int, default=8)
    parser.add_argument("--encoder-dim", type=int, default=32)
    parser.add_argument("--heads", type=int, default=4)
    parser.add_argument("--parallel", default="dp",
                        choices=["dp", "pp", "sp"],
                        help="dp: data-parallel over all devices (negatives "
                             "gathered, grads pmean'd).  pp: GPipe pipeline "
                             "stages over all devices (depth must divide by "
                             "the device count; single-process only).  "
                             "sp: sequence-parallel — trunk tokens shard "
                             "over all devices with exact ring attention "
                             "(parallel/sp.py; the large-N lever — "
                             "single-process only, batch replicates)")
    parser.add_argument("--pp-microbatches", type=int, default=None,
                        help="GPipe microbatch count (default: one per "
                             "stage); the local batch must divide by it")
    parser.add_argument("--pp-stages", type=int, default=None,
                        help="pipeline stage count (default: all devices); "
                             "the model depth must divide by it")
    parser.add_argument("--pp-interleave", type=int, default=1,
                        help="virtual chunks per stage (interleaved "
                             "schedule, parallel/pp_interleave.py): the "
                             "fill/drain bubble shrinks ~V x; depth must "
                             "divide by stages x V")
    parser.add_argument("--pp-tp-size", type=int, default=1,
                        help="compose PP x TP: Megatron-shard each "
                             "stage's block matrices over this many "
                             "devices (2-D (stage, model) mesh); heads "
                             "and the SwiGLU hidden dim must divide by it")
    parser.add_argument("--device", default="default",
                        help="jax platform override (cpu/tpu)")
    args = parser.parse_args(argv)

    if args.device != "default":
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from uni_adapter_tpu import checkpoint
    from uni_adapter_tpu.data.streaming import (ShardedCorpus,
                                                StreamingLoader, global_batch)
    from uni_adapter_tpu.models.uni3d import Uni3D
    from uni_adapter_tpu.train import (init_train_state, make_dp_train_step,
                                       make_optimizer)
    from uni_adapter_tpu.parallel.bootstrap import init_distributed_device
    from uni_adapter_tpu.utils.logging import setup_logging
    from uni_adapter_tpu.utils.profiling import enable_compile_cache

    # must run BEFORE any backend use (single-process launches are a no-op)
    # — without it a RANK/WORLD_SIZE launch would see process_count()==1
    # and every process would stream the same rows
    dist = init_distributed_device()
    enable_compile_cache()
    os.makedirs(args.out, exist_ok=True)
    setup_logging(os.path.join(args.out, "pretrain.log"))
    if dist["distributed"]:
        logging.info("distributed: process %d/%d, %d global devices",
                     dist["rank"], dist["world_size"], dist["device_count"])

    if args.pc_shards:
        pc = sorted(glob.glob(args.pc_shards))
        tx = sorted(glob.glob(args.text_shards)) if args.text_shards else None
        im = (sorted(glob.glob(args.image_shards))
              if args.image_shards else None)
        if not pc:
            raise FileNotFoundError(f"no shards match {args.pc_shards!r}")
        if not tx:
            raise ValueError(
                "--text-shards is required with --pc-shards: the "
                "contrastive objective distils into the frozen TEXT tower "
                "embeddings (pc<->image alone is the masked secondary leg)")
    else:
        logging.info("no --pc-shards: synthetic corpus under %s/synthetic",
                     args.out)
        synth_root = os.path.join(args.out, "synthetic")
        if jax.process_index() == 0:
            try:
                pc, tx, im = _synthetic_corpus(synth_root, dim=args.embed_dim)
            except Exception:
                # surface the real cause before peers see only an opaque
                # barrier/heartbeat failure
                logging.exception("rank 0 failed writing the synthetic "
                                  "corpus under %s", synth_root)
                raise
        if jax.process_count() > 1:
            # one writer on a shared filesystem; everyone else waits, then
            # re-derives the (now existing) shard paths
            from jax.experimental import multihost_utils
            if jax.process_index() != 0:
                logging.info("waiting for rank 0 to write the synthetic "
                             "corpus under %s", synth_root)
            multihost_utils.sync_global_devices("synthetic-corpus")
        if jax.process_index() != 0:
            pc, tx, im = _synthetic_corpus(synth_root, dim=args.embed_dim)
    corpus = ShardedCorpus(pc, tx, im)
    loader = StreamingLoader(corpus, args.batch_size, seed=args.seed,
                             prefetch=args.prefetch)
    logging.info("corpus: %d samples in %d shards; %d steps/epoch "
                 "(global batch %d, local %d)", len(corpus), len(corpus.pc),
                 loader.steps_per_epoch, args.batch_size,
                 loader.local_batch_size)

    model = Uni3D(trans_dim=args.trans_dim, embed_dim=args.embed_dim,
                  num_group=args.num_group, group_size=args.group_size,
                  encoder_dim=args.encoder_dim, depth=args.depth,
                  num_heads=args.heads, dtype=jnp.float32)
    tx_opt = make_optimizer(lr=args.lr, weight_decay=args.weight_decay,
                            total_steps=args.steps,
                            warmup_steps=args.warmup_steps)
    example = jnp.zeros((1,) + corpus.sample_shape, jnp.float32)

    if args.parallel == "pp":
        # pipeline stages over ALL devices; the model's depth shards, the
        # batch replicates (negatives are global by construction)
        from uni_adapter_tpu.parallel import pp as ppar

        if jax.process_count() > 1:
            raise ValueError("--parallel pp is single-process (each stage "
                             "needs the full replicated batch); use dp for "
                             "multi-host runs")
        tp = args.pp_tp_size
        avail = len(jax.devices())
        if tp < 1 or avail % tp:
            raise ValueError(f"--pp-tp-size {tp} must divide the device "
                             f"count ({avail})")
        n_stages = (args.pp_stages if args.pp_stages is not None
                    else avail // tp)
        if not 1 <= n_stages * tp <= avail:
            raise ValueError(f"--pp-stages {n_stages} x --pp-tp-size {tp} "
                             f"needs {n_stages * tp} devices, have {avail}")
        if tp > 1:
            mesh = Mesh(np.array(jax.devices()[:n_stages * tp]).reshape(
                n_stages, tp), ("stage", "model"))
            tp_axis = "model"
        else:
            mesh = Mesh(np.array(jax.devices()[:n_stages]), ("stage",))
            tp_axis = None
        prepare, pp_step = ppar.make_pp_train_step_uni3d(
            model, tx_opt, mesh, n_micro=args.pp_microbatches,
            tp_axis=tp_axis, interleave=args.pp_interleave, donate=True)
        state = ppar.init_pp_train_state(
            model, jax.random.PRNGKey(args.seed), example, tx_opt, prepare)
        logging.info("pipeline parallel: %d stages x %d chunks/stage x "
                     "%d blocks/chunk, %d microbatches%s", n_stages,
                     args.pp_interleave,
                     args.depth // (n_stages * args.pp_interleave),
                     args.pp_microbatches or n_stages,
                     f", x {tp}-way tensor" if tp > 1 else "")
    elif args.parallel == "sp":
        # tokens shard over ALL devices (exact ring attention); the batch
        # replicates, so negatives are global by construction.  The SP
        # param layout — (L, ...)-stacked trunk blocks + rest, all
        # replicated — does not depend on the mesh size, so an sp
        # checkpoint resumes on any device count
        from uni_adapter_tpu.parallel import pp as ppar
        from uni_adapter_tpu.parallel import sp as spar

        if jax.process_count() > 1:
            raise ValueError("--parallel sp is single-process (every "
                             "device needs the full replicated batch); "
                             "use dp for multi-host runs")
        mesh = Mesh(np.array(jax.devices()), ("seq",))
        prepare, sp_step = spar.make_sp_train_step_uni3d(model, tx_opt, mesh,
                                                         donate=True)
        state = ppar.init_pp_train_state(
            model, jax.random.PRNGKey(args.seed), example, tx_opt, prepare)
        logging.info("sequence parallel: %d tokens over %d devices "
                     "(ring attention)", args.num_group + 1,
                     len(jax.devices()))
    else:
        state = init_train_state(model, jax.random.PRNGKey(args.seed),
                                 example, tx_opt)

    ckpt_path = os.path.join(args.out, "ckpt")
    start_step = 0
    if args.resume and os.path.exists(ckpt_path + ".npz"):
        blob = checkpoint.restore_state(ckpt_path)
        # refuse every silent-divergence vector, not just the batch
        # schedule: a geometry mismatch (pp stage count / depth) would
        # silently DROP trunk blocks (each stage scans only its local
        # (L/S, ...) slice), and a weight-decay-recipe change would
        # silently alter the trajectory mid-run
        checks = [("data_seed", args.seed), ("global_batch", args.batch_size),
                  ("depth", args.depth),
                  # the corpus SIZE shapes the schedule too: the epoch
                  # permutation is rng.permutation(len(corpus)) and the
                  # resume cursor derives from steps_per_epoch — shards
                  # added/removed under the same glob would silently skip
                  # or repeat samples
                  ("corpus_size", len(corpus)),
                  # the optimizer recipe shapes the whole trajectory: lr /
                  # decay scale the updates, warmup reshapes the schedule.
                  # --steps is deliberately NOT checked: continuing a run
                  # with a longer horizon is the resume workflow, and it
                  # re-stretches the cosine tail by documented design
                  ("lr", args.lr), ("weight_decay", args.weight_decay),
                  ("warmup_steps", args.warmup_steps)]
        if args.parallel == "pp":
            checks.append(("pp_stages", n_stages))
            checks.append(("pp_interleave", args.pp_interleave))
            # tp resizing is layout-safe (the stacked tree is identical;
            # only the shardings change) but unstamped provenance is not —
            # default 1 for pre-tp checkpoints
            if int(blob.get("pp_tp_size", 1)) != args.pp_tp_size:
                logging.info("resuming a pp checkpoint trained at "
                             "pp_tp_size=%d with --pp-tp-size %d (layout "
                             "identical; re-sharding onto the new mesh)",
                             int(blob.get("pp_tp_size", 1)),
                             args.pp_tp_size)
        for key, now in checks:
            if key not in blob:
                # a missing stamp means unknown provenance — exactly when
                # the guard matters most (consistent with the wd_mask
                # refusal below)
                raise ValueError(
                    f"the checkpoint carries no {key!r} stamp, so the "
                    f"resume guard cannot verify it matches {key}={now}; "
                    "restart training or re-stamp the checkpoint if its "
                    "recipe is known")
            was = type(now)(blob[key])
            if was != now:
                raise ValueError(
                    f"--resume with {key}={now} but the checkpoint was "
                    f"trained with {key}={was}: the run would silently "
                    "diverge (batch schedule, trunk-block layout, or "
                    "optimizer trajectory)")
        was_par = str(blob.get("parallel", "dp"))
        if was_par != args.parallel:
            raise ValueError(
                f"--resume with --parallel {args.parallel} but the "
                f"checkpoint was trained with {was_par}: the param trees "
                "are laid out differently (PP stacks the trunk blocks)")
        was_mask = str(blob.get("wd_mask", "unstamped"))
        if was_mask != "name":
            raise ValueError(
                f"the checkpoint's weight-decay-mask recipe is "
                f"{was_mask!r} (current: 'name', train.decay_mask); an "
                "unstamped checkpoint may predate the name-based mask, and "
                "resuming across a mask change silently alters which "
                "params decay — restart training or re-stamp the "
                "checkpoint if its recipe is known")
        if args.parallel == "pp":
            # restored leaves are unsharded host arrays; re-apply the full
            # stage-sharded layout (params AND optimizer moments — the
            # moments live stage-sharded, same as the weights) using the
            # freshly initialized state as the sharding template.  Leaves
            # whose template sharding is not on the stage mesh (scalars:
            # logit_scale, step, schedule counts) replicate over it —
            # device_put commits arrays, and a committed single-device
            # scalar would conflict with the mesh-sharded params
            from jax.sharding import NamedSharding, PartitionSpec

            def stage_sharding(t):
                sh = t.sharding
                if getattr(sh, "mesh", None) is not None:
                    return sh
                return NamedSharding(mesh, PartitionSpec())

            state = jax.device_put(
                blob["train"], jax.tree.map(stage_sharding, state))
        else:
            # dp/sp: leave the leaves uncommitted — the jitted step
            # replicates them over the mesh (committing to the template's
            # single init device would conflict with the sharded batch;
            # sp's (L, ...)-stacked layout is mesh-size-agnostic)
            state = blob["train"]
        # the cursor is DERIVED from the checkpointed step — one atomic
        # artifact, nothing to desynchronize on a crash mid-save
        start_step = int(state.step)
        loader.load_state_dict({
            "epoch": start_step // loader.steps_per_epoch,
            "step": start_step % loader.steps_per_epoch,
            "seed": args.seed})
        logging.info("resumed at train step %d (loader %s)", start_step,
                     loader.state_dict())

    if jax.process_count() > 1:
        # ranks must agree on the resume point: with --out on host-local
        # disks only rank 0 holds the checkpoint (save() is rank-0-gated),
        # and a silent disagreement would run mismatched step ranges whose
        # collectives deadlock — fail loudly instead
        from jax.experimental import multihost_utils
        steps_all = multihost_utils.process_allgather(
            jnp.asarray([start_step], jnp.int32))
        if int(steps_all.min()) != int(steps_all.max()):
            raise ValueError(
                f"ranks disagree on the resume step ({steps_all.ravel()}): "
                "--out must be a SHARED filesystem so every process sees "
                "the rank-0 checkpoint")

    if args.parallel == "dp":
        mesh = Mesh(np.array(jax.devices()), ("dp",))
        # donate=True: the loop rebinds state each step, so donating the
        # input buffers halves peak params+moments memory at no cost here
        train_fn = make_dp_train_step(model, tx_opt, mesh, donate=True)
    elif args.parallel == "sp":
        train_fn = sp_step
    else:
        train_fn = pp_step

    pending_save = []
    save_error = []
    last_saved_step = [start_step - 1]

    def _join_pending():
        """Join the in-flight async save and PROPAGATE its failure — a
        dropped write exception would let the run log success and exit 0
        with a stale checkpoint."""
        for t in pending_save:
            t.join()
        pending_save.clear()
        if save_error:
            raise RuntimeError(
                "async checkpoint write failed") from save_error.pop()

    def save(at_step: int):
        if jax.process_index() != 0:
            return   # replicated state — one writer (shared-filesystem safe)
        if at_step == last_saved_step[0]:
            return   # final save already landed on a --ckpt-every boundary
        last_saved_step[0] = at_step
        blob = {"train": state, "data_seed": args.seed,
                "global_batch": args.batch_size, "parallel": args.parallel,
                "depth": args.depth, "wd_mask": "name",
                "corpus_size": len(corpus),
                "lr": args.lr, "weight_decay": args.weight_decay,
                "warmup_steps": args.warmup_steps}
        if args.parallel == "pp":
            blob["pp_stages"] = n_stages
            blob["pp_interleave"] = args.pp_interleave
            blob["pp_tp_size"] = args.pp_tp_size
        if args.ckpt_async:
            import threading

            # at most one in-flight snapshot: join the previous first so
            # writes land in order and a slow disk backpressures cleanly
            _join_pending()

            def _write(path=ckpt_path, payload=blob):
                try:
                    checkpoint.save_state(path, payload)
                except BaseException as e:   # surfaced at the next join
                    save_error.append(e)

            th = threading.Thread(target=_write, daemon=True)
            th.start()
            pending_save.append(th)
        else:
            checkpoint.save_state(ckpt_path, blob)

    t0 = time.perf_counter()
    for step in range(start_step, args.steps):
        if args.parallel == "dp":
            batch = global_batch(next(loader), mesh, "dp")
        else:
            # PP: the batch replicates (every stage sees all microbatches)
            batch = {k: jnp.asarray(v) for k, v in next(loader).items()}
        state, metrics = train_fn(state, batch["pc"], batch["text_embed"],
                                  batch["image_embed"], batch["mask"])
        if (step + 1) % args.log_every == 0 or step + 1 == args.steps:
            loss = float(metrics["loss"])
            dt = time.perf_counter() - t0
            logging.info("step %d/%d  loss %.4f  scale %.2f  "
                         "%.1f samples/s", step + 1, args.steps, loss,
                         float(jnp.exp(state.logit_scale)),
                         args.batch_size * (step + 1 - start_step) / dt)
        if (step + 1) % args.ckpt_every == 0:
            save(step + 1)
    save(args.steps)
    _join_pending()   # drain the in-flight async snapshot, surface failure
    loader.close()
    logging.info("done: %d steps, checkpoint at %s.npz", args.steps,
                 ckpt_path)
    return state


def cli() -> int:
    """Console-script entry (pyproject.toml): exit 0 on success —
    main()'s return value is in-process API, not an exit code."""
    main()
    return 0


if __name__ == "__main__":
    raise SystemExit(cli())
