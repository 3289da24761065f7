"""Experiment driver: the 15-corruption TTA evaluation loop.

Rebuild of the reference's CLI entry point (main_test-time.py:25-104):
parse config, set up logging, loop corruptions, run the TTA core per
corruption, log Top-1/3/5 + the mean.  Differences by design:

  * the stream runs as one on-device lax.scan per corruption
    (engine.run_stream_scan) — no DataLoader workers, no per-batch host
    round-trips; pass --scan false for the host-iterator path;
  * model weights load from a converted checkpoint when provided
    (models/loader.py), otherwise the run is zero-shot-random (useful for
    throughput work, meaningless for accuracy — a warning is logged);
  * distributed modes per RunConfig.dist_mode (parallel/mesh.py stream
    sharding; parallel/ep.py class-sharded expert parallelism);
  * --trunk-parallel {tp,pp,sp} shards the ENCODER over the devices
    (tensor / pipeline / ring-attention sequence parallelism — capacity
    and large-N levers for trunks beyond one chip) while the adaptation
    loop stays replicated;
  * --continual carries ONE adaptation trajectory through the whole
    corruption sequence (continual-TTA protocol) instead of the
    reference's per-corruption reset.

Example:
    python main.py --root /data/modelnet40_c --dataset-name modelnet \
        --precomputed-text-features large --dota-use-mode-dota true
    # installed: uni-adapter-tta <same flags>
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from datetime import datetime

import numpy as np

from uni_adapter_tpu.config import CORRUPTIONS, parse_args
from uni_adapter_tpu.utils.logging import setup_logging

GREEN, RESET = "\033[92m", "\033[0m"


def build_model(cfg):
    import jax
    import jax.numpy as jnp

    from uni_adapter_tpu.models.loader import init_or_load_params
    from uni_adapter_tpu.models.pointbert import create_ulip
    from uni_adapter_tpu.models.ppta import create_openshape
    from uni_adapter_tpu.models.uni3d import create_uni3d

    kind = cfg.model.vlm3d
    if kind == "uni3d":
        model = create_uni3d(cfg.model)
        example = jnp.zeros((1, cfg.data.npoints, 6), jnp.float32)
        init_args = (example,)
    elif kind == "ulip":
        model = create_ulip(cfg.model)
        init_args = (jnp.zeros((1, cfg.data.npoints, 3), jnp.float32),)
    elif kind == "openshape":
        model = create_openshape(cfg.model)
        init_args = (jnp.zeros((1, cfg.data.npoints, 3), jnp.float32),
                     jnp.zeros((1, cfg.data.npoints, 6), jnp.float32))
    else:
        raise ValueError(kind)
    params = init_or_load_params(model, init_args, cfg.model.checkpoint_path,
                                 seed=cfg.run.seed)
    return model, params


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from uni_adapter_tpu import engine
    from uni_adapter_tpu.anchors import get_text_anchors
    from uni_adapter_tpu.data.datasets import load_tta_dataset
    from uni_adapter_tpu.parallel import mesh as pmesh

    cfg = parse_args(argv)
    if cfg.run.device != "default":
        jax.config.update("jax_platforms", cfg.run.device)
    # multi-host launches (RANK/WORLD_SIZE env, the reference's
    # utils/distributed.py convention) must initialise BEFORE any backend
    # use; single-process runs are a no-op
    from uni_adapter_tpu.parallel.bootstrap import init_distributed_device
    dist = init_distributed_device()
    from uni_adapter_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    name = cfg.run.name or datetime.now().strftime("%Y_%m_%d-%H_%M_%S")
    log_dir = os.path.join(cfg.run.output_dir, name)
    os.makedirs(log_dir, exist_ok=True)
    setup_logging(os.path.join(log_dir, "out.log"))
    logging.info("Running Experiment: %s", name)
    logging.info("Config: %s", cfg)
    if dist["distributed"]:
        logging.info("distributed: process %d/%d, %d global devices",
                     dist["rank"], dist["world_size"], dist["device_count"])

    model, params = build_model(cfg)
    if cfg.model.checkpoint_path is None:
        logging.warning("No checkpoint configured — random weights; "
                        "accuracy numbers are not meaningful.")

    # optional trunk (model) parallelism: shard the encoder forward over
    # the devices while the adaptation loop stays replicated (the trunk
    # holds the model's mass — TP/PP/SP are capacity and large-N levers;
    # config.py validates the dist_mode/vmap interplay at parse time)
    encode_fn = None
    if cfg.run.trunk_parallel != "none":
        from uni_adapter_tpu.parallel.trunk import prepare_trunk_parallel

        params, encode_fn = prepare_trunk_parallel(cfg, model, params)

    text = get_text_anchors_with_fallback(cfg)

    corruptions = (list(CORRUPTIONS) if cfg.data.corruption == "all"
                   else [cfg.data.corruption])
    results = {}
    zs_results = {}

    # optional XLA profiler capture around the whole evaluation
    # (--profile-dir; the reference's only tracing is paired CUDA events,
    # Uni_Adapter.py:365-366,577-579)
    import contextlib

    from uni_adapter_tpu.utils import profiling
    profile_ctx = (profiling.trace(cfg.run.profile_dir)
                   if cfg.run.profile_dir else contextlib.nullcontext())

    if cfg.run.vmap_corruptions and len(corruptions) > 1:
        with profile_ctx:
            return run_all_vmapped(cfg, model, params, text, corruptions,
                                   log_dir)

    # ONE jitted scan across the corruption loop: the step function does not
    # depend on the corruption name, so rebuilding it per corruption would
    # just recompile the same program 15 times (~25 s each on the trunk).
    scan_fn = (jax.jit(engine.make_scan_fn(cfg, model, encode_fn=encode_fn))
               if cfg.run.use_scan else None)
    step_fn = (jax.jit(engine.make_step_fn(cfg, model, encode_fn=encode_fn))
               if not cfg.run.use_scan else None)

    # continual TTA (--continual): one adaptation trajectory through the
    # whole corruption sequence — the carry below survives the loop instead
    # of re-initialising per corruption (the reference always resets,
    # Uni_Adapter.py:323-361)
    carry_state = None

    with profile_ctx:
        for corr in corruptions:
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data, corruption=corr))
            logging.info("%s Processing corruption: %s %s", "=" * 20, corr, "=" * 20)
            print(f"{GREEN}Loading data for corruption: {corr}{RESET}")
            dataset = load_tta_dataset(cfg)
            pcs, rgbs, targets = dataset.as_arrays(cfg.data.batch_size,
                                                   npoints=cfg.data.npoints,
                                                   seed=cfg.run.seed)
            # batch-0 visualization, best-effort (reference Uni_Adapter.py:371-377);
            # rank-0 only — concurrent writers would interleave the same HTML
            if pmesh.is_primary():
                try:
                    from uni_adapter_tpu.visualize import (
                        visualize_pointclouds_plotly)

                    viz = {f"Sample_{j}_{dataset.class_names[int(targets[0, j])]}":
                           pcs[0, j] for j in range(min(2, pcs.shape[1]))}
                    visualize_pointclouds_plotly(
                        viz,
                        save_path=os.path.join(log_dir, f"vis_{corr}_batch_0"),
                        title=f"{corr} batch 0 input")
                except Exception as e:
                    logging.warning("Visualization failed: %s", e)
            t0 = time.perf_counter()
            if cfg.run.dist_mode == "sharded":
                _, summary = pmesh.run_stream_sharded(
                    cfg, model, params, text, pcs, rgbs, targets,
                    seed=cfg.run.seed)
            elif cfg.run.dist_mode == "psum":
                _, summary = pmesh.run_stream_psum(
                    cfg, model, params, text, pcs, rgbs, targets,
                    seed=cfg.run.seed)
            elif cfg.run.dist_mode == "ep":
                from uni_adapter_tpu.parallel import ep as pep

                state, summary = pep.run_stream_ep(
                    cfg, model, params, text, pcs, rgbs, targets,
                    seed=cfg.run.seed, initial_state=carry_state,
                    shard_encoder=cfg.run.ep_shard_encoder)
                if cfg.run.continual:
                    carry_state = state
            elif not cfg.run.use_scan:
                res = engine.run_stream(cfg, model, params, text,
                                        dataset.iter_batches(
                                            cfg.data.batch_size,
                                            npoints=cfg.data.npoints,
                                            seed=cfg.run.seed),
                                        seed=cfg.run.seed,
                                        print_freq=cfg.run.print_freq,
                                        step_fn=step_fn,
                                        initial_state=carry_state)
                summary = {k: res[k] for k in ("acc1", "acc3", "acc5")}
                if cfg.run.continual:
                    carry_state = res["state"]
            else:
                state, outs = engine.run_stream_scan(
                    cfg, model, params, text, jnp.asarray(pcs), jnp.asarray(rgbs),
                    jnp.asarray(targets), seed=cfg.run.seed, scan_fn=scan_fn,
                    initial_state=carry_state)
                summary = engine.summarize(outs, pcs.shape[0] * pcs.shape[1])
                if cfg.run.continual:
                    carry_state = state
            dt = time.perf_counter() - t0
            logging.info("Final Results: Acc@1 %.3f Acc@3 %.3f Acc@5 %.3f",
                         summary["acc1"], summary["acc3"], summary["acc5"])
            if "zs_acc1" in summary:
                logging.info("Zero-shot baseline (same run): Acc@1 %.3f "
                             "(adaptation %+0.3f)", summary["zs_acc1"],
                             summary["acc1"] - summary["zs_acc1"])
                zs_results[corr] = float(summary["zs_acc1"])
            logging.info("Total time: %.3f ms (%.1f pc/s)",
                         dt * 1e3, pcs.shape[0] * pcs.shape[1] / dt)
            results[corr] = float(summary["acc1"])

        logging.info("Summary of Results: %s", results)
        logging.info("Average Top-1: %.3f", float(np.mean(list(results.values()))))
        if pmesh.is_primary():
            with open(os.path.join(log_dir, "results.json"), "w") as f:
                json.dump(results, f, indent=2)
            if zs_results:
                # the zero-shot column of the same run (real-weight
                # validation reads adapted vs frozen per corruption —
                # scripts/validate_real_weights.sh)
                with open(os.path.join(log_dir, "results_zs.json"),
                          "w") as f:
                    json.dump(zs_results, f, indent=2)
    return results


def run_all_vmapped(cfg, model, params, text, corruptions, log_dir):
    """All corruption streams in ONE vmapped scan (equal lengths required;
    falls back to nothing — the caller already handled the sequential path).
    The reference runs the same 15 streams sequentially
    (main_test-time.py:55-96)."""
    import dataclasses as dc_mod

    import jax.numpy as jnp

    from uni_adapter_tpu import engine
    from uni_adapter_tpu.data.datasets import load_tta_dataset
    from uni_adapter_tpu.parallel import mesh as pmesh

    stacks = []
    for corr in corruptions:
        c = dc_mod.replace(cfg, data=dc_mod.replace(cfg.data, corruption=corr))
        ds = load_tta_dataset(c)
        stacks.append(ds.as_arrays(cfg.data.batch_size,
                                   npoints=cfg.data.npoints,
                                   seed=cfg.run.seed))
    T = min(s[0].shape[0] for s in stacks)
    pcs = np.stack([s[0][:T] for s in stacks])
    rgbs = np.stack([s[1][:T] for s in stacks])
    tgts = np.stack([s[2][:T] for s in stacks])
    logging.info("vmapped sweep: %d streams × %d steps", len(stacks), T)

    t0 = time.perf_counter()
    if cfg.run.dist_mode == "sharded":
        _, summary_s = pmesh.run_streams_sharded(
            cfg, model, params, text, pcs, rgbs, tgts, seed=cfg.run.seed)
        summaries = [{"acc1": a} for a in summary_s["acc1_per_stream"]]
    elif cfg.run.dist_mode == "ep":
        # DP × EP sweep: streams vmapped locally (data axis 1), every
        # stream's class state sharded over ALL devices — the K=1156
        # LVIS deployment of the vmapped sweep (parallel/ep.py
        # run_streams_ep: shard_map(vmap(scan)), per-stream seeds
        # identical to the replicated vmapped run)
        import jax
        from jax.sharding import Mesh
        from uni_adapter_tpu.parallel import ep as pep

        devs = jax.devices()
        mesh = Mesh(np.asarray(devs).reshape(1, len(devs)),
                    ("data", "classes"))
        _, summary_e = pep.run_streams_ep(
            cfg, model, params, text, pcs, rgbs, tgts, mesh=mesh,
            seed=cfg.run.seed,
            shard_encoder=cfg.run.ep_shard_encoder)
        summaries = [{"acc1": a} for a in summary_e["acc1_per_stream"]]
    else:
        _, outs = engine.run_streams_vmapped(
            cfg, model, params, text, jnp.asarray(pcs), jnp.asarray(rgbs),
            jnp.asarray(tgts), seed=cfg.run.seed)
        summaries = engine.summarize_vmapped(outs, T * cfg.data.batch_size)
    dt = time.perf_counter() - t0
    results = {c: float(s["acc1"]) for c, s in zip(corruptions, summaries)}
    zs_results = {c: float(s["zs_acc1"]) for c, s in zip(corruptions,
                                                         summaries)
                  if "zs_acc1" in s}
    total = len(stacks) * T * cfg.data.batch_size
    logging.info("Summary of Results: %s", results)
    logging.info("Average Top-1: %.3f", float(np.mean(list(results.values()))))
    if zs_results:
        logging.info("Zero-shot baseline (same run): %s", zs_results)
    logging.info("Total time: %.1f ms (%.1f pc/s over %d samples)",
                 dt * 1e3, total / dt, total)
    if pmesh.is_primary():
        with open(os.path.join(log_dir, "results.json"), "w") as f:
            json.dump(results, f, indent=2)
        if zs_results:
            with open(os.path.join(log_dir, "results_zs.json"), "w") as f:
                json.dump(zs_results, f, indent=2)
    return results


def get_text_anchors_with_fallback(cfg):
    """Anchors: precomputed bank → on-the-fly text tower → error."""
    from uni_adapter_tpu.anchors import get_text_anchors

    if cfg.data.precomputed_text_features:
        try:
            return get_text_anchors(cfg)
        except FileNotFoundError:
            # configured-but-missing bank: fall through to the text tower
            # (matches the reference's configured-AND-present precedence)
            logging.warning(
                "precomputed bank '%s' not found; falling back to the "
                "on-the-fly text tower",
                cfg.data.precomputed_text_features)

    import jax
    import jax.numpy as jnp

    from uni_adapter_tpu.models.clip_text import create_text_encoder
    from uni_adapter_tpu.models.loader import init_or_load_params

    preset = (cfg.model.vlm3d if cfg.model.vlm3d != "openshape"
              else f"openshape_{cfg.model.oshape_version}")
    tower = create_text_encoder(preset)
    params = init_or_load_params(
        tower, (jnp.zeros((1, 77), jnp.int32),),
        cfg.model.clip_checkpoint_path, seed=cfg.run.seed)
    # params as an argument, not a closure constant (a GB-scale tower
    # closure bakes into the jaxpr and pays constant folding/re-upload)
    params = jax.device_put(params)
    apply = jax.jit(tower.apply)
    return get_text_anchors(cfg, encode_text_fn=lambda t: apply(params, t))


def cli() -> int:
    """Console-script entry (pyproject.toml): exit 0 on success —
    main()'s return value is in-process API, not an exit code."""
    main()
    return 0


if __name__ == "__main__":
    raise SystemExit(cli())
