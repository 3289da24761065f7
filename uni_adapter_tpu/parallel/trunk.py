"""Trunk (encoder) parallelism composition for product entry points.

Builds the mesh for the configured --trunk-parallel mode, re-shards the
params onto it, and returns the matching encode_fn for
engine.make_step_fn / make_scan_fn.  The adaptation loop itself stays
replicated — only the encoder forward is sharded.  Shared by the
evaluation CLI (cli/tta.py) and the serving CLI (cli/serve.py).

No reference analogue — the reference is single-GPU end to end
(SURVEY.md §2.4); TP/PP/SP here are the beyond-reference capacity and
large-N levers (parallel/tp.py, parallel/pp.py, parallel/sp.py).
"""
from __future__ import annotations

import logging

import numpy as np


def prepare_trunk_parallel(cfg, model, params):
    """Shard the encoder trunk per cfg.run.trunk_parallel: build the mesh,
    re-shard the params onto it, and return (prepared_params, encode_fn)
    for engine.make_step_fn/make_scan_fn.  The adaptation loop itself stays
    replicated — only the trunk forward changes."""
    import jax
    from jax.sharding import Mesh

    kind = cfg.model.vlm3d
    devices = np.asarray(jax.devices())
    mode = cfg.run.trunk_parallel
    if mode == "pp":
        from uni_adapter_tpu.parallel.pp import make_pp_encode_fn

        S = (len(devices) if cfg.run.trunk_stages is None
             else cfg.run.trunk_stages)
        if not 1 <= S <= len(devices):
            raise ValueError(f"--trunk-stages {S} must be in "
                             f"[1, {len(devices)}]")
        mesh = Mesh(devices[:S], ("stage",))
        prepare, encode = make_pp_encode_fn(
            model, mesh, kind, interleave=cfg.run.pp_interleave)
        logging.info("trunk parallelism: pipeline, %d stages x %d "
                     "chunks/stage", S, cfg.run.pp_interleave)
    elif mode == "tp":
        from uni_adapter_tpu.parallel.tp import make_tp_encode_fn

        mesh = Mesh(devices, ("model",))
        prepare, encode = make_tp_encode_fn(model, mesh, kind)
        logging.info("trunk parallelism: tensor (Megatron), %d-way",
                     len(devices))
    elif mode == "sp":
        from uni_adapter_tpu.parallel.sp import make_sp_encode_fn

        mesh = Mesh(devices, ("seq",))
        prepare, encode = make_sp_encode_fn(model, mesh, kind)
        logging.info("trunk parallelism: sequence (ring attention), "
                     "%d-way", len(devices))
    else:
        raise ValueError(mode)
    try:
        return prepare(params), encode
    except ValueError as e:
        raise ValueError(
            f"--trunk-parallel {mode}: the model's shapes don't divide "
            f"over the {mesh.devices.size}-device mesh ({e}).  Pick "
            "dimensions divisible by the device count — MLP hidden size "
            "and head count for tp, trunk depth (x --pp-interleave) for "
            "pp.") from e
