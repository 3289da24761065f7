"""Example: watch test-time adaptation beat zero-shot on a structured stream.

A self-contained demonstration of the framework's reason to exist
(reference Uni_Adapter.py:581-595): a corrupted stream where frozen
zero-shot classification degrades and the online adapters recover accuracy
— no datasets or checkpoints needed.

The stream is the calibrated ring-of-classes + coherent-drift construction
from tests/test_efficacy.py: K classes on a tight ring in the toy
encoder's input space, anchors built from the CLEAN class means, then the
whole ring rotated toward its neighbours (systematic anchor misalignment)
with per-sample jitter (decision noise).  Streaming density estimation
relocates the decision boundaries the frozen anchors miss.

Run:
    python examples/efficacy_demo.py             # default: seeds 17, 5
    python examples/efficacy_demo.py --seeds 0 1 2 --steps 480
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[17, 5])
    ap.add_argument("--steps", type=int, default=480)
    ap.add_argument("--device", default=None,
                    help="cpu forces the CPU backend (the axon sitecustomize "
                         "overrides JAX_PLATFORMS; use the flag)")
    args = ap.parse_args(argv)

    import jax
    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    import test_efficacy as eff
    from uni_adapter_tpu import engine

    eff.T = args.steps  # module-level stream length used by make_problem

    print(f"{'seed':>6} {'zero-shot':>10} {'MODE-DOTA':>10} {'cache':>8}"
          f"   (Top-1 %, {args.steps}-step stream, K={eff.K})")
    for seed in args.seeds:
        pcs, targets, text, W = eff.make_problem(seed)
        zs = eff.zero_shot_acc(pcs, targets, text, W)
        accs = {}
        for method in ("mode", "cache"):
            cfg = eff._config(method)
            model = eff._JaxToyEncoder(W)
            _, outs = engine.run_stream_scan(
                cfg, model, {}, jnp.asarray(text), jnp.asarray(pcs),
                jnp.asarray(np.ones_like(pcs)),
                jnp.asarray(targets.astype(np.int32)))
            final = np.asarray(outs.final_logits)[:, 0]
            accs[method] = 100.0 * np.mean(
                final.argmax(-1) == targets[:, 0])
        print(f"{seed:>6} {zs:>10.1f} {accs['mode']:>10.1f} "
              f"{accs['cache']:>8.1f}   "
              f"(gain {accs['mode'] - zs:+.1f} / {accs['cache'] - zs:+.1f})")


if __name__ == "__main__":
    main()
