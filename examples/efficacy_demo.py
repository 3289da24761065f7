"""Example: watch test-time adaptation beat zero-shot on a structured stream.

A self-contained demonstration of the framework's reason to exist
(reference Uni_Adapter.py:581-595): a corrupted stream where frozen
zero-shot classification degrades and the online adapters recover accuracy
— no datasets, checkpoints, torch, or test dependencies needed.

The stream is the calibrated ring-of-classes + coherent-drift construction
shared with the committed efficacy tests
(uni_adapter_tpu/data/synthetic_stream.py — tests/test_efficacy.py drives
the SAME code, plus the reference's own loop for gain parity).

Run:
    python examples/efficacy_demo.py             # default: seeds 17, 5
    python examples/efficacy_demo.py --seeds 0 1 2 --steps 480
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    from uni_adapter_tpu.data.synthetic_stream import (
        K, make_problem, run_adapter, zero_shot_acc)

    print(f"{'seed':>6} {'zero-shot':>10} {'MODE-DOTA':>10} {'cache':>8} "
          f"{'GMM-DOTA':>9}   (Top-1 %, {args.steps}-step stream, K={K})")
    for seed in args.seeds:
        pcs, targets, text, W = make_problem(seed, steps=args.steps)
        zs = zero_shot_acc(pcs, targets, text, W)
        accs = {m: run_adapter(m, text, pcs, targets, W)[0]
                for m in ("mode", "cache", "gmm")}
        print(f"{seed:>6} {zs:>10.1f} {accs['mode']:>10.1f} "
              f"{accs['cache']:>8.1f} {accs['gmm']:>9.1f}   "
              f"(gain {accs['mode'] - zs:+.1f} / {accs['cache'] - zs:+.1f}"
              f" / {accs['gmm'] - zs:+.1f})")


if __name__ == "__main__":
    main()
