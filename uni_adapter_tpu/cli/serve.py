"""CLI: serve online test-time adaptation over HTTP.

Builds the configured backbone + text anchors (same flags as the
evaluation driver — config.parse_args) and exposes serve.TTAServer
through the micro-batching HTTP endpoint (serve_http.HTTPTTAServer):

    uni-adapter-serve --checkpoint-path uni3d_L.npz \
        --precomputed-text-features large --port 8080

    POST /register?client=ID, POST /submit?client=ID (npz body: pc[,rgb])
    -> npy logits; GET /healthz; snapshots by NAME under --snapshot-dir.
    See the serve_http module docstring for the full protocol.

Serving flags are split off first so the evaluation parser stays the
single source of truth for model/data flags; `--help` prints both.
"""
from __future__ import annotations

import argparse
import logging
import os


def main(argv=None):
    # split serve-specific flags from the shared config flags
    ap = argparse.ArgumentParser(
        prog="uni-adapter-serve",
        description="Serving flags (all other flags: evaluation parser "
                    "below)", add_help=False)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--gather-ms", type=float, default=2.0,
                    help="first-request gather window per tick")
    ap.add_argument("--sizes", default="1,2,4,8,16",
                    help="compiled vmapped batch-size ladder")
    ap.add_argument("--snapshot-dir", default=None,
                    help="server-owned snapshot directory (default "
                         "<output-dir>/snapshots); clients reference "
                         "snapshots by NAME, never by path")
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile the step program for every ladder "
                         "size at startup (first requests skip the ~25 s "
                         "trunk compile)")
    serve_args, rest = ap.parse_known_args(argv)
    if "-h" in (rest or []) or "--help" in (rest or []):
        print(ap.format_help())   # then the shared parser prints and exits

    from uni_adapter_tpu.config import parse_args
    from uni_adapter_tpu.utils.logging import setup_logging

    cfg = parse_args(rest)
    import jax

    if cfg.run.device != "default":
        jax.config.update("jax_platforms", cfg.run.device)
    from uni_adapter_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    os.makedirs(cfg.run.output_dir, exist_ok=True)
    setup_logging(os.path.join(cfg.run.output_dir, "serve.log"))

    from uni_adapter_tpu.cli.tta import (build_model,
                                         get_text_anchors_with_fallback)
    from uni_adapter_tpu.serve import TTAServer
    from uni_adapter_tpu.serve_http import HTTPTTAServer

    model, params = build_model(cfg)
    if cfg.model.checkpoint_path is None:
        logging.warning("No checkpoint configured — random weights; "
                        "served logits are not meaningful.")

    # --trunk-parallel {tp,pp,sp}: shard the encoder over the devices
    # (same flags and semantics as the evaluation CLI); the client-vmapped
    # tick composes with the trunk's shard_map (tests/test_serve.py)
    encode_fn = None
    if cfg.run.trunk_parallel != "none":
        from uni_adapter_tpu.parallel.trunk import prepare_trunk_parallel

        params, encode_fn = prepare_trunk_parallel(cfg, model, params)

    text = get_text_anchors_with_fallback(cfg)
    sizes = tuple(int(s) for s in serve_args.sizes.split(","))
    # --dist-mode ep: class-shard every client's adaptation state over the
    # devices (the large-K online deployment; parallel/ep.py) — the vmap
    # ladder is disabled, see serve.TTAServer (which validates dist_mode)
    server = TTAServer(cfg, model, params, text, sizes=sizes,
                       seed=cfg.run.seed, encode_fn=encode_fn,
                       dist_mode=cfg.run.dist_mode)
    if serve_args.warmup:
        logging.info("warming up %d step programs ...",
                     len(server.sizes) + (0 if 1 in server.sizes else 1))
        server.warmup(cfg.data.npoints)
    snapshot_dir = (serve_args.snapshot_dir
                    or os.path.join(cfg.run.output_dir, "snapshots"))
    http_srv = HTTPTTAServer(server, host=serve_args.host,
                             port=serve_args.port,
                             gather_ms=serve_args.gather_ms,
                             snapshot_dir=snapshot_dir).start()
    logging.info("serving TTA on %s:%d (sizes %s)", serve_args.host,
                 http_srv.port, tuple(server.sizes))
    return http_srv   # caller-controlled lifetime (tests); CLI blocks below


def cli() -> int:
    """Console-script entry: serve until interrupted."""
    http_srv = main()
    try:
        http_srv.wait()
    except KeyboardInterrupt:
        logging.info("shutting down")
        http_srv.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(cli())
