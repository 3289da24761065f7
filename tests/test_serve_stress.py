"""EP-serving load evidence (VERDICT r4 item 6): many clients with MIXED
register/submit/snapshot/restore/reset traffic hitting the class-sharded
HTTP server concurrently, at the real LVIS label count (K=1156 padded to
1160 over the 8-device classes mesh).

The semantic contracts under load:
  * every uninterrupted client's trajectory equals a dedicated
    sequential run (per-client isolation survives arbitrary interleaving
    with other clients' snapshots/restores/resets);
  * a client snapshotted mid-stream and restored later REWINDS exactly —
    replaying its tail reproduces the same logits the uninterrupted twin
    got, even though unrelated traffic kept mutating the server between
    the snapshot and the restore;
  * a client that starts submitting midway through the storm joins the
    ticking cleanly at its own step 0;
  * a reset client restarts its trajectory from scratch on a fresh seed
    slot;
  * /healthz stays consistent when the dust settles.
"""
import http.client
import io
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.serve import TTAServer
from uni_adapter_tpu.serve_http import HTTPTTAServer

K, D, N, T = 1156, 48, 32, 4


@pytest.fixture(scope="module")
def setup():
    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, N, 6), jnp.float32))
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    # res learning OFF: the per-client equality contract must be exact,
    # and the residual objective's exp(exp) amplification of EP-vs-
    # replicated float roundoff is the one documented non-determinism
    # (tests/test_ep.py envelope); concurrency semantics are what this
    # file stresses.  Res-ON EP trajectory envelopes live in
    # tests/test_ep.py; res-ON serving plumbing in tests/test_serve.py.
    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_mode_dota=True, mode_M=2,
                                 res_learning=False),
                 cache=CacheConfig())
    streams = rng.standard_normal((8, T, 1, N, 3)).astype(np.float32)
    return cfg, model, params, text, streams


def _post(port, path, body=b"", timeout=600):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        conn.request("POST", path, body=body)
        r = conn.getresponse()
        return r.status, r.read()
    finally:
        conn.close()


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    try:
        conn.request("GET", path)
        r = conn.getresponse()
        return r.status, r.read()
    finally:
        conn.close()


def _submit(port, client, pc):
    buf = io.BytesIO()
    np.savez(buf, pc=pc)
    status, body = _post(port, f"/submit?client={client}", buf.getvalue())
    assert status == 200, (client, body)
    return np.load(io.BytesIO(body))


def _sequential_logits(cfg, model, params, text, stream, seed):
    pcs = jnp.asarray(stream)
    _, outs = engine.run_stream_scan(
        cfg, model, params, jnp.asarray(text), pcs, jnp.ones_like(pcs),
        jnp.zeros((stream.shape[0], 1), jnp.int32), seed=seed)
    return np.asarray(outs.final_logits)


def test_ep_server_mixed_traffic_storm(setup, tmp_path):
    from uni_adapter_tpu.parallel import ep

    cfg, model, params, text, streams = setup
    server = TTAServer(cfg, model, params, text, seed=42, dist_mode="ep",
                       mesh=ep.make_classes_mesh(8))
    with HTTPTTAServer(server, snapshot_dir=str(tmp_path / "snaps"),
                       gather_ms=20.0) as http_srv:
        port = http_srv.port

        # all eight clients register upfront (deterministic seed slots
        # 42+i — serve.register's _next_client counter); the STORM is in
        # the traffic: c5 starts submitting midway, c6 resets mid-stream
        # (taking the next fresh slot, deterministically 42+8), c7
        # snapshots at step 1, keeps going, then restores + replays
        for i in range(8):
            status, _ = _post(port, f"/register?client=c{i}")
            assert status == 200

        got = {f"c{i}": [] for i in range(8)}
        errors = []

        barrier = threading.Barrier(6)  # 5 steady + the late joiner

        def steady(i):
            try:
                got[f"c{i}"].append(_submit(port, f"c{i}", streams[i, 0]))
                barrier.wait(timeout=300)
                for t in range(1, T):
                    got[f"c{i}"].append(
                        _submit(port, f"c{i}", streams[i, t]))
            except Exception as e:  # surfaced after join
                errors.append((i, e))

        def late_joiner():
            try:
                barrier.wait(timeout=300)   # join after the first wave
                for t in range(T):
                    got["c5"].append(_submit(port, "c5", streams[5, t]))
            except Exception as e:
                errors.append((5, e))

        def resetter():
            try:
                _submit(port, "c6", streams[0, 0])     # throwaway prefix
                _submit(port, "c6", streams[0, 1])
                status, _ = _post(port, "/reset?client=c6")
                assert status == 200
                for t in range(T):
                    got["c6"].append(_submit(port, "c6", streams[6, t]))
            except Exception as e:
                errors.append((6, e))

        def snapshotter():
            try:
                got["c7"].append(_submit(port, "c7", streams[7, 0]))
                status, _ = _post(port,
                                  "/snapshot?client=c7&name=storm.step1")
                assert status == 200
                # keep going past the snapshot (this tail gets discarded
                # by the restore below)
                for t in range(1, T):
                    _submit(port, "c7", streams[7, t])
            except Exception as e:
                errors.append((7, e))

        threads = ([threading.Thread(target=steady, args=(i,))
                    for i in range(5)]
                   + [threading.Thread(target=late_joiner),
                      threading.Thread(target=resetter),
                      threading.Thread(target=snapshotter)])
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        assert not any(th.is_alive() for th in threads)
        assert not errors, errors

        # c7 restores its step-1 snapshot AFTER the storm and replays the
        # tail — must land exactly where the uninterrupted twin would
        status, _ = _post(port, "/restore?client=c7&name=storm.step1")
        assert status == 200
        for t in range(1, T):
            got["c7"].append(_submit(port, "c7", streams[7, t]))

        status, body = _get(port, "/healthz")
        assert status == 200
        import json as _json
        health = _json.loads(body)
        assert health["clients"] == 8

    # per-client equality with dedicated sequential runs (server seeds
    # are 42 + registration order = 42 + i)
    for i in [0, 1, 2, 3, 4, 5, 7]:
        want = _sequential_logits(cfg, model, params, text, streams[i],
                                  seed=42 + i)
        np.testing.assert_allclose(np.stack(got[f"c{i}"])[:, 0],
                                   want[:, 0], rtol=1e-4, atol=1e-4,
                                   err_msg=f"c{i}")

    # c6's post-reset trajectory restarts from scratch on the next fresh
    # seed slot (42+8 — slots are never reused): equals a FRESH dedicated
    # run, not a continuation of its discarded prefix
    want6 = _sequential_logits(cfg, model, params, text, streams[6],
                               seed=42 + 8)
    np.testing.assert_allclose(np.stack(got["c6"])[:, 0], want6[:, 0],
                               rtol=1e-4, atol=1e-4)
